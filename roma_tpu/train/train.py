"""Training step + state for the matcher models.

Replaces the reference's train loop machinery
(/root/reference/romatch/train/train.py:7-104): no GradScaler (bf16 on TPU
needs none), gradient-norm clipping to 0.01 (train_roma_outdoor.py:234 uses
the same clip), AdamW with per-group LRs, MultiStep LR decay at 90% of the
schedule — all as one jitted, mesh-sharded step. The step counter counts
samples (GLOBAL_STEP semantics), matching the reference's LR milestones.

Data parallelism: batches arrive sharded over the mesh `data` axis, params
replicated; jit + sharding constraints make XLA insert the gradient
all-reduce (the DDP-equivalent) over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import optax
from flax import struct

from roma_tpu.config import TrainConfig
from roma_tpu.losses.robust_loss import RobustLossConfig, tiny_robust_loss
from roma_tpu.models.tiny_roma import TinyRoma
from roma_tpu.parallel.mesh import batch_sharding, replicated_sharding


class TrainState(struct.PyTreeNode):
    step: jax.Array                       # counts samples, like the reference
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_optimizer(cfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    """clip-by-global-norm 0.01 -> AdamW with sample-count LR schedule."""
    milestone = int(cfg.steps * cfg.milestone_frac)

    def schedule(count):
        # `count` is optimizer updates; the caller scales lr by batch size so
        # LR-per-sample matches the reference's STEP_SIZE-scaled group LRs
        samples = count * cfg.batch_size
        mult = jnp.where(samples >= milestone, cfg.lr_decay, 1.0)
        if cfg.warmup_samples > 0:
            mult = mult * jnp.minimum(1.0, (samples + cfg.batch_size) / cfg.warmup_samples)
        return lr * mult

    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(schedule, weight_decay=0.01),
    )


def make_tiny_train_state(
    rng: jax.Array,
    cfg: TrainConfig = TrainConfig(),
    hw: tuple[int, int] = (448, 448),
    model: TinyRoma | None = None,
    trainable: str = "all",
) -> TrainState:
    """trainable: "all" | "fine_only" (the fork's staged recipe —
    freeze trunk+coarse, train the fine matcher; model_tiny2.py:669-684
    freeze_stage1/train_fine_matcher) | "matchers_only" (frozen XFeat trunk,
    the shipped tiny configuration)."""
    model = model if model is not None else TinyRoma()
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = jax.jit(lambda k, a, b: model.init(k, a, b, train=False))(rng, x, x)
    tx = make_optimizer(cfg, cfg.lr_decoder * cfg.batch_size)
    if trainable != "all":
        frozen_roots = {
            "fine_only": {"backbone", "coarse_matcher"},
            "matchers_only": {"backbone"},
        }[trainable]

        def label_tree(params):
            def assign(path, _leaf):
                root = str(path[0].key) if hasattr(path[0], "key") else ""
                return "frozen" if root in frozen_roots else "train"

            return jax.tree_util.tree_map_with_path(assign, params)

        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, label_tree
        )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def make_roma_train_state(
    rng: jax.Array,
    cfg: TrainConfig = TrainConfig(),
    roma_cfg=None,
    hw: tuple[int, int] = (448, 448),
) -> TrainState:
    """Full-RoMa training state with the reference's parameter groups
    (train_roma_outdoor.py:221-225): CNN encoder at lr_encoder, decoder at
    lr_decoder, DINOv2 frozen (zero updates — its grads are already zero via
    stop_gradient; the mask also keeps AdamW weight decay off it)."""
    import optax

    from roma_tpu.config import RomaConfig
    from roma_tpu.models.matcher import RomaModel

    roma_cfg = roma_cfg or RomaConfig()
    model = RomaModel(roma_cfg)
    x = jnp.zeros((1, *hw, 3), jnp.float32)
    variables = jax.jit(
        lambda k, a, b: model.init(k, a, b, symmetric=False, train=False)
    )(rng, x, x)

    def label_tree(params):
        def assign(path, _leaf):
            keys = [str(p.key) for p in path if hasattr(p, "key")]
            if "dinov2" in keys:
                return "frozen"
            if "encoder" in keys:
                return "encoder"
            return "decoder"

        return jax.tree_util.tree_map_with_path(assign, params)

    tx = optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.multi_transform(
            {
                "encoder": _adamw_with_schedule(cfg, cfg.lr_encoder * cfg.batch_size),
                "decoder": _adamw_with_schedule(cfg, cfg.lr_decoder * cfg.batch_size),
                "frozen": optax.set_to_zero(),
            },
            label_tree,
        ),
    )
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=lambda v, a, b, **kw: model.apply(v, a, b, symmetric=False, **kw),
    )


def _adamw_with_schedule(cfg: TrainConfig, lr: float) -> optax.GradientTransformation:
    milestone = int(cfg.steps * cfg.milestone_frac)

    def schedule(count):
        return lr * jnp.where(count * cfg.batch_size >= milestone, cfg.lr_decay, 1.0)

    return optax.adamw(schedule, weight_decay=0.01)


def ema_update(ema_params: Any, params: Any, decay: float = 0.999) -> Any:
    """One EMA step (reference train_k_steps ema_model.update() hook,
    train/train.py:59-60). Jit-safe pure function."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p,
                        ema_params, params)


def init_ema(params: Any) -> Any:
    """Materialize an EMA tree as fresh device buffers. Required because
    make_train_step donates the state: an EMA tree that merely aliases
    `state.params` would reference deleted buffers after the first step."""
    return jax.tree.map(lambda p: p + jnp.zeros((), p.dtype), params)


def train_k_steps(
    state: TrainState,
    loader,
    step_fn,
    k: int,
    logger=None,
    device_put=None,
    ema_params: Any = None,
    ema_decay: float = 0.999,
) -> TrainState | tuple[TrainState, Any]:
    """Run k optimizer steps off a batch iterator (reference
    train/train.py:42-66 without the GradScaler machinery). Warmup lives in
    the optax schedule (make_optimizer), not a separate hook. Pass
    `ema_params` to also maintain an exponential moving average of params;
    the (state, ema_params) pair is then returned."""
    use_ema = ema_params is not None
    ema_step = jax.jit(ema_update, static_argnames="decay") if use_ema else None
    for _ in range(k):
        batch = next(loader)
        if device_put is not None:
            batch = device_put(batch)
        state, metrics = step_fn(state, batch)
        if use_ema:
            ema_params = ema_step(ema_params, state.params, decay=ema_decay)
        if logger is not None:
            logger.log(int(state.step), metrics)
    if use_ema:
        return state, ema_params
    return state


def make_train_step(
    loss_fn: Callable = tiny_robust_loss,
    loss_cfg: RobustLossConfig | None = None,
    mesh=None,
):
    """Build the jitted data-parallel train step.

    batch: {im_A, im_B (B,H,W,3), im_A_depth, im_B_depth (B,H,W),
            T_1to2 (B,4,4), K1, K2 (B,3,3)} — the reference's dataset item
    contract (megadepth.py:166-179), channels-last.
    """
    kwargs = {} if loss_cfg is None else {"cfg": loss_cfg}

    def step(state: TrainState, batch: Mapping[str, jax.Array]):
        def loss_of(params):
            corresps, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                batch["im_A"], batch["im_B"], train=True, mutable=["batch_stats"],
            )
            loss, metrics = loss_fn(corresps, batch, **kwargs)
            return loss, (metrics, mutated["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_of, has_aux=True
        )(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, total_loss=loss, grad_norm=optax.global_norm(grads))
        bsz = batch["im_A"].shape[0]
        new_state = state.replace(
            step=state.step + bsz,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(rep, data),
        out_shardings=(rep, rep),
    )
