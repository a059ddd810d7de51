"""Shared model/batch construction for the multi-process test: both the
2-process workers and the single-process reference build EXACTLY this."""

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.config import TinyRomaConfig, TrainConfig
from roma_tpu.losses.robust_loss import RobustLossConfig, tiny_robust_loss
from roma_tpu.models.tiny_roma import TinyRoma
from roma_tpu.parallel.mesh import replicate
from roma_tpu.train.train import make_tiny_train_state, make_train_step

HW = (32, 32)
GLOBAL_BATCH = 8


def build_state_and_step(mesh):
    cfg = TinyRomaConfig(match_dim=32, fine_match_dim=16, dtype="float32")
    tcfg = TrainConfig(batch_size=GLOBAL_BATCH, lr_decoder=1e-4)
    state = make_tiny_train_state(
        jax.random.PRNGKey(0), tcfg, hw=HW, model=TinyRoma(cfg), trainable="all"
    )
    state = state.replace(
        params=replicate(state.params, mesh),
        batch_stats=replicate(state.batch_stats, mesh),
        opt_state=replicate(state.opt_state, mesh),
        step=jax.device_put(state.step, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())),
    )
    loss_cfg = RobustLossConfig(
        ce_weight=0.01, alpha={4: 0.15, 8: 0.15}, c=1e-4, local_dist={4: 4},
        epe_mask_prob_th=0.001,
    )
    step = make_train_step(tiny_robust_loss, loss_cfg, mesh=mesh)
    return state, step


def global_batch():
    rng = np.random.default_rng(7)
    h, w = HW
    B = GLOBAL_BATCH
    im = rng.uniform(0, 1, (2 * B, h, w, 3)).astype(np.float32)
    depth = (4.0 + rng.uniform(0, 1, (2 * B, h, w))).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.2
    K = np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32)
    return {
        "im_A": im[:B],
        "im_B": im[B:],
        "im_A_depth": depth[:B],
        "im_B_depth": depth[B:],
        "T_1to2": np.stack([T] * B),
        "K1": np.stack([K] * B),
        "K2": np.stack([K] * B),
    }


def fingerprint(state) -> float:
    """Order-stable scalar over all params (process-identical if and only if
    the replicated updates match)."""
    leaves = jax.tree_util.tree_leaves(state.params)
    return float(sum(jnp.sum(jnp.abs(x.astype(jnp.float64))) for x in leaves))
