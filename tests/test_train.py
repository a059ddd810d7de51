"""Train step: single-device + 8-way data-parallel on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.config import TrainConfig
from roma_tpu.losses.robust_loss import RobustLossConfig, tiny_robust_loss
from roma_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from roma_tpu.train.train import make_tiny_train_state, make_train_step


def make_batch(rng, b=2, h=64, w=64):
    K = np.array([[80.0, 0, w / 2], [0, 80.0, h / 2], [0, 0, 1]], np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.05
    return {
        "im_A": rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32),
        "im_B": rng.uniform(0, 1, (b, h, w, 3)).astype(np.float32),
        "im_A_depth": np.full((b, h, w), 2.0, np.float32),
        "im_B_depth": np.full((b, h, w), 2.0, np.float32),
        "T_1to2": np.tile(T, (b, 1, 1)),
        "K1": np.tile(K, (b, 1, 1)),
        "K2": np.tile(K, (b, 1, 1)),
    }


def test_tiny_loss_finite_and_metrics(rng):
    from roma_tpu.models.tiny_roma import TinyRoma

    model = TinyRoma()
    batch = make_batch(rng)
    im = jnp.asarray(batch["im_A"])
    variables = model.init(jax.random.PRNGKey(0), im, im, train=False)
    corresps, _ = model.apply(
        variables, im, jnp.asarray(batch["im_B"]), train=True, mutable=["batch_stats"]
    )
    loss, metrics = tiny_robust_loss(corresps, batch)
    assert np.isfinite(float(loss))
    assert "regression_loss_8" in metrics and "corr_volume_loss_8" in metrics


def test_train_step_updates_params(rng):
    cfg = TrainConfig(batch_size=2)
    state = make_tiny_train_state(jax.random.PRNGKey(0), cfg, hw=(64, 64))
    step = make_train_step()
    batch = make_batch(rng)
    p0 = jax.tree_util.tree_leaves(state.params)[0].copy()
    state, metrics = step(state, batch)
    assert int(state.step) == 2
    assert np.isfinite(float(metrics["total_loss"]))
    p1 = jax.tree_util.tree_leaves(state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_train_step_8way_data_parallel_matches_single(rng):
    """The sharded step over an 8-device mesh must produce the same update as
    the unsharded step on the same global batch (psum == big-batch grad)."""
    cfg = TrainConfig(batch_size=8)
    batch = make_batch(rng, b=8)

    state1 = make_tiny_train_state(jax.random.PRNGKey(0), cfg, hw=(64, 64))
    step1 = make_train_step()
    state1, m1 = step1(state1, batch)

    mesh = make_mesh(n_data=8)
    state8 = make_tiny_train_state(jax.random.PRNGKey(0), cfg, hw=(64, 64))
    state8 = replicate(state8, mesh)
    step8 = make_train_step(mesh=mesh)
    state8, m8 = step8(state8, shard_batch(batch, mesh))

    # GSPMD keeps global semantics; the residual gap is reduction-order fp32
    # noise amplified through train-mode BatchNorm + the corr softmax
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m8["total_loss"]), rtol=5e-3
    )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_ema_update_and_warmup_schedule():
    from roma_tpu.config import TrainConfig
    from roma_tpu.train.train import ema_update, init_ema, make_optimizer

    ema = {"w": jnp.zeros(3)}
    params = {"w": jnp.ones(3)}
    ema = ema_update(ema, params, decay=0.9)
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.1, atol=1e-6)
    # init_ema must materialize new buffers (donation safety)
    fresh = init_ema(params)
    assert fresh["w"] is not params["w"]
    np.testing.assert_allclose(np.asarray(fresh["w"]), 1.0)

    cfg = TrainConfig(batch_size=4, steps=1000, warmup_samples=40,
                      milestone_frac=0.9)
    tx = make_optimizer(cfg, lr=1.0)
    p = {"w": jnp.ones(3)}
    state = tx.init(p)
    g = {"w": jnp.full(3, 1e-3)}
    # first update: warmup multiplier = batch/warmup = 0.1 of full LR
    deltas = []
    for _ in range(12):
        upd, state = tx.update(g, state, p)
        deltas.append(float(jnp.abs(upd["w"]).max()))
    # warmup ramps over first 10 updates then plateaus
    assert deltas[0] < deltas[4] < deltas[9]
    assert abs(deltas[10] - deltas[11]) / deltas[11] < 1e-3


def test_staged_training_freezes_trunk_and_coarse():
    from roma_tpu.train.train import make_tiny_train_state, make_train_step

    cfg = TrainConfig(batch_size=2, steps=1000)
    state = make_tiny_train_state(
        jax.random.PRNGKey(0), cfg, hw=(64, 64), trainable="fine_only"
    )
    step = make_train_step()
    rng = np.random.default_rng(0)
    h = w = 64
    K = np.array([[80.0, 0, 32], [0, 80.0, 32], [0, 0, 1]], np.float32)
    batch = {
        "im_A": jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)),
        "im_B": jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)).astype(np.float32)),
        "im_A_depth": jnp.ones((2, h, w), jnp.float32) * 2,
        "im_B_depth": jnp.ones((2, h, w), jnp.float32) * 2,
        "K1": jnp.asarray(np.stack([K, K])),
        "K2": jnp.asarray(np.stack([K, K])),
        "T_1to2": jnp.asarray(np.stack([np.eye(4, dtype=np.float32)] * 2)),
    }
    before = jax.tree.map(lambda x: np.asarray(x), state.params)
    new_state, _ = step(state, batch)
    after = jax.tree.map(lambda x: np.asarray(x), new_state.params)

    def max_delta(sub_b, sub_a):
        leaves_b, leaves_a = jax.tree.leaves(sub_b), jax.tree.leaves(sub_a)
        return max(float(np.abs(b - a).max()) for b, a in zip(leaves_b, leaves_a))

    assert max_delta(before["backbone"], after["backbone"]) == 0.0
    assert max_delta(before["coarse_matcher"], after["coarse_matcher"]) == 0.0
    assert max_delta(before["fine_matcher"], after["fine_matcher"]) > 0.0


def test_multihost_helpers_single_process(rng):
    """initialize_distributed is a no-op without a coordinator; the
    host-local->global assembler equals shard_batch in a single process."""
    from roma_tpu.parallel.mesh import (
        global_batch_from_host_local,
        initialize_distributed,
    )

    proc, nproc = initialize_distributed()
    assert (proc, nproc) == (0, 1)

    mesh = make_mesh(n_data=8)
    batch = make_batch(rng, b=8)
    got = global_batch_from_host_local(batch, mesh)
    want = shard_batch(batch, mesh)
    for k in batch:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
        assert got[k].sharding == want[k].sharding
