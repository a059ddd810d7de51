"""Full-RoMa training state, checkpoint/resume roundtrip, metrics logging."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.config import TrainConfig
from roma_tpu.losses.robust_loss import RobustLossConfig, robust_loss
from roma_tpu.models.zoo import debug_roma_config
from roma_tpu.train.checkpoint import CheckPoint
from roma_tpu.train.logging import MetricsLogger
from roma_tpu.train.train import (
    make_roma_train_state,
    make_tiny_train_state,
    make_train_step,
    train_k_steps,
)
from tests.test_train import make_batch


def test_roma_train_state_param_groups():
    state = make_roma_train_state(
        jax.random.PRNGKey(0), TrainConfig(batch_size=1),
        roma_cfg=debug_roma_config(), hw=(112, 112),
    )
    assert "encoder" in state.params and "decoder" in state.params


def test_roma_train_step_runs_and_freezes_dino(rng):
    cfg = TrainConfig(batch_size=1)
    state = make_roma_train_state(
        jax.random.PRNGKey(0), cfg, roma_cfg=debug_roma_config(), hw=(112, 112)
    )
    dino_before = jax.tree_util.tree_map(
        lambda x: np.asarray(x).copy(), state.params["encoder"]["dinov2"]
    )
    step = make_train_step(
        loss_fn=robust_loss,
        loss_cfg=RobustLossConfig(alpha=0.5, local_dist={1: 4, 2: 4, 4: 8, 8: 8}),
    )
    batch = make_batch(rng, b=1, h=112, w=112)
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert "gm_cls_loss_16" in metrics
    dino_after = state.params["encoder"]["dinov2"]
    for a, b in zip(
        jax.tree_util.tree_leaves(dino_before), jax.tree_util.tree_leaves(dino_after)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = TrainConfig(batch_size=2)
    state = make_tiny_train_state(jax.random.PRNGKey(0), cfg, hw=(64, 64))
    step = make_train_step()
    state, _ = step(state, make_batch(rng))

    ckpt = CheckPoint(str(tmp_path), "tiny")
    ckpt.save(state)
    ckpt.wait()
    assert ckpt.latest_step() == 2

    fresh = make_tiny_train_state(jax.random.PRNGKey(1), cfg, hw=(64, 64))
    restored = ckpt.load(fresh)
    assert int(restored.step) == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored state is trainable
    restored, m = step(restored, make_batch(rng))
    assert np.isfinite(float(m["total_loss"]))


def test_checkpoint_load_without_save_returns_fresh(tmp_path):
    state = make_tiny_train_state(jax.random.PRNGKey(0), TrainConfig(), hw=(64, 64))
    ckpt = CheckPoint(str(tmp_path), "none")
    out = ckpt.load(state)
    assert out is state


def test_train_k_steps_and_logger(tmp_path, rng):
    cfg = TrainConfig(batch_size=2)
    state = make_tiny_train_state(jax.random.PRNGKey(0), cfg, hw=(64, 64))
    step = make_train_step()
    logger = MetricsLogger(str(tmp_path), every=1)

    def loader():
        while True:
            yield make_batch(rng)

    state = train_k_steps(state, loader(), step, k=3, logger=logger)
    logger.close()
    assert int(state.step) == 6
    lines = open(os.path.join(tmp_path, "train.jsonl")).read().strip().split("\n")
    assert len(lines) == 3
    import json

    row = json.loads(lines[-1])
    assert "total_loss" in row and row["step"] == 6
