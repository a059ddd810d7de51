"""Training-convergence proof (VERDICT r1 #4): the loss actually decreases
and the model actually learns a warp — not just "one step changes params".

Setup: a fronto-parallel textured plane seen by two cameras separated by a
pure x-translation, so the GT dense warp is a constant disparity. The full
train stack (TinyRoma forward -> tiny_robust_loss -> AdamW) must overfit
this single pair until the dense EPE at the fine scale is < 1 px.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.config import TinyRomaConfig, TrainConfig
from roma_tpu.losses.robust_loss import RobustLossConfig, tiny_robust_loss
from roma_tpu.models.tiny_roma import TinyRoma
from roma_tpu.train.train import make_tiny_train_state, make_train_step


H = W = 64
FX = 64.0
PLANE_D = 4.0
SHIFT_PX = 6  # disparity = FX * tx / d


def _textured_pair():
    """im_B is im_A shifted left by SHIFT_PX (integer -> no resampling)."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (H, W + SHIFT_PX, 3)).astype(np.float32)
    # smooth a little so features are learnable but keep high-frequency detail
    for ax in (0, 1):
        base = 0.6 * base + 0.2 * (np.roll(base, 1, ax) + np.roll(base, -1, ax))
    im_a = base[:, :W]
    im_b = base[:, SHIFT_PX:]
    # x_B = x_A - SHIFT_PX: cam2 shifted +x by tx with disparity = FX*tx/d
    tx = SHIFT_PX * PLANE_D / FX
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = -tx
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1]], np.float32)
    depth = np.full((H, W), PLANE_D, np.float32)
    batch = {
        "im_A": jnp.asarray(im_a[None]),
        "im_B": jnp.asarray(im_b[None]),
        "im_A_depth": jnp.asarray(depth[None]),
        "im_B_depth": jnp.asarray(depth[None]),
        "T_1to2": jnp.asarray(T[None]),
        "K1": jnp.asarray(K[None]),
        "K2": jnp.asarray(K[None]),
    }
    return batch


@pytest.mark.slow
def test_tiny_roma_overfits_synthetic_scene():
    batch = _textured_pair()
    cfg = TinyRomaConfig(match_dim=64, fine_match_dim=32, dtype="float32")
    model = TinyRoma(cfg)
    # small model, aggressive LR for a single-pair overfit
    tcfg = TrainConfig(batch_size=1, lr_decoder=2e-3, grad_clip=1.0)
    state = make_tiny_train_state(
        jax.random.PRNGKey(0), tcfg, hw=(H, W), model=model, trainable="all"
    )
    loss_cfg = RobustLossConfig(
        ce_weight=0.01, alpha={4: 0.15, 8: 0.15}, c=1e-4,
        local_dist={4: 4}, epe_mask_prob_th=0.001, corr_volume_weight=1.0,
    )
    step = make_train_step(tiny_robust_loss, loss_cfg)

    def fine_epe_px(st):
        corresps = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats},
            batch["im_A"], batch["im_B"], train=False,
        )
        flow = np.asarray(corresps[4]["flow"])[0]
        h4, w4 = flow.shape[:2]
        gx, gy = np.meshgrid(
            np.linspace(-1 + 1 / w4, 1 - 1 / w4, w4),
            np.linspace(-1 + 1 / h4, 1 - 1 / h4, h4), indexing="xy",
        )
        gt_x = gx - 2 * SHIFT_PX / W
        valid = gt_x > -1 + 2 * SHIFT_PX / W
        return float(
            np.mean(np.hypot(flow[..., 0] - gt_x, flow[..., 1] - gy)[valid])
            * W / 2
        )

    epe0 = fine_epe_px(state)
    assert epe0 > 5.0  # random init is far off

    losses = []
    for i in range(500):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))

    # loss must actually decrease (the Charbonnier has an intrinsic floor of
    # ~0.42/scale at this c, so assert a meaningful drop, not a halving)
    first = float(np.median(losses[:20]))
    last = float(np.median(losses[-20:]))
    assert last < 0.85 * first, (first, last)

    # dense EPE at the fine scale: 22 px at init -> < 1 px when learned
    assert fine_epe_px(state) < 1.0, fine_epe_px(state)

    # keep the original fine-scale check shape for completeness
    corresps = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["im_A"], batch["im_B"], train=False,
    )
    flow = np.asarray(corresps[4]["flow"])[0]  # (H/4, W/4, 2) normalized
    h4, w4 = flow.shape[:2]
    gx, gy = np.meshgrid(
        np.linspace(-1 + 1 / w4, 1 - 1 / w4, w4),
        np.linspace(-1 + 1 / h4, 1 - 1 / h4, h4), indexing="xy",
    )
    gt_x = gx - 2 * SHIFT_PX / W  # constant disparity in normalized coords
    # evaluate away from the left border (covisibility)
    valid = gt_x > -1 + 2 * SHIFT_PX / W
    epe_px = np.hypot(flow[..., 0] - gt_x, flow[..., 1] - gy)[valid] * W / 2
    assert float(np.mean(epe_px)) < 1.0, float(np.mean(epe_px))
