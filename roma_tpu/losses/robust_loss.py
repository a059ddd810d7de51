"""Multi-scale robust matching losses (full RoMa + Tiny RoMa variants).

JAX re-design of the reference loss modules
(/root/reference/romatch/losses/robust_loss.py:10-161 and
robust_loss_tiny_roma.py:13-160). Differences from the reference are
mechanical, not semantic:

- pure functions returning (scalar loss, metrics dict) — no wandb calls
  buried in the loss (reference logs every term from inside the module);
  the train loop decides what to log.
- masked means instead of boolean indexing (fixed shapes, jit-friendly).
- GT warps are recomputed per scale from depth on device, same as the
  reference (robust_loss.py:126-134).

Loss pieces:
- generalized Charbonnier regression on end-point-error, masked to
  confident GT (prob > 0.99): cs^a * ((epe/cs)^2 + 1)^(a/2), cs = c * scale
- BCE on certainty logits vs GT validity
- full variant: cross-entropy over the 64^2 anchor grid at the coarse scale,
  and hierarchical locality gating — fine scales only supervised where the
  previous scale's EPE was already small (robust_loss.py:138-141)
- tiny variant: per-scale locality gate on its own EPE, certainty target
  zeroed where EPE > scale * epe_mask_prob_th, and an optional dual-softmax
  InfoNCE on the correlation volume at mutual-nearest GT pairs
  (robust_loss_tiny_roma.py:50-61, 129-152)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping

import jax
import jax.numpy as jnp

from roma_tpu.ops.corr import coord_grid
from roma_tpu.utils.geometry import get_gt_warp


@dataclasses.dataclass(frozen=True)
class RobustLossConfig:
    ce_weight: float = 0.01
    alpha: Mapping[int, float] | float = 0.5
    c: float = 1e-4
    local_dist: Mapping[int, float] = dataclasses.field(default_factory=dict)
    local_largest_scale: int = 8
    epe_mask_prob_th: float | None = None
    corr_volume_weight: float = 1.0
    corr_volume_inv_temp: float = 10.0
    cls_res: int = 64
    relative_depth_error_threshold: float = 0.05


def _masked_mean(x: jax.Array, mask: jax.Array, eps: float = 1e-8) -> jax.Array:
    m = mask.astype(jnp.float32)
    return jnp.sum(x * m) / (jnp.sum(m) + eps)


def _bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def _alpha_for(cfg: RobustLossConfig, scale: int) -> float:
    return cfg.alpha[scale] if isinstance(cfg.alpha, Mapping) else cfg.alpha


def regression_terms(
    cfg: RobustLossConfig,
    gt_warp: jax.Array,
    prob: jax.Array,
    flow: jax.Array,
    certainty: jax.Array,
    scale: int,
    gt_cert: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(certainty BCE mean, Charbonnier regression mean over prob>0.99)."""
    epe = jnp.linalg.norm(flow - gt_warp, axis=-1)
    ce = jnp.mean(_bce_with_logits(certainty[..., 0], gt_cert if gt_cert is not None else prob))
    a = _alpha_for(cfg, scale)
    cs = cfg.c * scale
    reg = cs**a * ((epe / cs) ** 2 + 1.0) ** (a / 2)
    reg = _masked_mean(reg, prob > 0.99)
    return ce, reg


def corr_volume_nll(
    cfg: RobustLossConfig,
    cv: jax.Array,
    gt_warp_fwd: jax.Array,
    gt_warp_bwd: jax.Array,
    hw: tuple[int, int],
) -> jax.Array:
    """Dual-softmax InfoNCE at mutual-nearest GT pairs.

    cv: (B, L_A, L_B) target-major volume (A rows, B cols). Mutual pairs are
    found by nearest-anchor snapping of the forward warp (A->B) against the
    B grid and the backward warp (B->A) against the A grid, both within 0.01
    normalized units (reference robust_loss_tiny_roma.py:142-148). Fixed-shape
    masked mean instead of index gathering.
    """
    h, w = hw
    L = h * w
    grid = coord_grid(h, w).reshape(L, 2)
    fa = gt_warp_fwd.reshape(-1, L, 2)
    fb = gt_warp_bwd.reshape(-1, L, 2)

    # D_B[b, a, j]: distance of A-pixel a's GT target to B grid cell j
    d_b = jnp.linalg.norm(fa[:, :, None, :] - grid[None, None, :, :], axis=-1)
    # D_A[b, i, q]: distance of A grid cell i to B-pixel q's GT target
    d_a = jnp.linalg.norm(grid[None, :, None, :] - fb[:, None, :, :], axis=-1)

    is_nn_b = d_b == jnp.min(d_b, axis=-1, keepdims=True)
    is_nn_a = d_a == jnp.min(d_a, axis=-2, keepdims=True)
    mnn = is_nn_b & is_nn_a & (d_b < 0.01) & (d_a < 0.01)

    logits = cfg.corr_volume_inv_temp * cv.astype(jnp.float32)
    nll = -jax.nn.log_softmax(logits, axis=-2) - jax.nn.log_softmax(logits, axis=-1)
    return _masked_mean(nll, mnn)


def _gt_for_scale(batch: Mapping[str, Any], h: int, w: int, cfg: RobustLossConfig):
    return get_gt_warp(
        batch["im_A_depth"], batch["im_B_depth"], batch["T_1to2"],
        batch["K1"], batch["K2"], H=h, W=w,
        relative_depth_error_threshold=cfg.relative_depth_error_threshold,
    )


def tiny_robust_loss(
    corresps: Mapping[int, Mapping[str, jax.Array]],
    batch: Mapping[str, Any],
    cfg: RobustLossConfig = RobustLossConfig(
        alpha={4: 0.15, 8: 0.15}, local_dist={4: 4}, epe_mask_prob_th=0.001
    ),
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Tiny-RoMa training loss over {8: ..., 4: ...} corresps (channels-last)."""
    tot = 0.0
    metrics: dict[str, jax.Array] = {}
    for scale in sorted(corresps.keys(), reverse=True):
        sc = corresps[scale]
        flow, certainty = sc["flow"], sc["certainty"]
        b, h, w, _ = flow.shape
        gt_warp, prob = _gt_for_scale(batch, h, w, cfg)

        epe = jnp.linalg.norm(flow - gt_warp, axis=-1)
        if scale in cfg.local_dist:
            prob = prob * (epe < (2 / 512) * cfg.local_dist[scale] * scale)
        gt_cert = prob
        if cfg.epe_mask_prob_th is not None:
            gt_cert = prob * (epe < scale * cfg.epe_mask_prob_th)

        ce, reg = regression_terms(cfg, gt_warp, prob, flow, certainty, scale, gt_cert)
        tot = tot + cfg.ce_weight * ce + reg
        metrics[f"certainty_loss_{scale}"] = ce
        metrics[f"regression_loss_{scale}"] = reg

        if "corr_volume" in sc:
            gt_bwd, _ = get_gt_warp(
                batch["im_B_depth"], batch["im_A_depth"],
                jnp.linalg.inv(batch["T_1to2"]), batch["K2"], batch["K1"],
                H=h, W=w,
                relative_depth_error_threshold=cfg.relative_depth_error_threshold,
            )
            nce = corr_volume_nll(cfg, sc["corr_volume"], gt_warp, gt_bwd, (h, w))
            tot = tot + cfg.corr_volume_weight * nce
            metrics[f"corr_volume_loss_{scale}"] = nce
    return tot, metrics


def robust_loss(
    corresps: Mapping[int, Mapping[str, jax.Array]],
    batch: Mapping[str, Any],
    cfg: RobustLossConfig = RobustLossConfig(
        alpha=0.5, c=1e-4, local_dist={1: 4, 2: 4, 4: 8, 8: 8}
    ),
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Full-RoMa training loss over {16, 8, 4, 2, 1} corresps.

    Coarse scale carries `gm_cls` (B, H, W, cls_res^2) anchor logits +
    `gm_certainty`; finer scales regress. Hierarchical gate: at scales <=
    local_largest_scale, GT prob is zeroed where the previous (coarser)
    scale's EPE exceeded local_dist[scale] * scale * (2/512).
    """
    tot = 0.0
    metrics: dict[str, jax.Array] = {}
    prev_epe = None
    for scale in sorted(corresps.keys(), reverse=True):
        sc = corresps[scale]
        flow, certainty = sc["flow"], sc["certainty"]
        b, h, w, _ = flow.shape
        gt_warp, prob = _gt_for_scale(batch, h, w, cfg)

        if cfg.local_largest_scale >= scale and prev_epe is not None:
            from roma_tpu.ops.resize import interpolate_nearest

            gate = interpolate_nearest(prev_epe[..., None], (h, w))[..., 0]
            prob = prob * (gate < (2 / 512) * cfg.local_dist[scale] * scale)

        if "gm_cls" in sc:
            gm_cls, gm_cert = sc["gm_cls"], sc["gm_certainty"]
            res = cfg.cls_res
            G = coord_grid(res, res).reshape(res * res, 2)
            # nearest-anchor GT label per pixel
            d = jnp.linalg.norm(gt_warp[..., None, :] - G, axis=-1)
            gt_label = jnp.argmin(d, axis=-1)
            logp = jax.nn.log_softmax(gm_cls.astype(jnp.float32), axis=-1)
            ce_cls = -jnp.take_along_axis(logp, gt_label[..., None], axis=-1)[..., 0]
            cls_loss = _masked_mean(ce_cls, prob > 0.99)
            cert_loss = jnp.mean(_bce_with_logits(gm_cert[..., 0], prob))
            tot = tot + cfg.ce_weight * cert_loss + cls_loss
            metrics[f"gm_cls_loss_{scale}"] = cls_loss
            metrics[f"gm_certainty_loss_{scale}"] = cert_loss

        ce, reg = regression_terms(cfg, gt_warp, prob, flow, certainty, scale)
        tot = tot + cfg.ce_weight * ce + reg
        metrics[f"certainty_loss_{scale}"] = ce
        metrics[f"regression_loss_{scale}"] = reg

        prev_epe = jax.lax.stop_gradient(
            jnp.linalg.norm(flow - gt_warp, axis=-1)
        )
    return tot, metrics
