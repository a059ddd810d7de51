"""Shared matcher API utilities: keypoint matching on a dense warp,
forward-backward consistency, warp visualization.

Equivalents of reference RegressionMatcher methods
(/root/reference/romatch/models/matcher.py): `match_keypoints` (:576-591),
`conf_from_fb_consistency` (:530-551), `visualize_warp` (:732-766).
All operate on channels-last arrays.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.ops.corr import coord_grid
from roma_tpu.ops.grid_sample import grid_sample


def match_keypoints(
    x_a: jax.Array,
    x_b: jax.Array,
    warp: jax.Array,
    certainty: jax.Array,
    sample_thresh: float = 0.05,
    max_dist: float = jnp.inf,
):
    """Match two sparse keypoint sets through a dense warp.

    x_a, x_b: (N, 2), (M, 2) normalized coords. warp: (H, W, 4) one-sided
    dense warp (A side; pass the left half of a symmetric warp). Returns
    (inds_a, inds_b, valid): mutual-nearest pairs with certainty above
    threshold; fixed-shape with a validity mask (TPU-friendly in place of
    torch.nonzero).
    """
    H, W, _ = warp.shape
    a_to_b = grid_sample(warp[None, :, :, 2:], x_a[None, :, None, :])[0, :, 0]
    cert_a = grid_sample(certainty[None, :, :, None], x_a[None, :, None, :])[0, :, 0, 0]
    D = jnp.linalg.norm(a_to_b[:, None, :] - x_b[None, :, :], axis=-1)
    row_min = D == jnp.min(D, axis=1, keepdims=True)
    col_min = D == jnp.min(D, axis=0, keepdims=True)
    mutual = row_min & col_min & (cert_a[:, None] > sample_thresh) & (D < max_dist)
    inds_b = jnp.argmax(mutual, axis=1)
    valid = jnp.any(mutual, axis=1)
    inds_a = jnp.arange(x_a.shape[0])
    return inds_a, inds_b, valid


def conf_from_fb_consistency(
    flow_forward: jax.Array, flow_backward: jax.Array, th: float = 2.0
) -> jax.Array:
    """1.0 where warping forward then backward returns within th pixels.

    flow_*: (H, W, 2) or (B, H, W, 2) normalized target coords."""
    batched = flow_forward.ndim == 4
    if not batched:
        flow_forward, flow_backward = flow_forward[None], flow_backward[None]
    B, H, W, _ = flow_forward.shape
    th_n = 2 * th / max(H, W)
    coords = jnp.broadcast_to(coord_grid(H, W), (B, H, W, 2))
    coords_fb = grid_sample(flow_backward, flow_forward)
    diff = jnp.linalg.norm(coords - coords_fb, axis=-1)
    in_th = (diff < th_n).astype(jnp.float32)
    return in_th if batched else in_th[0]


def visualize_warp(
    warp,
    certainty,
    im_a: np.ndarray,
    im_b: np.ndarray,
    symmetric: bool = True,
    save_path: str | None = None,
) -> np.ndarray:
    """Render B warped into A's frame (and A into B's for symmetric warps),
    blended toward white where certainty is low. Images are (H, W, 3) [0,1]
    arrays; output matches the warp's resolution.
    """
    warp = np.asarray(warp)
    certainty = np.asarray(certainty)
    H, W2, _ = warp.shape
    W = W2 // 2 if symmetric else W2

    def resize(im, h, w):
        from PIL import Image

        return (
            np.asarray(
                Image.fromarray((np.clip(im, 0, 1) * 255).astype(np.uint8)).resize(
                    (w, h), Image.BILINEAR
                ),
                np.float32,
            )
            / 255.0
        )

    x_b = jnp.asarray(resize(im_b, H, W))
    a_transfer = np.asarray(
        grid_sample(x_b[None], jnp.asarray(warp[None, :, :W, 2:]))[0]
    )
    if symmetric:
        x_a = jnp.asarray(resize(im_a, H, W))
        b_transfer = np.asarray(
            grid_sample(x_a[None], jnp.asarray(warp[None, :, W:, :2]))[0]
        )
        warp_im = np.concatenate([a_transfer, b_transfer], axis=1)
    else:
        warp_im = a_transfer
    white = np.ones_like(warp_im)
    vis = certainty[..., None] * warp_im + (1 - certainty[..., None]) * white
    if save_path is not None:
        from PIL import Image

        Image.fromarray((np.clip(vis, 0, 1) * 255).astype(np.uint8)).save(save_path)
    return vis
