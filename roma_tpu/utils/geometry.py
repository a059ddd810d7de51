"""Core geometry: grids, coordinate conversions, depth-consistent GT warps,
pose errors, and classification-grid -> flow decoding.

TPU-native re-implementation of the reference numeric utilities
(/root/reference/romatch/utils/utils.py): `get_grid` (:628-637),
`warp_kpts` (:357-455), `get_gt_warp` (:326-355), `cls_to_flow(_refine)`
(:284-323), pose error/AUC helpers (:116-148), coordinate converters
(:522-571). Everything array-shaped is jittable jnp; the scalar AUC summary
is numpy (host-side, benchmark bookkeeping only).

Conventions (identical to the reference):
- normalized image coords (x, y) in [-1, 1], pixel centers at +-(1 - 1/n)
- pixel coords: x_px = (x + 1) * W / 2 in [0.5, W - 0.5]
- warps are channels-last: (..., 2) for one-sided flow, (..., 4) for
  [coords_in_A, coords_in_B] stacked pairs.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.ops.grid_sample import grid_sample


# ---------------------------------------------------------------------------
# grids & coordinate conversions
# ---------------------------------------------------------------------------

def get_grid(b: int, h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """Normalized (x, y) coordinate grid, shape (b, h, w, 2)."""
    from roma_tpu.ops.corr import coord_grid

    return jnp.broadcast_to(coord_grid(h, w, dtype), (b, h, w, 2))


def normalized_to_pixel(coords: jax.Array, h: int, w: int) -> jax.Array:
    """[-1+1/n, 1-1/n] -> [0.5, n-0.5] pixel centers. coords (..., 2) = (x, y).

    numpy in -> numpy out: the eval harnesses call this per pair on host
    arrays, and a jnp version costs two device round-trips (~40 ms on the
    tunneled runtime) for a 4-flop scaling."""
    xp = np if isinstance(coords, np.ndarray) else jnp
    return xp.stack(
        (w * (coords[..., 0] + 1) / 2, h * (coords[..., 1] + 1) / 2), axis=-1
    )


def pixel_to_normalized(coords: jax.Array, h: int, w: int) -> jax.Array:
    """Inverse of `normalized_to_pixel` (numpy in -> numpy out)."""
    xp = np if isinstance(coords, np.ndarray) else jnp
    return xp.stack(
        (2 * coords[..., 0] / w - 1, 2 * coords[..., 1] / h - 1), axis=-1
    )


def warp_to_pixel_coordinates(
    warp: jax.Array, h1: int, w1: int, h2: int, w2: int
) -> tuple[jax.Array, jax.Array]:
    """Split a (..., 4) warp into pixel-coordinate keypoints in A and B."""
    kpts_a = normalized_to_pixel(warp[..., :2], h1, w1)
    kpts_b = normalized_to_pixel(warp[..., 2:], h2, w2)
    return kpts_a, kpts_b


# ---------------------------------------------------------------------------
# classification-grid decoding (coarse global matcher output)
# ---------------------------------------------------------------------------

def _anchor_grid(res: int, dtype=jnp.float32) -> jax.Array:
    """(res*res, 2) anchor coordinates, row-major over (y, x) like reference."""
    lin = jnp.linspace(-1 + 1 / res, 1 - 1 / res, res, dtype=dtype)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    return jnp.stack([gx, gy], axis=-1).reshape(res * res, 2)


@jax.jit
def cls_to_flow(cls: jax.Array) -> jax.Array:
    """Argmax anchor decoding: (B, H, W, C) logits -> (B, H, W, 2) flow."""
    C = cls.shape[-1]
    res = round(C**0.5)
    G = _anchor_grid(res)
    return G[jnp.argmax(cls, axis=-1)]


@jax.jit
def cls_to_flow_refine(cls: jax.Array) -> jax.Array:
    """Sub-anchor refined decoding (reference utils.py:301-323).

    Softmax over the res^2 anchors, take the mode and its 4 neighbours
    (x-1, x+1, y-1, y+1 on the anchor grid), and return their
    probability-weighted mean coordinate. (B, H, W, C) -> (B, H, W, 2).
    """
    C = cls.shape[-1]
    res = round(C**0.5)
    G = _anchor_grid(res)
    p = jax.nn.softmax(cls.astype(jnp.float32), axis=-1)
    mode = jnp.argmax(p, axis=-1)
    idx = jnp.stack(
        [mode - 1, mode, mode + 1, mode - res, mode + res], axis=-1
    )
    idx = jnp.clip(idx, 0, C - 1)
    neigh_p = jnp.take_along_axis(p, idx.reshape(*p.shape[:-1], 5), axis=-1)
    neigh_c = G[idx]  # (..., 5, 2)
    flow = jnp.sum(neigh_p[..., None] * neigh_c, axis=-2)
    return flow / jnp.sum(neigh_p, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# depth-consistent GT warp
# ---------------------------------------------------------------------------

@jax.jit
def warp_kpts(
    kpts0: jax.Array,
    depth0: jax.Array,
    depth1: jax.Array,
    T_0to1: jax.Array,
    K0: jax.Array,
    K1: jax.Array,
    relative_depth_error_threshold: float = 0.05,
) -> tuple[jax.Array, jax.Array]:
    """Warp normalized kpts0 from image 0 to image 1 using depth + pose.

    Follows the reference covisibility protocol (utils.py:357-455, itself
    adapted from LoFTR): bilinear depth lookup at the keypoint, unproject with
    K0, rigid transform by T_0to1, project with K1, then mask by
    (a) nonzero source depth, (b) in-bounds target, (c) relative depth
    consistency < threshold against a bilinear target-depth lookup.

    Args:
      kpts0: (N, L, 2) normalized (x, y).
      depth0, depth1: (N, H, W).
      T_0to1: (N, 4, 4) or (N, 3, 4) rigid transform cam0 -> cam1.
      K0, K1: (N, 3, 3) intrinsics.

    Returns:
      valid_mask (N, L) bool, warped kpts (N, L, 2) normalized.
    """
    n, h, w = depth0.shape
    f64 = jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    # geometry must be exact: TPU fp32 matmuls default to bf16 passes, which
    # wobbles warps by ~0.05 px — force full-precision dots here
    hi = jax.lax.Precision.HIGHEST
    kpts0 = kpts0.astype(f64)

    kpts0_depth = grid_sample(depth0[..., None].astype(f64), kpts0[:, :, None])[
        :, :, 0, 0
    ]
    nonzero_mask = kpts0_depth != 0

    kpts0_px = jnp.stack(
        (w * (kpts0[..., 0] + 1) / 2, h * (kpts0[..., 1] + 1) / 2), axis=-1
    )
    kpts0_h = (
        jnp.concatenate([kpts0_px, jnp.ones_like(kpts0_px[..., :1])], axis=-1)
        * kpts0_depth[..., None]
    )  # (N, L, 3)
    kpts0_cam = jnp.matmul(
        jnp.linalg.inv(K0.astype(f64)), jnp.swapaxes(kpts0_h, -1, -2), precision=hi
    )
    w_kpts0_cam = (
        jnp.matmul(T_0to1[:, :3, :3].astype(f64), kpts0_cam, precision=hi)
        + T_0to1[:, :3, 3:4].astype(f64)
    )  # (N, 3, L)
    w_depth_computed = w_kpts0_cam[:, 2, :]

    w_kpts0_h = jnp.swapaxes(
        jnp.matmul(K1.astype(f64), w_kpts0_cam, precision=hi), -1, -2
    )  # (N, L, 3)
    w_kpts0_px = w_kpts0_h[..., :2] / (w_kpts0_h[..., 2:3] + 1e-4)

    h1, w1 = depth1.shape[1:3]
    covisible = (
        (w_kpts0_px[..., 0] > 0)
        & (w_kpts0_px[..., 0] < w1 - 1)
        & (w_kpts0_px[..., 1] > 0)
        & (w_kpts0_px[..., 1] < h1 - 1)
    )
    w_kpts0 = jnp.stack(
        (2 * w_kpts0_px[..., 0] / w1 - 1, 2 * w_kpts0_px[..., 1] / h1 - 1), axis=-1
    )
    w_depth_sampled = grid_sample(
        depth1[..., None].astype(f64), w_kpts0[:, :, None]
    )[:, :, 0, 0]
    rel_err = jnp.abs((w_depth_sampled - w_depth_computed) / w_depth_sampled)
    consistent = rel_err < relative_depth_error_threshold
    valid = nonzero_mask & covisible & consistent
    return valid, w_kpts0.astype(jnp.float32)


def get_gt_warp(
    depth1: jax.Array,
    depth2: jax.Array,
    T_1to2: jax.Array,
    K1: jax.Array,
    K2: jax.Array,
    H: int,
    W: int,
    relative_depth_error_threshold: float = 0.05,
) -> tuple[jax.Array, jax.Array]:
    """Dense GT warp + validity at (H, W) loss resolution (utils.py:326-355).

    Returns (x2 (B,H,W,2), prob (B,H,W) float)."""
    B = depth1.shape[0]
    grid = get_grid(B, H, W).reshape(B, H * W, 2)
    mask, x2 = warp_kpts(
        grid, depth1, depth2, T_1to2, K1, K2,
        relative_depth_error_threshold=relative_depth_error_threshold,
    )
    return x2.reshape(B, H, W, 2), mask.astype(jnp.float32).reshape(B, H, W)


# ---------------------------------------------------------------------------
# pose errors + AUC (host-side, numpy)
# ---------------------------------------------------------------------------

def compute_relative_pose(R1, t1, R2, t2):
    """World-to-cam (R1, t1), (R2, t2) -> relative (R, t) taking cam1 to cam2."""
    R1, t1, R2, t2 = (np.asarray(a) for a in (R1, t1, R2, t2))
    rots = R2 @ R1.T
    trans = -rots @ t1 + t2
    return rots, trans


def angle_error_mat(R1, R2) -> float:
    cos = (np.trace(np.asarray(R1).T @ np.asarray(R2)) - 1) / 2
    return float(np.rad2deg(np.abs(np.arccos(np.clip(cos, -1.0, 1.0)))))


def angle_error_vec(v1, v2) -> float:
    v1, v2 = np.asarray(v1).ravel(), np.asarray(v2).ravel()
    n = np.linalg.norm(v1) * np.linalg.norm(v2)
    return float(np.rad2deg(np.arccos(np.clip(np.dot(v1, v2) / n, -1.0, 1.0))))


def compute_pose_error(T_0to1, R, t) -> tuple[float, float]:
    """Angular translation/rotation error vs a (3x4 | 4x4) GT relative pose."""
    T_0to1 = np.asarray(T_0to1)
    error_t = angle_error_vec(t, T_0to1[:3, 3])
    error_t = min(error_t, 180 - error_t)  # E-matrix sign ambiguity
    error_R = angle_error_mat(R, T_0to1[:3, :3])
    return error_t, error_R


def pose_auc(errors, thresholds) -> list[float]:
    """Trapezoid AUC of the recall-vs-error curve at each threshold
    (reference utils.py:136-148 — protocol-critical for Mega-1500 numbers)."""
    errors = np.sort(np.asarray(errors, dtype=np.float64))
    recall = (np.arange(len(errors)) + 1) / len(errors)
    errors = np.r_[0.0, errors]
    recall = np.r_[0.0, recall]
    aucs = []
    for t in thresholds:
        last_index = np.searchsorted(errors, t)
        r = np.r_[recall[:last_index], recall[last_index - 1]]
        e = np.r_[errors[:last_index], t]
        aucs.append(float(np.trapezoid(r, x=e) / t))
    return aucs


def signed_point_line_distance(point: jax.Array, line: jax.Array,
                               eps: float = 1e-9) -> jax.Array:
    """Signed distance from (*, N, 2|3) points to (*, N, 3) lines ax+by+c=0
    (reference utils.py:575-597, kornia-style)."""
    num = line[..., 0] * point[..., 0] + line[..., 1] * point[..., 1] + line[..., 2]
    den = jnp.linalg.norm(line[..., :2], axis=-1)
    return num / (den + eps)


def signed_left_to_right_epipolar_distance(pts1: jax.Array, pts2: jax.Array,
                                           Fm: jax.Array) -> jax.Array:
    """Distance from right-image points to the epipolar lines of the
    corresponding left-image points (reference utils.py:599-626)."""
    if pts1.shape[-1] == 2:
        pts1 = jnp.concatenate([pts1, jnp.ones_like(pts1[..., :1])], axis=-1)
    line1_in_2 = pts1 @ jnp.swapaxes(Fm, -2, -1)
    return signed_point_line_distance(pts2, line1_in_2)
