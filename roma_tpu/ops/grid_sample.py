"""Bilinear / nearest sampling of feature maps at normalized coordinates.

TPU-native replacement for torch ``F.grid_sample(align_corners=False)``
(used throughout the reference: matcher.py:109, tiny.py:357-363,
utils/local_correlation.py:43). Implemented as vectorized integer gathers +
lerp — the integer-gather recipe the reference fork itself validated on NPU
(tiny.py:25-76 ``gather_bilinear``) — so XLA lowers it to efficient dynamic
gathers with no scatter or host fallback.

Conventions:
- channels-last features ``(B, H, W, C)``
- grid ``(B, ..., 2)`` with ``(x, y)`` in [-1, 1] normalized coordinates
- align_corners=False mapping: ``px = ((x + 1) * W - 1) / 2``
- ``padding_mode``: "zeros" (out-of-range reads contribute 0) or "border"
  (indices clamped).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather_hw(feat_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather rows of (B, H*W, C) at (B, L) indices -> (B, L, C)."""
    return jnp.take_along_axis(feat_flat, idx[..., None], axis=1)


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def grid_sample(feat: jax.Array, grid: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Bilinear sample `feat` (B,H,W,C) at `grid` (B,...,2) -> (B,...,C)."""
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = feat.shape
    batch_shape = grid.shape[1:-1]
    g = grid.reshape(B, -1, 2)
    compute_dtype = jnp.promote_types(feat.dtype, jnp.float32)
    gx = (g[..., 0].astype(compute_dtype) + 1.0) * (W / 2) - 0.5
    gy = (g[..., 1].astype(compute_dtype) + 1.0) * (H / 2) - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx1 = gx - x0
    wy1 = gy - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def corner(xi, yi, wgt):
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            wgt = jnp.where(valid, wgt, 0.0)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        vals = _gather_hw(feat_flat, yc * W + xc)
        return vals * wgt[..., None].astype(feat_flat.dtype)

    feat_flat = feat.reshape(B, H * W, C)
    out = (
        corner(x0i, y0i, wx0 * wy0)
        + corner(x1i, y0i, wx1 * wy0)
        + corner(x0i, y1i, wx0 * wy1)
        + corner(x1i, y1i, wx1 * wy1)
    )
    return out.reshape(B, *batch_shape, C)


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def grid_sample_nearest(feat: jax.Array, grid: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Nearest-neighbour sample `feat` (B,H,W,C) at `grid` (B,...,2) -> (B,...,C).

    Matches torch grid_sample(mode='nearest', align_corners=False): rounds the
    un-normalized coordinate to the nearest pixel center.
    """
    B, H, W, C = feat.shape
    batch_shape = grid.shape[1:-1]
    g = grid.reshape(B, -1, 2)
    gx = (g[..., 0].astype(jnp.float32) + 1.0) * (W / 2) - 0.5
    gy = (g[..., 1].astype(jnp.float32) + 1.0) * (H / 2) - 0.5
    # torch rounds half away from midpoint consistently via floor(x + 0.5)
    xi = jnp.floor(gx + 0.5).astype(jnp.int32)
    yi = jnp.floor(gy + 0.5).astype(jnp.int32)
    feat_flat = feat.reshape(B, H * W, C)
    xc = jnp.clip(xi, 0, W - 1)
    yc = jnp.clip(yi, 0, H - 1)
    out = _gather_hw(feat_flat, yc * W + xc)
    if padding_mode == "zeros":
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        out = out * valid[..., None].astype(out.dtype)
    return out.reshape(B, *batch_shape, C)
