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


def _grid_sample_quad(feat: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sample via ONE gather row per output pixel (zeros padding).

    TPU XLA gathers cost ~13 cycles per gathered *row* nearly independent of
    row width (measured: 4x(B,HW,C<=64) corner gathers run at ~2 GB/s
    effective). Packing both source y-rows channel-wise puts all 4 bilinear
    corners in one (1,2,2C) slice = one contiguous row, which measures ~2x
    faster than per-corner gathers at the fine-scale shapes (864^2 x 9ch:
    115ms -> 57ms; 432^2 x 64ch: 47ms -> 24ms on v5e)."""
    from jax import lax

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
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    pad = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # feat2[y, x] = concat(pad[y, x], pad[y+1, x]): both corner rows in one
    feat2 = jnp.concatenate([pad[:, :-1], pad[:, 1:]], axis=-1)  # (B,H+1,W+2,2C)
    x0c = jnp.clip(x0i, -1, W - 1) + 1
    y0c = jnp.clip(y0i, -1, H - 1) + 1
    starts = jnp.stack([y0c, x0c], axis=-1)  # (B,L,2)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def one(img, st):
        return lax.gather(
            img, st, dnums, slice_sizes=(1, 2, 2 * C),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    p = jax.vmap(one)(feat2, starts)[:, :, 0]  # (B,L,2,2C)
    # far-OOB pixels: every corner invalid -> zero all weights (near-OOB
    # corners read the zero pad, matching per-corner zeros semantics)
    inb = ((x0i >= -1) & (x0i < W) & (y0i >= -1) & (y0i < H)).astype(wx0.dtype)
    wx0, wx1 = wx0 * inb, wx1 * inb
    dt = feat.dtype
    out = (
        p[:, :, 0, :C] * (wx0 * wy0)[..., None].astype(dt)
        + p[:, :, 1, :C] * (wx1 * wy0)[..., None].astype(dt)
        + p[:, :, 0, C:] * (wx0 * wy1)[..., None].astype(dt)
        + p[:, :, 1, C:] * (wx1 * wy1)[..., None].astype(dt)
    )
    return out.reshape(B, *batch_shape, C)


def _grid_sample_patch(feat: jax.Array, grid: jax.Array) -> jax.Array:
    """Bilinear sample via one (2,2,C) patch gather per pixel (zeros padding).

    2 gather rows per pixel instead of 4 corner rows; used for wide channels
    where the quad row-packing's doubled feature copy stops paying off (and
    where 2C-wide packed rows have shown rare TPU-worker faults)."""
    from jax import lax

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
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    pad = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x0c = jnp.clip(x0i, -1, W - 1) + 1
    y0c = jnp.clip(y0i, -1, H - 1) + 1
    starts = jnp.stack([y0c, x0c], axis=-1)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def one(img, st):
        return lax.gather(
            img, st, dnums, slice_sizes=(2, 2, C),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    p = jax.vmap(one)(pad, starts)  # (B,L,2,2,C)
    inb = ((x0i >= -1) & (x0i < W) & (y0i >= -1) & (y0i < H)).astype(wx0.dtype)
    wx0, wx1 = wx0 * inb, wx1 * inb
    dt = feat.dtype
    out = (
        p[:, :, 0, 0] * (wx0 * wy0)[..., None].astype(dt)
        + p[:, :, 0, 1] * (wx1 * wy0)[..., None].astype(dt)
        + p[:, :, 1, 0] * (wx0 * wy1)[..., None].astype(dt)
        + p[:, :, 1, 1] * (wx1 * wy1)[..., None].astype(dt)
    )
    return out.reshape(B, *batch_shape, C)


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def grid_sample(feat: jax.Array, grid: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Bilinear sample `feat` (B,H,W,C) at `grid` (B,...,2) -> (B,...,C)."""
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    B, H, W, C = feat.shape
    if padding_mode == "zeros":
        # row-packed single-gather path for narrow channels, patch gather for
        # wide ones (measured crossover on v5e; see variant docstrings)
        if C <= 128:
            return _grid_sample_quad(feat, grid)
        return _grid_sample_patch(feat, grid)
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
