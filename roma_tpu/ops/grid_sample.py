"""Bilinear / nearest sampling of feature maps at normalized coordinates.

TPU-native replacement for torch ``F.grid_sample(align_corners=False)``
(used throughout the reference: matcher.py:109, tiny.py:357-363,
utils/local_correlation.py:43). Implemented as vectorized integer gathers +
lerp — the integer-gather recipe the reference fork itself validated on NPU
(tiny.py:25-76 ``gather_bilinear``) — so XLA lowers it to efficient dynamic
gathers with no scatter or host fallback.

Two gather formulations, chosen by channel width:

- per-corner: four row gathers of (B, HW, C) — the baseline, robust at any C.
- corner-packed (C <= 256, zeros padding): the four bilinear corners are
  pre-packed channel-wise into one (H+1, W+1, 4C) map, so sampling is a
  SINGLE take_along_axis row per output pixel. TPU gather cost scales with
  gathered row count at these widths, measuring ~2x faster at the mid-scale
  refiner shapes (432^2 x 64ch: 47 -> 21 ms on v5e).

The packed table's channel count is padded up to a multiple of 64 lanes:
XLA's TPU gather emitter runs ~2 bytes/cycle for narrower rows but switches
to a far faster path at >= 64-lane rows (measured on v5e, 746k random rows
x4 batch: 36ch bf16 104 ms vs 64ch 49 ms vs 128ch 45 ms). For the 864^2
x9ch refiner-scale-1 warp this makes one padded 64-lane gather ~2.3x faster
than either four 9ch gathers or one unpadded 36ch gather.

NOTE: formulations based on lax.gather with multi-element slice_sizes
((1,2,2C) row-pairs / (2,2,C) patches) measured up to 2x faster again at
C<=9, but nondeterministically FAULT the TPU runtime when embedded in large
compiled graphs at batch >= 8 images (v5e, libtpu 2026-xx); only
take_along_axis single-row gathers are used here. Do not "optimize" back.

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


def _coords(feat, grid):
    B, H, W, C = feat.shape
    g = grid.reshape(B, -1, 2)
    cd = jnp.promote_types(feat.dtype, jnp.float32)
    gx = (g[..., 0].astype(cd) + 1.0) * (W / 2) - 0.5
    gy = (g[..., 1].astype(cd) + 1.0) * (H / 2) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    return x0.astype(jnp.int32), y0.astype(jnp.int32), gx - x0, gy - y0


def _grid_sample_packed(feat: jax.Array, grid: jax.Array) -> jax.Array:
    """One gather row per pixel via 4-corner channel packing (zeros pad)."""
    B, H, W, C = feat.shape
    batch_shape = grid.shape[1:-1]
    x0i, y0i, wx1, wy1 = _coords(feat, grid)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    # pad channels so the packed row is a multiple of 64 lanes (fast gather
    # emitter threshold; see module docstring)
    Cp = max(16, -(-C // 16) * 16)
    pad = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, Cp - C)))
    # f4[y, x] = (p[y,x], p[y,x+1], p[y+1,x], p[y+1,x+1]) in padded coords
    f4 = jnp.concatenate(
        [pad[:, :-1, :-1], pad[:, :-1, 1:], pad[:, 1:, :-1], pad[:, 1:, 1:]],
        axis=-1,
    ).reshape(B, (H + 1) * (W + 1), 4 * Cp)
    x0c = jnp.clip(x0i, -1, W - 1) + 1
    y0c = jnp.clip(y0i, -1, H - 1) + 1
    idx = y0c * (W + 1) + x0c
    p = jnp.take_along_axis(f4, idx[..., None], axis=1, mode="promise_in_bounds")
    # far-OOB pixels: all corners invalid -> zero the weights (near-OOB
    # corners read the zero pad, matching per-corner zeros semantics)
    inb = ((x0i >= -1) & (x0i < W) & (y0i >= -1) & (y0i < H)).astype(wx0.dtype)
    wx0, wx1 = wx0 * inb, wx1 * inb
    dt = feat.dtype
    out = (
        p[..., 0 * Cp : 0 * Cp + C] * (wx0 * wy0)[..., None].astype(dt)
        + p[..., 1 * Cp : 1 * Cp + C] * (wx1 * wy0)[..., None].astype(dt)
        + p[..., 2 * Cp : 2 * Cp + C] * (wx0 * wy1)[..., None].astype(dt)
        + p[..., 3 * Cp : 3 * Cp + C] * (wx1 * wy1)[..., None].astype(dt)
    )
    return out.reshape(B, *batch_shape, C)


def _grid_sample_corners(
    feat: jax.Array, grid: jax.Array, padding_mode: str
) -> jax.Array:
    B, H, W, C = feat.shape
    batch_shape = grid.shape[1:-1]
    x0i, y0i, wx1, wy1 = _coords(feat, grid)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    feat_flat = feat.reshape(B, H * W, C)

    def corner(xi, yi, wgt):
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            wgt = jnp.where(valid, wgt, 0.0)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        vals = _gather_hw(feat_flat, yc * W + xc)
        return vals * wgt[..., None].astype(feat_flat.dtype)

    out = (
        corner(x0i, y0i, wx0 * wy0)
        + corner(x0i + 1, y0i, wx1 * wy0)
        + corner(x0i, y0i + 1, wx0 * wy1)
        + corner(x0i + 1, y0i + 1, wx1 * wy1)
    )
    return out.reshape(B, *batch_shape, C)


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def grid_sample(feat: jax.Array, grid: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Bilinear sample `feat` (B,H,W,C) at `grid` (B,...,2) -> (B,...,C)."""
    if padding_mode not in ("zeros", "border"):
        raise ValueError(f"unsupported padding_mode: {padding_mode}")
    C = feat.shape[-1]
    if padding_mode == "zeros" and C <= 256:
        return _grid_sample_packed(feat, grid)
    return _grid_sample_corners(feat, grid, padding_mode)


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
