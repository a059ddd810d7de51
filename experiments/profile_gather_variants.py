"""Microbenchmark of bilinear grid_sample formulations on TPU.

XLA gather throughput on TPU depends heavily on the gather *shape*: row
gathers with a minor dim narrower than the 128-lane vector register waste
lanes (the 864^2 x 9ch sample in the RoMa scale-1 refiner runs at ~2 GB/s
effective). This script times alternative formulations at the shapes the
full-RoMa pipeline actually uses, to pick the implementation of
roma_tpu/ops/grid_sample.py.

Variants:
  cur      4x take_along_axis rows of (B,HW,C) — one gather per corner
  comb     1x take_along_axis with 4HW stacked corner indices
  pib      like cur but mode="promise_in_bounds" (indices pre-clipped)
  patch22  one lax.gather of (2,2,C) patches from zero-padded (H+2,W+2,C)
  rows2    two lax.gather of (1,2C) contiguous slices from padded flat rows
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from roma_tpu.ops.grid_sample import grid_sample
from roma_tpu.utils.profiling import enable_compilation_cache


def _coords(feat, grid):
    B, H, W, C = feat.shape
    g = grid.reshape(B, -1, 2)
    gx = (g[..., 0].astype(jnp.float32) + 1.0) * (W / 2) - 0.5
    gy = (g[..., 1].astype(jnp.float32) + 1.0) * (H / 2) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx1, wy1 = gx - x0, gy - y0
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx1, wy1


def gs_combined(feat, grid):
    B, H, W, C = feat.shape
    x0, y0, wx1, wy1 = _coords(feat, grid)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    xs = jnp.stack([x0, x0 + 1, x0, x0 + 1], 1)  # (B,4,L)
    ys = jnp.stack([y0, y0, y0 + 1, y0 + 1], 1)
    ws = jnp.stack([wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1], 1)
    valid = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    ws = jnp.where(valid, ws, 0.0)
    idx = jnp.clip(ys, 0, H - 1) * W + jnp.clip(xs, 0, W - 1)
    flat = feat.reshape(B, H * W, C)
    vals = jnp.take_along_axis(flat, idx.reshape(B, -1)[..., None], axis=1)
    vals = vals.reshape(B, 4, -1, C) * ws[..., None].astype(feat.dtype)
    return vals.sum(1).reshape(grid.shape[:-1] + (C,))


def gs_pib(feat, grid):
    B, H, W, C = feat.shape
    x0, y0, wx1, wy1 = _coords(feat, grid)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    flat = feat.reshape(B, H * W, C)

    def corner(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        w = jnp.where(valid, w, 0.0)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1,
                                mode="promise_in_bounds")
        return v * w[..., None].astype(feat.dtype)

    out = (corner(x0, y0, wx0 * wy0) + corner(x0 + 1, y0, wx1 * wy0)
           + corner(x0, y0 + 1, wx0 * wy1) + corner(x0 + 1, y0 + 1, wx1 * wy1))
    return out.reshape(grid.shape[:-1] + (C,))


def gs_patch22(feat, grid):
    B, H, W, C = feat.shape
    x0, y0, wx1, wy1 = _coords(feat, grid)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    pad = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x0c = jnp.clip(x0, -1, W - 1) + 1
    y0c = jnp.clip(y0, -1, H - 1) + 1
    starts = jnp.stack([y0c, x0c], -1)  # (B,L,2)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def one(img, st):
        return lax.gather(img, st, dnums, slice_sizes=(2, 2, C),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    p = jax.vmap(one)(pad, starts)  # (B,L,2,2,C)
    vx = (xv := None)
    w = jnp.stack([
        jnp.stack([wy0 * wx0, wy0 * wx1], -1),
        jnp.stack([wy1 * wx0, wy1 * wx1], -1),
    ], -2)  # (B,L,2,2)
    # far-OOB handled by the clip-to-border-1: contributions multiply padded
    # zeros, matching zeros padding_mode within 1px; mask the rest
    inb = ((x0 >= -1) & (x0 < W) & (y0 >= -1) & (y0 < H))
    w = w * inb[..., None, None]
    out = (p * w[..., None].astype(feat.dtype)).sum((2, 3))
    return out.reshape(grid.shape[:-1] + (C,))


def gs_rows2(feat, grid):
    B, H, W, C = feat.shape
    x0, y0, wx1, wy1 = _coords(feat, grid)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    pad = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    flat = pad.reshape(B, H + 2, (W + 2) * C)
    x0c = jnp.clip(x0, -1, W - 1) + 1
    y0c = jnp.clip(y0, -1, H - 1) + 1
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def row(img, st):
        return lax.gather(img, st, dnums, slice_sizes=(1, 2 * C),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    st0 = jnp.stack([y0c, x0c * C], -1)
    st1 = jnp.stack([y0c + 1, x0c * C], -1)
    r0 = jax.vmap(row)(flat, st0).reshape(B, -1, 2, C)
    r1 = jax.vmap(row)(flat, st1).reshape(B, -1, 2, C)
    inb = ((x0 >= -1) & (x0 < W) & (y0 >= -1) & (y0 < H)).astype(jnp.float32)
    wx0, wx1 = wx0 * inb, wx1 * inb
    top = r0[..., 0, :] * (wx0 * wy0)[..., None].astype(feat.dtype) \
        + r0[..., 1, :] * (wx1 * wy0)[..., None].astype(feat.dtype)
    bot = r1[..., 0, :] * (wx0 * wy1)[..., None].astype(feat.dtype) \
        + r1[..., 1, :] * (wx1 * wy1)[..., None].astype(feat.dtype)
    return (top + bot).reshape(grid.shape[:-1] + (C,))


def gs_quad(feat, grid):
    """Pack both y-rows channel-wise so all 4 bilinear corners live in ONE
    contiguous gather row: gather cost on TPU is ~13 cycles/row independent
    of row width, so 1 row/pixel is the floor for per-pixel random access."""
    B, H, W, C = feat.shape
    x0, y0, wx1, wy1 = _coords(feat, grid)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    pad = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    feat2 = jnp.concatenate([pad[:, :-1], pad[:, 1:]], axis=-1)  # (B,H+1,W+2,2C)
    x0c = jnp.clip(x0, -1, W - 1) + 1
    y0c = jnp.clip(y0, -1, H - 1) + 1
    starts = jnp.stack([y0c, x0c], -1)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def one(img, st):
        return lax.gather(img, st, dnums, slice_sizes=(1, 2, 2 * C),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    p = jax.vmap(one)(feat2, starts)[:, :, 0]  # (B,L,2,2C)
    inb = ((x0 >= -1) & (x0 < W) & (y0 >= -1) & (y0 < H)).astype(jnp.float32)
    wx0, wx1 = wx0 * inb, wx1 * inb
    top = p[:, :, 0, :C] * (wx0 * wy0)[..., None].astype(feat.dtype) \
        + p[:, :, 1, :C] * (wx1 * wy0)[..., None].astype(feat.dtype)
    bot = p[:, :, 0, C:] * (wx0 * wy1)[..., None].astype(feat.dtype) \
        + p[:, :, 1, C:] * (wx1 * wy1)[..., None].astype(feat.dtype)
    return (top + bot).reshape(grid.shape[:-1] + (C,))


def gs_quadx(feat, grid):
    """All 4 corners packed into channels: one (1,1,4C) slice = one truly
    contiguous gather row per output pixel."""
    B, H, W, C = feat.shape
    x0, y0, wx1, wy1 = _coords(feat, grid)
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1
    pad = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
    feat4 = jnp.concatenate(
        [pad[:, :-1, :-1], pad[:, :-1, 1:], pad[:, 1:, :-1], pad[:, 1:, 1:]],
        axis=-1)  # (B,H+1,W+1,4C)
    x0c = jnp.clip(x0, -1, W - 1) + 1
    y0c = jnp.clip(y0, -1, H - 1) + 1
    starts = jnp.stack([y0c, x0c], -1)
    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1))

    def one(img, st):
        return lax.gather(img, st, dnums, slice_sizes=(1, 1, 4 * C),
                          mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS)

    p = jax.vmap(one)(feat4, starts)[:, :, 0, 0]  # (B,L,4C)
    inb = ((x0 >= -1) & (x0 < W) & (y0 >= -1) & (y0 < H)).astype(jnp.float32)
    wx0, wx1 = wx0 * inb, wx1 * inb
    out = (p[..., :C] * (wx0 * wy0)[..., None].astype(feat.dtype)
           + p[..., C:2 * C] * (wx1 * wy0)[..., None].astype(feat.dtype)
           + p[..., 2 * C:3 * C] * (wx0 * wy1)[..., None].astype(feat.dtype)
           + p[..., 3 * C:] * (wx1 * wy1)[..., None].astype(feat.dtype))
    return out.reshape(grid.shape[:-1] + (C,))


def timed(fn, *args, iters=6, name=""):
    jfn = jax.jit(fn)
    out = jfn(*args)
    _ = float(jnp.asarray(out, jnp.float32).sum())
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(*args)
        _ = float(jnp.asarray(out, jnp.float32).sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"  {name:10s} {best * 1e3:9.2f} ms", flush=True)
    return out


def main():
    enable_compilation_cache()
    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    shapes = [(4, 864, 864, 9), (4, 432, 432, 64), (4, 108, 108, 512)]
    for (B, H, W, C) in shapes:
        feat = jnp.asarray(rng.normal(size=(B, H, W, C)), jnp.bfloat16)
        grid = jnp.asarray(rng.uniform(-1.05, 1.05, (B, H, W, 2)), jnp.float32)
        print(f"({B},{H},{W},{C}):")
        ref = timed(grid_sample, feat, grid, name="cur")
        for name, fn in [("quad", gs_quad), ("quadx", gs_quadx)]:
            out = timed(fn, feat, grid, name=name)
            err = float(jnp.max(jnp.abs(
                jnp.asarray(out, jnp.float32) - jnp.asarray(ref, jnp.float32))))
            if err > 0.15:
                print(f"    !! {name} max_err={err:.4f}")


if __name__ == "__main__":
    main()
