"""Local-window correlation around a dense warp.

TPU-native replacement for the reference's per-batch-element python loop
(/root/reference/romatch/utils/local_correlation.py:4-48): for every target
pixel, correlate its feature with a (2r+1)^2 window of bilinearly-sampled
source features centered on the current flow estimate.

Key structural fact exploited here: the reference's window offsets
(linspace(-2r/n, 2r/n, 2r+1) in normalized units, local_correlation.py:30-39)
are exactly INTEGER pixel shifts at feature resolution, so every offset in
the (2r+1)^2 window shares one fractional bilinear weight. Instead of 4
gathers per offset (4K^2 total), we gather the (2r+2)^2 integer-corner dot
products once and assemble all K^2 bilinear outputs by slicing:

  g[dy, dx]     = <f0(p), f1(y0(p)+dy, x0(p)+dx)> / sqrt(C)
  corr[dy, dx]  = w00 g[dy, dx] + w01 g[dy, dx+1]
                + w10 g[dy+1, dx] + w11 g[dy+1, dx+1]

~3.5x fewer gathers at r=7 and each step cheaper. TPU gathers are the
bottleneck of this op (the rest is one dot per corner).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("radius", "padding_mode"))
def local_correlation(
    f0: jax.Array,
    f1: jax.Array,
    radius: int,
    flow: jax.Array | None = None,
    padding_mode: str = "zeros",
) -> jax.Array:
    """(B,H,W,C) x (B,H,W,C) -> (B,H,W,(2r+1)^2) local cost volume.

    ``flow`` is the current warp estimate, (B,H,W,2) normalized coords; when
    None the identity grid is used (features assumed aligned). Output channel
    order is row-major over (dy, dx), matching the reference. Semantics are
    identical to bilinear grid_sample with zeros padding at each offset.
    """
    B, H, W, C = f0.shape
    r = radius
    k = 2 * r + 1
    if flow is None:
        from roma_tpu.ops.corr import coord_grid

        flow = jnp.broadcast_to(coord_grid(H, W), (B, H, W, 2))

    # base sample position in pixels (align_corners=False convention)
    gx = (flow[..., 0].astype(jnp.float32) + 1.0) * (W / 2) - 0.5
    gy = (flow[..., 1].astype(jnp.float32) + 1.0) * (H / 2) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = gx - x0  # weight of the +1 corner, shared by every window offset
    wy = gy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # gather in the features' stored dtype (bf16 in the model) — gathers are
    # HBM-bandwidth-bound, halving bytes halves the dominant cost; the
    # per-corner dot accumulates in fp32
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f0s = (f0.astype(jnp.float32) * scale).astype(f0.dtype).reshape(B, H * W, C)
    f1f = f1.reshape(B, H * W, C)

    # corner offsets: dy, dx in [-r, r+1] -> (2r+2)^2 gather+dot steps
    side = jnp.arange(-r, r + 2, dtype=jnp.int32)
    oy, ox = jnp.meshgrid(side, side, indexing="ij")
    corner_offsets = jnp.stack([oy.reshape(-1), ox.reshape(-1)], axis=-1)

    def corner_dot(_, off):
        yi = y0i + off[0]
        xi = x0i + off[1]
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        vals = jnp.take_along_axis(f1f, idx.reshape(B, H * W, 1), axis=1)
        g = jnp.sum(
            (f0s * vals).astype(jnp.float32), axis=-1
        ).reshape(B, H, W)
        return None, jnp.where(valid, g, 0.0)

    _, g = jax.lax.scan(corner_dot, None, corner_offsets, unroll=4)
    g = g.reshape(2 * r + 2, 2 * r + 2, B, H, W)

    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    corr = (
        w00 * g[:k, :k] + w01 * g[:k, 1:] + w10 * g[1:, :k] + w11 * g[1:, 1:]
    )  # (k, k, B, H, W)
    return corr.reshape(k * k, B, H, W).transpose(1, 2, 3, 0)
