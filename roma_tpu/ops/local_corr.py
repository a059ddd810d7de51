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
products and assemble all K^2 bilinear outputs by slicing:

  g[dy, dx]     = <f0(p), f1(y0(p)+dy, x0(p)+dx)> / sqrt(C)
  corr[dy, dx]  = w00 g[dy, dx] + w01 g[dy, dx+1]
                + w10 g[dy+1, dx] + w11 g[dy+1, dx+1]

Corners are fetched in (py, px)-blocks from a channel-packed map (e.g.
f1q[y, x] = (f1[y,x], f1[y,x+1], f1[y+1,x], f1[y+1,x+1]) for a 2x2 quad):
one gather of a py*px*C-wide row yields py*px corner dots, cutting the step
count by py*px at py*px-wider rows. XLA's TPU gather emitter throughput
rises steeply with row width up to ~2KB rows and falls off beyond (v5e), so
the packing policy uses quads for C <= 256 and no packing wider.

Two v5e-measured de-overheading choices: the packed map is zero-padded by
r+1 pixels per side so every clamped read is EXACTLY right (an out-of-range
corner lands on a zero row — no per-step validity selects, which cost more
than the dots), and the offset loop is a plain unrolled Python loop — a
lax.scan here spends comparable time copying its stacked f32 carry through
the while-loop body as it does gathering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pack_policy(C: int) -> tuple[int, int]:
    """(py, px) corner-block packing by channel width (v5e-measured: quads
    win up to 1024-channel packed rows; at C=512 both pair- and quad-packing
    measured slower than plain per-corner gathers)."""
    if C <= 256:
        return 2, 2
    return 1, 1


@functools.partial(
    jax.jit, static_argnames=("radius", "padding_mode", "pack")
)
def local_correlation(
    f0: jax.Array,
    f1: jax.Array,
    radius: int,
    flow: jax.Array | None = None,
    padding_mode: str = "zeros",
    pack: tuple[int, int] | None = None,
) -> jax.Array:
    """(B,H,W,C) x (B,H,W,C) -> (B,H,W,(2r+1)^2) local cost volume.

    ``flow`` is the current warp estimate, (B,H,W,2) normalized coords; when
    None the identity grid is used (features assumed aligned). Output channel
    order is row-major over (dy, dx), matching the reference. Semantics are
    identical to bilinear grid_sample with zeros padding at each offset.
    ``pack`` overrides the (py, px) corner-block packing (None = auto).
    """
    B, H, W, C = f0.shape
    r = radius
    k = 2 * r + 1
    py, px = pack if pack is not None else _pack_policy(C)
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
    f0s = (f0.astype(jnp.float32) * scale).astype(f0.dtype)

    # corner-block-packed source map, zero-padded r+p pixels per side so any
    # clamped block origin reads exact values: an origin clamped to the
    # bottom row has every corner < 0 (true zeros, and the clamp target is an
    # all-zero row); symmetrically at the far edge. This removes all
    # per-corner masking — selects cost more than the corner dots here.
    Py, Px = r + py, r + px
    f1p = jnp.pad(f1, ((0, 0), (Py, Py), (Px, Px), (0, 0)))
    Ty, Tx = H + 2 * Py - (py - 1), W + 2 * Px - (px - 1)
    f1q = jnp.concatenate(
        [
            f1p[:, u : u + Ty, v : v + Tx]
            for u in range(py)
            for v in range(px)
        ],
        axis=-1,
    ).reshape(B, Ty * Tx, py * px * C)

    # block origins: (y0 - r + py*ty, x0 - r + px*tx); each gathered row
    # holds corners (dy..dy+py-1) x (dx..dx+px-1)
    ny = -(-(2 * r + 2) // py)
    nx = -(-(2 * r + 2) // px)

    flat = H * W

    def block_dot(off_y, off_x):
        yi = jnp.clip(y0i + off_y + Py, 0, Ty - 1)
        xi = jnp.clip(x0i + off_x + Px, 0, Tx - 1)
        idx = yi * Tx + xi
        vals = jnp.take_along_axis(
            f1q, idx.reshape(B, flat, 1), axis=1, mode="promise_in_bounds"
        ).reshape(B, H, W, py * px, C)
        return jnp.einsum(
            "bhwc,bhwqc->qbhw", f0s, vals, preferred_element_type=jnp.float32
        )

    if ny * nx <= 64:
        # fully unrolled: no while-loop carry copies
        g = jnp.stack(
            [
                block_dot(py * ty - r, px * tx - r)
                for ty in range(ny)
                for tx in range(nx)
            ]
        )
    else:
        # very large windows (r=7 at C=512: 256 steps) would balloon compile time
        # unrolled; scan with moderate unroll instead
        oy, ox = jnp.meshgrid(
            jnp.arange(ny, dtype=jnp.int32) * py - r,
            jnp.arange(nx, dtype=jnp.int32) * px - r,
            indexing="ij",
        )
        offs = jnp.stack([oy.reshape(-1), ox.reshape(-1)], axis=-1)
        _, g = jax.lax.scan(
            lambda _, off: (None, block_dot(off[0], off[1])), None, offs,
            unroll=4,
        )
    # g: (ny*nx, py*px, B, H, W)
    g = g.reshape(ny, nx, py, px, B, H, W)
    g = g.transpose(0, 2, 1, 3, 4, 5, 6).reshape(ny * py, nx * px, B, H, W)
    g = g[: 2 * r + 2, : 2 * r + 2]

    w00 = (1 - wy) * (1 - wx)
    w01 = (1 - wy) * wx
    w10 = wy * (1 - wx)
    w11 = wy * wx
    corr = (
        w00 * g[:k, :k] + w01 * g[:k, 1:] + w10 * g[1:, :k] + w11 * g[1:, 1:]
    )  # (k, k, B, H, W)
    return corr.reshape(k * k, B, H, W).transpose(1, 2, 3, 0)
