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
one gather of a py*px*C-wide row yields py*px corner dots, cutting the scan
step count by py*px at py*px-wider rows. XLA's TPU gather emitter throughput
rises steeply with row width up to ~2KB rows and falls off beyond (v5e), so
the packing policy uses quads for C <= 256 and no packing wider. The
gathers are the bottleneck of this op (the rest is one dot per corner).
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
    jax.jit, static_argnames=("radius", "padding_mode", "pack", "unroll")
)
def local_correlation(
    f0: jax.Array,
    f1: jax.Array,
    radius: int,
    flow: jax.Array | None = None,
    padding_mode: str = "zeros",
    pack: tuple[int, int] | None = None,
    unroll: int = 4,
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

    # corner-block-packed source map over block origins o in
    # [-(p-1), H-1] x [-(p-1), W-1]: row (o_y + py-1, o_x + px-1) holds the
    # py*px corners (f1[o_y+u, o_x+v]) with zeros outside the image, so a
    # block whose origin sits just outside still yields its valid corners
    f1p = jnp.pad(f1, ((0, 0), (py - 1, py - 1), (px - 1, px - 1), (0, 0)))
    Ty, Tx = H + py - 1, W + px - 1
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
    oy, ox = jnp.meshgrid(
        jnp.arange(ny, dtype=jnp.int32) * py - r,
        jnp.arange(nx, dtype=jnp.int32) * px - r,
        indexing="ij",
    )
    block_offsets = jnp.stack([oy.reshape(-1), ox.reshape(-1)], axis=-1)

    def block_dot(_, off):
        yi = y0i + off[0]
        xi = x0i + off[1]
        # clip to the padded origin range; corners of farther-out origins are
        # individually masked below
        idx = (
            jnp.clip(yi + py - 1, 0, Ty - 1) * Tx
            + jnp.clip(xi + px - 1, 0, Tx - 1)
        )
        vals = jnp.take_along_axis(
            f1q, idx.reshape(B, H * W, 1), axis=1, mode="promise_in_bounds"
        ).reshape(B, H, W, py * px, C)
        g = jnp.einsum(
            "bhwc,bhwqc->qbhw", f0s, vals, preferred_element_type=jnp.float32
        )
        # each corner masked by its own coordinate validity (zeros padding)
        valid = jnp.stack(
            [
                (yi + u >= 0) & (yi + u < H) & (xi + v >= 0) & (xi + v < W)
                for u in range(py)
                for v in range(px)
            ],
            axis=0,
        )
        return None, jnp.where(valid, g, 0.0)

    _, g = jax.lax.scan(block_dot, None, block_offsets, unroll=min(unroll, ny * nx))
    # g: (ny*nx steps, py*px corners, B, H, W) -> (ny*py, nx*px, B, H, W)
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
