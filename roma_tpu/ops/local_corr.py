"""Local-window correlation around a dense warp.

TPU-native replacement for the reference's per-batch-element python loop
(/root/reference/romatch/utils/local_correlation.py:4-48): for every target
pixel, correlate its feature with a (2r+1)^2 window of bilinearly-sampled
source features centered on the current flow estimate.

Key structural facts exploited here:

1. The reference's window offsets (linspace(-2r/n, 2r/n, 2r+1) in normalized
   units, local_correlation.py:30-39) are exactly INTEGER pixel shifts at
   feature resolution, so every offset in the (2r+1)^2 window shares one
   fractional bilinear weight. The full window therefore only needs the
   (2r+2)^2 integer-corner dot products:

     g[dy, dx]     = <f0(p), f1(y0(p)+dy, x0(p)+dx)> / sqrt(C)
     corr[dy, dx]  = w00 g[dy, dx] + w01 g[dy, dx+1]
                   + w10 g[dy+1, dx] + w11 g[dy+1, dx+1]

2. TPU XLA gathers cost ~13 cycles per gathered ROW nearly independent of
   row width (measured on v5e). Gathering the whole (2r+2, 2r+2, C) corner
   patch per pixel in ONE lax.gather costs 2r+2 rows/pixel instead of
   (2r+2)^2 rows/pixel for per-corner gathers — 8x fewer at r=3, 16x at r=7.

The patch buffer (L, 2r+2, 2r+2, C) would be GBs at full resolution, so the
gather+dot is blocked over output row chunks with lax.scan; each chunk's
patches live only in the fused chunk computation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_CHUNK_BUDGET_BYTES = 48 * 1024 * 1024


def _row_chunk(B: int, H: int, W: int, S: int, C: int, itemsize: int) -> int:
    per_row = B * W * S * S * C * itemsize
    best = 1
    for rows in range(1, H + 1):
        if H % rows == 0 and rows * per_row <= _CHUNK_BUDGET_BYTES:
            best = rows
    return best


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
    S = 2 * r + 2  # corner-window side
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

    # P chosen so any base with >=1 valid corner reads unclipped: corner
    # offsets span [-r, r+1], any-valid requires x0 in [-(r+1), W-1+r]
    P = 2 * r + 1
    f1p = jnp.pad(f1, ((0, 0), (P, P), (P, P), (0, 0)))
    x0c = jnp.clip(x0i, -(r + 1), W - 1 + r)
    y0c = jnp.clip(y0i, -(r + 1), H - 1 + r)

    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f0s = (f0.astype(jnp.float32) * scale).astype(f0.dtype)

    rows = _row_chunk(B, H, W, S, C, jnp.dtype(f0.dtype).itemsize)
    n_chunks = H // rows

    dnums = lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def gather_one(img, st):
        return lax.gather(
            img, st, dnums, slice_sizes=(S, S, C),
            mode=lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )

    # per-chunk inputs laid out (n_chunks, ...) for scan
    def chunked(a):
        return a.reshape(B, n_chunks, rows * W, *a.shape[3:]).swapaxes(0, 1)

    starts = jnp.stack([y0c - r + P, x0c - r + P], axis=-1)  # (B,H,W,2)
    side = jnp.arange(S, dtype=jnp.int32)
    ch_starts = chunked(starts)
    ch_x0 = chunked(x0i[..., None])[..., 0]
    ch_y0 = chunked(y0i[..., None])[..., 0]
    ch_f0 = chunked(f0s)

    def chunk_corr(_, inp):
        st, cx0, cy0, cf0 = inp
        patches = jax.vmap(gather_one)(f1p, st)  # (B, rows*W, S, S, C)
        g = jnp.einsum(
            "blijc,blc->blij", patches, cf0,
            preferred_element_type=jnp.float32,
        )
        # zero invalid corners (OOB reads land in the zero pad except where
        # the base clip shifted them — mask both exactly)
        cxs = cx0[..., None] - r + side  # (B, rows*W, S)
        cys = cy0[..., None] - r + side
        vx = (cxs >= 0) & (cxs < W)
        vy = (cys >= 0) & (cys < H)
        g = g * (vy[..., :, None] & vx[..., None, :]).astype(g.dtype)
        return None, g

    _, g = lax.scan(chunk_corr, None, (ch_starts, ch_x0, ch_y0, ch_f0))
    g = g.swapaxes(0, 1).reshape(B, H, W, S, S)

    w00 = ((1 - wy) * (1 - wx))[..., None, None]
    w01 = ((1 - wy) * wx)[..., None, None]
    w10 = (wy * (1 - wx))[..., None, None]
    w11 = (wy * wx)[..., None, None]
    corr = (
        w00 * g[..., :k, :k] + w01 * g[..., :k, 1:]
        + w10 * g[..., 1:, :k] + w11 * g[..., 1:, 1:]
    )  # (B, H, W, k, k)
    return corr.reshape(B, H, W, k * k)
