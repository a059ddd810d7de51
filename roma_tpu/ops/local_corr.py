"""Local-window correlation around a dense warp.

TPU-native replacement for the reference's per-batch-element python loop
(/root/reference/romatch/utils/local_correlation.py:4-48): for every target
pixel, correlate its feature with a (2r+1)^2 window of bilinearly-sampled
source features centered on the current flow estimate.

The XLA formulation scans over the window offsets (static K^2 trip count,
unrolled), each step being one fused gather+dot over the full image — memory
stays O(B*H*W*C) instead of O(B*H*W*K^2*C). A fused Pallas kernel is the
planned fast path for the hot scales (SURVEY §7 stage 3b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from roma_tpu.ops.grid_sample import grid_sample


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
    None the identity grid is used (features assumed aligned). Window offsets
    span +-r source pixels: linspace(-2r/n, 2r/n, 2r+1) in normalized units
    (reference local_correlation.py:30-39). Output channel order is
    row-major over (dy, dx), matching the reference.
    """
    B, H, W, C = f0.shape
    r = radius
    k = 2 * r + 1
    if flow is None:
        from roma_tpu.ops.corr import coord_grid

        flow = jnp.broadcast_to(coord_grid(H, W), (B, H, W, 2))

    dys = jnp.linspace(-2 * r / H, 2 * r / H, k, dtype=jnp.float32)
    dxs = jnp.linspace(-2 * r / W, 2 * r / W, k, dtype=jnp.float32)
    ox, oy = jnp.meshgrid(dxs, dys, indexing="xy")
    offsets = jnp.stack([ox, oy], axis=-1).reshape(k * k, 2)

    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f0s = f0.astype(jnp.float32) * scale

    def step(_, off):
        window = grid_sample(f1, flow + off[None, None, None, :], padding_mode=padding_mode)
        corr = jnp.sum(f0s * window.astype(jnp.float32), axis=-1)
        return None, corr

    _, corrs = jax.lax.scan(step, None, offsets, unroll=4)
    return jnp.moveaxis(corrs, 0, -1)  # (B, H, W, K^2)
