"""Search-space-restricted correlation variants (band / row-only matching).

Capability port of the reference fork's NPU innovations
(/root/reference/experiments/model_tiny2.py:388-533): when the camera pair is
roughly rectified (stereo-like motion), the vertical search range can be
restricted to +-radius rows (`corr_volume_export`/`pos_embed_export`) or to
the same row only (`corr_volume_exportH`/`pos_embed_exportH`), cutting the
search space from (H*W)^2 to H*W*(2r+1)*W or H*W*W.

TPU-first design: instead of the fork's pad+shift stacking, we compute the
full-rank band as one batched matmul over row blocks — each target row i
correlates against source rows [i-r, i+r] — and take the softmax-expectation
over the band only. Shapes stay static; the band mask handles borders.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from roma_tpu.ops.corr import coord_grid


@functools.partial(jax.jit, static_argnames=("radius",))
def banded_pos_embed(f0: jax.Array, f1: jax.Array, radius: int) -> jax.Array:
    """Softmax-expectation warp with vertical search limited to +-radius rows.

    f0, f1: (B, H, W, C); returns (B, H, W, 2) expected source coords.
    radius=0 reproduces row-only (horizontal/stereo) matching.
    """
    B, H, W, C = f0.shape
    k = 2 * radius + 1
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))

    # stack the +-radius row-shifted versions of f1: (B, H, k, W, C)
    shifted = []
    valid_rows = []
    for dy in range(-radius, radius + 1):
        rolled = jnp.roll(f1, shift=-dy, axis=1)
        shifted.append(rolled)
        rows = jnp.arange(H) + dy
        valid_rows.append((rows >= 0) & (rows < H))
    f1_band = jnp.stack(shifted, axis=2)                  # (B, H, k, W, C)
    valid = jnp.stack(valid_rows, axis=1)                 # (H, k)

    # scores: target (B, H, W) x band source (k, W)
    s = jnp.einsum(
        "bhwc,bhkvc->bhwkv", f0.astype(jnp.float32), f1_band.astype(jnp.float32)
    ) * scale                                             # (B, H, W, k, W)
    s = jnp.where(valid[None, :, None, :, None], s, -jnp.inf)
    p = jax.nn.softmax(s.reshape(B, H, W, k * W), axis=-1).reshape(B, H, W, k, W)

    xs = jnp.linspace(-1 + 1 / W, 1 - 1 / W, W)
    ys = jnp.linspace(-1 + 1 / H, 1 - 1 / H, H)
    # expected x: weight over source columns
    ex = jnp.einsum("bhwkv,v->bhw", p, xs)
    # expected y: band slot dy maps to source row (h + dy)
    band_y = ys[:, None] + (jnp.arange(-radius, radius + 1)[None, :] * (2 / H))
    ey = jnp.einsum("bhwk,hk->bhw", p.sum(-1), band_y)
    return jnp.stack([ex, ey], axis=-1)


@jax.jit
def row_pos_embed(f0: jax.Array, f1: jax.Array) -> jax.Array:
    """Row-only (horizontal) matching: each target row correlates against its
    own source row — the stereo fast path (model_tiny2.py:464-533)."""
    B, H, W, C = f0.shape
    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    s = jnp.einsum(
        "bhwc,bhvc->bhwv", f0.astype(jnp.float32), f1.astype(jnp.float32)
    ) * scale                                             # (B, H, W, W)
    p = jax.nn.softmax(s, axis=-1)
    xs = jnp.linspace(-1 + 1 / W, 1 - 1 / W, W)
    ys = jnp.linspace(-1 + 1 / H, 1 - 1 / H, H)
    ex = jnp.einsum("bhwv,v->bhw", p, xs)
    ey = jnp.broadcast_to(ys[None, :, None], (B, H, W))
    return jnp.stack([ex, ey], axis=-1)
