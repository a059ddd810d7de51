"""Gaussian kernel density estimate over match coordinates.

Replacement for the reference's O(N^2)-materialized fp16 cdist
(/root/reference/romatch/utils/kde.py:4-13). Computed in row tiles with a
`lax.map` so peak memory is O(tile * N) instead of O(N^2) — N is 40k at the
reference's balanced-sampling settings.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("tile",))
def kde(x: jax.Array, std: float = 0.1, tile: int = 2048) -> jax.Array:
    """Density at each row of x (N, D): sum_j exp(-||x_i - x_j||^2 / (2 std^2))."""
    n, d = x.shape
    x = x.astype(jnp.float32)
    inv = 1.0 / (2.0 * std * std)
    sq = jnp.sum(x * x, axis=-1)

    pad = (-n) % tile
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    sqp = jnp.pad(sq, (0, pad))
    rows = xp.reshape(-1, tile, d)
    row_sq = sqp.reshape(-1, tile)

    def tile_density(args):
        xr, sr = args
        # ||a-b||^2 = |a|^2 + |b|^2 - 2ab, computed on the MXU
        d2 = sr[:, None] + sq[None, :] - 2.0 * jnp.dot(
            xr, x.T, preferred_element_type=jnp.float32
        )
        return jnp.sum(jnp.exp(-jnp.maximum(d2, 0.0) * inv), axis=-1)

    dens = jax.lax.map(tile_density, (rows, row_sq))
    return dens.reshape(-1)[:n]
