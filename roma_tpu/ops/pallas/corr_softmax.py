"""Fused global-correlation softmax-expectation Pallas kernel.

Computes, for every target position p, the softmax-weighted expected source
coordinate

    warp[p] = sum_j softmax_j(<f0[p], f1[j]> / sqrt(C)) * grid[j]

in one pass without ever materializing the (L0, L1) correlation volume in
HBM — the flash-attention recipe applied to the matching volume
(SURVEY §5.7: the 4D corr volume is the quadratic "attention-like" object;
§7 stage 3a). The XLA path (roma_tpu.ops.corr) materializes (B, L0, L1);
at 1/8 scale of a 1920x1080 image that is 32k x 32k floats — 4 GB — while
this kernel streams source chunks through VMEM with a running
(max, denominator, 2-channel numerator) accumulator.

Layout: f0 (L0, C) target features, f1 (L1, C) source features, grid (L1, 2)
source coordinates. Grid dim 0 tiles L0; the kernel loops over L1 chunks with
`jax.lax.fori_loop`, each step one (TILE_L0, C) x (C, CHUNK) MXU matmul +
online-softmax update. Batched via vmap.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(f0_ref, f1_ref, grid_ref, out_ref, *, chunk: int, l1: int, scale: float):
    tile = f0_ref.shape[0]
    f0 = f0_ref[:].astype(jnp.float32)

    m0 = jnp.full((tile, 1), -jnp.inf, jnp.float32)
    d0 = jnp.zeros((tile, 1), jnp.float32)
    n0 = jnp.zeros((tile, 2), jnp.float32)

    num_chunks = l1 // chunk

    def body(ci, carry):
        m, d, n = carry
        start = ci * chunk
        f1c = f1_ref[pl.ds(start, chunk), :].astype(jnp.float32)
        gc = grid_ref[pl.ds(start, chunk), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            f0, f1c, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (tile, chunk)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        d_new = d * alpha + jnp.sum(p, axis=1, keepdims=True)
        n_new = n * alpha + jnp.dot(p, gc, preferred_element_type=jnp.float32)
        return m_new, d_new, n_new

    m, d, n = jax.lax.fori_loop(0, num_chunks, body, (m0, d0, n0))
    out_ref[:] = n / d


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("chunk", "tile", "interpret"))
def fused_pos_embed(
    f0: jax.Array,
    f1: jax.Array,
    grid: jax.Array,
    chunk: int = 512,
    tile: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """(B, L0, C), (B, L1, C), (L1, 2) -> (B, L0, 2) expected source coords.

    Matches `pos_embed_expectation(corr_volume(f0, f1))` exactly (same math,
    streaming evaluation). Pads L0/L1 internally; padded source rows get
    -inf scores via a zero-feature trick only when needed — we instead pad f1
    with a large negative bias row handled by masking below.
    """
    B, L0, C = f0.shape
    _, L1, _ = f1.shape
    # score scale uses the TRUE feature dim (the pad-flag channel below must
    # not change real scores)
    scale = 1.0 / float(np.sqrt(C))
    l0p = _round_up(L0, tile)
    l1p = _round_up(L1, chunk)

    f0p = jnp.pad(f0, ((0, 0), (0, l0p - L0), (0, 0)))
    f1p = jnp.pad(f1, ((0, 0), (0, l1p - L1), (0, 0)))
    gridp = jnp.pad(grid, ((0, l1p - L1), (0, 0)))
    if l1p != L1:
        # make padded source rows contribute exp(-inf)=0: give them a feature
        # vector that scores very negatively against any query. Simplest
        # robust trick: append a constant channel, queries get +1 on it,
        # real sources 0, padded sources -LARGE.
        ones = jnp.ones((B, l0p, 1), f0p.dtype)
        flag = jnp.zeros((B, l1p, 1), f1p.dtype)
        flag = flag.at[:, L1:, :].set(-3e4)
        f0p = jnp.concatenate([f0p, ones], axis=-1)
        f1p = jnp.concatenate([f1p, flag], axis=-1)
        C = C + 1

    kern = functools.partial(_kernel, chunk=chunk, l1=l1p, scale=scale)

    def single(f0b, f1b):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((l0p, 2), jnp.float32),
            grid=(l0p // tile,),
            in_specs=[
                pl.BlockSpec((tile, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((l1p, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((l1p, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(f0b, f1b, gridp)

    out = jax.vmap(single)(f0p, f1p)
    return out[:, :L0]
