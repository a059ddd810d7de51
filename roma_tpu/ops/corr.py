"""Global 4D correlation volume + softmax-expectation ("pos_embed") ops.

TPU-native equivalents of the reference Tiny-RoMa global matcher
(/root/reference/romatch/models/tiny.py:241-254 ``corr_volume`` and
:178-203 ``pos_embed``):

- ``corr_volume``: all-pairs inner products between the two coarse feature
  maps. We lay it out as ``(B, H0*W0, H1*W1)`` — softmax axis last (lane
  dimension) — instead of the reference's ``(B, H1, W1, H0, W0)``, so both the
  softmax and the expectation-matmul hit the MXU/VPU at full tilt.
- ``pos_embed_expectation``: exact softmax over all source positions, then the
  probability-weighted mean of the normalized coordinate grid. On TPU this is
  one softmax + one (HW, HW) x (HW, 2) matmul; the reference's strided
  "fast path" (tiny.py:187-198) exists for NPU constraints and is kept only as
  ``pos_embed_fast`` for parity experiments.

A fused Pallas kernel that streams the volume (flash-style, never
materializing (H0W0, H1W1) in HBM) lives in
``roma_tpu.ops.pallas.corr_softmax`` and is used by the models at high
resolution.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def coord_grid(h: int, w: int, dtype=jnp.float32) -> jax.Array:
    """Normalized (x, y) grid with centers at +-(1 - 1/n). Shape (h, w, 2)."""
    xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w, dtype=dtype)
    ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1)


@jax.jit
def corr_volume(f0: jax.Array, f1: jax.Array) -> jax.Array:
    """All-pairs correlation: (B,H0,W0,C), (B,H1,W1,C) -> (B, H0*W0, H1*W1).

    ``cv[b, i, j] = <f0[b, i], f1[b, j]> / sqrt(C)`` — matches the reference
    volume (tiny.py:253) transposed to target-major layout.
    """
    B, H0, W0, C = f0.shape
    _, H1, W1, _ = f1.shape
    a = f0.reshape(B, H0 * W0, C)
    b = f1.reshape(B, H1 * W1, C)
    cv = jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    return cv / jnp.sqrt(jnp.asarray(C, cv.dtype))


@functools.partial(jax.jit, static_argnames=("src_hw",))
def pos_embed_expectation(cv: jax.Array, src_hw: tuple[int, int]) -> jax.Array:
    """Exact softmax-expectation warp from a (B, H0*W0, H1*W1) volume.

    Returns the expected source coordinate for every target position,
    ``(B, H0*W0, 2)`` in normalized [-1, 1] coords (reference tiny.py:201-202).
    """
    h1, w1 = src_hw
    grid = coord_grid(h1, w1).reshape(h1 * w1, 2)
    p = jax.nn.softmax(cv.astype(jnp.float32), axis=-1)
    return jnp.dot(p, grid, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("src_hw", "down", "faithful"))
def pos_embed_fast(
    cv: jax.Array, src_hw: tuple[int, int], down: int = 4,
    faithful: bool = False,
) -> jax.Array:
    """Strided low-res softmax + argmax-channel warp (B, H0*W0, 2).

    Parity path for the reference inference shortcut (tiny.py:187-198):
    softmax over the `down`-strided source grid plus one extra channel for
    the argmax position. The reference has two quirks:
    (1) it feeds the argmax *index* (an integer in [0, H1*W1)) as that
        channel's logit, which makes the channel (almost always) dominate;
    (2) its low-res grid is `linspace(-1 + down/n, 1 - down/n, n//down)` —
        slightly shifted from the true coordinates of the strided positions.

    `faithful=True` reproduces both quirks bit-for-bit (needed to reproduce
    the reference AUC with ported tiny weights). The default replaces the
    index-logit with the max correlation *value* — the blockwise-softmax
    approximation the shortcut was aiming at, without the index-magnitude
    dependence on resolution.
    """
    h1, w1 = src_hw
    B, L0, L1 = cv.shape
    grid = coord_grid(h1, w1).reshape(h1 * w1, 2)
    if faithful:
        xs = jnp.linspace(-1 + down / w1, 1 - down / w1, w1 // down)
        ys = jnp.linspace(-1 + down / h1, 1 - down / h1, h1 // down)
        gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
        grid_lr = jnp.stack([gx, gy], -1).reshape(-1, 2)
    else:
        # true positions of the (h1, w1) grid strided by `down`
        grid_lr = coord_grid(h1, w1)[::down, ::down].reshape(-1, 2)
    idx = (
        jnp.arange(0, h1, down)[:, None] * w1 + jnp.arange(0, w1, down)[None, :]
    ).reshape(-1)
    cv32 = cv.astype(jnp.float32)
    cv_lr = cv32[:, :, idx]  # (B, L0, L1/down^2)
    best = jnp.argmax(cv32, axis=-1)  # (B, L0)
    if faithful:
        extra = best.astype(jnp.float32)  # reference: index as logit
    else:
        extra = jnp.max(cv32, axis=-1)
    logits = jnp.concatenate([cv_lr, extra[..., None]], axis=-1)
    p = jax.nn.softmax(logits, axis=-1)
    exp_lr = jnp.dot(p[..., :-1], grid_lr, preferred_element_type=jnp.float32)
    return exp_lr + p[..., -1:] * grid[best]


def pos_embed_warp(f0: jax.Array, f1: jax.Array, exact: bool = True) -> jax.Array:
    """Convenience: features -> dense coarse warp (B, H0, W0, 2)."""
    B, H0, W0, _ = f0.shape
    _, H1, W1, _ = f1.shape
    cv = corr_volume(f0, f1)
    fn = pos_embed_expectation if exact else pos_embed_fast
    return fn(cv, (H1, W1)).reshape(B, H0, W0, 2)
