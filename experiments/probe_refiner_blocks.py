"""Component-level probe of the scale-2 / scale-1 refiner block costs.

Breaks refiner[2] (C=64 in, hidden 144) and refiner[1] (hidden 24) into
their constituent ops at the bench shapes (batch 4 images = 2 pairs) to
decide where a fused Pallas block kernel pays: the depthwise 5x5, the BN
affine+relu, the 1x1 mixing conv, and the warp gather, in both NHWC and
width-major layouts.

Usage: python experiments/probe_refiner_blocks.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.utils.profiling import enable_compilation_cache


def timed(fn, *args, iters=8, trials=3, name=""):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:46s} {best * 1e3:9.2f} ms", flush=True)
    return best


@functools.partial(jax.jit, static_argnames=("n",))
def dw_nhwc(x, w, s, t, n=9):
    from roma_tpu.ops.pallas.depthwise import _jax_reference

    def body(c, _):
        return _jax_reference(c, w, s, t), None

    y, _ = jax.lax.scan(body, x, None, length=n)
    return y


@functools.partial(jax.jit, static_argnames=("n",))
def conv1x1_nhwc(x, k, b, n=9):
    def body(c, _):
        y = jax.lax.conv_general_dilated(
            c, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + b
        return y, None

    y, _ = jax.lax.scan(body, x, None, length=n)
    return y


@functools.partial(jax.jit, static_argnames=("n",))
def dw_ncw(x, w, s, t, n=9):
    from roma_tpu.ops.pallas.depthwise import dw5x5_affine_relu

    def body(c, _):
        return dw5x5_affine_relu(c, w, s, t, "NHCW"), None

    y, _ = jax.lax.scan(body, x, None, length=n)
    return y


@functools.partial(jax.jit, static_argnames=("n",))
def mm_ncw(x, k, b, n=9):
    def body(c, _):
        return jnp.einsum("bhcw,cd->bhdw", c, k) + b[:, None], None

    y, _ = jax.lax.scan(body, x, None, length=n)
    return y


def main():
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32), dtype)

    for hw, C in ((432, 144), (280, 144), (864, 24), (560, 24)):
        B = 4
        x = arr(B, hw, hw, C)
        xt = arr(B, hw, C, hw)
        w = arr(5, 5, C)
        s = arr(C, dtype=jnp.float32)
        t = arr(C, dtype=jnp.float32)
        k = arr(1, 1, C, C)
        b = arr(C)
        print(f"--- {hw}x{hw} C={C} batch {B} (x9 blocks)")
        timed(dw_nhwc, x, w, s, t, name=f"dw5x5+affine+relu NHWC")
        timed(conv1x1_nhwc, x, k, b, name=f"1x1 conv NHWC")
        timed(dw_ncw, xt, w, s, t, name=f"dw5x5+affine+relu NCW pallas")
        timed(mm_ncw, xt, k[0, 0], b, name=f"1x1 einsum NCW")

    # warp gathers at refiner input channel widths
    from roma_tpu.ops.grid_sample import grid_sample
    from roma_tpu.ops.corr import coord_grid

    for hw, C in ((432, 64), (280, 64), (864, 9), (560, 9)):
        y = arr(4, hw, hw, C)
        fl = jnp.asarray(
            rng.uniform(-1, 1, (4, hw, hw, 2)).astype(np.float32)
        )
        timed(jax.jit(grid_sample), y, fl, name=f"grid_sample {hw}^2 C={C}")


if __name__ == "__main__":
    main()
