"""Profile local correlation: XLA packed-gather path vs Pallas DMA kernel.

Times the op at the full-RoMa refiner shapes (batch 8 images = the bench's
4-pair batch; scale 8 C=512 r=3, scale 4 C=256 r=2, at both the 560^2 coarse
and 864^2 upsample resolutions). Repetitions run INSIDE one jit with a data
dependence between iterations (per-dispatch overhead on the tunneled runtime
is ~6 ms, and XLA would CSE identical calls); readback is a scalar.

Usage: python experiments/profile_local_corr.py [--iters 8]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.ops.local_corr import local_correlation
from roma_tpu.ops.pallas.block_gather import local_correlation_dma
from roma_tpu.utils.profiling import enable_compilation_cache

SHAPES = [
    # (B, H, W, C, r, label)
    (8, 70, 70, 512, 3, "scale8 coarse 560"),
    (8, 108, 108, 512, 3, "scale8 upsample 864"),
    (8, 140, 140, 256, 2, "scale4 coarse 560"),
    (8, 216, 216, 256, 2, "scale4 upsample 864"),
]


@functools.partial(jax.jit, static_argnames=("r", "n", "impl"))
def _rep(f0, f1, flow, r, n, impl):
    fn = local_correlation_dma if impl == "dma" else local_correlation
    def body(carry, _):
        # data dependence iter->iter so XLA cannot CSE or reorder the calls;
        # the flow perturbation is one cheap elementwise op
        out = fn(f0, f1, r, flow + carry * 1e-20)
        return jnp.sum(out) * 1e-6, None
    s, _ = jax.lax.scan(body, 0.0, None, length=n)
    return s


def time_impl(f0, f1, flow, r, iters, impl):
    _ = float(_rep(f0, f1, flow, r, iters, impl))  # compile + warm
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        _ = float(_rep(f0, f1, flow, r, iters, impl))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()
    enable_compilation_cache()
    rng = np.random.default_rng(0)
    for B, H, W, C, r, label in SHAPES:
        f0 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        f1 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
        flow = jnp.asarray(rng.uniform(-1.3, 1.3, (B, H, W, 2)), jnp.float32)
        # bytes the window fetch must move (the dominant cost): per pixel a
        # (2r+2)^2 x C corner set (XLA) or a (2r+2) x 8 x C block (DMA)
        px = B * H * W
        gb_xla = px * (2 * r + 2) ** 2 * C * 2 / 1e9
        gb_dma = px * (2 * r + 2) * 8 * C * 2 / 1e9
        t_xla = time_impl(f0, f1, flow, r, args.iters, "xla")
        t_dma = time_impl(f0, f1, flow, r, args.iters, "dma")
        print(
            f"{label:22s} B{B} {H:3d}^2 C{C} r{r}: "
            f"xla {t_xla:6.1f} ms ({gb_xla / t_xla * 1e3:5.0f} GB/s)  "
            f"dma {t_dma:6.1f} ms ({gb_dma / t_dma * 1e3:5.0f} GB/s)  "
            f"speedup {t_xla / t_dma:4.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
