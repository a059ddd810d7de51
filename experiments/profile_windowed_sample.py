"""Windowed smooth-flow warp gather vs the packed gather emitter at the
scale-1 warp shape (864^2 x 9ch, batch 4 = 2 pairs).

Three cases:
- smooth synthetic flow (sinusoidal few-px displacement): the windowed
  Pallas kernel's home turf;
- random flow THROUGH grid_sample_smooth: measures the fallback overhead
  (validity reduction + lax.cond) — the "no cliff" requirement;
- random flow through plain grid_sample: the baseline emitter.

Usage: python experiments/profile_windowed_sample.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.utils.profiling import enable_compilation_cache


def timed(fn, *args, iters=6, trials=3, name=""):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:52s} {best * 1e3:9.2f} ms", flush=True)
    return best


def main():
    enable_compilation_cache()
    from roma_tpu.ops.grid_sample import grid_sample
    from roma_tpu.ops.pallas.windowed_sample import (
        grid_sample_smooth, smoothness_ok, _windowed_path,
    )

    rng = np.random.default_rng(0)
    B, H, W, C = 4, 864, 864, 9
    feat = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)

    ys, xs = np.meshgrid(
        np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij"
    )
    dx = 2.5 * np.sin(ys / 37.0) + 1.9 * np.cos(xs / 53.0)
    dy = 1.5 * np.cos(ys / 41.0) - 2.2 * np.sin(xs / 61.0)
    tx = np.clip(xs + dx, 1.0, W - 2.0)
    ty = np.clip(ys + dy, 1.0, H - 2.0)
    smooth = jnp.asarray(
        np.broadcast_to(
            np.stack(
                [2 * (tx + 0.5) / W - 1, 2 * (ty + 0.5) / H - 1], -1
            )[None],
            (B, H, W, 2),
        ).astype(np.float32)
    )
    random_flow = jnp.asarray(
        rng.uniform(-1, 1, (B, H, W, 2)).astype(np.float32)
    )

    def ok(f, g):
        ph = (-g.shape[1]) % 8
        pw = (-g.shape[2]) % 128
        gp = jnp.pad(g, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        return bool(smoothness_ok(f, gp, valid_hw=(g.shape[1], g.shape[2])))

    print("smoothness_ok(smooth):", ok(feat, smooth))
    print("smoothness_ok(random):", ok(feat, random_flow))

    gs = jax.jit(grid_sample)
    gss = jax.jit(grid_sample_smooth)
    # correctness on device first
    ref = gs(feat, smooth)
    got = gss(feat, smooth)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"on-device windowed vs packed max abs err: {err:.2e}")

    gsf = jax.jit(lambda f, g: grid_sample_smooth(f, g, mode="fast"))
    timed(gs, feat, smooth, name="packed emitter, smooth flow")
    timed(gss, feat, smooth, name="grid_sample_smooth exact, smooth flow")
    timed(gsf, feat, smooth, name="grid_sample_smooth fast, smooth flow")
    timed(gs, feat, random_flow, name="packed emitter, random flow")
    timed(gss, feat, random_flow, name="grid_sample_smooth exact, random (fallback)")


if __name__ == "__main__":
    main()
