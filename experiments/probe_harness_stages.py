"""Per-stage cost probe for the batched eval harness (serialized stages, no
overlap): upload, device resize+match, sampling, main-thread finish work
(pixel conversion + RNG), pose estimation. Explains the gap between the
dense-match ceiling (bench.py) and bench_harness throughput.

Usage: python experiments/probe_harness_stages.py [--batch 8] [--iters 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax

from roma_tpu.utils.profiling import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 640))
    args = ap.parse_args()
    enable_compilation_cache()

    from roma_tpu.models.zoo import roma_outdoor
    from roma_tpu.benchmarks.pose_backends import get_pose_backend

    matcher = roma_outdoor()
    B = args.batch
    h, w = args.hw
    rng = np.random.default_rng(0)
    raw_np = rng.integers(0, 256, (2 * B, h, w, 3)).astype(np.uint8)
    idx_np = np.zeros(2 * B, np.int32)
    banks = matcher.build_resize_banks([(h, w)], (h, w))
    estimate_pose = get_pose_backend("native")
    K = np.array([[800.0, 0, w / 2], [0, 800.0, h / 2], [0, 0, 1.0]])

    def timed(name, fn, n=args.iters):
        fn()  # warm (compile)
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"{name:34s} {best * 1e3:8.1f} ms/batch  "
              f"({best / B * 1e3:6.1f} ms/pair)")
        return best

    # 1. raw upload
    def upload():
        r = jax.device_put(raw_np)
        i = jax.device_put(idx_np)
        jax.block_until_ready((r, i))
        return r, i

    timed("upload raw uint8 (2B originals)", upload)
    raw, idx = upload()

    # 1b. model-resolution uint8 upload (the non-device-resize path ships)
    hc, wc = matcher.cfg.coarse_resolution
    hu, wu = matcher.cfg.upsample_resolution
    prepped = [
        rng.integers(0, 256, (B, hh, ww, 3)).astype(np.uint8)
        for hh, ww in [(hc, wc), (hc, wc), (hu, wu), (hu, wu)]
    ]
    timed("upload model-res uint8 (a,b,a2,b2)",
          lambda: jax.block_until_ready(
              [jax.device_put(x) for x in prepped]))

    # 2. device resize alone
    timed("device resize (_prep_raw both res)",
          lambda: jax.block_until_ready(
              matcher._prep_raw(raw, idx, *banks, up=True)))

    # 3. full match from raw
    def match():
        wps, cts = matcher.match_raw(raw, idx, banks)
        jax.block_until_ready((wps, cts))
        return wps, cts

    timed("match_raw (resize + 2-pass + post)", match)
    warps, certs = match()

    # 3b. match_prepped on already-prepped (the old fast path, minus upload)
    a, b, a2, b2 = (jax.device_put(x) for x in prepped)
    timed("match_prepped (2-pass + post)",
          lambda: jax.block_until_ready(matcher.match_prepped(a, b, a2, b2)))

    # 4. sampling
    keys = [jax.random.PRNGKey(i) for i in range(B)]

    def sample():
        s = matcher.sample_batched(warps, certs, 5000, keys)[0]
        return np.asarray(s)

    timed("sample_batched + fetch", sample)
    sparse_all = sample()

    # 5. main-thread finish work (pixel conversion + perms), as the harness
    # does it today (jnp to_pixel_coordinates on np input = device roundtrips)
    shuffle_rng = np.random.default_rng(0)

    def finish():
        for i in range(B):
            sp = sparse_all[i]
            k1 = np.asarray(matcher.to_pixel_coordinates(sp[:, :2], 1200.0, 900.0))
            k2 = np.asarray(matcher.to_pixel_coordinates(sp[:, 2:], 1200.0, 900.0))
            _ = [shuffle_rng.permutation(len(k1)) for _ in range(5)]

    timed("finish: to_pixel x2/pair + perms", finish)

    # 5b. key-split chain (as the harness does: one dispatch per pair)
    def splits():
        key = jax.random.PRNGKey(0)
        for _ in range(B):
            key, sub = jax.random.split(key)
        jax.block_until_ready(key)

    timed("key split chain (B dispatches)", splits)

    # 6. one pose estimation (per pair x5 reps; pool-parallel in the harness)
    sp = sparse_all[0]
    k1 = np.asarray((sp[:, :2] + 1) / 2 * [[w, h]])
    k2 = np.asarray((sp[:, 2:] + 1) / 2 * [[w, h]])
    nt = 0.5 / (np.mean(np.abs(K[:2, :2])) * 2)

    def ransac():
        for _ in range(5):
            estimate_pose(k1, k2, K, K, nt)

    timed("RANSAC x5 (ONE pair, 1 thread)", ransac, n=1)


if __name__ == "__main__":
    main()
