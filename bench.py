"""Headline benchmark — prints ONE JSON line for the driver.

Metric: full RoMa dense matching throughput (pairs/s) at the reference's
shipped inference config — coarse 560^2 + upsampled 864^2 second pass,
symmetric (BASELINE.json primary metric). The reference repo publishes no
GPU throughput (BASELINE.md "gaps"); vs_baseline uses 1.0 pairs/s, the
rough published single-GPU speed of full RoMa at this config (~1 s/pair on
an A100-class card), documented here until a measured baseline exists.

Timing forces a host readback per batch: on the remote-TPU runtime used in
this environment, block_until_ready returns before execution completes.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

BASELINE_FULL_ROMA_PAIRS_PER_S = 1.0
BASELINE_TINY_NPU_PAIRS_PER_S = 1000.0 / 73.9  # NOTE.md:147-149, 640x320


def bench_full_roma(batch: int = 4, iters: int = 3) -> dict:
    from roma_tpu.models.zoo import roma_outdoor

    matcher = roma_outdoor()
    rng = np.random.default_rng(0)
    h, w = matcher.cfg.coarse_resolution
    ims = [
        jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32))
        for _ in range(iters + 1)
    ]
    # warmup / compile both passes
    warp, cert = matcher.match(ims[0], ims[1], batched=True)
    _ = float(cert.sum())
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            warp, cert = matcher.match(ims[i], ims[i + 1], batched=True)
        _ = float(cert.sum())
        best = min(best, time.perf_counter() - t0)
    pairs_per_s = batch * iters / best
    return {
        "metric": "full_roma_pairs_per_s_560_864",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_FULL_ROMA_PAIRS_PER_S, 2),
    }


def bench_tiny(batch: int = 8, h: int = 320, w: int = 640, iters: int = 10) -> dict:
    from roma_tpu.models.tiny_roma import TinyRomaMatcher

    matcher = TinyRomaMatcher.init(jax.random.PRNGKey(0), hw=(h, w))

    @jax.jit
    def match(params, im_a, im_b):
        corresps = matcher.model.apply(params, im_a, im_b, train=False)
        return corresps[8]["flow"], corresps[8]["certainty"]

    rng = np.random.default_rng(0)
    ims = [
        jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32))
        for _ in range(iters + 1)
    ]
    _ = float(match(matcher.params, ims[0], ims[1])[0].sum())
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out = match(matcher.params, ims[i], ims[i + 1])
        _ = float(out[0].sum())
        best = min(best, time.perf_counter() - t0)
    pairs_per_s = batch * iters / best
    return {
        "metric": "tiny_roma_pairs_per_s_640x320",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_TINY_NPU_PAIRS_PER_S, 2),
    }


if __name__ == "__main__":
    print(json.dumps(bench_full_roma()))
