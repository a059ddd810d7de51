"""Headline benchmark — prints ONE JSON line for the driver.

Current metric: Tiny RoMa dense matching throughput (pairs/s) at 640x320 on
one chip. Baseline: the only speed numbers in the reference repo are the
fork's NPU latencies (NOTE.md:147-149 — 73.9 ms avg for the full tiny graph
at 640x320 => 13.53 pairs/s); vs_baseline is measured against that.
This will switch to the full-RoMa 560->864 pairs/s headline once the full
model lands (BASELINE.json primary metric).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


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

    # warmup / compile; a tiny host readback forces completion — on the
    # remote-TPU runtime used here, block_until_ready returns early
    _ = float(match(matcher.params, ims[0], ims[1])[0].sum())
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out = match(matcher.params, ims[i], ims[i + 1])
        _ = float(out[0].sum())
        best = min(best, time.perf_counter() - t0)
    pairs_per_s = batch * iters / best
    baseline_pairs_per_s = 1000.0 / 73.9  # NOTE.md:147-149, NPU 640x320
    return {
        "metric": "tiny_roma_pairs_per_s_640x320",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / baseline_pairs_per_s, 2),
    }


if __name__ == "__main__":
    print(json.dumps(bench_tiny()))
