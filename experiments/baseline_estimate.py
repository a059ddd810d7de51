"""Derive the reference-performance baseline from first principles.

The reference repo publishes no GPU throughput (BASELINE.md "gaps to fill").
This script produces the defensible denominator for bench.py's vs_baseline:

1. Exact FLOPs + HBM bytes of the full-RoMa inference graph from XLA's
   compiler cost analysis — valid for the reference too, because the
   architectures are numerically identical (tests/test_golden_parity.py:
   composed forward matches to 1.7e-6).
2. Per-stage roofline times on A100 (the reference's hardware class:
   312 TF/s dense fp16, 2.0 TB/s HBM) and v5e (197 TF/s bf16, 819 GB/s).
3. A reference-throughput estimate at stated eager-torch utilization
   anchors.

Usage: python experiments/baseline_estimate.py  (runs on any backend; uses
AOT lowering only — nothing executes on device)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

from roma_tpu.config import RomaConfig
from roma_tpu.models.matcher import RomaModel

A100_FP16_TFLOPS = 312.0
A100_HBM_TBPS = 2.0
V5E_BF16_TFLOPS = 197.0
V5E_HBM_TBPS = 0.819


def cost_of(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def main():
    cfg = RomaConfig(dtype="bfloat16")
    model = RomaModel(cfg)
    h, w = cfg.coarse_resolution
    hu, wu = cfg.upsample_resolution
    B = 1
    x = jnp.zeros((B, h, w, 3), jnp.float32)
    xu = jnp.zeros((B, hu, wu, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda k: model.init(k, x, x, symmetric=False, train=False),
        jax.random.PRNGKey(0),
    )
    variables = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), variables)

    rows = []
    f1, b1 = cost_of(
        lambda v, a, b: model.apply(v, a, b, symmetric=True, train=False),
        variables, x, x,
    )
    rows.append(("coarse pass 560^2 (symmetric)", f1, b1))
    flow = jnp.zeros((2 * B, h, w, 2), jnp.float32)
    cert = jnp.zeros((2 * B, h, w, 1), jnp.float32)
    f2, b2 = cost_of(
        lambda v, a, b, fl, ce: model.apply(
            v, a, b, symmetric=True, upsample=True, flow=fl, certainty=ce,
            scale_factor=float((hu * wu / (h * w)) ** 0.5), train=False,
        ),
        variables, xu, xu, flow, cert,
    )
    rows.append(("upsample pass 864^2 (symmetric)", f2, b2))

    tot_f = f1 + f2
    tot_b = b1 + b2
    print("| stage | TFLOPs/pair | HBM GB/pair | A100 roofline ms | v5e roofline ms |")
    print("|---|---|---|---|---|")
    for name, f, by in rows + [("TOTAL", tot_f, tot_b)]:
        a100 = max(f / (A100_FP16_TFLOPS * 1e12), by / (A100_HBM_TBPS * 1e12)) * 1e3
        v5e = max(f / (V5E_BF16_TFLOPS * 1e12), by / (V5E_HBM_TBPS * 1e12)) * 1e3
        print(f"| {name} | {f/1e12:.2f} | {by/1e9:.2f} | {a100:.1f} | {v5e:.1f} |")

    # reference-on-A100 estimate: eager torch fp16 at 25-40% of the
    # compute roofline (big cuDNN convs/matmuls hit 50-70%; the per-batch
    # -element python-loop local correlation, unfused pointwise chains, and
    # empty_cache() between passes drag the mean down)
    for util in (0.40, 0.25):
        t = tot_f / (A100_FP16_TFLOPS * 1e12 * util)
        print(f"reference-on-A100 estimate at {int(util*100)}% util: "
              f"{t*1e3:.0f} ms/pair = {1/t:.1f} pairs/s")
    sol = max(tot_f / (V5E_BF16_TFLOPS * 1e12), tot_b / (V5E_HBM_TBPS * 1e12))
    print(f"v5e speed-of-light: {sol*1e3:.0f} ms/pair = {1/sol:.1f} pairs/s")


if __name__ == "__main__":
    main()
