"""Per-stage timing of the full-RoMa match pipeline on the current device.

Times each jitted stage (preprocess, coarse forward, upsample forward,
postprocess) separately, plus sub-stages of the coarse pass (encoder-only,
GP+decoder), to direct kernel-level optimization. Mirrors the stages in
roma_tpu/models/matcher.py::RomaMatcher.match (reference pipeline:
/root/reference/romatch/models/matcher.py:593-730).

Usage: python experiments/profile_roma_stages.py [--batch 2] [--iters 4]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.utils.profiling import enable_compilation_cache


def timed(fn, *args, iters=4, trials=3, name=""):
    out = fn(*args)
    jax.block_until_ready(out)
    # force a real readback: on the remote-TPU runtime block_until_ready can
    # return before execution completes
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:34s} {best * 1e3:9.2f} ms")
    return out, best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    enable_compilation_cache()
    from roma_tpu.models.zoo import roma_outdoor

    matcher = roma_outdoor()
    cfg = matcher.cfg
    B = args.batch
    rng = np.random.default_rng(0)
    h, w = cfg.coarse_resolution
    hu, wu = cfg.upsample_resolution
    im_a = jnp.asarray(rng.uniform(0, 1, (B, h, w, 3)).astype(np.float32))
    im_b = jnp.asarray(rng.uniform(0, 1, (B, h, w, 3)).astype(np.float32))

    print(f"device={jax.devices()[0]}  batch={B}  coarse={h}x{w}  up={hu}x{wu}")

    a, _ = timed(lambda: matcher._prep(im_a, im_b, hs=h, ws=w),
                 iters=args.iters, name="prep coarse")
    a, b = a
    a2, _ = timed(lambda: matcher._prep(im_a, im_b, hs=hu, ws=wu),
                  iters=args.iters, name="prep upsample")
    a2, b2 = a2

    # encoder-only at coarse res (both images, symmetric concat)
    model = matcher.model
    enc = jax.jit(lambda p, x: model.apply(p, x, method=model.encode))
    x = jnp.concatenate([a, b], axis=0)
    _, _ = timed(lambda: enc(matcher.params, x), iters=args.iters,
                 name="encoder (VGG+DINOv2) coarse")

    enc_up = jax.jit(
        lambda p, x: model.apply(p, x, coarse=False, method=model.encode)
    )
    x2 = jnp.concatenate([a2, b2], axis=0)
    _, _ = timed(lambda: enc_up(matcher.params, x2), iters=args.iters,
                 name="encoder (VGG only) upsample")

    corresps, t_fwd = timed(lambda: matcher._fwd(matcher.params, a, b),
                            iters=args.iters, name="coarse fwd (full)")
    finest = corresps[1]
    sf = float(np.sqrt((hu * wu) / (h * w)))
    corr_up, t_up = timed(
        lambda: matcher._fwd_up(
            matcher.params, a2, b2, finest["flow"], finest["certainty"], sf
        ),
        iters=args.iters, name="upsample fwd (full)",
    )
    cert16 = corresps[16]["certainty"]
    _, _ = timed(
        lambda: matcher._post(
            corr_up[1]["flow"], corr_up[1]["certainty"], cert16,
            hs=hu, ws=wu, symmetric=cfg.symmetric, attenuate=cfg.attenuate_cert,
        ),
        iters=args.iters, name="postprocess",
    )

    total = t_fwd + t_up
    print(f"{'fwd total':34s} {total * 1e3:9.2f} ms  "
          f"-> {B / total:.3f} pairs/s (fwd only)")


if __name__ == "__main__":
    main()
