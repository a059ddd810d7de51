"""Capture an xplane trace of the upsample forward pass and print the top
ops by total device time — finds the cost hiding between the profiled
refiner/encoder components.

Usage: python experiments/trace_fwd_up.py [--top 40] [--stage up|coarse]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.utils.profiling import enable_compilation_cache


def top_ops(logdir: str, top: int):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True
    )
    assert files, f"no xplane.pb under {logdir}"
    tot = defaultdict(float)
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if "XLA Ops" not in line.name and "Ops" != line.name:
                    continue
                for ev in line.events:
                    name = meta.get(ev.metadata_id, "?")
                    tot[name] += ev.duration_ps / 1e9  # -> ms
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    total = sum(tot.values())
    print(f"total device op time: {total:.1f} ms (all traced iterations)")
    for name, ms in items[:top]:
        print(f"{ms:9.2f} ms  {100 * ms / total:5.1f}%  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--stage", default="up", choices=["up", "coarse"])
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    enable_compilation_cache()
    from roma_tpu.models.zoo import roma_outdoor

    matcher = roma_outdoor()
    cfg = matcher.cfg
    B = 2
    rng = np.random.default_rng(0)
    h, w = cfg.coarse_resolution
    hu, wu = cfg.upsample_resolution
    a = jnp.asarray(rng.uniform(-2, 2, (B, h, w, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(-2, 2, (B, h, w, 3)).astype(np.float32))
    a2 = jnp.asarray(rng.uniform(-2, 2, (B, hu, wu, 3)).astype(np.float32))
    b2 = jnp.asarray(rng.uniform(-2, 2, (B, hu, wu, 3)).astype(np.float32))

    corresps = matcher._fwd(matcher.params, a, b)
    finest = corresps[1]
    sf = float(np.sqrt((hu * wu) / (h * w)))

    def run_up():
        out = matcher._fwd_up(
            matcher.params, a2, b2, finest["flow"], finest["certainty"], sf
        )
        jax.block_until_ready(out)
        return out

    def run_coarse():
        out = matcher._fwd(matcher.params, a, b)
        jax.block_until_ready(out)
        return out

    run = run_up if args.stage == "up" else run_coarse
    run()  # warm

    logdir = f"/tmp/xplane_{args.stage}"
    os.system(f"rm -rf {logdir}")
    jax.profiler.start_trace(logdir)
    for _ in range(args.iters):
        out = run()
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    jax.profiler.stop_trace()
    top_ops(logdir, args.top)


if __name__ == "__main__":
    main()
