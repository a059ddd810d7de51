"""Evaluate full RoMa on the pose/dense benchmarks.

Equivalent of /root/reference/experiments/eval_roma_outdoor.py: load a
checkpoint (or random init for plumbing checks), run Mega-1500 (and
optionally dense) and print/save the metric dict.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse
import json
import os

import jax

from roma_tpu.benchmarks import (
    MegadepthDenseBenchmark,
    MegaDepthPoseEstimationBenchmark,
)
from roma_tpu.models.zoo import roma_outdoor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="data/megadepth")
    p.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    p.add_argument("--coarse_res", type=int, default=560)
    p.add_argument("--upsample_res", type=int, default=864)
    p.add_argument("--out", default="results/roma_outdoor_mega1500.json")
    p.add_argument("--dense", action="store_true")
    p.add_argument("--mega8", action="store_true",
                   help="also run the Mega-8-scenes list")
    p.add_argument("--pose_backend", default="auto",
                   choices=["auto", "cv2", "native", "numpy"])
    p.add_argument("--shard_index", type=int, default=0)
    p.add_argument("--shard_count", type=int, default=1)
    p.add_argument("--batch", type=int, default=1,
                   help=">1: TPU-first batched schedule (stacked match, "
                        "prefetch, pooled RANSAC) — protocol-identical")
    p.add_argument("--device-resize", action="store_true",
                   help="ship original-res uint8, PIL-parity resize on "
                        "device (3.5x fewer upload bytes; <=1 uint8 level)")
    args = p.parse_args()

    matcher = roma_outdoor(
        coarse_res=args.coarse_res, upsample_res=args.upsample_res
    )
    if args.checkpoint:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(
            args.checkpoint, matcher.params
        )
        matcher = roma_outdoor(
            params=restored, coarse_res=args.coarse_res,
            upsample_res=args.upsample_res,
        )

    results = {}
    bench = MegaDepthPoseEstimationBenchmark(
        data_root=args.data_root, shard=(args.shard_index, args.shard_count),
        pose_backend=args.pose_backend, batch_size=args.batch,
        device_resize=args.device_resize,
    )
    results.update(bench.benchmark(matcher, model_name="roma_outdoor"))
    if args.mega8:
        from eval_tiny_roma_v1_outdoor import MEGA8_SCENES

        bench8 = MegaDepthPoseEstimationBenchmark(
            data_root=args.data_root, scene_names=MEGA8_SCENES,
            shard=(args.shard_index, args.shard_count),
            pose_backend=args.pose_backend, batch_size=args.batch,
            device_resize=args.device_resize,
        )
        results["mega8"] = bench8.benchmark(matcher, model_name="roma_outdoor")
    if args.dense:
        results.update(
            MegadepthDenseBenchmark(data_root=args.data_root).benchmark(matcher)
        )
    print(json.dumps(results, indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
