"""Evaluate Tiny RoMa v1 on Mega-1500 (+ Mega-8-scenes).

Equivalent of /root/reference/experiments/eval_tiny_roma_v1_outdoor.py,
including the Mega-8 scene list (reference eval defines the extra 8-scene
npz set).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse
import json
import os

from roma_tpu.benchmarks import MegaDepthPoseEstimationBenchmark
from roma_tpu.models.zoo import tiny_roma_v1_outdoor

MEGA8_SCENES = [
    "mega_8_scenes_0019_0.1_0.3.npz", "mega_8_scenes_0025_0.1_0.3.npz",
    "mega_8_scenes_0021_0.1_0.3.npz", "mega_8_scenes_0008_0.1_0.3.npz",
    "mega_8_scenes_0032_0.1_0.3.npz", "mega_8_scenes_1589_0.1_0.3.npz",
    "mega_8_scenes_0063_0.1_0.3.npz", "mega_8_scenes_0024_0.1_0.3.npz",
    "mega_8_scenes_0019_0.3_0.5.npz", "mega_8_scenes_0025_0.3_0.5.npz",
    "mega_8_scenes_0021_0.3_0.5.npz", "mega_8_scenes_0008_0.3_0.5.npz",
    "mega_8_scenes_0032_0.3_0.5.npz", "mega_8_scenes_1589_0.3_0.5.npz",
    "mega_8_scenes_0063_0.3_0.5.npz", "mega_8_scenes_0024_0.3_0.5.npz",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", default="data/megadepth")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--mega8", action="store_true")
    p.add_argument("--out", default="results/tiny_roma_v1_outdoor.json")
    args = p.parse_args()

    matcher = tiny_roma_v1_outdoor()
    if args.checkpoint:
        import orbax.checkpoint as ocp

        restored = ocp.StandardCheckpointer().restore(args.checkpoint, matcher.params)
        matcher = tiny_roma_v1_outdoor(params=restored)

    results = {}
    bench = MegaDepthPoseEstimationBenchmark(data_root=args.data_root)
    results["mega1500"] = bench.benchmark(matcher, model_name="tiny_roma_v1")
    if args.mega8:
        bench8 = MegaDepthPoseEstimationBenchmark(
            data_root=args.data_root, scene_names=MEGA8_SCENES
        )
        results["mega8"] = bench8.benchmark(matcher, model_name="tiny_roma_v1")
    print(json.dumps(results, indent=2))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
