"""Tiny RoMa export CLI (reference experiments/export_tiny.py equivalent):
serialize the forward to a portable StableHLO artifact at a fixed shape and
print the compiler's FLOP/memory audit (the thop + onnxsim role)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse

import numpy as np

import jax

from roma_tpu.export import export_tiny_roma, load_exported
from roma_tpu.models.zoo import tiny_roma_v1_outdoor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--checkpoint", default=None,
                   help="reference tiny-RoMa torch checkpoint (.pth) to port")
    p.add_argument("--out", default="tiny_roma.stablehlo")
    p.add_argument("--check", action="store_true",
                   help="round-trip the artifact and compare outputs")
    args = p.parse_args()

    params = None
    if args.checkpoint:
        import torch

        from roma_tpu.models.port import port_tiny_roma

        state = torch.load(args.checkpoint, map_location="cpu", weights_only=True)
        params = port_tiny_roma(state)
    matcher = tiny_roma_v1_outdoor(params=params)

    result = export_tiny_roma(
        matcher.params, hw=(args.height, args.width), path=args.out
    )
    print(f"serialized {len(result.serialized)/1e6:.1f} MB -> {args.out}")
    if result.flops is not None:
        print(f"forward: {result.flops/1e9:.2f} GFLOP, "
              f"{(result.bytes_accessed or 0)/1e9:.2f} GB accessed, "
              f"peak temp {(result.peak_memory or 0)/1e6:.1f} MB")

    if args.check:
        rng = np.random.default_rng(0)
        a = rng.uniform(0, 1, (1, args.height, args.width, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (1, args.height, args.width, 3)).astype(np.float32)
        fn = load_exported(result.serialized)
        out = fn(matcher.params, a, b)
        ref = jax.jit(
            lambda p, x, y: matcher.model.apply(p, x, y, train=False)
        )(matcher.params, a, b)
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(ref[8]["flow"]), atol=1e-5
        )
        print("round-trip check passed")


if __name__ == "__main__":
    main()
