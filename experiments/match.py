"""Sparse-match visualization CLI (reference experiments/match.py
equivalent): Tiny RoMa match → sample N correspondences → draw numbered
keypoints side by side, optionally estimate a fundamental matrix."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse

import numpy as np
from PIL import Image

import jax

from roma_tpu.models.zoo import tiny_roma_v1_outdoor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/sacre_coeur_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/sacre_coeur_B.jpg")
    p.add_argument("--save_path", default="match.jpg")
    p.add_argument("--num", type=int, default=300)
    p.add_argument("--params", default=None,
                   help="reference tiny-RoMa torch checkpoint (.pth) to port")
    p.add_argument("--fundamental", action="store_true",
                   help="also estimate F from the sampled matches")
    args = p.parse_args()

    params = None
    if args.params:
        import torch

        from roma_tpu.models.port import port_tiny_roma

        state = torch.load(args.params, map_location="cpu", weights_only=True)
        params = port_tiny_roma(state)
    matcher = tiny_roma_v1_outdoor(params=params)

    im_a = Image.open(args.im_A_path).convert("RGB")
    im_b = Image.open(args.im_B_path).convert("RGB")
    (w_a, h_a), (w_b, h_b) = im_a.size, im_b.size

    warp, certainty = matcher.match(args.im_A_path, args.im_B_path)
    matches, _ = matcher.sample(warp, certainty, num=args.num,
                                key=jax.random.PRNGKey(0))
    kpts_a, kpts_b = matcher.to_pixel_coordinates(matches, h_a, w_a, h_b, w_b)
    kpts_a = np.asarray(kpts_a).round().astype(int)
    kpts_b = np.asarray(kpts_b).round().astype(int)

    import cv2

    canvas = np.concatenate(
        [np.asarray(im_a.resize((w_a, max(h_a, h_b)))),
         np.asarray(im_b.resize((w_b, max(h_a, h_b))))], axis=1
    ).copy()
    rng = np.random.default_rng(0)
    for i, (ka, kb) in enumerate(zip(kpts_a, kpts_b + np.array([w_a, 0]))):
        color = tuple(int(c) for c in rng.integers(0, 256, 3))
        cv2.circle(canvas, tuple(ka), 3, color, 2)
        cv2.circle(canvas, tuple(kb), 3, color, 2)
    Image.fromarray(canvas).save(args.save_path)
    print(f"{len(kpts_a)} matches; saved {args.save_path}")

    if args.fundamental:
        from roma_tpu.estimation import estimate_fundamental_ransac

        result = estimate_fundamental_ransac(
            np.asarray(kpts_a, np.float64), np.asarray(kpts_b, np.float64),
            threshold_px=1.0,
        )
        if result is None:
            print("fundamental estimation failed")
        else:
            print("F =\n", result.model)
            print(f"inliers: {int(result.inliers.sum())}/{len(kpts_a)}")


if __name__ == "__main__":
    main()
