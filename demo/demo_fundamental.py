"""Fundamental-matrix demo (reference demo/demo_fundamental.py equivalent):
match with full RoMa, estimate F with the built-in robust estimator."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse

import numpy as np
from PIL import Image

import jax.numpy as jnp

from roma_tpu.estimation import estimate_fundamental_ransac
from roma_tpu.models.zoo import roma_outdoor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/sacre_coeur_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/sacre_coeur_B.jpg")
    args = p.parse_args()

    matcher = roma_outdoor()
    pil_a = Image.open(args.im_A_path).convert("RGB")
    pil_b = Image.open(args.im_B_path).convert("RGB")
    w1, h1 = pil_a.size
    w2, h2 = pil_b.size
    im_a = np.asarray(pil_a, np.float32) / 255
    im_b = np.asarray(pil_b, np.float32) / 255
    warp, certainty = matcher.match(jnp.asarray(im_a), jnp.asarray(im_b))
    matches, _ = matcher.sample(warp, certainty, num=10000)
    kpts1, kpts2 = matcher.to_pixel_coordinates(matches, h1, w1, h2, w2)
    res = estimate_fundamental_ransac(
        np.asarray(kpts1), np.asarray(kpts2), threshold_px=0.2, max_iters=2000
    )
    print("F =\n", res.model)
    print(f"inliers: {res.inliers.mean():.1%} of {len(res.inliers)}")


if __name__ == "__main__":
    main()
