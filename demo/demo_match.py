"""Dense-warp visualization demo (reference demo/demo_match.py equivalent):
match two images with full RoMa and save the certainty-blended warp."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse

import numpy as np
from PIL import Image

import jax.numpy as jnp

from roma_tpu.models.zoo import roma_outdoor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/sacre_coeur_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/sacre_coeur_B.jpg")
    p.add_argument("--save_path", default="demo/roma_warp.jpg")
    args = p.parse_args()

    matcher = roma_outdoor()
    im_a = np.asarray(Image.open(args.im_A_path).convert("RGB"), np.float32) / 255
    im_b = np.asarray(Image.open(args.im_B_path).convert("RGB"), np.float32) / 255
    warp, certainty = matcher.match(jnp.asarray(im_a), jnp.asarray(im_b))
    matcher.visualize_warp(warp, certainty, im_a, im_b, save_path=args.save_path)
    print(f"saved {args.save_path}")


if __name__ == "__main__":
    main()
