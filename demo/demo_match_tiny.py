"""Tiny RoMa matching demo (reference demo/demo_match_tiny.py equivalent):
match two images, sample correspondences, save the warp visualization."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


import argparse

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from roma_tpu.models.zoo import tiny_roma_v1_outdoor


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/sacre_coeur_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/sacre_coeur_B.jpg")
    p.add_argument("--save_path", default="demo/tiny_roma_warp.jpg")
    args = p.parse_args()

    matcher = tiny_roma_v1_outdoor()
    pil_a = Image.open(args.im_A_path).convert("RGB")
    pil_b = Image.open(args.im_B_path).convert("RGB")
    # common size for the pair API
    H, W = 448, 608
    im_a = np.asarray(pil_a.resize((W, H)), np.float32) / 255
    im_b = np.asarray(pil_b.resize((W, H)), np.float32) / 255
    warp, certainty = matcher.match(jnp.asarray(im_a), jnp.asarray(im_b))
    matches, cert = matcher.sample(warp, certainty, num=2000)
    k_a, k_b = matcher.to_pixel_coordinates(matches, H, W, H, W)
    print(f"sampled {len(np.asarray(k_a))} matches")
    matcher.visualize_warp(warp, certainty, im_a, im_b, save_path=args.save_path)
    print(f"saved {args.save_path}")


if __name__ == "__main__":
    main()
