"""3D-parallax gif demo (reference demo/demo_3D_effect.py equivalent):
interpolate the dense warp between the two views and resample image B at
each intermediate warp, writing a frame sequence."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse

import numpy as np
from PIL import Image

import jax.numpy as jnp

from roma_tpu.models.zoo import roma_outdoor
from roma_tpu.ops.grid_sample import grid_sample


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--im_A_path", default="/root/reference/assets/toronto_A.jpg")
    p.add_argument("--im_B_path", default="/root/reference/assets/toronto_B.jpg")
    p.add_argument("--save_path", default="demo/gif/roma_warp_toronto")
    p.add_argument("--frames", type=int, default=200)
    args = p.parse_args()

    matcher = roma_outdoor()
    # one-directional warp is enough for the effect (reference sets
    # symmetric=False); take the A-side half of the symmetric output
    warp, _certainty = matcher.match(args.im_A_path, args.im_B_path)
    h, w2 = warp.shape[:2]
    w = w2 // 2
    warp = warp[:, :w]
    coords_a, coords_b = warp[..., :2], warp[..., 2:]

    im_b = np.asarray(
        Image.open(args.im_B_path).convert("RGB").resize((w, h)), np.float32
    ) / 255.0
    x2 = jnp.asarray(im_b)[None]

    os.makedirs(os.path.dirname(args.save_path) or ".", exist_ok=True)
    for i, x in enumerate(np.linspace(0, 2 * np.pi, args.frames)):
        t = (1 + np.cos(x)) / 2
        interp_warp = (1 - t) * coords_a + t * coords_b
        frame = grid_sample(x2, interp_warp[None])[0]
        frame = np.clip(np.asarray(frame) * 255, 0, 255).astype(np.uint8)
        Image.fromarray(frame).save(f"{args.save_path}_{i:03d}.jpg")
    print(f"saved {args.frames} frames to {args.save_path}_*.jpg")


if __name__ == "__main__":
    main()
