"""Multi-view SfM from a directory of images: dense matching -> pose graph ->
tracks -> distributed-ready bundle adjustment.

The end-to-end north-star pipeline (BASELINE.json): RoMa matches feed the
net-new SfM backend. Matches sequential windows of images, reconstructs, and
writes poses/points; reports ATE when a ground-truth trajectory is given.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import argparse
import glob
import json

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", required=True, help="directory of images (sorted)")
    p.add_argument("--intrinsics", default=None,
                   help="3x3 K as a .txt (one shared camera); default: focal=1.2*max(h,w)")
    p.add_argument("--matcher", default="tiny", choices=["tiny", "roma"])
    p.add_argument("--window", type=int, default=3, help="match i with i+1..i+window")
    p.add_argument("--num_matches", type=int, default=2000)
    p.add_argument("--gt_trajectory", default=None,
                   help="npy of (N, 3) GT camera centers for ATE")
    p.add_argument("--out", default="results/sfm_reconstruction.npz")
    args = p.parse_args()

    paths = sorted(
        sum([glob.glob(os.path.join(args.images, e)) for e in
             ("*.jpg", "*.png", "*.ppm")], [])
    )
    n = len(paths)
    assert n >= 3, f"need >= 3 images, found {n}"
    print(f"{n} images")

    if args.matcher == "tiny":
        from roma_tpu.models.zoo import tiny_roma_v1_outdoor
        matcher = tiny_roma_v1_outdoor()
        H, W = 448, 608
    else:
        from roma_tpu.models.zoo import roma_outdoor
        matcher = roma_outdoor()
        H, W = matcher.cfg.upsample_resolution

    sizes = []
    ims = []
    for path in paths:
        im = Image.open(path).convert("RGB")
        sizes.append(im.size)  # (w, h)
        ims.append(np.asarray(im.resize((608, 448)), np.float32) / 255.0
                   if args.matcher == "tiny" else np.asarray(im, np.float32) / 255.0)

    if args.intrinsics:
        K = np.loadtxt(args.intrinsics).reshape(3, 3)
    else:
        w0, h0 = sizes[0]
        f = 1.2 * max(w0, h0)
        K = np.array([[f, 0, w0 / 2], [0, f, h0 / 2], [0, 0, 1.0]])

    key = jax.random.PRNGKey(0)
    matches = {}
    for i in range(n):
        for j in range(i + 1, min(i + 1 + args.window, n)):
            warp, cert = matcher.match(jnp.asarray(ims[i]), jnp.asarray(ims[j]))
            key, sub = jax.random.split(key)
            sparse, conf = matcher.sample(warp, cert, args.num_matches, key=sub)
            sparse = np.asarray(sparse)
            wi, hi = sizes[i]
            wj, hj = sizes[j]
            ki = np.asarray(matcher.to_pixel_coordinates(sparse[:, :2], hi, wi))
            kj = np.asarray(matcher.to_pixel_coordinates(sparse[:, 2:], hj, wj))
            matches[(i, j)] = (ki, kj)
            print(f"pair ({i},{j}): {len(ki)} matches")

    from roma_tpu.sfm.reconstruction import reconstruct

    rec = reconstruct(matches, np.tile(K, (n, 1, 1)).astype(np.float32), n)
    print(f"BA final robust cost: {rec.cost:.4g} px^2, {len(rec.points)} points")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, rotations=rec.rotations, translations=rec.translations,
             points=rec.points, centers=rec.centers)
    print(f"saved {args.out}")

    if args.gt_trajectory:
        from roma_tpu.sfm.metrics import absolute_trajectory_error

        gt = np.load(args.gt_trajectory)
        ate = absolute_trajectory_error(rec.centers, gt)
        print(json.dumps(ate, indent=2))


if __name__ == "__main__":
    main()
