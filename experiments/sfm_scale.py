"""SfM at scale (VERDICT r1 #9): 100 cameras / 10k points with noise +
outliers — ATE after pose-graph init vs after BA, plus a distributed-BA
step-time scaling table (1 vs 8 devices). Results recorded in SFM.md.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python experiments/sfm_scale.py [--cams 100 --pts 10000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

if "--tpu" not in sys.argv:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax

if "--tpu" not in sys.argv:
    # the image's sitecustomize pins JAX_PLATFORMS to the remote TPU; this
    # study runs on the virtual-CPU mesh unless --tpu is passed
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from roma_tpu.sfm.bundle_adjust import (
    BAProblem,
    bundle_adjust,
    bundle_adjust_device,
    make_distributed_ba_step,
    rodrigues,
    triangulate_tracks,
)
from roma_tpu.sfm.metrics import absolute_trajectory_error
from roma_tpu.sfm.pose_graph import (
    centers_to_translations,
    rotation_averaging,
    translation_averaging,
)
from roma_tpu.sfm.reconstruction import _rvec_from_R
from roma_tpu.parallel.mesh import make_mesh


def rot_xyz(a, b, c):
    Rx = np.array([[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]])
    Ry = np.array([[np.cos(b), 0, np.sin(b)], [0, 1, 0], [-np.sin(b), 0, np.cos(b)]])
    Rz = np.array([[np.cos(c), -np.sin(c), 0], [np.sin(c), np.cos(c), 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def make_world(n_cams, n_pts, seed=0, noise_px=0.5, outlier_frac=0.1,
               obs_per_cam=None):
    rng = np.random.default_rng(seed)
    K = np.array([[600.0, 0, 480], [0, 600.0, 320], [0, 0, 1]], np.float32)
    X = rng.uniform([-8, -5, 10], [8, 5, 30], (n_pts, 3))
    Rs, cs = [], []
    for i in range(n_cams):
        th = 2 * np.pi * i / n_cams
        # orbiting ring trajectory, cameras looking inward-ish
        c = np.array([10 * np.sin(th), 1.5 * np.sin(2.3 * th), 10 - 10 * np.cos(th)])
        R = rot_xyz(0.05 * np.sin(3 * th), -th * 0.35, 0.03 * np.cos(2 * th))
        Rs.append(R)
        cs.append(c)
    cam_idx, pt_idx, uv = [], [], []
    for ci in range(n_cams):
        R, c = Rs[ci], cs[ci]
        t = -R @ c
        Xc = X @ R.T + t
        x = Xc @ K.T
        px = x[:, :2] / np.maximum(x[:, 2:], 1e-6)
        vis = (Xc[:, 2] > 1.0) & (px[:, 0] > 0) & (px[:, 0] < 960) & \
              (px[:, 1] > 0) & (px[:, 1] < 640)
        sel = np.flatnonzero(vis)
        if obs_per_cam is not None and len(sel) > obs_per_cam:
            sel = rng.choice(sel, obs_per_cam, replace=False)
        obs = px[sel] + rng.normal(0, noise_px, (len(sel), 2))
        n_out = int(outlier_frac * len(sel))
        if n_out:
            out_rows = rng.choice(len(sel), n_out, replace=False)
            obs[out_rows] = rng.uniform([0, 0], [960, 640], (n_out, 2))
        cam_idx.append(np.full(len(sel), ci))
        pt_idx.append(sel)
        uv.append(obs)
    return {
        "K": K, "X": X, "Rs": np.stack(Rs), "centers": np.stack(cs),
        "cam_idx": np.concatenate(cam_idx).astype(np.int32),
        "pt_idx": np.concatenate(pt_idx).astype(np.int32),
        "uv": np.concatenate(uv).astype(np.float32),
    }


def noisy_pose_graph_init(world, rng, rot_noise_deg=1.5, dir_noise=0.03):
    """Simulated two-view estimates on a ring+chords graph -> averaging."""
    n = len(world["Rs"])
    edges_R, edges_t = [], []
    def rel(i, j):
        R = world["Rs"][j] @ world["Rs"][i].T
        c_j_in_i = world["Rs"][i] @ (world["centers"][j] - world["centers"][i])
        t = -R @ c_j_in_i  # t of j relative to i, in j frame
        return R, t / np.linalg.norm(t)
    for i in range(n):
        for j in ((i + 1) % n, (i + 5) % n, (i + 11) % n):
            if i == j:
                continue
            R, t = rel(i, j)
            dR = rot_xyz(*rng.normal(0, np.deg2rad(rot_noise_deg), 3))
            dt = rng.normal(0, dir_noise, 3)
            t = t + dt
            edges_R.append((i, j, dR @ R))
            edges_t.append((i, j, t / np.linalg.norm(t)))
    Rs = rotation_averaging(n, edges_R)
    centers = translation_averaging(n, Rs, edges_t)
    ts = centers_to_translations(Rs, centers)
    return Rs, centers, ts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=100)
    ap.add_argument("--pts", type=int, default=10000)
    ap.add_argument("--ba-iters", type=int, default=30)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument(
        "--device-driver", action="store_true",
        help="use bundle_adjust_device (fully-jitted LM, on-device f64 "
             "solve) instead of the host-fp64 driver",
    )
    ap.add_argument(
        "--shard", type=int, default=0,
        help="with --device-driver: shard the observation axis over an "
             "N-device mesh",
    )
    ap.add_argument(
        "--solver", default="dense", choices=["dense", "cg"],
        help="device-driver camera solve: exact dense f64 Schur, or "
             "matrix-free block-Jacobi(S) CG + f64 refinement (O(n_obs) "
             "memory — the 1k-cam/1M-obs path)",
    )
    ap.add_argument(
        "--skip-scaling", action="store_true",
        help="skip the distributed ba_step timing sweep",
    )
    ap.add_argument(
        "--iters-per-launch", type=int, default=None,
        help="split the device LM scan into launches of at most N "
             "iterations (bit-identical; for runtimes that kill long "
             "single executions)",
    )
    ap.add_argument(
        "--obs-per-cam", type=int, default=None,
        help="cap observations per camera (keeps the 1k-cam world at ~1M "
             "obs instead of full-visibility tens of millions)",
    )
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    world = make_world(args.cams, args.pts, obs_per_cam=args.obs_per_cam)
    n_obs = len(world["uv"])
    print(f"world: {args.cams} cams, {args.pts} pts, {n_obs} obs "
          f"(0.5 px noise, 10% outliers)")

    Rs0, centers0, ts0 = noisy_pose_graph_init(world, rng)
    ate_init = absolute_trajectory_error(centers0, world["centers"])
    print(f"ATE after pose-graph init: rmse {ate_init['ate_rmse']:.4f} "
          f"median {ate_init['ate_median']:.4f} (scene diameter ~20)")

    cameras = np.concatenate(
        [np.stack([_rvec_from_R(R) for R in Rs0]), ts0], -1
    ).astype(np.float32)
    Ks = np.stack([world["K"]] * args.cams)
    X0 = triangulate_tracks(
        cameras, Ks, world["cam_idx"], world["pt_idx"], world["uv"], args.pts
    )
    problem = BAProblem(
        cameras=jnp.asarray(cameras), points=jnp.asarray(X0.astype(np.float32)),
        intrinsics=jnp.asarray(Ks.astype(np.float32)),
        cam_idx=jnp.asarray(world["cam_idx"]),
        pt_idx=jnp.asarray(world["pt_idx"]),
        uv=jnp.asarray(world["uv"]),
        mask=jnp.ones(n_obs, jnp.float32),
    )
    t0 = time.perf_counter()
    if args.device_driver:
        mesh = None
        dd_problem = problem
        if args.shard:
            pad = (-n_obs) % args.shard
            dd_problem = problem._replace(
                cam_idx=jnp.pad(problem.cam_idx, (0, pad)),
                pt_idx=jnp.pad(problem.pt_idx, (0, pad)),
                uv=jnp.pad(problem.uv, ((0, pad), (0, 0))),
                mask=jnp.pad(problem.mask, (0, pad)),
            )
            mesh = make_mesh(n_data=args.shard)
        refined, cost = bundle_adjust_device(
            dd_problem, iters=args.ba_iters, huber_delta=3.0, max_err_px=20.0,
            mesh=mesh, solver=args.solver,
            iters_per_launch=args.iters_per_launch,
        )
    else:
        refined, cost = bundle_adjust(
            problem, iters=args.ba_iters, huber_delta=3.0, max_err_px=20.0
        )
    ba_s = time.perf_counter() - t0
    cams = np.asarray(refined.cameras)
    Rs_ref = np.stack([np.asarray(rodrigues(jnp.asarray(c[:3]))) for c in cams])
    centers_ref = -np.einsum("nij,ni->nj", Rs_ref, cams[:, 3:])
    ate_ba = absolute_trajectory_error(centers_ref, world["centers"])
    print(f"ATE after BA ({args.ba_iters} LM iters, Huber 3px, {ba_s:.1f}s): "
          f"rmse {ate_ba['ate_rmse']:.4f} median {ate_ba['ate_median']:.4f} "
          f"robust cost {cost:.3f} px^2")

    if args.skip_scaling:
        return
    # distributed ba_step scaling: 1 device vs all devices
    for n_dev in (1, len(jax.devices())):
        mesh = make_mesh(n_data=n_dev)
        # pad obs to a multiple of the mesh
        pad = (-n_obs) % n_dev
        pp = problem._replace(
            cam_idx=jnp.pad(problem.cam_idx, (0, pad)),
            pt_idx=jnp.pad(problem.pt_idx, (0, pad)),
            uv=jnp.pad(problem.uv, ((0, pad), (0, 0))),
            mask=jnp.pad(problem.mask, (0, pad)),
        )
        step = make_distributed_ba_step(mesh, n_cg=40, huber_delta=3.0)
        out = step(pp, jnp.asarray(1e-4))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = step(pp, jnp.asarray(1e-4))
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"distributed ba_step on {n_dev} device(s): {dt*1e3:.0f} ms "
              f"({n_obs} obs, 40 CG iters)")


if __name__ == "__main__":
    main()
