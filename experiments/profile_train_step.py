"""Compile + step the FULL-size training graphs on the real TPU.

VERDICT r1 #3b: the 560^2 full-RoMa train graph (GP 1600^2 Grams + 9-block
refiners + VGG, with gradients) had never been compiled or memory-profiled
on device. This script builds the real RomaConfig train state, runs a few
steps on synthetic batches, and reports step time + device memory.

Usage:
  python experiments/profile_train_step.py --model roma --hw 560 560 --batch 2
  python experiments/profile_train_step.py --model tiny --hw 448 448 --batch 8
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from roma_tpu.config import RomaConfig, TrainConfig
from roma_tpu.losses.robust_loss import RobustLossConfig, robust_loss, tiny_robust_loss
from roma_tpu.train.train import (
    make_roma_train_state,
    make_tiny_train_state,
    make_train_step,
)
from roma_tpu.utils.profiling import enable_compilation_cache


def synthetic_batch(b, h, w):
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 1, (2 * b, h, w, 3)).astype(np.float32)
    depth = (4.0 + rng.uniform(0, 1, (2 * b, h, w))).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = 0.3
    K = np.array([[h, 0, w / 2], [0, h, h / 2], [0, 0, 1]], np.float32)
    return {
        "im_A": jnp.asarray(im[:b]),
        "im_B": jnp.asarray(im[b:]),
        "im_A_depth": jnp.asarray(depth[:b]),
        "im_B_depth": jnp.asarray(depth[b:]),
        "T_1to2": jnp.asarray(np.stack([T] * b)),
        "K1": jnp.asarray(np.stack([K] * b)),
        "K2": jnp.asarray(np.stack([K] * b)),
    }


def disparity_batch(b, h, w, shift_px=16):
    """Textured plane under pure x-translation (constant-disparity GT, the
    test_convergence construction at full size): real learnable signal, so a
    multi-step run must show the loss moving DOWN, not just being finite."""
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (b, h, w + shift_px, 3)).astype(np.float32)
    for ax in (1, 2):
        base = 0.6 * base + 0.2 * (
            np.roll(base, 1, ax) + np.roll(base, -1, ax)
        )
    im_a = base[:, :, :w]
    im_b = base[:, :, shift_px:]
    fx = float(h)
    plane_d = 4.0
    tx = shift_px * plane_d / fx
    T = np.eye(4, dtype=np.float32)
    T[0, 3] = -tx
    K = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32)
    depth = np.full((b, h, w), plane_d, np.float32)
    return {
        "im_A": jnp.asarray(im_a),
        "im_B": jnp.asarray(im_b),
        "im_A_depth": jnp.asarray(depth),
        "im_B_depth": jnp.asarray(depth),
        "T_1to2": jnp.asarray(np.tile(T, (b, 1, 1))),
        "K1": jnp.asarray(np.tile(K, (b, 1, 1))),
        "K2": jnp.asarray(np.tile(K, (b, 1, 1))),
    }


def device_memory_mb() -> dict:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return {
            "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
            "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
            "limit_mb": stats.get("bytes_limit", 0) / 1e6,
        }
    except Exception:
        return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=["roma", "tiny"], default="roma")
    ap.add_argument("--hw", type=int, nargs=2, default=[560, 560])
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument(
        "--convergence", type=int, default=0, metavar="N",
        help="train N steps on a textured constant-disparity batch and "
             "report the loss trajectory (VERDICT r2 #4: full-size loss "
             "must move down, at any model size)",
    )
    args = ap.parse_args()

    enable_compilation_cache()
    h, w = args.hw
    tcfg = TrainConfig(batch_size=args.batch)
    if args.model == "roma":
        state = make_roma_train_state(
            jax.random.PRNGKey(0), tcfg, roma_cfg=RomaConfig(), hw=(h, w)
        )
        loss_cfg = RobustLossConfig(
            alpha=0.5, c=1e-4, local_dist={1: 4, 2: 4, 4: 8, 8: 8}
        )
        step = make_train_step(robust_loss, loss_cfg)
    else:
        state = make_tiny_train_state(
            jax.random.PRNGKey(0), tcfg, hw=(h, w), trainable="matchers_only"
        )
        loss_cfg = RobustLossConfig(
            ce_weight=0.01, alpha={4: 0.15, 8: 0.15}, c=1e-4,
            local_dist={4: 4}, epe_mask_prob_th=0.001,
        )
        step = make_train_step(tiny_robust_loss, loss_cfg)

    if args.convergence:
        batch = disparity_batch(args.batch, h, w)
        losses = []
        t0 = time.perf_counter()
        for i in range(args.convergence):
            state, metrics = step(state, batch)
            losses.append(float(metrics["total_loss"]))
            if i == 0:
                print(f"first step (compile + run): "
                      f"{time.perf_counter() - t0:.1f}s loss={losses[0]:.4f}",
                      flush=True)
                t0 = time.perf_counter()
        steady = (time.perf_counter() - t0) / max(args.convergence - 1, 1)
        first = float(np.median(losses[:10]))
        last = float(np.median(losses[-10:]))
        print(f"steady step time ~{steady * 1e3:.0f} ms "
              f"({args.batch / steady:.2f} samples/s/chip, excl. compile)")
        print(f"loss trajectory over {args.convergence} steps: "
              f"median(first 10)={first:.4f} median(last 10)={last:.4f} "
              f"ratio={last / first:.3f}")
        print("losses:", " ".join(f"{l:.3f}" for l in losses))
        assert last < first, "loss did not decrease"
        return

    batch = synthetic_batch(args.batch, h, w)
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    loss0 = float(metrics["total_loss"])  # forces completion
    compile_s = time.perf_counter() - t0
    print(f"first step (compile + run): {compile_s:.1f}s loss={loss0:.4f}")
    print("memory after step 1:", device_memory_mb())

    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        _ = float(metrics["total_loss"])
        times.append(time.perf_counter() - t0)
    print(
        f"steady step time: median {np.median(times)*1e3:.0f} ms "
        f"(min {min(times)*1e3:.0f}) at batch {args.batch} {h}x{w} "
        f"[{args.model}]"
    )
    print("memory:", device_memory_mb())
    print(f"samples/s: {args.batch / np.median(times):.2f}")


if __name__ == "__main__":
    main()
