"""Timing + quality table for the robust two-view estimators.

Compares the framework's estimators (numpy vectorized, C++ native) against
OpenCV's (the reference's backend, utils/utils.py:31-52) on synthetic scenes
at benchmark-realistic sizes (5000 matches, the Mega-1500 sample count).

Usage: python experiments/bench_estimator.py [--n 5000] [--iters 1000]
Writes a markdown table to stdout (recorded in PERF.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from roma_tpu.estimation import estimate_essential_ransac
from roma_tpu.estimation.essential import recover_pose
from roma_tpu.utils.geometry import angle_error_mat, angle_error_vec


def synthetic_pair(n, outlier_frac, noise, seed):
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
    a = np.deg2rad(8.0)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]])
    t = np.array([0.8, 0.1, 0.05])
    x0 = X[:, :2] / X[:, 2:]
    Xc1 = X @ R.T + t
    x1 = Xc1[:, :2] / Xc1[:, 2:]
    x0 += rng.normal(0, noise, x0.shape)
    x1 += rng.normal(0, noise, x1.shape)
    n_out = int(outlier_frac * n)
    x1[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    return x0, x1, R, t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5000)
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--seeds", type=int, default=3)
    args = ap.parse_args()

    try:
        import cv2
    except Exception:
        cv2 = None
    try:
        from roma_tpu.estimation.native import estimate_essential_ransac_native
    except Exception:
        estimate_essential_ransac_native = None

    rows = []
    for outlier_frac in (0.2, 0.5):
        scenes = [
            synthetic_pair(args.n, outlier_frac, 2e-4, 100 + s)
            for s in range(args.seeds)
        ]

        def run(fn):
            errs, times = [], []
            for x0, x1, R, t in scenes:
                t0 = time.perf_counter()
                out = fn(x0, x1)
                times.append(time.perf_counter() - t0)
                if out is None:
                    errs.append(180.0)
                    continue
                R_hat, t_hat = out
                errs.append(
                    max(angle_error_mat(R_hat, R), angle_error_vec(t_hat, t))
                )
            return float(np.median(times) * 1e3), float(np.mean(errs))

        def np5(x0, x1):
            res = estimate_essential_ransac(
                x0, x1, 5e-3, max_iters=args.iters, solver="5pt"
            )
            if res is None:
                return None
            R, t, _ = recover_pose(res.model, x0, x1, res.inliers)
            return R, t

        def np8(x0, x1):
            res = estimate_essential_ransac(
                x0, x1, 5e-3, max_iters=args.iters, solver="8pt", scoring="msac"
            )
            if res is None:
                return None
            R, t, _ = recover_pose(res.model, x0, x1, res.inliers)
            return R, t

        entries = [("numpy 5pt+MAGSAC", np5), ("numpy 8pt+MSAC", np8)]
        if estimate_essential_ransac_native is not None:
            def cpp5(x0, x1):
                ret = estimate_essential_ransac_native(
                    x0, x1, 5e-3, max_iters=args.iters, solver="5pt"
                )
                return None if ret is None else (ret[1], ret[2])
            entries.append(("C++ 5pt+MAGSAC", cpp5))
        if cv2 is not None:
            def cv(x0, x1):
                E, mask = cv2.findEssentialMat(
                    x0, x1, np.eye(3), threshold=5e-3, prob=0.99999,
                    method=cv2.RANSAC,
                )
                if E is None:
                    return None
                _, R, t, _ = cv2.recoverPose(
                    E[:3], x0, x1, np.eye(3), mask=mask.copy()
                )
                return R, t[:, 0]
            entries.append(("cv2 findEssentialMat (5pt)", cv))

        for name, fn in entries:
            ms, err = run(fn)
            rows.append((f"{int(outlier_frac*100)}%", name, ms, err))

    print(f"\n| outliers | estimator | median ms (n={args.n}) | mean max(eR,et) deg |")
    print("|---|---|---|---|")
    for o, name, ms, err in rows:
        print(f"| {o} | {name} | {ms:.1f} | {err:.3f} |")


if __name__ == "__main__":
    main()
