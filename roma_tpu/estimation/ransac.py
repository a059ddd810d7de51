"""Vectorized RANSAC core.

The reference delegates robust estimation to OpenCV C++
(findEssentialMat/findFundamentalMat/findHomography, utils/utils.py:31-76)
and PoseLib. Here it is a first-class, fully-batched component: all minimal
samples are drawn at once, all candidate models solved as one batched linear-
algebra call, and all hypotheses scored against all correspondences with one
matmul-shaped residual evaluation — the shape that vectorizes on any backend
(numpy/CPU today; the same code jits for TPU).

Scoring is MSAC (truncated squared residual), the same family as OpenCV's
USAC default; a local-optimization (LO) step re-fits on the best hypothesis's
inliers, which is the core of LO-RANSAC.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np


@dataclasses.dataclass
class RansacResult:
    model: np.ndarray
    inliers: np.ndarray          # bool (N,)
    score: float
    num_iters: int


def ransac(
    solver: Callable[[np.ndarray, np.ndarray], np.ndarray],
    residual: Callable[[np.ndarray, np.ndarray, np.ndarray], np.ndarray],
    pts0: np.ndarray,
    pts1: np.ndarray,
    sample_size: int,
    threshold: float,
    max_iters: int = 2000,
    confidence: float = 0.99999,
    lo_iters: int = 2,
    lo_sample_max: int = 4096,
    rng: np.random.Generator | None = None,
) -> RansacResult | None:
    """Batched hypothesize-and-verify.

    solver: (S, k, 2), (S, k, 2) minimal samples -> (M, 3, 3) candidate models
      (M may exceed S when a minimal problem has multiple roots).
    residual: (M, 3, 3), (N, 2), (N, 2) -> (M, N) squared residuals.
    """
    rng = rng or np.random.default_rng(0)
    n = len(pts0)
    if n < sample_size:
        return None

    idx = np.stack([rng.choice(n, sample_size, replace=False) for _ in range(max_iters)])
    models = solver(pts0[idx], pts1[idx])
    if models is None or len(models) == 0:
        return None

    r2 = residual(models, pts0, pts1)  # (M, N)
    t2 = threshold * threshold
    # MSAC score: sum of min(r^2, t^2); lower is better
    scores = np.sum(np.minimum(r2, t2), axis=1)
    best = int(np.argmin(scores))
    best_model = models[best]
    best_inliers = r2[best] < t2
    best_score = float(scores[best])

    # local optimization: iterated re-fit on inliers
    for _ in range(lo_iters):
        ni = int(best_inliers.sum())
        if ni <= sample_size:
            break
        sel = np.flatnonzero(best_inliers)
        if ni > lo_sample_max:
            sel = rng.choice(sel, lo_sample_max, replace=False)
        refit = solver(pts0[None, sel], pts1[None, sel])
        if refit is None or len(refit) == 0:
            break
        r2_lo = residual(refit, pts0, pts1)
        s_lo = np.sum(np.minimum(r2_lo, t2), axis=1)
        j = int(np.argmin(s_lo))
        if s_lo[j] < best_score:
            best_score = float(s_lo[j])
            best_model = refit[j]
            best_inliers = r2_lo[j] < t2
        else:
            break

    return RansacResult(best_model, best_inliers, best_score, max_iters)


def adaptive_num_iters(inlier_ratio: float, sample_size: int, confidence: float) -> int:
    eps = max(inlier_ratio, 1e-3)
    denom = np.log(max(1 - eps**sample_size, 1e-12))
    return int(np.ceil(np.log(1 - confidence) / denom))
