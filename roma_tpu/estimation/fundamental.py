"""Fundamental-matrix estimation (uncalibrated two-view geometry).

Replaces cv2.findFundamentalMat USAC_ACCURATE
(/root/reference/romatch/utils/utils.py:54-76): batched normalized 8-point in
the vectorized RANSAC core with Sampson scoring + local optimization.
"""

from __future__ import annotations

import numpy as np

from roma_tpu.estimation.essential import _eight_point, sampson_sq
from roma_tpu.estimation.ransac import RansacResult, ransac


def fundamental_8pt(p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    return _eight_point(p0, p1, essential=False)


def estimate_fundamental_ransac(
    p0: np.ndarray,
    p1: np.ndarray,
    threshold_px: float,
    max_iters: int = 2000,
    rng: np.random.Generator | None = None,
) -> RansacResult | None:
    """Pixel correspondences -> F + inliers."""
    return ransac(
        solver=fundamental_8pt,
        residual=sampson_sq,
        pts0=p0,
        pts1=p1,
        sample_size=8,
        threshold=threshold_px,
        max_iters=max_iters,
        rng=rng,
    )
