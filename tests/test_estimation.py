"""Robust estimation: synthetic two-view scenes with exact ground truth."""

import numpy as np
import pytest

from roma_tpu.estimation import (
    estimate_essential_ransac,
    estimate_fundamental_ransac,
    estimate_homography_ransac,
    estimate_pose,
)
from roma_tpu.estimation.essential import (
    decompose_essential,
    essential_8pt,
    recover_pose,
    sampson_sq,
    triangulate,
)
from roma_tpu.estimation.homography import homography_dlt, transfer_error_sq
from roma_tpu.utils.geometry import angle_error_mat, angle_error_vec


def rot(axis, deg):
    a = np.deg2rad(deg)
    c, s = np.cos(a), np.sin(a)
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def synthetic_pair(n=500, outlier_frac=0.0, noise=0.0, seed=0):
    """3D points seen by two cameras; returns K-normalized coords + GT (R, t)."""
    rng = np.random.default_rng(seed)
    X = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
    R = rot("y", 8) @ rot("x", 3)
    t = np.array([0.8, 0.1, 0.05])
    x0 = X[:, :2] / X[:, 2:]
    Xc1 = X @ R.T + t
    x1 = Xc1[:, :2] / Xc1[:, 2:]
    if noise:
        x0 = x0 + rng.normal(0, noise, x0.shape)
        x1 = x1 + rng.normal(0, noise, x1.shape)
    n_out = int(outlier_frac * n)
    if n_out:
        x1[:n_out] = rng.uniform(-0.5, 0.5, (n_out, 2))
    return x0, x1, R, t


def essential_from_rt(R, t):
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    return tx @ R


def test_eight_point_exact_on_clean_data():
    x0, x1, R, t = synthetic_pair(n=200)
    E = essential_8pt(x0[None, :16], x1[None, :16])[0]
    E_gt = essential_from_rt(R, t)
    # E is scale/sign ambiguous: compare normalized up to sign
    E_n = E / np.linalg.norm(E)
    E_gt_n = E_gt / np.linalg.norm(E_gt)
    err = min(np.abs(E_n - E_gt_n).max(), np.abs(E_n + E_gt_n).max())
    assert err < 1e-6
    # epipolar constraint holds for all points
    r2 = sampson_sq(E[None], x0, x1)
    assert r2.max() < 1e-10


def test_decompose_recover_gt_pose():
    x0, x1, R, t = synthetic_pair(n=200)
    E = essential_from_rt(R, t)
    Rs = decompose_essential(E)
    assert len(Rs) == 4
    R_hat, t_hat, ngood = recover_pose(E, x0, x1)
    assert ngood > 190
    assert angle_error_mat(R_hat, R) < 1e-6
    assert angle_error_vec(t_hat, t) < 1e-4


def test_triangulate_recovers_depths():
    x0, x1, R, t = synthetic_pair(n=50)
    X = triangulate(R, t, x0, x1)
    assert (X[:, 2] > 0).all()


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
def test_essential_ransac_with_outliers(outlier_frac):
    x0, x1, R, t = synthetic_pair(n=600, outlier_frac=outlier_frac, noise=1e-4)
    res = estimate_essential_ransac(x0, x1, threshold=1e-2, max_iters=500,
                                    rng=np.random.default_rng(1))
    assert res is not None
    n_out = int(outlier_frac * 600)
    # inliers found among the clean points
    assert res.inliers[n_out:].mean() > 0.97
    # outliers must be rejected
    if n_out:
        assert res.inliers[:n_out].mean() < 0.1
    R_hat, t_hat, _ = recover_pose(res.model, x0, x1, res.inliers)
    # 8-pt + MSAC + LO precision at this noise level; a 5-pt/GN refinement
    # stage can tighten this further
    assert angle_error_mat(R_hat, R) < 0.5
    assert angle_error_vec(t_hat, t) < 2.5


def test_estimate_pose_pixel_protocol():
    """Full protocol with intrinsics: pixels in, (R, t, mask) out."""
    x0, x1, R, t = synthetic_pair(n=800, outlier_frac=0.2, noise=5e-5, seed=3)
    K = np.array([[800.0, 0, 400], [0, 800.0, 300], [0, 0, 1]])
    k0 = x0 @ K[:2, :2].T + K[:2, 2]
    k1 = x1 @ K[:2, :2].T + K[:2, 2]
    ret = estimate_pose(k0, k1, K, K, norm_thresh=0.01,
                        rng=np.random.default_rng(0))
    assert ret is not None
    R_hat, t_hat, mask = ret
    assert angle_error_mat(R_hat, R) < 0.5
    assert angle_error_vec(t_hat[:, 0], t) < 0.5


def test_homography_dlt_exact():
    rng = np.random.default_rng(0)
    H_gt = np.array([[1.1, 0.05, 3.0], [-0.02, 0.95, -2.0], [1e-4, -2e-4, 1.0]])
    p0 = rng.uniform(0, 100, (1, 12, 2))
    h = (np.concatenate([p0[0], np.ones((12, 1))], -1) @ H_gt.T)
    p1 = (h[:, :2] / h[:, 2:])[None]
    H = homography_dlt(p0, p1)[0]
    np.testing.assert_allclose(H / H[2, 2], H_gt, atol=1e-6)
    err = transfer_error_sq(H[None], p0[0], p1[0])
    assert err.max() < 1e-8


def test_homography_ransac_with_outliers():
    rng = np.random.default_rng(2)
    H_gt = np.array([[0.9, 0.1, 10.0], [0.05, 1.05, -5.0], [1e-4, 5e-5, 1.0]])
    p0 = rng.uniform(0, 400, (500, 2))
    h = np.concatenate([p0, np.ones((500, 1))], -1) @ H_gt.T
    p1 = h[:, :2] / h[:, 2:]
    p1[:150] = rng.uniform(0, 400, (150, 2))  # 30% outliers
    res = estimate_homography_ransac(p0, p1, threshold_px=1.0, max_iters=500, rng=rng)
    assert res is not None
    assert res.inliers[150:].mean() > 0.98
    np.testing.assert_allclose(res.model / res.model[2, 2], H_gt, atol=1e-3)


def test_fundamental_ransac_epipolar_consistency():
    x0, x1, R, t = synthetic_pair(n=400, outlier_frac=0.25, noise=1e-4, seed=5)
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    k0 = x0 @ K[:2, :2].T + K[:2, 2]
    k1 = x1 @ K[:2, :2].T + K[:2, 2]
    res = estimate_fundamental_ransac(k0, k1, threshold_px=1.5, max_iters=800,
                                      rng=np.random.default_rng(0))
    assert res is not None
    assert res.inliers[100:].mean() > 0.95
    # E from F must match GT essential up to scale/sign
    E = K.T @ res.model @ K
    E_gt = essential_from_rt(R, t)
    E, E_gt = E / np.linalg.norm(E), E_gt / np.linalg.norm(E_gt)
    err = min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max())
    assert err < 5e-3


# ---------------------------------------------------------------------------
# 5-point / 7-point minimal solvers + MAGSAC scoring (round 2)
# ---------------------------------------------------------------------------

def test_five_point_exact_on_minimal_sample():
    from roma_tpu.estimation.fivepoint import essential_5pt

    x0, x1, R, t = synthetic_pair(n=64)
    # several minimal samples at once (batched path)
    idx = np.arange(30).reshape(6, 5)
    Es = essential_5pt(x0[idx], x1[idx])
    assert len(Es) >= 6  # at least one real root per sample
    E_gt = essential_from_rt(R, t)
    E_gt = E_gt / np.linalg.norm(E_gt)
    # every sample's best root matches GT
    best = min(
        min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max()) for E in Es
    )
    assert best < 1e-9
    # all returned models satisfy the essential constraints
    for E in Es:
        s = np.linalg.svd(E, compute_uv=False)
        assert s[2] < 1e-8 and abs(s[0] - s[1]) < 1e-8


def test_five_point_ransac_low_inlier_ratio():
    """25% inliers: 8-sample draws succeed with p~0.25^8=1.5e-5 per iter —
    the 5-point solver (p~1e-3) is what makes this regime work (why the
    reference uses cv2's 5-point, utils.py:39)."""
    x0, x1, R, t = synthetic_pair(n=800, outlier_frac=0.75, noise=1e-4, seed=7)
    # 0.25^5 ~ 1e-3 all-inlier probability per draw -> ~2 expected hits in
    # 2000 iters; the 8-point (0.25^8 ~ 1.5e-5) would need ~60k
    res = estimate_essential_ransac(
        x0, x1, threshold=1e-2, max_iters=2000, solver="5pt",
        rng=np.random.default_rng(0),
    )
    assert res is not None
    n_out = 600
    assert res.inliers[n_out:].mean() > 0.95
    R_hat, t_hat, _ = recover_pose(res.model, x0, x1, res.inliers)
    assert angle_error_mat(R_hat, R) < 0.5
    assert angle_error_vec(t_hat, t) < 2.0


def test_seven_point_exact_on_minimal_sample():
    from roma_tpu.estimation.fundamental import fundamental_7pt

    x0, x1, R, t = synthetic_pair(n=35)
    idx = np.arange(35).reshape(5, 7)
    Fs = fundamental_7pt(x0[idx], x1[idx])
    assert len(Fs) >= 5
    E_gt = essential_from_rt(R, t)  # K=I here, so F == E
    E_gt = E_gt / np.linalg.norm(E_gt)
    best = min(
        min(np.abs(F - E_gt).max(), np.abs(F + E_gt).max()) for F in Fs
    )
    assert best < 1e-8
    for F in Fs:  # rank-2 by construction
        assert np.linalg.svd(F, compute_uv=False)[2] < 1e-8


def test_estimate_pose_uncalibrated():
    from roma_tpu.estimation import estimate_pose_uncalibrated

    x0, x1, R, t = synthetic_pair(n=700, outlier_frac=0.3, noise=1e-4, seed=9)
    K = np.array([[700.0, 0, 350], [0, 700.0, 260], [0, 0, 1]])
    k0 = x0 @ K[:2, :2].T + K[:2, 2]
    k1 = x1 @ K[:2, :2].T + K[:2, 2]
    ret = estimate_pose_uncalibrated(
        k0, k1, K, K, norm_thresh=1.0, rng=np.random.default_rng(0)
    )
    assert ret is not None
    R_hat, t_hat, mask = ret
    assert mask[210:].mean() > 0.9
    assert angle_error_mat(R_hat, R) < 1.0
    assert angle_error_vec(t_hat[:, 0], t) < 3.0


def test_magsac_scoring_beats_msac_with_loose_threshold():
    """With a threshold 20x the noise, sigma-marginalized scoring should not
    do worse than plain MSAC on pose error (usually better)."""
    errs = {}
    for scoring in ("msac", "magsac"):
        e_sum = 0.0
        for seed in range(4):
            x0, x1, R, t = synthetic_pair(
                n=500, outlier_frac=0.4, noise=5e-4, seed=20 + seed
            )
            res = estimate_essential_ransac(
                x0, x1, threshold=1e-2, max_iters=300, solver="5pt",
                scoring=scoring, rng=np.random.default_rng(seed),
            )
            R_hat, t_hat, _ = recover_pose(res.model, x0, x1, res.inliers)
            e_sum += max(angle_error_mat(R_hat, R), angle_error_vec(t_hat, t))
        errs[scoring] = e_sum / 4
    assert errs["magsac"] < errs["msac"] * 1.5 + 0.1


def test_estimate_pose_matches_cv2():
    """Protocol cross-check against the reference's actual backend
    (cv2.findEssentialMat 5-point + recoverPose, utils/utils.py:31-52)."""
    cv2 = pytest.importorskip("cv2")

    for seed in range(3):
        x0, x1, R, t = synthetic_pair(
            n=600, outlier_frac=0.35, noise=2e-4, seed=40 + seed
        )
        K = np.array([[800.0, 0, 400], [0, 800.0, 300], [0, 0, 1]])
        k0 = x0 @ K[:2, :2].T + K[:2, 2]
        k1 = x1 @ K[:2, :2].T + K[:2, 2]

        ret = estimate_pose(k0, k1, K, K, norm_thresh=5e-3,
                            rng=np.random.default_rng(seed))
        assert ret is not None
        R_ours, t_ours, _ = ret

        E_cv, mask = cv2.findEssentialMat(
            x0, x1, np.eye(3), threshold=5e-3, prob=0.99999, method=cv2.RANSAC
        )
        _, R_cv, t_cv, _ = cv2.recoverPose(E_cv[:3], x0, x1, np.eye(3),
                                           mask=mask.copy())
        # ours within 1 degree of GT; cv2 (no LO) gets a looser bound —
        # at seed 42 cv2 lands at 1.46 degrees where ours is < 1
        assert angle_error_mat(R_ours, R) < 1.0
        assert angle_error_mat(R_cv, R) < 3.0
        assert angle_error_vec(t_ours[:, 0], t) < 2.0
