"""Native C++ robust estimator vs the numpy reference implementation."""

import numpy as np
import pytest

from roma_tpu.utils.geometry import angle_error_mat, angle_error_vec
from tests.test_estimation import essential_from_rt, synthetic_pair

native = pytest.importorskip("roma_tpu.estimation.native")


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load_library()
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native build unavailable: {e}")


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3, 0.5])
def test_native_essential_ransac(lib, outlier_frac):
    x0, x1, R, t = synthetic_pair(n=600, outlier_frac=outlier_frac, noise=1e-4)
    ret = native.estimate_essential_ransac_native(
        x0, x1, threshold=1e-2, max_iters=500, seed=1
    )
    assert ret is not None
    E, R_hat, t_hat, inl = ret
    n_out = int(outlier_frac * 600)
    assert inl[n_out:].mean() > 0.97
    if n_out:
        assert inl[:n_out].mean() < 0.1
    assert angle_error_mat(R_hat, R) < 0.5
    assert angle_error_vec(t_hat, t) < 2.5


def test_native_pose_backend_contract(lib):
    x0, x1, R, t = synthetic_pair(n=800, outlier_frac=0.2, noise=5e-5, seed=3)
    K = np.array([[800.0, 0, 400], [0, 800.0, 300], [0, 0, 1]])
    k0 = x0 @ K[:2, :2].T + K[:2, 2]
    k1 = x1 @ K[:2, :2].T + K[:2, 2]
    ret = native.estimate_pose_cpp(k0, k1, K, K, norm_thresh=0.01)
    assert ret is not None
    R_hat, t_hat, mask = ret
    assert t_hat.shape == (3, 1)
    assert angle_error_mat(R_hat, R) < 0.5
    assert angle_error_vec(t_hat[:, 0], t) < 1.0


def test_native_matches_numpy_inliers(lib):
    """Same scene: C++ and numpy backends must agree on the inlier set."""
    from roma_tpu.estimation import estimate_essential_ransac

    x0, x1, R, t = synthetic_pair(n=400, outlier_frac=0.25, noise=1e-4, seed=7)
    res_np = estimate_essential_ransac(
        x0, x1, threshold=1e-2, max_iters=300, rng=np.random.default_rng(0)
    )
    ret = native.estimate_essential_ransac_native(
        x0, x1, threshold=1e-2, max_iters=300, seed=0
    )
    E, R_hat, t_hat, inl_cpp = ret
    agreement = (res_np.inliers == inl_cpp).mean()
    assert agreement > 0.95, agreement


def test_native_degenerate_input(lib):
    rng = np.random.default_rng(0)
    # too few points (5 is a valid minimal sample for the 5-point solver)
    assert native.estimate_essential_ransac_native(
        rng.normal(size=(4, 2)), rng.normal(size=(4, 2)), 1e-2
    ) is None
    assert native.estimate_essential_ransac_native(
        rng.normal(size=(7, 2)), rng.normal(size=(7, 2)), 1e-2, solver="8pt"
    ) is None


def test_native_five_point_low_inlier_ratio(lib):
    """Native 5-point + MAGSAC at 25% inliers — the regime where the
    8-point minimal sample (p_all-inlier ~ 0.25^8) collapses."""
    x0, x1, R, t = synthetic_pair(n=800, outlier_frac=0.75, noise=1e-4, seed=7)
    ret = native.estimate_essential_ransac_native(
        x0, x1, 1e-2, max_iters=2000, solver="5pt", scoring="magsac"
    )
    assert ret is not None
    E, R_hat, t_hat, inl = ret
    assert inl[600:].mean() > 0.95
    assert angle_error_mat(R_hat, R) < 0.5
    assert angle_error_vec(t_hat, t) < 1.0


def test_native_five_point_matches_numpy_solver(lib):
    """Same scene, native vs numpy 5-point RANSAC: equivalent pose quality."""
    from roma_tpu.estimation import estimate_essential_ransac
    from roma_tpu.estimation.essential import recover_pose

    x0, x1, R, t = synthetic_pair(n=500, outlier_frac=0.4, noise=2e-4, seed=11)
    ret = native.estimate_essential_ransac_native(
        x0, x1, 5e-3, max_iters=1000, solver="5pt"
    )
    assert ret is not None
    _, R_n, _, _ = ret
    res = estimate_essential_ransac(x0, x1, 5e-3, max_iters=1000, solver="5pt")
    R_p, _, _ = recover_pose(res.model, x0, x1, res.inliers)
    assert angle_error_mat(R_n, R) < 0.5
    assert angle_error_mat(R_p, R) < 0.5
