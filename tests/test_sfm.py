"""SfM subsystem: synthetic multi-view scenes with exact ground truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.sfm.bundle_adjust import (
    BAProblem,
    ba_step,
    bundle_adjust,
    make_distributed_ba_step,
    project,
    rodrigues,
    triangulate_tracks,
)
from roma_tpu.sfm.metrics import absolute_trajectory_error, align_umeyama
from roma_tpu.sfm.pose_graph import (
    centers_to_translations,
    rotation_averaging,
    translation_averaging,
)
from roma_tpu.sfm.reconstruction import Reconstruction, _rvec_from_R, reconstruct
from roma_tpu.sfm.tracks import TrackBuilder
from roma_tpu.utils.geometry import angle_error_mat


# ---------------------------------------------------------------------------
# synthetic multi-view world
# ---------------------------------------------------------------------------

def make_world(n_cams=6, n_pts=300, seed=0, noise_px=0.0):
    rng = np.random.default_rng(seed)
    K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]], np.float32)
    X = rng.uniform([-3, -2, 6], [3, 2, 14], (n_pts, 3))
    cams = []
    for i in range(n_cams):
        a = np.deg2rad(4.0 * i)
        R = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]]
        )
        # curved trajectory — collinear centers are degenerate for
        # direction-based translation averaging
        c = np.array([0.5 * i, 0.4 * np.sin(1.1 * i), 0.25 * np.cos(0.9 * i) - 0.25])
        t = -R @ c
        cams.append((R, t))
    cam_idx, pt_idx, uv = [], [], []
    for ci, (R, t) in enumerate(cams):
        Xc = X @ R.T + t
        x = Xc @ K.T
        px = x[:, :2] / x[:, 2:]
        vis = (Xc[:, 2] > 0.1) & (px[:, 0] > 0) & (px[:, 0] < 640) & (px[:, 1] > 0) & (px[:, 1] < 480)
        for pi in np.flatnonzero(vis):
            cam_idx.append(ci)
            pt_idx.append(pi)
            uv.append(px[pi] + rng.normal(0, noise_px, 2))
    return {
        "K": K,
        "X": X,
        "cams": cams,
        "cam_idx": np.asarray(cam_idx, np.int32),
        "pt_idx": np.asarray(pt_idx, np.int32),
        "uv": np.asarray(uv, np.float32),
    }


def cams_to_param(cams):
    return np.stack(
        [np.concatenate([_rvec_from_R(R), t]) for R, t in cams]
    ).astype(np.float32)


def test_rodrigues_roundtrip(rng):
    for _ in range(10):
        v = rng.normal(0, 1, 3).astype(np.float32)
        R = np.asarray(rodrigues(jnp.asarray(v)))
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
        v2 = _rvec_from_R(R)
        np.testing.assert_allclose(v2, v, atol=1e-4)


def test_project_matches_numpy(rng):
    w = make_world(n_cams=2)
    R, t = w["cams"][1]
    cam = np.concatenate([_rvec_from_R(R), t]).astype(np.float32)
    X = w["X"][0].astype(np.float32)
    px = np.asarray(project(jnp.asarray(cam), jnp.asarray(w["K"]), jnp.asarray(X)))
    ref = w["K"] @ (R @ X + t)
    np.testing.assert_allclose(px, ref[:2] / ref[2], atol=1e-3)


def test_rotation_averaging_exact():
    w = make_world()
    edges = []
    for i in range(len(w["cams"]) - 1):
        Ri, _ = w["cams"][i]
        Rj, _ = w["cams"][i + 1]
        edges.append((i, i + 1, Rj @ Ri.T))
    edges.append((0, 3, w["cams"][3][0] @ w["cams"][0][0].T))
    Rs = rotation_averaging(len(w["cams"]), edges)
    for i, (R_gt, _) in enumerate(w["cams"]):
        # gauge: anchored to cam0; gt cam0 is identity already
        assert angle_error_mat(Rs[i], R_gt) < 1e-4


def test_translation_averaging_recovers_centers():
    w = make_world()
    n = len(w["cams"])
    Rs = np.stack([R for R, _ in w["cams"]])
    edges = []
    for i in range(n - 1):
        Ri, ti = w["cams"][i]
        Rj, tj = w["cams"][i + 1]
        R_ij = Rj @ Ri.T
        t_ij = tj - R_ij @ ti
        edges.append((i, i + 1, t_ij))
    # every edge must sit in a cycle: bridge-edge lengths are unobservable
    # from directions alone
    for i, j in [(0, 2), (1, 3), (2, 4), (3, 5)]:
        Ri, ti = w["cams"][i]
        Rj, tj = w["cams"][j]
        R_ij = Rj @ Ri.T
        edges.append((i, j, tj - R_ij @ ti))
    centers = translation_averaging(n, Rs, edges)
    gt_centers = np.stack([-R.T @ t for R, t in w["cams"]])
    res = absolute_trajectory_error(centers, gt_centers)
    assert res["ate_rmse"] < 1e-3, res


def test_ba_recovers_from_perturbation():
    w = make_world(noise_px=0.0)
    cams_gt = cams_to_param(w["cams"])
    rng = np.random.default_rng(1)
    cams0 = cams_gt + rng.normal(0, 0.01, cams_gt.shape).astype(np.float32)
    cams0[0] = cams_gt[0]  # gauge
    X0 = w["X"].astype(np.float32) + rng.normal(0, 0.05, w["X"].shape).astype(np.float32)
    prob = BAProblem(
        cameras=jnp.asarray(cams0),
        points=jnp.asarray(X0),
        intrinsics=jnp.asarray(np.tile(w["K"], (len(cams0), 1, 1))),
        cam_idx=jnp.asarray(w["cam_idx"]),
        pt_idx=jnp.asarray(w["pt_idx"]),
        uv=jnp.asarray(w["uv"]),
        mask=jnp.ones(len(w["uv"]), jnp.float32),
    )
    out, cost = bundle_adjust(prob, iters=15)
    assert cost < 1e-4, cost
    # camera centers match gt (up to the fixed gauge)
    est_centers = np.stack(
        [-np.asarray(rodrigues(c[:3])).T @ np.asarray(c[3:]) for c in np.asarray(out.cameras)]
    )
    gt_centers = np.stack([-R.T @ t for R, t in w["cams"]])
    ate = absolute_trajectory_error(est_centers, gt_centers, with_scale=False)
    assert ate["ate_rmse"] < 1e-3, ate


def test_distributed_ba_matches_single_device():
    w = make_world(n_cams=4, n_pts=100)
    cams0 = cams_to_param(w["cams"])
    rng = np.random.default_rng(2)
    cams0 = cams0 + rng.normal(0, 0.005, cams0.shape).astype(np.float32)
    X0 = w["X"].astype(np.float32) + rng.normal(0, 0.02, w["X"].shape).astype(np.float32)
    n_obs = len(w["uv"])
    pad = (-n_obs) % 8  # observation axis must divide the mesh

    def mk(pad_to_8: bool):
        return BAProblem(
            cameras=jnp.asarray(cams0),
            points=jnp.asarray(X0),
            intrinsics=jnp.asarray(np.tile(w["K"], (len(cams0), 1, 1))),
            cam_idx=jnp.asarray(np.pad(w["cam_idx"], (0, pad))),
            pt_idx=jnp.asarray(np.pad(w["pt_idx"], (0, pad))),
            uv=jnp.asarray(np.pad(w["uv"], ((0, pad), (0, 0)))),
            mask=jnp.asarray(np.pad(np.ones(n_obs, np.float32), (0, pad))),
        )

    lam = jnp.asarray(1e-3, jnp.float32)
    dc1, dp1, c1 = ba_step(mk(True), lam)

    from roma_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh(n_data=8)
    step = make_distributed_ba_step(mesh)
    prob = mk(True)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = NamedSharding(mesh, P())
    obs = NamedSharding(mesh, P("data"))
    prob = BAProblem(
        cameras=jax.device_put(prob.cameras, rep),
        points=jax.device_put(prob.points, rep),
        intrinsics=jax.device_put(prob.intrinsics, rep),
        cam_idx=jax.device_put(prob.cam_idx, obs),
        pt_idx=jax.device_put(prob.pt_idx, obs),
        uv=jax.device_put(prob.uv, obs),
        mask=jax.device_put(prob.mask, obs),
    )
    dc8, dp8, c8 = step(prob, lam)
    np.testing.assert_allclose(float(c1), float(c8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dc1), np.asarray(dc8), atol=1e-4)
    np.testing.assert_allclose(np.asarray(dp1), np.asarray(dp8), atol=1e-4)


def test_triangulate_tracks_exact():
    w = make_world()
    cams = cams_to_param(w["cams"])
    X = triangulate_tracks(
        cams, np.tile(w["K"], (len(cams), 1, 1)),
        w["cam_idx"], w["pt_idx"], w["uv"], len(w["X"]),
    )
    # only points observed >= 2 times triangulate
    counts = np.bincount(w["pt_idx"], minlength=len(w["X"]))
    sel = counts >= 2
    err = np.linalg.norm(X[sel] - w["X"][sel], axis=-1)
    assert np.median(err) < 1e-3


def test_track_builder_merges_pairs():
    tb = TrackBuilder(cell_px=2.0)
    # feature seen in images 0-1-2 at consistent positions
    tb.add_matches(0, 1, np.array([[10.0, 10.0]]), np.array([[50.0, 52.0]]))
    tb.add_matches(1, 2, np.array([[50.4, 52.2]]), np.array([[90.0, 91.0]]))
    tracks = tb.build(min_length=3)
    assert len(tracks) == 1
    assert set(tracks[0].obs) == {0, 1, 2}


def test_umeyama_alignment(rng):
    X = rng.normal(0, 1, (50, 3))
    R_gt = np.asarray(rodrigues(jnp.asarray([0.2, -0.1, 0.3])))
    Y = 2.5 * X @ R_gt.T + np.array([1.0, -2.0, 0.5])
    s, R, t = align_umeyama(X, Y)
    assert abs(s - 2.5) < 1e-6
    np.testing.assert_allclose(R, R_gt, atol=1e-6)
    ate = absolute_trajectory_error(X, Y)
    assert ate["ate_rmse"] < 1e-6


def test_reconstruct_end_to_end():
    """Full pipeline on synthetic matches: ATE must be tiny."""
    w = make_world(n_cams=5, n_pts=400, seed=4, noise_px=0.0)
    n = len(w["cams"])
    K = w["K"]
    matches = {}
    for i in range(n):
        for j in range(i + 1, min(i + 3, n)):
            Ri, ti = w["cams"][i]
            Rj, tj = w["cams"][j]
            Xi = w["X"] @ Ri.T + ti
            Xj = w["X"] @ Rj.T + tj
            pi = (Xi @ K.T)[:, :2] / (Xi @ K.T)[:, 2:]
            pj = (Xj @ K.T)[:, :2] / (Xj @ K.T)[:, 2:]
            vis = (
                (pi > 0).all(-1) & (pi < [640, 480]).all(-1)
                & (pj > 0).all(-1) & (pj < [640, 480]).all(-1)
            )
            matches[(i, j)] = (pi[vis].astype(np.float64), pj[vis].astype(np.float64))
    rec = reconstruct(
        matches, np.tile(K, (n, 1, 1)).astype(np.float32), n, ba_iters=15
    )
    gt_centers = np.stack([-R.T @ t for R, t in w["cams"]])
    ate = absolute_trajectory_error(rec.centers, gt_centers)
    assert ate["ate_rmse"] < 0.02, ate

def test_ba_device_driver_recovers_from_perturbation():
    """Fully-jitted device LM (f64 solve on device) matches the host-fp64
    driver's quality on the same perturbed problem."""
    from roma_tpu.sfm.bundle_adjust import bundle_adjust_device

    w = make_world(noise_px=0.0)
    cams_gt = cams_to_param(w["cams"])
    rng = np.random.default_rng(1)
    cams0 = cams_gt + rng.normal(0, 0.01, cams_gt.shape).astype(np.float32)
    cams0[0] = cams_gt[0]  # gauge
    X0 = w["X"].astype(np.float32) + rng.normal(0, 0.05, w["X"].shape).astype(
        np.float32
    )
    prob = BAProblem(
        cameras=jnp.asarray(cams0),
        points=jnp.asarray(X0),
        intrinsics=jnp.asarray(np.tile(w["K"], (len(cams0), 1, 1))),
        cam_idx=jnp.asarray(w["cam_idx"]),
        pt_idx=jnp.asarray(w["pt_idx"]),
        uv=jnp.asarray(w["uv"]),
        mask=jnp.ones(len(w["uv"]), jnp.float32),
    )
    out, cost = bundle_adjust_device(prob, iters=15)
    assert cost < 1e-4, cost
    est_centers = np.stack(
        [
            -np.asarray(rodrigues(c[:3])).T @ np.asarray(c[3:])
            for c in np.asarray(out.cameras)
        ]
    )
    gt_centers = np.stack([-R.T @ t for R, t in w["cams"]])
    ate = absolute_trajectory_error(est_centers, gt_centers, with_scale=False)
    assert ate["ate_rmse"] < 1e-3, ate


def test_ba_cg_solver_matches_dense_quality():
    """The matrix-free CG solver (block-Jacobi(S)-preconditioned f32 CG +
    f64 iterative refinement) reaches the dense f64 Schur path's quality on
    the same perturbed problem — the at-scale path must not trade accuracy."""
    from roma_tpu.sfm.bundle_adjust import bundle_adjust_device

    w = make_world(noise_px=0.0)
    cams_gt = cams_to_param(w["cams"])
    rng = np.random.default_rng(1)
    cams0 = cams_gt + rng.normal(0, 0.01, cams_gt.shape).astype(np.float32)
    cams0[0] = cams_gt[0]
    X0 = w["X"].astype(np.float32) + rng.normal(0, 0.05, w["X"].shape).astype(
        np.float32
    )
    prob = BAProblem(
        cameras=jnp.asarray(cams0),
        points=jnp.asarray(X0),
        intrinsics=jnp.asarray(np.tile(w["K"], (len(cams0), 1, 1))),
        cam_idx=jnp.asarray(w["cam_idx"]),
        pt_idx=jnp.asarray(w["pt_idx"]),
        uv=jnp.asarray(w["uv"]),
        mask=jnp.ones(len(w["uv"]), jnp.float32),
    )
    out, cost = bundle_adjust_device(prob, iters=15, solver="cg")
    assert cost < 1e-4, cost
    est_centers = np.stack(
        [
            -np.asarray(rodrigues(c[:3])).T @ np.asarray(c[3:])
            for c in np.asarray(out.cameras)
        ]
    )
    gt_centers = np.stack([-R.T @ t for R, t in w["cams"]])
    ate = absolute_trajectory_error(est_centers, gt_centers, with_scale=False)
    assert ate["ate_rmse"] < 1e-3, ate


@pytest.mark.slow
def test_ba_cg_sharded_matches_replicated():
    """CG path, larger world: 8-way sharded (observations AND point blocks
    constrained to the mesh) == 1-way, at a scale with real point fan-out."""
    from roma_tpu.parallel.mesh import make_mesh
    from roma_tpu.sfm.bundle_adjust import bundle_adjust_device

    w = make_world(n_cams=16, n_pts=1500, noise_px=0.5)
    cams0 = cams_to_param(w["cams"])
    rng = np.random.default_rng(3)
    cams0 = cams0 + rng.normal(0, 0.005, cams0.shape).astype(np.float32)
    X0 = w["X"].astype(np.float32) + rng.normal(0, 0.02, w["X"].shape).astype(
        np.float32
    )
    n_obs = len(w["uv"])
    pad = (-n_obs) % 8
    prob = BAProblem(
        cameras=jnp.asarray(cams0),
        points=jnp.asarray(X0),
        intrinsics=jnp.asarray(np.tile(w["K"], (len(cams0), 1, 1))),
        cam_idx=jnp.asarray(np.pad(w["cam_idx"], (0, pad))),
        pt_idx=jnp.asarray(np.pad(w["pt_idx"], (0, pad))),
        uv=jnp.asarray(np.pad(w["uv"], ((0, pad), (0, 0)))),
        mask=jnp.asarray(np.pad(np.ones(n_obs, np.float32), (0, pad))),
    )
    _, cost1 = bundle_adjust_device(prob, iters=6, solver="cg")
    _, cost8 = bundle_adjust_device(
        prob, iters=6, solver="cg", mesh=make_mesh(n_data=8)
    )
    np.testing.assert_allclose(cost1, cost8, rtol=1e-3)


def test_ba_device_driver_sharded_matches_replicated():
    """The same jitted LM loop with the observation axis sharded 8-way gives
    the same final cost (collectives preserve the math)."""
    from roma_tpu.parallel.mesh import make_mesh
    from roma_tpu.sfm.bundle_adjust import bundle_adjust_device

    w = make_world(n_cams=4, n_pts=100, noise_px=0.5)
    cams0 = cams_to_param(w["cams"])
    rng = np.random.default_rng(2)
    cams0 = cams0 + rng.normal(0, 0.005, cams0.shape).astype(np.float32)
    X0 = w["X"].astype(np.float32) + rng.normal(0, 0.02, w["X"].shape).astype(
        np.float32
    )
    n_obs = len(w["uv"])
    pad = (-n_obs) % 8
    prob = BAProblem(
        cameras=jnp.asarray(cams0),
        points=jnp.asarray(X0),
        intrinsics=jnp.asarray(np.tile(w["K"], (len(cams0), 1, 1))),
        cam_idx=jnp.asarray(np.pad(w["cam_idx"], (0, pad))),
        pt_idx=jnp.asarray(np.pad(w["pt_idx"], (0, pad))),
        uv=jnp.asarray(np.pad(w["uv"], ((0, pad), (0, 0)))),
        mask=jnp.asarray(np.pad(np.ones(n_obs, np.float32), (0, pad))),
    )
    _, cost1 = bundle_adjust_device(prob, iters=8)
    _, cost8 = bundle_adjust_device(prob, iters=8, mesh=make_mesh(n_data=8))
    np.testing.assert_allclose(cost1, cost8, rtol=1e-3)


def test_ba_device_chunked_launches_match_single():
    """iters_per_launch (bounded device launches with full carry hand-off)
    is bit-identical to the single-scan run — including across a refilter
    boundary (the traced global-iteration offset keeps the cadence)."""
    from roma_tpu.sfm.bundle_adjust import bundle_adjust_device

    w = make_world(noise_px=0.5)
    cams_gt = cams_to_param(w["cams"])
    rng = np.random.default_rng(5)
    cams0 = cams_gt + rng.normal(0, 0.01, cams_gt.shape).astype(np.float32)
    cams0[0] = cams_gt[0]
    X0 = w["X"].astype(np.float32) + rng.normal(0, 0.05, w["X"].shape).astype(
        np.float32
    )
    prob = BAProblem(
        cameras=jnp.asarray(cams0),
        points=jnp.asarray(X0),
        intrinsics=jnp.asarray(np.tile(w["K"], (len(cams0), 1, 1))),
        cam_idx=jnp.asarray(w["cam_idx"]),
        pt_idx=jnp.asarray(w["pt_idx"]),
        uv=jnp.asarray(w["uv"]),
        mask=jnp.ones(len(w["uv"]), jnp.float32),
    )
    kw = dict(iters=9, solver="cg", max_err_px=20.0, refilter_every=4)
    out1, cost1 = bundle_adjust_device(prob, **kw)
    out2, cost2 = bundle_adjust_device(prob, **kw, iters_per_launch=4)
    np.testing.assert_allclose(cost2, cost1, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out2.cameras), np.asarray(out1.cameras), atol=1e-6
    )
