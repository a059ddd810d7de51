"""Geometry foundation tests: synthetic pinhole scenes with exact answers."""

import numpy as np
import torch

import jax.numpy as jnp

from roma_tpu.utils.geometry import (
    cls_to_flow,
    cls_to_flow_refine,
    compute_pose_error,
    compute_relative_pose,
    get_grid,
    get_gt_warp,
    normalized_to_pixel,
    pixel_to_normalized,
    pose_auc,
    warp_kpts,
)


def test_grid_centers():
    g = np.asarray(get_grid(1, 4, 8))
    assert g.shape == (1, 4, 8, 2)
    np.testing.assert_allclose(g[0, 0, 0], [-1 + 1 / 8, -1 + 1 / 4], atol=1e-6)
    np.testing.assert_allclose(g[0, -1, -1], [1 - 1 / 8, 1 - 1 / 4], atol=1e-6)
    # x varies along W, y along H
    assert np.allclose(g[0, 0, :, 1], g[0, 0, 0, 1])
    assert np.allclose(g[0, :, 0, 0], g[0, 0, 0, 0])


def test_pixel_roundtrip(rng):
    c = rng.uniform(-1, 1, (5, 2)).astype(np.float32)
    px = normalized_to_pixel(jnp.asarray(c), 480, 640)
    back = pixel_to_normalized(px, 480, 640)
    np.testing.assert_allclose(np.asarray(back), c, atol=1e-6)
    # center convention: -1+1/W -> 0.5 px
    edge = normalized_to_pixel(jnp.asarray([[-1 + 1 / 640, -1 + 1 / 480]]), 480, 640)
    np.testing.assert_allclose(np.asarray(edge), [[0.5, 0.5]], atol=1e-4)


def _fronto_parallel_scene(B=1, H=24, W=32, depth_val=2.0, tx=0.25):
    """Constant-depth plane viewed by two cameras translated along x.

    With depth d and pure translation (tx, 0, 0), the warp in pixels is
    x2 = x1 + fx * tx / d — an exact closed form to check against.
    """
    fx = fy = 50.0
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], np.float64)
    depth = np.full((B, H, W), depth_val, np.float64)
    T = np.eye(4)
    T[0, 3] = -tx  # cam2 at +tx means points shift by -tx in cam2 coords
    return K, depth, T, fx * (-tx) / depth_val


def test_warp_kpts_translation_exact():
    K, depth, T, dx_px = _fronto_parallel_scene()
    B, H, W = depth.shape
    grid = np.asarray(get_grid(B, H, W)).reshape(B, -1, 2)
    valid, warped = warp_kpts(
        jnp.asarray(grid), jnp.asarray(depth, jnp.float32), jnp.asarray(depth, jnp.float32),
        jnp.asarray(T[None], jnp.float32), jnp.asarray(K[None], jnp.float32),
        jnp.asarray(K[None], jnp.float32),
    )
    valid, warped = np.asarray(valid), np.asarray(warped)
    src_px = np.asarray(normalized_to_pixel(jnp.asarray(grid), H, W))
    dst_px = np.asarray(normalized_to_pixel(jnp.asarray(warped), H, W))
    # in-bounds warps should be exactly a dx_px shift
    sel = valid[0]
    assert sel.sum() > 100
    # tolerance: the projection divide carries a +1e-4 depth epsilon
    # (reference utils.py:423-425), worth ~2e-3 px at these intrinsics
    np.testing.assert_allclose(
        dst_px[0, sel, 0] - src_px[0, sel, 0], dx_px, atol=2e-3
    )
    np.testing.assert_allclose(dst_px[0, sel, 1], src_px[0, sel, 1], atol=2e-3)


def test_warp_kpts_masks_depth_inconsistency():
    K, depth, T, _ = _fronto_parallel_scene()
    B, H, W = depth.shape
    bad_depth2 = depth * 2.0  # violates 5% relative-depth consistency
    grid = np.asarray(get_grid(B, H, W)).reshape(B, -1, 2)
    valid, _ = warp_kpts(
        jnp.asarray(grid), jnp.asarray(depth, jnp.float32), jnp.asarray(bad_depth2, jnp.float32),
        jnp.asarray(T[None], jnp.float32), jnp.asarray(K[None], jnp.float32),
        jnp.asarray(K[None], jnp.float32),
    )
    assert not np.asarray(valid).any()


def test_get_gt_warp_shapes():
    K, depth, T, _ = _fronto_parallel_scene()
    B, H, W = depth.shape
    x2, prob = get_gt_warp(
        jnp.asarray(depth, jnp.float32), jnp.asarray(depth, jnp.float32),
        jnp.asarray(T[None], jnp.float32), jnp.asarray(K[None], jnp.float32),
        jnp.asarray(K[None], jnp.float32), H=12, W=16,
    )
    assert x2.shape == (B, 12, 16, 2) and prob.shape == (B, 12, 16)
    assert 0.3 < float(prob.mean()) <= 1.0


def test_cls_to_flow_refine_vs_torch_logic(rng):
    """Independent torch oracle implementing the published decoding rule."""
    B, H, W, res = 2, 3, 4, 8
    C = res * res
    cls = rng.standard_normal((B, H, W, C), dtype=np.float32)

    t = torch.from_numpy(np.moveaxis(cls, -1, 1).copy())
    G = torch.meshgrid(
        *[torch.linspace(-1 + 1 / res, 1 - 1 / res, res) for _ in range(2)],
        indexing="ij",
    )
    G = torch.stack([G[1], G[0]], dim=-1).reshape(C, 2)
    p = t.softmax(dim=1)
    mode = p.max(dim=1).indices
    index = torch.stack(
        (mode - 1, mode, mode + 1, mode - res, mode + res), dim=1
    ).clamp(0, C - 1).long()
    neighbours = torch.gather(p, dim=1, index=index)[..., None]
    flow = sum(neighbours[:, i] * G[index[:, i]] for i in range(5))
    flow = flow / neighbours.sum(dim=1)

    ours = np.asarray(cls_to_flow_refine(jnp.asarray(cls)))
    np.testing.assert_allclose(ours, flow.numpy(), atol=1e-5)


def test_cls_to_flow_argmax(rng):
    res = 4
    cls = rng.standard_normal((1, 2, 2, 16), dtype=np.float32)
    flow = np.asarray(cls_to_flow(jnp.asarray(cls)))
    idx = cls.argmax(-1)
    lin = np.linspace(-1 + 1 / res, 1 - 1 / res, res)
    np.testing.assert_allclose(flow[..., 0], lin[idx % res], atol=1e-6)
    np.testing.assert_allclose(flow[..., 1], lin[idx // res], atol=1e-6)


def test_relative_pose_and_errors():
    # cam1 at origin; cam2 rotated 10deg about y and translated
    th = np.deg2rad(10)
    R2 = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
    )
    t2 = np.array([0.5, 0.0, 0.1])
    R, t = compute_relative_pose(np.eye(3), np.zeros(3), R2, t2)
    np.testing.assert_allclose(R, R2, atol=1e-12)
    T = np.concatenate([R, t[:, None]], axis=1)
    e_t, e_R = compute_pose_error(T, R, t)
    assert e_t < 1e-6 and e_R < 1e-6
    e_t2, e_R2 = compute_pose_error(T, np.eye(3), t)
    assert abs(e_R2 - 10) < 1e-6


def test_pose_auc_known_values():
    # all errors at exactly 0: AUC = 1 at any threshold
    assert np.allclose(pose_auc([0.0, 0.0], [5, 10]), [1.0, 1.0])
    # single error at threshold edge
    aucs = pose_auc([5.0], [5, 10])
    assert aucs[0] < 0.01
    # uniform errors: recall ramps linearly -> AUC ~ 0.5 at max threshold
    errs = np.linspace(0.01, 10, 1000)
    auc = pose_auc(errs, [10])[0]
    assert abs(auc - 0.5) < 0.01


def test_epipolar_distance_helpers(rng):
    from roma_tpu.utils.geometry import (
        signed_left_to_right_epipolar_distance,
        signed_point_line_distance,
    )

    # point on the line x = y (line [1, -1, 0]) has distance 0
    pts = jnp.array([[[1.0, 1.0], [0.0, 1.0]]])
    lines = jnp.array([[[1.0, -1.0, 0.0], [1.0, -1.0, 0.0]]])
    d = np.asarray(signed_point_line_distance(pts, lines))
    np.testing.assert_allclose(d[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(abs(d[0, 1]), 1 / np.sqrt(2), atol=1e-6)

    # perfect correspondences under a known F have zero epipolar distance
    F = jnp.array([[[0.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]]])
    # F = [t]_x for pure horizontal translation: y1 == y2 satisfies x2^T F x1 = 0
    pts1 = jnp.asarray(rng.uniform(-1, 1, (1, 20, 2)).astype(np.float32))
    pts2 = pts1.at[..., 0].add(
        jnp.asarray(rng.uniform(-0.5, 0.5, (1, 20)).astype(np.float32))
    )
    d = np.asarray(signed_left_to_right_epipolar_distance(pts1, pts2, F))
    np.testing.assert_allclose(d, 0.0, atol=1e-5)
