"""Train -> eval loop closure (VERDICT r2 #4): TinyRoma TRAINED on a
synthetic textured two-plane world must drive the real Mega-1500 harness
(match -> balanced sampling -> RANSAC -> AUC) to AUC@5 > 0.5 — the one link
no other test covers: learned weights all the way to the headline metric.

The world: two fronto-ish planes (z=4 for x_world<0, z=6 for x_world>=0)
carrying smooth random textures, viewed by a ring of slightly rotating /
translating cameras. Images are RENDERED by ray-plane intersection +
bilinear texture lookup; depth maps are the analytic z_cam of the same
intersections, so the training GT (depth+pose warp, get_gt_warp) and the
eval GT (relative poses in the scene npz) are the same geometry the pixels
actually show. Two planes keep E-estimation non-degenerate
(tests/test_benchmarks.py two_plane rationale).
"""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from roma_tpu.config import TinyRomaConfig, TrainConfig
from roma_tpu.losses.robust_loss import RobustLossConfig, tiny_robust_loss
from roma_tpu.models.tiny_roma import TinyRoma, TinyRomaMatcher
from roma_tpu.train.train import make_tiny_train_state, make_train_step

H, W = 96, 128
FX = 130.0
Z_NEAR, Z_FAR = 4.0, 6.0
N_CAMS = 5


def _smooth_texture(rng, n=384):
    t = rng.uniform(0, 1, (n, n, 3)).astype(np.float32)
    for _ in range(2):
        for ax in (0, 1):
            t = 0.5 * t + 0.25 * (np.roll(t, 1, ax) + np.roll(t, -1, ax))
    # renormalize contrast
    t = (t - t.min()) / (t.max() - t.min())
    return t


def _pose(i):
    a = np.deg2rad(2.0 * i)
    R = np.array(
        [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
        np.float64,
    )
    t = np.array([0.25 * i, 0.02 * i, 0.0])
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def _sample_tex(tex, u, v):
    n = tex.shape[0]
    u = np.clip(u, 0, n - 1.001)
    v = np.clip(v, 0, n - 1.001)
    u0, v0 = np.floor(u).astype(int), np.floor(v).astype(int)
    fu, fv = (u - u0)[..., None], (v - v0)[..., None]
    return (
        tex[v0, u0] * (1 - fu) * (1 - fv)
        + tex[v0, u0 + 1] * fu * (1 - fv)
        + tex[v0 + 1, u0] * (1 - fu) * fv
        + tex[v0 + 1, u0 + 1] * fu * fv
    )


def _render(T, K, tex_near, tex_far):
    """Render image + depth for world: z=Z_NEAR where x<0, z=Z_FAR else."""
    R, t = T[:3, :3], T[:3, 3]
    c = -R.T @ t
    u, v = np.meshgrid(np.arange(W) + 0.5, np.arange(H) + 0.5, indexing="xy")
    rays_cam = np.stack(
        [(u - K[0, 2]) / K[0, 0], (v - K[1, 2]) / K[1, 1], np.ones_like(u)], -1
    )
    d_world = rays_cam @ R  # R^T applied row-wise
    img = np.zeros((H, W, 3), np.float32)
    depth = np.zeros((H, W), np.float32)
    X_near = c + d_world * ((Z_NEAR - c[2]) / d_world[..., 2])[..., None]
    X_far = c + d_world * ((Z_FAR - c[2]) / d_world[..., 2])[..., None]
    use_near = X_near[..., 0] < 0
    X = np.where(use_near[..., None], X_near, X_far)
    # texture coords: world (x, y) in [-S, S] -> [0, n)
    S = 4.0
    for sel, tex in ((use_near, tex_near), (~use_near, tex_far)):
        n = tex.shape[0]
        uu = (X[..., 0] + S) / (2 * S) * (n - 1)
        vv = (X[..., 1] + S) / (2 * S) * (n - 1)
        img[sel] = _sample_tex(tex, uu[sel], vv[sel])
    depth = (X @ R.T + t)[..., 2].astype(np.float32)
    return img, depth


@pytest.fixture(scope="module")
def rendered_world(tmp_path_factory):
    rng = np.random.default_rng(3)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    tex_near, tex_far = _smooth_texture(rng), _smooth_texture(rng)
    imgs, depths, poses = [], [], []
    for i in range(N_CAMS):
        T = _pose(i)
        img, depth = _render(T, K, tex_near, tex_far)
        imgs.append(img)
        depths.append(depth)
        poses.append(T)
    root = tmp_path_factory.mktemp("trained_world")
    os.makedirs(root / "images", exist_ok=True)
    im_paths = []
    for i, img in enumerate(imgs):
        p = f"images/r_{i}.png"
        Image.fromarray((img * 255).astype(np.uint8)).save(root / p)
        im_paths.append(p)
    pairs = [(i, i + 1) for i in range(N_CAMS - 1)]
    np.savez(
        root / "scene.npz",
        pair_infos=np.array([[p, 0.5] for p in pairs], dtype=object),
        intrinsics=np.array([K] * N_CAMS),
        poses=np.array(poses),
        image_paths=np.array(im_paths),
    )
    return {
        "root": root, "imgs": imgs, "depths": depths, "poses": poses, "K": K,
    }


def _train_batches(world):
    """All consecutive pairs, both directions, as one batch dict."""
    ims_a, ims_b, dep_a, dep_b, Ts = [], [], [], [], []
    for i in range(N_CAMS - 1):
        for a, b in ((i, i + 1), (i + 1, i)):
            ims_a.append(world["imgs"][a])
            ims_b.append(world["imgs"][b])
            dep_a.append(world["depths"][a])
            dep_b.append(world["depths"][b])
            Ts.append(world["poses"][b] @ np.linalg.inv(world["poses"][a]))
    K = np.tile(world["K"][None], (len(ims_a), 1, 1)).astype(np.float32)
    return {
        "im_A": jnp.asarray(np.stack(ims_a)),
        "im_B": jnp.asarray(np.stack(ims_b)),
        "im_A_depth": jnp.asarray(np.stack(dep_a)),
        "im_B_depth": jnp.asarray(np.stack(dep_b)),
        "T_1to2": jnp.asarray(np.stack(Ts).astype(np.float32)),
        "K1": jnp.asarray(K),
        "K2": jnp.asarray(K),
    }


@pytest.mark.slow
def test_trained_tiny_reaches_auc_through_mega_harness(rendered_world):
    from roma_tpu.benchmarks.megadepth_pose import (
        MegaDepthPoseEstimationBenchmark,
    )

    cfg = TinyRomaConfig(match_dim=64, fine_match_dim=32, dtype="float32")
    model = TinyRoma(cfg)
    # decay LR 5x after ~400 steps: the high overfit LR that reaches a good
    # warp fast starts oscillating past that point (AUC@5 measured 0.49 at
    # 400 steps but 0.17 at 800 without decay)
    tcfg = TrainConfig(
        batch_size=8, lr_decoder=1e-3, grad_clip=1.0,
        steps=8 * 600, milestone_frac=0.67,
    )
    state = make_tiny_train_state(
        jax.random.PRNGKey(0), tcfg, hw=(H, W), model=model, trainable="all"
    )
    loss_cfg = RobustLossConfig(
        ce_weight=0.01, alpha={4: 0.15, 8: 0.15}, c=1e-4,
        local_dist={4: 4}, epe_mask_prob_th=0.001, corr_volume_weight=1.0,
    )
    step = make_train_step(tiny_robust_loss, loss_cfg)
    batch = _train_batches(rendered_world)

    def bench_auc(st):
        matcher = TinyRomaMatcher(
            {"params": st.params, "batch_stats": st.batch_stats}, cfg
        )
        bench = MegaDepthPoseEstimationBenchmark(
            data_root=str(rendered_world["root"]), scene_names=["scene.npz"],
            num_ransac_runs=3, sample_num=2500,
        )
        return bench.benchmark(matcher)

    auc_init = bench_auc(state)
    losses = []
    for _ in range(600):
        state, metrics = step(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert float(np.median(losses[-20:])) < 0.85 * float(
        np.median(losses[:20])
    ), (losses[:5], losses[-5:])

    auc = bench_auc(state)
    # learned weights -> dense warp -> balanced sampling -> RANSAC -> AUC:
    # the full headline pipeline must report genuinely good pose accuracy
    # for the trained model and near-zero for the untrained one
    assert auc["auc_5"] > 0.5, (auc_init, auc)
    assert auc["auc_5"] > auc_init["auc_5"] + 0.3, (auc_init, auc)
