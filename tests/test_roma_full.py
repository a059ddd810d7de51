"""Full RoMa: component numerics + end-to-end two-pass matcher contract."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from roma_tpu.models.gp import GP, cos_kernel, spd_solve
from roma_tpu.models.matcher import RomaMatcher, RomaModel
from roma_tpu.models.zoo import debug_roma_config


def test_cos_kernel_matches_reference_formula(rng):
    x = rng.standard_normal((2, 6, 8)).astype(np.float32)
    y = rng.standard_normal((2, 5, 8)).astype(np.float32)
    K = np.asarray(cos_kernel(jnp.asarray(x), jnp.asarray(y), T=0.2))
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    c = torch.einsum("bnd,bmd->bnm", tx, ty) / (
        tx.norm(dim=-1)[..., None] * ty.norm(dim=-1)[:, None] + 1e-6
    )
    ref = ((c - 1.0) / 0.2).exp().numpy()
    np.testing.assert_allclose(K, ref, atol=1e-5)
    # kernel of x with itself has unit diagonal
    Kxx = np.asarray(cos_kernel(jnp.asarray(x), jnp.asarray(x), T=0.2))
    np.testing.assert_allclose(np.diagonal(Kxx, axis1=1, axis2=2), 1.0, atol=1e-4)


def test_spd_solve_matches_inverse(rng):
    """Cholesky solve == the reference's explicit inverse path
    (matcher.py:259-263) on an SPD system."""
    n, d = 40, 6
    A = rng.standard_normal((2, n, n)).astype(np.float32)
    A = A @ np.swapaxes(A, -1, -2) / n + 0.1 * np.eye(n, dtype=np.float32)
    b = rng.standard_normal((2, n, d)).astype(np.float32)
    ours = np.asarray(spd_solve(jnp.asarray(A), jnp.asarray(b)))
    ref = np.linalg.inv(A.astype(np.float64)) @ b.astype(np.float64)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_gp_posterior_interpolates_coordinates(rng):
    """With identical feature maps, K_xy == K_yy, so the posterior mean is
    K_yy (K_yy + sigma I)^-1 f — a smoothed version of the coordinate
    embedding f: highly correlated with f, not equal."""
    gp = GP(gp_dim=16)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 12)).astype(np.float32))
    params = gp.init(jax.random.PRNGKey(0), x, x)
    mu = gp.apply(params, x, x)
    assert mu.shape == (1, 6, 6, 16)
    assert np.isfinite(np.asarray(mu)).all()
    # smoothing shrinks magnitude: |mu| <= |f| (f = cos(...) bounded by 1)
    assert float(jnp.abs(mu).max()) <= 1.0 + 1e-4


@pytest.fixture(scope="module")
def debug_matcher():
    return RomaMatcher.init(jax.random.PRNGKey(0), debug_roma_config())


def test_roma_forward_scales_and_shapes(debug_matcher):
    model = debug_matcher.model
    x = jnp.zeros((1, 112, 112, 3))
    out = model.apply(debug_matcher.params, x, x, symmetric=True, train=False)
    assert set(out.keys()) == {16, 8, 4, 2, 1}
    assert out[16]["flow"].shape == (2, 8, 8, 2)       # 112/14
    assert out[8]["flow"].shape == (2, 14, 14, 2)      # 112/8
    assert out[1]["flow"].shape == (2, 112, 112, 2)


def test_roma_upsample_pass_shapes(debug_matcher):
    model = debug_matcher.model
    x1 = jnp.zeros((1, 112, 112, 3))
    out1 = model.apply(debug_matcher.params, x1, x1, symmetric=True, train=False)
    x2 = jnp.zeros((1, 224, 224, 3))
    out2 = model.apply(
        debug_matcher.params, x2, x2, symmetric=True, upsample=True,
        flow=out1[1]["flow"], certainty=out1[1]["certainty"],
        scale_factor=2.0, train=False,
    )
    assert set(out2.keys()) == {8, 4, 2, 1}
    assert out2[1]["flow"].shape == (2, 224, 224, 2)


def test_roma_match_end_to_end(debug_matcher, rng):
    im_a = jnp.asarray(rng.uniform(0, 1, (140, 180, 3)).astype(np.float32))
    im_b = jnp.asarray(rng.uniform(0, 1, (140, 180, 3)).astype(np.float32))
    warp, cert = debug_matcher.match(im_a, im_b)
    hs, ws = debug_matcher.cfg.upsample_resolution
    assert warp.shape == (hs, 2 * ws, 4)   # symmetric side-by-side
    assert cert.shape == (hs, 2 * ws)
    assert float(cert.min()) >= 0 and float(cert.max()) <= 1
    assert np.isfinite(np.asarray(warp)).all()
    m, c = debug_matcher.sample(warp, cert, num=500)
    assert m.shape == (500, 4)


def test_roma_match_prepped_matches_pil_match(debug_matcher, rng):
    """The batched-eval fast path (host_prep_np -> match_prepped, used by the
    harness at batch_size > 1) must reproduce the serial PIL `match` path."""
    from PIL import Image

    ims = [
        Image.fromarray(
            rng.uniform(0, 255, (150, 190, 3)).astype(np.uint8)
        )
        for _ in range(4)
    ]
    w0, c0 = debug_matcher.match(ims[0], ims[1])
    w1, c1 = debug_matcher.match(ims[2], ims[3])

    cfg = debug_matcher.cfg
    hc, wc = cfg.coarse_resolution
    hu, wu = cfg.upsample_resolution
    a = np.stack([debug_matcher.host_prep_np(ims[i], hc, wc) for i in (0, 2)])
    b = np.stack([debug_matcher.host_prep_np(ims[i], hc, wc) for i in (1, 3)])
    a2 = np.stack([debug_matcher.host_prep_np(ims[i], hu, wu) for i in (0, 2)])
    b2 = np.stack([debug_matcher.host_prep_np(ims[i], hu, wu) for i in (1, 3)])
    warps, certs = debug_matcher.match_prepped(a, b, a2, b2)
    assert warps.shape[0] == 2
    np.testing.assert_allclose(np.asarray(warps[0]), np.asarray(w0), atol=2e-2)
    np.testing.assert_allclose(np.asarray(warps[1]), np.asarray(w1), atol=2e-2)
    np.testing.assert_allclose(np.asarray(certs[0]), np.asarray(c0), atol=2e-2)

    # uint8 shipping (host_resize_np + on-device normalize) == f32 shipping
    au = np.stack([debug_matcher.host_resize_np(ims[i], hc, wc) for i in (0, 2)])
    bu = np.stack([debug_matcher.host_resize_np(ims[i], hc, wc) for i in (1, 3)])
    au2 = np.stack([debug_matcher.host_resize_np(ims[i], hu, wu) for i in (0, 2)])
    bu2 = np.stack([debug_matcher.host_resize_np(ims[i], hu, wu) for i in (1, 3)])
    warps_u, certs_u = debug_matcher.match_prepped(au, bu, au2, bu2)
    np.testing.assert_allclose(
        np.asarray(warps_u), np.asarray(warps), atol=1e-5
    )

    # vmapped sampling agrees with per-pair sampling at identical keys
    keys = [jax.random.PRNGKey(7), jax.random.PRNGKey(8)]
    mb, _cb = debug_matcher.sample_batched(warps, certs, 200, keys)
    m0, _ = debug_matcher.sample(warps[0], certs[0], 200, key=keys[0])
    np.testing.assert_allclose(np.asarray(mb[0]), np.asarray(m0), atol=1e-6)


def test_roma_train_corresps_carry_training_keys(debug_matcher):
    x = jnp.zeros((1, 112, 112, 3))
    out, _ = debug_matcher.model.apply(
        debug_matcher.params, x, x, symmetric=False, train=True,
        mutable=["batch_stats"],
    )
    assert "gm_cls" in out[16] and "gm_certainty" in out[16]
    assert "delta_flow" in out[8] and "flow_pre_delta" in out[8]
    assert out[16]["gm_cls"].shape[-1] == 64 * 64


def test_dinov2_frozen_in_graph(debug_matcher):
    """Encoder ViT output is stop-gradient'ed: loss grads w.r.t. dinov2
    params must be exactly zero."""
    model = debug_matcher.model
    x = jnp.ones((1, 112, 112, 3)) * 0.5

    def loss(params):
        out = model.apply(
            {"params": params, "batch_stats": debug_matcher.params["batch_stats"]},
            x, x, symmetric=False, train=False,
        )
        return jnp.sum(out[1]["flow"] ** 2) + jnp.sum(out[16]["flow"] ** 2)

    grads = jax.grad(loss)(debug_matcher.params["params"])
    g_dino = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()),
        grads["encoder"]["dinov2"], 0.0,
    )
    assert g_dino == 0.0


def test_resnet50_pyramid_shapes_and_early_exit(rng):
    from roma_tpu.models.resnet import ResNet50

    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    net = ResNet50(dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(variables, x)
    assert set(feats) == {1, 2, 4, 8, 16, 32}
    for scale, ch in [(2, 64), (4, 256), (8, 512), (16, 1024), (32, 2048)]:
        f = feats[scale]
        assert f.shape[1:3] == (64 // scale, 64 // scale), (scale, f.shape)
        assert f.shape[-1] == ch, (scale, f.shape)

    early = ResNet50(early_exit=True, dtype=jnp.float32)
    variables = early.init(jax.random.PRNGKey(0), x)
    feats = early.apply(variables, x)
    assert set(feats) == {1, 2, 4, 8}

    # replace-stride-with-dilation keeps spatial size from that stage on
    dil = ResNet50(dilation=(False, True, True), dtype=jnp.float32)
    variables = dil.init(jax.random.PRNGKey(0), x)
    feats = dil.apply(variables, x)
    assert feats[16].shape[1:3] == feats[8].shape[1:3]
    assert feats[32].shape[1:3] == feats[8].shape[1:3]


def test_swiglu_droppath_dinohead(rng):
    from roma_tpu.models.transformer import Block, DINOHead, drop_path

    x = jnp.asarray(rng.standard_normal((2, 5, 32)).astype(np.float32))
    blk = Block(32, 4, ffn_layer="swiglu", drop_path_rate=0.5, dtype=jnp.float32)
    params = blk.init(jax.random.PRNGKey(0), x)
    # deterministic: identity drop-path, swiglu path runs
    y = blk.apply(params, x, deterministic=True)
    assert y.shape == x.shape and np.isfinite(np.asarray(y)).all()
    # stochastic: needs the drop_path rng and differs from deterministic
    y2 = blk.apply(params, x, deterministic=False,
                   rngs={"drop_path": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(y), np.asarray(y2))

    # drop_path keeps expectation: E[out] == x (check masked rows are 0 or x/keep)
    h = jnp.ones((8, 4))
    out = np.asarray(drop_path(h, 0.5, False, jax.random.PRNGKey(0)))
    assert set(np.unique(out.round(4))) <= {0.0, 2.0}

    head = DINOHead(out_dim=16, hidden_dim=24, bottleneck_dim=8)
    hp = head.init(jax.random.PRNGKey(0), x)
    logits = head.apply(hp, x)
    assert logits.shape == (2, 5, 16)
    # prototypes are unit-norm columns: logits bounded by bottleneck norm (=1)
    assert np.abs(np.asarray(logits)).max() <= 1.0 + 1e-5


def test_roma_match_different_input_sizes(debug_matcher, rng):
    """match() accepts A/B images of different raw sizes (the reference
    resizes each independently before batching, matcher.py:633-648)."""
    im_a = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    im_b = rng.uniform(0, 1, (80, 56, 3)).astype(np.float32)
    warp, cert = debug_matcher.match(jnp.asarray(im_a), jnp.asarray(im_b))
    hs, ws = debug_matcher.cfg.upsample_resolution
    assert warp.shape == (hs, 2 * ws, 4)
    assert np.isfinite(np.asarray(warp)).all()


def test_roma_match_raw_matches_prepped(debug_matcher, rng):
    """The raw-upload device-resize path (original-res uint8 canvases ->
    PIL-parity matrix resize on device -> match_prepped) must reproduce the
    host-PIL-resize fast path: prepped inputs to <=1 uint8 level, match
    outputs within the same tolerance the f32-vs-PIL prep comparison uses."""
    from PIL import Image

    ims = [
        Image.fromarray(rng.uniform(0, 255, hw + (3,)).astype(np.uint8))
        for hw in [(150, 190), (120, 160), (150, 190), (99, 131)]
    ]
    cfg = debug_matcher.cfg
    hc, wc = cfg.coarse_resolution
    hu, wu = cfg.upsample_resolution

    sizes = sorted({im.size[::-1] for im in ims})
    size_idx = {s: i for i, s in enumerate(sizes)}
    bucket = (max(h for h, _ in sizes), max(w for _, w in sizes))
    banks = debug_matcher.build_resize_banks(sizes, bucket)

    def canvas(im):
        c = np.zeros(bucket + (3,), np.uint8)
        a = np.asarray(im, np.uint8)
        c[: a.shape[0], : a.shape[1]] = a
        return c

    # A images stacked over B images (pairs: (0,1), (2,3))
    raw = jnp.asarray(np.stack([canvas(ims[i]) for i in (0, 2, 1, 3)]))
    idx = jnp.asarray(
        [size_idx[ims[i].size[::-1]] for i in (0, 2, 1, 3)], jnp.int32
    )

    # prepped parity: device resize == host PIL resize to <=1 uint8 level
    xc, xu = debug_matcher._prep_raw(raw, idx, *banks, up=True)
    host_c = np.stack(
        [debug_matcher.host_prep_np(ims[i], hc, wc) for i in (0, 2, 1, 3)]
    )
    host_u = np.stack(
        [debug_matcher.host_prep_np(ims[i], hu, wu) for i in (0, 2, 1, 3)]
    )
    lvl = (1.0 / 255.0) / 0.224  # one uint8 level over the smallest std
    assert np.abs(np.asarray(xc) - host_c).max() <= lvl + 1e-5
    assert np.abs(np.asarray(xu) - host_u).max() <= lvl + 1e-5

    # end-to-end: match_raw == match_prepped on the host-resized inputs
    warps_r, certs_r = debug_matcher.match_raw(raw, idx, banks)
    au = np.stack([debug_matcher.host_resize_np(ims[i], hc, wc) for i in (0, 2)])
    bu = np.stack([debug_matcher.host_resize_np(ims[i], hc, wc) for i in (1, 3)])
    au2 = np.stack([debug_matcher.host_resize_np(ims[i], hu, wu) for i in (0, 2)])
    bu2 = np.stack([debug_matcher.host_resize_np(ims[i], hu, wu) for i in (1, 3)])
    warps_h, certs_h = debug_matcher.match_prepped(au, bu, au2, bu2)
    # statistical bound, not allclose: the random-init debug model amplifies
    # 1-uint8-level input diffs chaotically at a small fraction of pixels (a
    # control experiment perturbing 0.01% of host pixels by +-1 level gives
    # the same divergence profile: max ~1.3, q99 ~0.3, mean ~0.01)
    dw = np.abs(np.asarray(warps_r) - np.asarray(warps_h))
    dc = np.abs(np.asarray(certs_r) - np.asarray(certs_h))
    assert warps_r.shape == warps_h.shape
    assert dw.mean() < 2e-2, dw.mean()
    assert np.quantile(dw, 0.9) < 5e-2, np.quantile(dw, 0.9)
    assert dc.mean() < 2e-2, dc.mean()
