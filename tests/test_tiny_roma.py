"""Tiny RoMa model family: layer parity vs torch, shape contracts, behavior."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from roma_tpu.config import TinyRomaConfig
from roma_tpu.models.layers import ConvBlock, instance_norm
from roma_tpu.models.port import conv_kernel
from roma_tpu.models.tiny_roma import TinyRoma, TinyRomaMatcher
from roma_tpu.models.xfeat import XFeatBackbone


def test_conv_block_matches_torch_basic_layer(rng):
    """Conv(bias=False)+BN(affine=False)+ReLU with ported weights must match
    torch exactly (eval mode) — this validates the padding and BN conventions
    that weight-port parity depends on."""
    cin, cout, k, s = 5, 7, 3, 2
    x = rng.standard_normal((2, 8, 10, cin), dtype=np.float32)

    tconv = nn.Conv2d(cin, cout, k, stride=s, padding=k // 2, bias=False)
    tbn = nn.BatchNorm2d(cout, affine=False)
    tbn.running_mean.normal_(); tbn.running_var.uniform_(0.5, 2.0)
    tbn.eval()
    with torch.no_grad():
        ref = torch.relu(tbn(tconv(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))))
    ref = np.moveaxis(ref.numpy(), 1, -1)

    block = ConvBlock(cout, kernel_size=k, stride=s, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params = {
        "params": {"Conv_0": {"kernel": conv_kernel(tconv.weight.detach().numpy())}},
        "batch_stats": {
            "BatchNorm_0": {
                "mean": tbn.running_mean.numpy(),
                "var": tbn.running_var.numpy(),
            }
        },
    }
    ours = np.asarray(block.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 9, 11, 1), dtype=np.float32)
    ref = nn.InstanceNorm2d(1)(torch.from_numpy(np.moveaxis(x, -1, 1).copy()))
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(ours, np.moveaxis(ref.numpy(), 1, -1), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_matcher():
    return TinyRomaMatcher.init(jax.random.PRNGKey(0), hw=(64, 96))


def test_xfeat_shapes():
    m = XFeatBackbone(dtype=jnp.float32)
    x = jnp.zeros((2, 64, 96, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    fine, coarse = m.apply(params, x)
    assert fine.shape == (2, 16, 24, 24)
    assert coarse.shape == (2, 8, 12, 64)


def test_tiny_roma_corresps_shapes(tiny_matcher):
    im = jnp.zeros((1, 64, 96, 3))
    corresps = tiny_matcher.forward(im, im)
    assert corresps[8]["flow"].shape == (1, 8, 12, 2)
    assert corresps[8]["certainty"].shape == (1, 8, 12, 1)
    assert corresps[4]["flow"].shape == (1, 16, 24, 2)


def test_tiny_roma_match_api(tiny_matcher, rng):
    im_a = jnp.asarray(rng.uniform(0, 1, (70, 100, 3)).astype(np.float32))
    im_b = jnp.asarray(rng.uniform(0, 1, (70, 100, 3)).astype(np.float32))
    warp, cert = tiny_matcher.match(im_a, im_b)
    assert warp.shape == (70, 100, 4) and cert.shape == (70, 100)
    assert float(cert.min()) >= 0 and float(cert.max()) <= 1
    # first two channels are the identity grid of image A
    g = np.asarray(warp[..., :2])
    assert abs(g[0, 0, 0] - (-1 + 1 / 100)) < 1e-5
    assert abs(g[-1, -1, 1] - (1 - 1 / 70)) < 1e-5

    m, c = tiny_matcher.sample(warp, cert, num=200)
    assert m.shape == (200, 4)
    ka, kb = tiny_matcher.to_pixel_coordinates(m, 70, 100, 70, 100)
    assert float(ka[:, 0].max()) <= 100 and float(ka[:, 1].max()) <= 70


def test_fine_stage_is_residual_on_upsampled_coarse(tiny_matcher, rng):
    """corresps[4] = upsample(corresps[8]) + delta * (2/W, 2/H): the residual
    magnitude is bounded by |head output| * pixel step, so fine flow must stay
    close to the upsampled coarse flow."""
    from roma_tpu.ops.resize import interpolate_bilinear

    im_a = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    im_b = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    corresps = tiny_matcher.forward(im_a, im_b)
    up = np.asarray(interpolate_bilinear(corresps[8]["flow"], (16, 16)))
    fine = np.asarray(corresps[4]["flow"])
    delta_px = np.abs(fine - up) / (2 / 64)  # in target-image pixels
    assert np.isfinite(fine).all()
    assert delta_px.max() < 50  # a few pixels of residual, not a rewrite


def test_fine_stage_does_not_backprop_into_coarse(tiny_matcher):
    """The fine matcher refines a stop-gradient'ed coarse warp (reference
    detaches at tiny.py:362): d(fine flow)/d(coarse matcher params) == 0."""
    model = TinyRoma(TinyRomaConfig(dtype="float32"))
    im = jnp.linspace(0, 1, 1 * 64 * 64 * 3).reshape(1, 64, 64, 3)

    def fine_loss(params):
        out = model.apply(
            {"params": params, "batch_stats": tiny_matcher.params["batch_stats"]},
            im, im, train=False,
        )
        return jnp.sum(out[4]["flow"] ** 2)

    grads = jax.grad(fine_loss)(tiny_matcher.params["params"])
    g_coarse = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), grads["coarse_matcher"], 0.0
    )
    g_fine = jax.tree_util.tree_reduce(
        lambda a, b: a + float(jnp.abs(b).sum()), grads["fine_matcher"], 0.0
    )
    assert g_coarse == 0.0
    assert g_fine > 0.0


def test_tiny_roma_train_mode_mutates_batch_stats(tiny_matcher):
    im = jnp.ones((1, 64, 64, 3))
    model = TinyRoma(TinyRomaConfig())
    out, mutated = model.apply(
        tiny_matcher.params, im, im, train=True, mutable=["batch_stats"]
    )
    assert "batch_stats" in mutated
    assert 8 in out and 4 in out
