"""Numeric parity tests for the core sampling/resize/correlation ops.

Torch (CPU) is used as the independent oracle for grid_sample / interpolate
semantics — the contract the reference model relies on.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from roma_tpu.ops import (
    corr_volume,
    grid_sample,
    grid_sample_nearest,
    interpolate_bilinear,
    local_correlation,
    pos_embed_expectation,
)
from roma_tpu.ops.corr import coord_grid, pos_embed_fast


def torch_grid_sample(feat_nhwc, grid, mode="bilinear", padding_mode="zeros"):
    t = torch.from_numpy(np.moveaxis(feat_nhwc, -1, 1).copy())
    g = torch.from_numpy(grid.copy())
    out = F.grid_sample(t, g, mode=mode, padding_mode=padding_mode, align_corners=False)
    return np.moveaxis(out.numpy(), 1, -1)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, padding_mode):
    feat = rng.standard_normal((2, 13, 17, 5), dtype=np.float32)
    grid = (rng.uniform(-1.3, 1.3, (2, 9, 11, 2))).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(grid), padding_mode))
    ref = torch_grid_sample(feat, grid, padding_mode=padding_mode)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_nearest_matches_torch(rng):
    feat = rng.standard_normal((2, 8, 10, 3), dtype=np.float32)
    # keep away from exact .5 boundaries where round ties differ
    grid = (rng.uniform(-1.2, 1.2, (2, 7, 7, 2)) + 1e-4).astype(np.float32)
    ours = np.asarray(grid_sample_nearest(jnp.asarray(feat), jnp.asarray(grid)))
    ref = torch_grid_sample(feat, grid, mode="nearest")
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_grid_sample_flat_points(rng):
    feat = rng.standard_normal((1, 6, 6, 2), dtype=np.float32)
    pts = rng.uniform(-0.9, 0.9, (1, 5, 2)).astype(np.float32)
    ours = np.asarray(grid_sample(jnp.asarray(feat), jnp.asarray(pts)))
    ref = torch_grid_sample(feat, pts[:, :, None])[:, :, 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("size", [(7, 9), (26, 34), (13, 17)])
def test_bilinear_resize_matches_torch(rng, size):
    x = rng.standard_normal((2, 13, 17, 4), dtype=np.float32)
    ours = np.asarray(interpolate_bilinear(jnp.asarray(x), size))
    t = torch.from_numpy(np.moveaxis(x, -1, 1).copy())
    ref = F.interpolate(t, size=size, mode="bilinear", align_corners=False)
    ref = np.moveaxis(ref.numpy(), 1, -1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_corr_volume_matches_einsum(rng):
    f0 = rng.standard_normal((2, 4, 5, 8), dtype=np.float32)
    f1 = rng.standard_normal((2, 3, 6, 8), dtype=np.float32)
    cv = np.asarray(corr_volume(jnp.asarray(f0), jnp.asarray(f1)))
    ref = np.einsum("bic,bjc->bij", f0.reshape(2, 20, 8), f1.reshape(2, 18, 8)) / np.sqrt(8)
    np.testing.assert_allclose(cv, ref, atol=1e-5)


def test_pos_embed_expectation_peaked_recovers_argmax(rng):
    # a sharply peaked volume must return (approximately) the argmax coordinate
    h1, w1 = 6, 8
    cv = rng.standard_normal((1, 12, h1 * w1), dtype=np.float32)
    peaks = rng.integers(0, h1 * w1, 12)
    cv[0, np.arange(12), peaks] += 50.0
    warp = np.asarray(pos_embed_expectation(jnp.asarray(cv), (h1, w1)))
    grid = np.asarray(coord_grid(h1, w1)).reshape(-1, 2)
    np.testing.assert_allclose(warp[0], grid[peaks], atol=1e-4)


def test_pos_embed_exact_matches_torch_softmax(rng):
    h1, w1 = 8, 8
    cv = rng.standard_normal((2, 10, h1 * w1), dtype=np.float32)
    ours = np.asarray(pos_embed_expectation(jnp.asarray(cv), (h1, w1)))
    p = torch.softmax(torch.from_numpy(cv), dim=-1).numpy()
    grid = np.asarray(coord_grid(h1, w1)).reshape(-1, 2)
    np.testing.assert_allclose(ours, p @ grid, atol=1e-5)


def test_pos_embed_fast_close_to_exact_when_peaked(rng):
    h1, w1 = 16, 16
    cv = 0.1 * rng.standard_normal((1, 8, h1 * w1), dtype=np.float32)
    peaks = rng.integers(0, h1 * w1, 8)
    cv[0, np.arange(8), peaks] += 20.0
    exact = np.asarray(pos_embed_expectation(jnp.asarray(cv), (h1, w1)))
    fast = np.asarray(pos_embed_fast(jnp.asarray(cv), (h1, w1)))
    np.testing.assert_allclose(fast, exact, atol=1e-2)


def naive_local_corr(f0, f1, r, flow):
    """Straight-line oracle: grid_sample per offset, inner product."""
    B, H, W, C = f0.shape
    k = 2 * r + 1
    dys = np.linspace(-2 * r / H, 2 * r / H, k)
    dxs = np.linspace(-2 * r / W, 2 * r / W, k)
    out = np.zeros((B, H, W, k * k), np.float32)
    for i, dy in enumerate(dys):
        for j, dx in enumerate(dxs):
            g = flow + np.array([dx, dy], np.float32)
            win = torch_grid_sample(f1, g)
            out[..., i * k + j] = (f0 * win).sum(-1) / np.sqrt(C)
    return out


def test_local_correlation_matches_naive(rng):
    B, H, W, C, r = 2, 6, 7, 8, 2
    f0 = rng.standard_normal((B, H, W, C), dtype=np.float32)
    f1 = rng.standard_normal((B, H, W, C), dtype=np.float32)
    flow = rng.uniform(-1, 1, (B, H, W, 2)).astype(np.float32)
    ours = np.asarray(local_correlation(jnp.asarray(f0), jnp.asarray(f1), r, jnp.asarray(flow)))
    ref = naive_local_corr(f0, f1, r, flow)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_local_correlation_extreme_flow_and_packs(rng):
    """Clamped out-of-range block origins must read exact zeros for any
    flow, including garbage values far outside [-1, 1], in every corner-
    packing mode (the padded-map clamping replaces per-corner masking)."""
    B, H, W, C, r = 2, 9, 11, 8, 2
    f0 = rng.standard_normal((B, H, W, C), dtype=np.float32)
    f1 = rng.standard_normal((B, H, W, C), dtype=np.float32)
    flow = np.where(
        rng.uniform(size=(B, H, W, 2)) < 0.25,
        rng.uniform(-60, 60, (B, H, W, 2)),
        rng.uniform(-1.4, 1.4, (B, H, W, 2)),
    ).astype(np.float32)
    ref = naive_local_corr(f0, f1, r, flow)
    for pack in [(1, 1), (2, 2)]:
        ours = np.asarray(
            local_correlation(
                jnp.asarray(f0), jnp.asarray(f1), r, jnp.asarray(flow), pack=pack
            )
        )
        np.testing.assert_allclose(ours, ref, atol=1e-4)
    # r=4 unpacked crosses the 36-step threshold into the lax.scan path
    ref4 = naive_local_corr(f0, f1, 4, flow)
    ours4 = np.asarray(
        local_correlation(
            jnp.asarray(f0), jnp.asarray(f1), 4, jnp.asarray(flow), pack=(1, 1)
        )
    )
    np.testing.assert_allclose(ours4, ref4, atol=1e-4)


def test_pil_bicubic_matrix_parity(rng):
    """Device-side matrix resize == PIL.Image.resize(BICUBIC) to <=1 uint8
    level (the per-pass fixed-point rounding), including on a zero-padded
    canvas larger than the source (the eval harness's raw-upload layout) —
    downscale (antialiased support), upscale, and mixed-axis cases."""
    from PIL import Image

    from roma_tpu.ops.resize import pil_bicubic_matrix, pil_bicubic_resize_device

    cases = [(48, 64, 56, 56), (48, 64, 86, 86), (33, 51, 56, 40), (10, 8, 86, 86)]
    for H, W, h, w in cases:
        img = rng.integers(0, 256, (H, W, 3)).astype(np.uint8)
        ref = np.asarray(
            Image.fromarray(img).resize((w, h), Image.BICUBIC), np.float64
        )
        hb, wb = H + 13, W + 7
        canvas = np.zeros((hb, wb, 3), np.float32)
        canvas[:H, :W] = img
        ry = pil_bicubic_matrix(H, h, hb)
        rx = pil_bicubic_matrix(W, w, wb)
        out = np.asarray(pil_bicubic_resize_device(
            jnp.asarray(canvas), jnp.asarray(ry), jnp.asarray(rx)
        ))
        d = np.abs(out - ref)
        assert d.max() <= 1.0 + 1e-6, (H, W, h, w, d.max())
        assert (d > 0).mean() < 0.01, (H, W, h, w, (d > 0).mean())
    # normalized rows: resizing a constant image is exact
    ry = pil_bicubic_matrix(48, 56)
    np.testing.assert_allclose(ry.sum(axis=1), 1.0, atol=1e-6)
