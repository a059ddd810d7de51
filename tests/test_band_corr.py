"""Band / row-restricted correlation variants vs masked-softmax oracles."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.ops.band_corr import banded_pos_embed, row_pos_embed
from roma_tpu.ops.corr import coord_grid


def masked_oracle(f0, f1, radius):
    """Full volume + band mask + softmax expectation (numpy)."""
    B, H, W, C = f0.shape
    cv = np.einsum("bhwc,bijc->bhwij", f0, f1) / np.sqrt(C)  # (B,H,W,H,W)
    rows = np.arange(H)
    mask = np.abs(rows[:, None] - rows[None, :]) <= radius   # (H_tgt, H_src)
    cv = np.where(mask[None, :, None, :, None], cv, -np.inf)
    flat = cv.reshape(B, H, W, H * W)
    p = np.asarray(jax.nn.softmax(jnp.asarray(flat), axis=-1)).reshape(B, H, W, H, W)
    grid = np.asarray(coord_grid(H, W))
    ex = np.einsum("bhwij,ijd->bhwd", p, grid)
    return ex


@pytest.mark.parametrize("radius", [0, 2])
def test_banded_pos_embed_matches_masked_oracle(rng, radius):
    B, H, W, C = 2, 8, 10, 16
    f0 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    ours = np.asarray(banded_pos_embed(jnp.asarray(f0), jnp.asarray(f1), radius))
    ref = masked_oracle(f0, f1, radius)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_row_pos_embed_matches_banded_zero(rng):
    B, H, W, C = 1, 6, 12, 8
    f0 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    f1 = rng.standard_normal((B, H, W, C)).astype(np.float32)
    a = np.asarray(row_pos_embed(jnp.asarray(f0), jnp.asarray(f1)))
    b = np.asarray(banded_pos_embed(jnp.asarray(f0), jnp.asarray(f1), 0))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # y coordinate is exactly the target row's own coordinate
    ys = np.linspace(-1 + 1 / H, 1 - 1 / H, H)
    np.testing.assert_allclose(a[0, :, 0, 1], ys, atol=1e-6)


def test_tiny_roma_band_modes_run(rng):
    from roma_tpu.config import TinyRomaConfig
    from roma_tpu.models.tiny_roma import TinyRomaMatcher

    for mode in ("row", "band"):
        m = TinyRomaMatcher.init(
            jax.random.PRNGKey(0),
            TinyRomaConfig(search_mode=mode, band_radius=2, coarse_iters=2),
            hw=(64, 64),
        )
        im = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
        warp, cert = m.match(im, im)
        assert warp.shape == (64, 64, 4)
        assert np.isfinite(np.asarray(warp)).all()
