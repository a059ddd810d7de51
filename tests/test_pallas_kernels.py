"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.ops.corr import coord_grid, corr_volume, pos_embed_expectation
from roma_tpu.ops.pallas.corr_softmax import fused_pos_embed


@pytest.mark.parametrize("l0,l1,c", [(60, 48, 16), (256, 512, 64), (100, 700, 32)])
def test_fused_pos_embed_matches_xla(rng, l0, l1, c):
    h1 = 8
    w1 = l1 // 8 if l1 % 8 == 0 else l1
    f0 = rng.standard_normal((2, l0, c)).astype(np.float32)
    f1 = rng.standard_normal((2, l1, c)).astype(np.float32)
    grid = rng.uniform(-1, 1, (l1, 2)).astype(np.float32)
    cv = np.einsum("bic,bjc->bij", f0, f1) / np.sqrt(c)
    p = jax.nn.softmax(jnp.asarray(cv), axis=-1)
    ref = np.asarray(jnp.einsum("bij,jd->bid", p, jnp.asarray(grid)))

    out = np.asarray(
        fused_pos_embed(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(grid),
            chunk=128, tile=64, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_fused_pos_embed_peaked(rng):
    """Sharply peaked volume returns the argmax coordinate."""
    l0, l1, c = 32, 96, 8
    f1 = rng.standard_normal((1, l1, c)).astype(np.float32) * 0.01
    peaks = rng.integers(0, l1, l0)
    f0 = 20.0 * f1[0, peaks][None] / np.linalg.norm(f1[0, peaks], axis=-1, keepdims=True)
    grid = rng.uniform(-1, 1, (l1, 2)).astype(np.float32)
    out = np.asarray(
        fused_pos_embed(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(grid),
            chunk=32, tile=32, interpret=True,
        )
    )
    cv = np.einsum("bic,bjc->bij", f0, f1[:1]) / np.sqrt(c)
    expect = jax.nn.softmax(jnp.asarray(cv), -1) @ jnp.asarray(grid)
    np.testing.assert_allclose(out, np.asarray(expect), atol=1e-4)
