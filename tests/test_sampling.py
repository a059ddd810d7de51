"""Statistical tests for KDE + balanced Gumbel-top-k sampling."""

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.utils.kde import kde
from roma_tpu.utils.sampling import gumbel_topk, sample_matches


def test_kde_matches_dense(rng):
    x = rng.standard_normal((300, 4)).astype(np.float32)
    ours = np.asarray(kde(jnp.asarray(x), std=0.1, tile=64))
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    ref = np.exp(-d2 / (2 * 0.1**2)).sum(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_gumbel_topk_no_replacement_and_distribution(rng):
    w = np.array([0.0, 1.0, 1.0, 4.0, 0.0, 2.0], np.float32)
    counts = np.zeros(6)
    for i in range(2000):
        idx = np.asarray(gumbel_topk(jax.random.PRNGKey(i), jnp.asarray(w), 2))
        assert len(set(idx.tolist())) == 2
        assert all(w[j] > 0 for j in idx)
        counts[idx] += 1
    # heaviest weight must be sampled most
    assert counts[3] == counts.max()
    assert counts[0] == 0 and counts[4] == 0


def test_sample_matches_balanced(rng):
    # dense cluster + sparse spread: balanced sampling should not let the
    # cluster dominate proportionally to its size
    H = W = 64
    grid = np.stack(
        np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H), indexing="xy"),
        axis=-1,
    )
    warp = np.concatenate([grid, grid], axis=-1).astype(np.float32)
    cert = np.full((H, W), 0.9, np.float32)
    m, c = sample_matches(
        jax.random.PRNGKey(0), jnp.asarray(warp), jnp.asarray(cert), num=256
    )
    assert m.shape == (256, 4) and c.shape == (256,)
    # all matches come from the warp support
    assert np.abs(np.asarray(m)).max() <= 1.0
    # spread: samples cover most of the x-range
    xs = np.asarray(m)[:, 0]
    assert xs.min() < -0.7 and xs.max() > 0.7


def test_sample_matches_respects_certainty(rng):
    H = W = 32
    grid = np.stack(
        np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H), indexing="xy"),
        axis=-1,
    )
    warp = np.concatenate([grid, grid], axis=-1).astype(np.float32)
    cert = np.zeros((H, W), np.float32)
    cert[:, : W // 2] = 0.9  # only left half is confident
    m, _ = sample_matches(
        jax.random.PRNGKey(1), jnp.asarray(warp), jnp.asarray(cert), num=128
    )
    assert np.asarray(m)[:, 0].max() < 0.05
