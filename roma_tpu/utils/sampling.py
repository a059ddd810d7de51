"""Balanced certainty-weighted correspondence sampling — fully on-device.

Replacement for the reference's two-stage `sample()` (matcher.py:468-495 and
tiny.py:297-327): threshold the certainty, draw an oversampled pool
proportional to certainty, re-weight by inverse KDE density for spatial
balance, and draw the final set.

The reference uses `torch.multinomial(..., replacement=False)` twice; the
TPU-native equivalent is Gumbel top-k (top-k of log w + Gumbel noise draws k
items without replacement proportional to w), which keeps everything
fixed-shape and jittable with no host round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from roma_tpu.utils.kde import kde


def gumbel_topk(key: jax.Array, weights: jax.Array, k: int) -> jax.Array:
    """Indices of k draws without replacement with P(i) proportional to weights.

    weights (N,) nonnegative; zero-weight entries are never selected unless
    fewer than k positive entries exist.
    """
    logw = jnp.log(jnp.maximum(weights, 0.0))
    g = jax.random.gumbel(key, weights.shape, dtype=jnp.float32)
    _, idx = jax.lax.top_k(logw + g, k)
    return idx


@functools.partial(jax.jit, static_argnames=("num", "expansion_factor", "balanced"))
def sample_matches(
    key: jax.Array,
    matches: jax.Array,
    certainty: jax.Array,
    num: int = 10000,
    sample_thresh: float = 0.05,
    expansion_factor: int = 4,
    balanced: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Draw `num` balanced correspondences from a dense warp.

    Args:
      matches: (..., 4) dense warp [x_A, y_A, x_B, y_B] normalized.
      certainty: (...,) in [0, 1].

    Returns (matches (num, 4), certainty (num,)).
    """
    matches = matches.reshape(-1, 4)
    certainty = certainty.reshape(-1).astype(jnp.float32)
    # threshold: anything confident enough counts the same ("threshold" mode)
    certainty = jnp.where(certainty > sample_thresh, 1.0, certainty)

    if not balanced:
        idx = gumbel_topk(key, certainty, num)
        return matches[idx], certainty[idx]

    k1, k2 = jax.random.split(key)
    pool = min(expansion_factor * num, matches.shape[0])
    good_idx = gumbel_topk(k1, certainty, pool)
    good_matches = matches[good_idx]
    good_certainty = certainty[good_idx]

    density = kde(good_matches, std=0.1)
    p = 1.0 / (density + 1.0)
    # need ~10 near-perfect neighbours to count as a populated region
    p = jnp.where(density < 10, 1e-7, p)
    final_idx = gumbel_topk(k2, p, min(num, pool))
    return good_matches[final_idx], good_certainty[final_idx]
