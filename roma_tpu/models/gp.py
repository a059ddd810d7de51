"""Gaussian-process coarse global matcher (kernel regression at 1/16).

TPU-native version of the reference GP module
(/root/reference/romatch/models/matcher.py:145-273): cosine kernel
K = exp((cos_sim - 1)/T) with T=0.2, Fourier coordinate basis
cos(8*pi*Conv1x1(coords)), posterior mean mu = K_xy (K_yy + sigma I)^-1 f.

The reference solves with a dense `torch.linalg.inv` (matcher.py:261); since
K_yy + sigma I is SPD we use a Cholesky factorization + two batched
triangular solves — faster and better conditioned. The posterior covariance
path is dead in every shipped config (`no_cov=True`, roma_models.py:117) and
is not carried over. All Gram math is fp32 with full-precision dots (the GP
sits inside an otherwise bf16 graph; SURVEY 'hard parts' #2).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from roma_tpu.ops.corr import coord_grid


def cos_kernel(x: jax.Array, y: jax.Array, T: float, eps: float = 1e-6) -> jax.Array:
    """(B, N, D), (B, M, D) -> (B, N, M): exp((cos_sim - 1)/T)."""
    hi = jax.lax.Precision.HIGHEST
    c = jnp.einsum("bnd,bmd->bnm", x, y, precision=hi)
    nx = jnp.linalg.norm(x, axis=-1)[..., None]
    ny = jnp.linalg.norm(y, axis=-1)[:, None, :]
    c = c / (nx * ny + eps)
    return jnp.exp((c - 1.0) / T)


def spd_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Batched SPD solve via Cholesky: A (B, N, N), b (B, N, D) -> (B, N, D)."""
    L = jnp.linalg.cholesky(A)
    w = jax.lax.linalg.triangular_solve(
        L, b, left_side=True, lower=True, transpose_a=False
    )
    return jax.lax.linalg.triangular_solve(
        L, w, left_side=True, lower=True, transpose_a=True
    )


class GP(nn.Module):
    gp_dim: int = 512
    T: float = 0.2
    sigma_noise: float = 0.1
    basis_gain: float = 8.0 * math.pi

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """x, y: (B, H, W, C) projected feats of A and B -> posterior mean
        (B, H, W, gp_dim) of B's embedded coordinates at A's features."""
        B, H, W, C = x.shape
        L = H * W

        coords = jnp.broadcast_to(coord_grid(H, W), (B, H, W, 2))
        f = jnp.cos(
            self.basis_gain
            * nn.Conv(
                self.gp_dim, (1, 1), dtype=jnp.float32, param_dtype=jnp.float32,
                name="pos_conv",
            )(coords)
        ).reshape(B, L, self.gp_dim)

        xf = x.reshape(B, L, C).astype(jnp.float32)
        yf = y.reshape(B, L, C).astype(jnp.float32)
        K_yy = cos_kernel(yf, yf, self.T)
        K_xy = cos_kernel(xf, yf, self.T)
        A = K_yy + self.sigma_noise * jnp.eye(L, dtype=jnp.float32)
        z = spd_solve(A, f)
        hi = jax.lax.Precision.HIGHEST
        mu = jnp.einsum("bnm,bmd->bnd", K_xy, z, precision=hi)
        return mu.reshape(B, H, W, self.gp_dim)
