"""Shared NN building blocks (NHWC, torch-compatible padding).

Torch convs pad symmetrically (k//2 each side) and floor the output size;
XLA's 'SAME' pads asymmetrically for even inputs with stride 2, which shifts
features by one pixel and breaks weight-port parity. All convs here use
explicit (k//2, k//2) padding to match torch exactly.
"""

from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_padding(kernel_size: int) -> list[tuple[int, int]]:
    p = kernel_size // 2
    return [(p, p), (p, p)]


class ConvBlock(nn.Module):
    """Conv(k, s, torch padding) -> BatchNorm -> optional ReLU.

    `affine_norm=False` reproduces torch BatchNorm2d(affine=False) (used by
    the XFeat trunk); `groups` enables the depthwise-separable refiner blocks.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    groups: int = 1
    relu: bool = True
    affine_norm: bool = False
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=torch_padding(self.kernel_size),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            use_bias=self.affine_norm,
            use_scale=self.affine_norm,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
        )(x.astype(jnp.float32))
        if self.relu:
            x = nn.relu(x)
        return x.astype(self.dtype)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-sample, per-channel (H, W) normalization — torch InstanceNorm2d
    with affine=False, on NHWC."""
    mean = jnp.mean(x, axis=(-3, -2), keepdims=True)
    var = jnp.var(x, axis=(-3, -2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)
