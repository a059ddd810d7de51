"""Image / feature-map resizing with half-pixel-center semantics.

Matches the behavior the reference relies on from
``F.interpolate(..., mode='bilinear', align_corners=False)``
(/root/reference/romatch/models/tiny.py:141, matcher.py:349-360) and
``transforms.Resize(..., BICUBIC)`` (utils/utils.py:234-242), expressed with
``jax.image.resize`` which uses half-pixel centers (the align_corners=False
convention) natively.

All functions are channels-last: ``(..., H, W, C)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _resize_hw(x: jax.Array, size: tuple[int, int], method: str, antialias: bool) -> jax.Array:
    """Resize the (-3, -2) spatial axes of a channels-last array."""
    h, w = size
    out_shape = (*x.shape[:-3], h, w, x.shape[-1])
    return jax.image.resize(x, out_shape, method=method, antialias=antialias)


def interpolate_bilinear(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinear resize, half-pixel centers, no antialiasing.

    Equivalent of torch ``F.interpolate(mode='bilinear', align_corners=False)``
    on a channels-last tensor.
    """
    return _resize_hw(x, size, "bilinear", antialias=False)


def interpolate_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest-exact resize (half-pixel centers, like torch 'nearest-exact')."""
    return _resize_hw(x, size, "nearest", antialias=False)


def resize_bicubic(x: jax.Array, size: tuple[int, int], antialias: bool = True) -> jax.Array:
    """Bicubic resize with antialiasing on downscale.

    Used for input-image preprocessing; approximates PIL/torchvision
    ``Resize(..., BICUBIC)`` (reference utils/utils.py:234-242). PIL applies a
    widened filter support when downsampling, which ``antialias=True``
    reproduces.
    """
    return _resize_hw(x, size, "cubic", antialias=antialias)


@functools.partial(jax.jit, static_argnames=("multiple",))
def pad_to_multiple(x: jax.Array, multiple: int = 32) -> jax.Array:
    """Resize (H, W) down/up to the nearest multiple (floor), bilinear.

    Mirrors the reference's ``preprocess_tensor`` contract (tiny.py:135-142):
    guarantee divisibility by 32 by bilinear-resampling to (H//32*32, W//32*32).
    """
    h, w = x.shape[-3], x.shape[-2]
    return interpolate_bilinear(x, ((h // multiple) * multiple, (w // multiple) * multiple))
