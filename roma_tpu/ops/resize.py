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
import numpy as np


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


def _cubic_conv_kernel(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel with a=-0.75 (torch / OpenCV flavor; note
    jax.image.resize's 'cubic' is the Keys a=-0.5 kernel, which does NOT
    match torch F.interpolate(mode='bicubic'))."""
    at = np.abs(t)
    return np.where(
        at <= 1,
        ((a + 2) * at - (a + 3)) * at * at + 1,
        np.where(at < 2, a * (((at - 5) * at + 8) * at - 4), 0.0),
    )


def _torch_bicubic_matrix(n_in: int, n_out: int, scale: float) -> np.ndarray:
    """(n_out, n_in) interpolation matrix reproducing torch
    F.interpolate(mode='bicubic', align_corners=False) along one axis.

    `scale` is the scale factor used for the source-coordinate mapping
    src = (dst + 0.5)/scale - 0.5 — torch uses the CALLER-PASSED
    scale_factor when given (recompute_scale_factor=False), which is how
    DINOv2's `+0.1` pos-embed offset kludge (reference dinov2.py:178-185)
    changes the sampling positions. Border taps clamp (replicate)."""
    i = np.arange(n_out, dtype=np.float64)
    src = (i + 0.5) / scale - 0.5
    f = np.floor(src).astype(np.int64)
    m = np.zeros((n_out, n_in), np.float64)
    for k in range(-1, 3):
        idx = np.clip(f + k, 0, n_in - 1)
        wts = _cubic_conv_kernel(src - (f + k).astype(np.float64))
        np.add.at(m, (i.astype(np.int64), idx), wts)
    return m


def torch_bicubic_resize(
    x: jax.Array,
    size: tuple[int, int],
    scale: tuple[float, float] | None = None,
) -> jax.Array:
    """torch-exact F.interpolate(mode='bicubic', align_corners=False) on the
    (-3, -2) axes of a channels-last array. `scale`, when given, overrides
    the coordinate-mapping scale factors (h_scale, w_scale) — matching
    torch's scale_factor= call form."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h, w = size
    sh = scale[0] if scale is not None else h / h_in
    sw = scale[1] if scale is not None else w / w_in
    mh = jnp.asarray(_torch_bicubic_matrix(h_in, h, sh), jnp.float32)
    mw = jnp.asarray(_torch_bicubic_matrix(w_in, w, sw), jnp.float32)
    y = jnp.einsum("hi,...iwc->...hwc", mh, x.astype(jnp.float32))
    return jnp.einsum("wj,...hjc->...hwc", mw, y).astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("multiple",))
def pad_to_multiple(x: jax.Array, multiple: int = 32) -> jax.Array:
    """Resize (H, W) down/up to the nearest multiple (floor), bilinear.

    Mirrors the reference's ``preprocess_tensor`` contract (tiny.py:135-142):
    guarantee divisibility by 32 by bilinear-resampling to (H//32*32, W//32*32).
    """
    h, w = x.shape[-3], x.shape[-2]
    return interpolate_bilinear(x, ((h // multiple) * multiple, (w // multiple) * multiple))
