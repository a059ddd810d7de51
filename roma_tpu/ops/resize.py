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


def _pil_bicubic_filter(x: np.ndarray) -> np.ndarray:
    """PIL's BICUBIC filter: Keys cubic with a=-0.5, support 2
    (Pillow Resample.c bicubic_filter)."""
    a = -0.5
    x = np.abs(x)
    return np.where(
        x < 1.0,
        ((a + 2.0) * x - (a + 3.0)) * x * x + 1,
        np.where(x < 2.0, (((x - 5) * x + 8) * x - 4) * a, 0.0),
    )


def pil_bicubic_matrix(n_in: int, n_out: int, n_cols: int | None = None) -> np.ndarray:
    """(n_out, n_cols or n_in) one-axis interpolation matrix reproducing
    PIL's antialiased BICUBIC resize coefficient computation (Pillow
    Resample.c precompute_coeffs): support widened by the downscale factor,
    window [int(center-support+.5), int(center+support+.5)) clipped to the
    source, weights normalized over the clipped window. Columns beyond
    `n_in` (the padded-canvas case) are zero, so a zero-padded source
    resizes identically to the unpadded one."""
    if n_cols is None:
        n_cols = n_in
    scale = n_in / n_out
    filterscale = max(scale, 1.0)
    support = 2.0 * filterscale
    center = (np.arange(n_out, dtype=np.float64) + 0.5) * scale
    m = np.zeros((n_out, n_cols), np.float64)
    for i in range(n_out):
        xmin = max(int(center[i] - support + 0.5), 0)
        xmax = min(int(center[i] + support + 0.5), n_in)
        xs = np.arange(xmin, xmax, dtype=np.float64)
        w = _pil_bicubic_filter((xs - center[i] + 0.5) / filterscale)
        s = w.sum()
        if s != 0.0:
            w = w / s
        m[i, xmin:xmax] = w
    return m.astype(np.float32)


def pil_round_u8(x: jax.Array) -> jax.Array:
    """PIL's per-pass fixed-point store: round-half-up then clamp to
    [0, 255] (Resample.c clip8 of the accumulated sum + half-ulp)."""
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


def pil_bicubic_resize_device(
    x: jax.Array, ry: jax.Array, rx: jax.Array
) -> jax.Array:
    """PIL-parity antialiased bicubic via interpolation matrices, on device.

    x: (..., H, W, C) in [0, 255] float; ry: (..., h_out, H); rx:
    (..., w_out, W). Horizontal pass first, then vertical, with the
    per-pass uint8 rounding PIL's 8-bit path performs — output matches
    `PIL.Image.resize(..., BICUBIC)` to within coefficient-quantization
    rounding (<=1 uint8 level). HIGHEST precision keeps the f32 weighted
    sums from crossing rounding boundaries on the MXU."""
    hp = jnp.einsum(
        "...wj,...hjc->...hwc", rx, x, precision=jax.lax.Precision.HIGHEST
    )
    hp = pil_round_u8(hp)
    vp = jnp.einsum(
        "...hi,...iwc->...hwc", ry, hp, precision=jax.lax.Precision.HIGHEST
    )
    return pil_round_u8(vp)


@functools.partial(jax.jit, static_argnames=("multiple",))
def pad_to_multiple(x: jax.Array, multiple: int = 32) -> jax.Array:
    """Resize (H, W) down/up to the nearest multiple (floor), bilinear.

    Mirrors the reference's ``preprocess_tensor`` contract (tiny.py:135-142):
    guarantee divisibility by 32 by bilinear-resampling to (H//32*32, W//32*32).
    """
    h, w = x.shape[-3], x.shape[-2]
    return interpolate_bilinear(x, ((h // multiple) * multiple, (w // multiple) * multiple))
