"""Tiny RoMa v1: XFeat trunk + global correlation matcher + conv refiners.

TPU-native re-design of the reference TinyRoMa
(/root/reference/romatch/models/tiny.py:93-367):

- coarse (1/8): all-pairs correlation volume -> exact softmax-expectation
  warp (one MXU matmul; the reference's strided shortcut tiny.py:187-198 is an
  NPU workaround we don't need) -> 4-block conv matcher predicting
  (dx, dy, logit) residuals scaled by (2/W, 2/H, 1)
- fine (1/4): warp upsample (stop-gradient, as the reference detaches
  tiny.py:362) -> 4-block conv matcher, same residual scheme

Everything is NHWC, channels-last flows, fixed shapes, jit-friendly. The
`TinyRomaMatcher` wrapper owns preprocessing (divisible-by-32 resize),
the `match`/`sample`/`to_pixel_coordinates` user API, and jit caching.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from roma_tpu.config import TinyRomaConfig
from roma_tpu.models.layers import ConvBlock
from roma_tpu.models.xfeat import XFeatBackbone
from roma_tpu.ops.corr import coord_grid, corr_volume, pos_embed_expectation, pos_embed_fast
from roma_tpu.ops.grid_sample import grid_sample
from roma_tpu.ops.resize import interpolate_bilinear
from roma_tpu.utils.geometry import normalized_to_pixel
from roma_tpu.utils.sampling import sample_matches


def _load_image_pair(path_a, path_b):
    """Load two images to one common (model-friendly) size, [0, 1] float."""
    from PIL import Image

    pa = Image.open(path_a).convert("RGB")
    pb = Image.open(path_b).convert("RGB")
    # common size: A's, rounded to the /32 contract
    w, h = pa.size
    w, h = max(32, (w // 32) * 32), max(32, (h // 32) * 32)
    a = np.asarray(pa.resize((w, h), Image.BICUBIC), np.float32) / 255.0
    b = np.asarray(pb.resize((w, h), Image.BICUBIC), np.float32) / 255.0
    return jnp.asarray(a), jnp.asarray(b)


class MatchRefiner(nn.Module):
    """N ConvBlocks + 1x1 head -> (dx, dy, certainty-logit)."""

    hidden_dim: int
    num_blocks: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(self.num_blocks):
            x = ConvBlock(self.hidden_dim, dtype=self.dtype, name=f"block_{i}")(x, train)
        return nn.Conv(
            3, (1, 1), use_bias=True, dtype=jnp.float32, param_dtype=jnp.float32,
            name="head",
        )(x.astype(jnp.float32))


class TinyRoma(nn.Module):
    """Forward model: image pair -> {8: (flow, cert), 4: (flow, cert)}."""

    cfg: TinyRomaConfig = TinyRomaConfig()

    def setup(self):
        dt = jnp.dtype(self.cfg.dtype)
        self.backbone = XFeatBackbone(dtype=dt)
        self.coarse_matcher = MatchRefiner(
            self.cfg.match_dim, self.cfg.num_matcher_blocks, dtype=dt
        )
        self.fine_matcher = MatchRefiner(
            self.cfg.fine_match_dim, self.cfg.num_matcher_blocks, dtype=dt
        )

    def __call__(
        self, im_a: jax.Array, im_b: jax.Array, train: bool = False
    ) -> dict[int, dict[str, jax.Array]]:
        B, H, W, _ = im_a.shape
        dt = jnp.dtype(self.cfg.dtype)
        # one trunk pass over both images (reference batches them, tiny.py:346-349)
        fine, coarse = self.backbone(jnp.concatenate([im_a, im_b], axis=0), train)
        f0c, f1c = coarse[:B], coarse[B:]
        f0f, f1f = fine[:B], fine[B:]

        _, h8, w8, _ = f0c.shape
        if self.cfg.search_mode != "full":
            # restricted search (rectified/stereo-like pairs): band or
            # row-only matching, fork capability (model_tiny2.py:388-533)
            from roma_tpu.ops.band_corr import banded_pos_embed, row_pos_embed

            if self.cfg.search_mode == "row":
                coarse_warp = row_pos_embed(f0c, f1c)
            else:
                coarse_warp = banded_pos_embed(f0c, f1c, self.cfg.band_radius)
            cv = None
        elif self.cfg.fused_kernel and not train:
            # streaming Pallas kernel: exact softmax-expectation, no (L0, L1)
            # volume in HBM (ops/pallas/corr_softmax.py)
            from roma_tpu.ops.pallas.corr_softmax import fused_pos_embed

            grid1 = coord_grid(h8, w8).reshape(h8 * w8, 2)
            coarse_warp = fused_pos_embed(
                f0c.reshape(B, h8 * w8, -1).astype(jnp.float32),
                f1c.reshape(B, h8 * w8, -1).astype(jnp.float32),
                grid1,
            ).reshape(B, h8, w8, 2)
            cv = None
        else:
            cv = corr_volume(f0c.astype(jnp.float32), f1c.astype(jnp.float32))
            if self.cfg.exact_softmax or train:
                coarse_warp = pos_embed_expectation(cv, (h8, w8))
            else:
                coarse_warp = pos_embed_fast(
                    cv, (h8, w8), faithful=self.cfg.faithful_fast_path
                )
            coarse_warp = coarse_warp.reshape(B, h8, w8, 2)

        # residual step scale: one target-image pixel in normalized units
        to_norm = jnp.asarray([2 / W, 2 / H, 1.0], jnp.float32)

        # iterated coarse matcher: re-apply the same refiner on its own output
        # (fork recipe, model_tiny.py:427-430 / model_tiny1.py:713-717)
        coarse_matches = jnp.concatenate(
            [coarse_warp, jnp.zeros_like(coarse_warp[..., :1])], -1
        )
        for _ in range(self.cfg.coarse_iters):
            warp_now = coarse_matches[..., :2]
            f1c_warped = grid_sample(f1c, warp_now)
            coarse_in = jnp.concatenate(
                [f0c, f1c_warped.astype(dt), warp_now.astype(dt)], axis=-1
            )
            delta = self.coarse_matcher(coarse_in, train)
            coarse_matches = coarse_matches + delta * to_norm
        corresps = {
            8: {"flow": coarse_matches[..., :2], "certainty": coarse_matches[..., 2:]}
        }
        if train:
            # exposed for the dual-softmax InfoNCE loss (losses/robust_loss.py)
            corresps[8]["corr_volume"] = cv

        _, h4, w4, _ = f0f.shape
        up = interpolate_bilinear(coarse_matches, (h4, w4))
        up = jax.lax.stop_gradient(up)  # fine stage refines, never backprops coarse
        f1f_warped = grid_sample(f1f, up[..., :2])
        fine_in = jnp.concatenate(
            [f0f, f1f_warped.astype(dt), up[..., :2].astype(dt)], axis=-1
        )
        fine_delta = self.fine_matcher(fine_in, train)
        fine_matches = up + fine_delta * to_norm
        corresps[4] = {"flow": fine_matches[..., :2], "certainty": fine_matches[..., 2:]}
        return corresps


@dataclass
class TinyRomaMatcher:
    """User-facing matcher API around `TinyRoma` (reference tiny.py:264-327)."""

    params: Any
    cfg: TinyRomaConfig = field(default_factory=TinyRomaConfig)

    def __post_init__(self):
        self.model = TinyRoma(self.cfg)
        self._jit_forward = jax.jit(
            lambda p, a, b: self.model.apply(p, a, b, train=False)
        )

    @staticmethod
    def init(key: jax.Array, cfg: TinyRomaConfig = TinyRomaConfig(), hw=(448, 448)):
        model = TinyRoma(cfg)
        x = jnp.zeros((1, *hw, 3), jnp.float32)
        # jit the init: one compiled graph instead of hundreds of eager ops
        # (each a network round-trip on the remote-TPU runtime)
        params = jax.jit(lambda k, a, b: model.init(k, a, b, train=False))(key, x, x)
        return TinyRomaMatcher(params, cfg)

    def preprocess(self, im: jax.Array) -> jax.Array:
        """Bilinear-resize to the nearest multiple of 32 (tiny.py:135-142)."""
        h, w = im.shape[-3], im.shape[-2]
        return interpolate_bilinear(im, ((h // 32) * 32, (w // 32) * 32))

    def forward(self, im_a: jax.Array, im_b: jax.Array):
        return self._jit_forward(self.params, self.preprocess(im_a), self.preprocess(im_b))

    def match(self, im_a, im_b, batched: bool = False):
        """Dense warp + certainty at input resolution.

        Args:
          im_a, im_b: (B, H, W, 3) float images in [0, 1] (same H, W), or
            image file paths (reference match_from_path, tiny.py:256-261).
        Returns:
          warp (B, H, W, 4) [x_A, y_A, x_B, y_B] normalized, cert (B, H, W).
        """
        if isinstance(im_a, (str, bytes)) or hasattr(im_a, "__fspath__"):
            im_a, im_b = _load_image_pair(im_a, im_b)
        from PIL import Image

        if isinstance(im_a, Image.Image):
            # PIL inputs (benchmark harnesses): tiny runs at native input
            # resolution (reference tiny.py:256-261), so just decode
            im_a = jnp.asarray(
                np.asarray(im_a.convert("RGB"), np.float32) / 255.0
            )
            im_b = jnp.asarray(
                np.asarray(im_b.convert("RGB"), np.float32) / 255.0
            )
        if im_a.ndim == 3:
            im_a, im_b = im_a[None], im_b[None]
        B, H, W, _ = im_a.shape
        corresps = self.forward(im_a, im_b)
        flow = interpolate_bilinear(corresps[8]["flow"], (H, W))
        cert = interpolate_bilinear(corresps[8]["certainty"], (H, W))[..., 0]
        grid = jnp.broadcast_to(coord_grid(H, W), (B, H, W, 2))
        warp = jnp.concatenate([grid, flow], axis=-1)
        cert = jax.nn.sigmoid(cert)
        if batched:
            return warp, cert
        return warp[0], cert[0]

    def sample(self, warp, certainty, num: int = 5000, key: jax.Array | None = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return sample_matches(
            key, warp, certainty, num=num, sample_thresh=self.cfg.sample_thresh
        )

    def to_pixel_coordinates(self, coords, h_a, w_a, h_b=None, w_b=None):
        if coords.shape[-1] == 2:
            return normalized_to_pixel(coords, h_a, w_a)
        return (
            normalized_to_pixel(coords[..., :2], h_a, w_a),
            normalized_to_pixel(coords[..., 2:], h_b, w_b),
        )

    def match_keypoints(self, x_a, x_b, warp, certainty, **kw):
        from roma_tpu.models.api import match_keypoints

        return match_keypoints(
            x_a, x_b, warp, certainty, sample_thresh=self.cfg.sample_thresh, **kw
        )

    def conf_from_fb_consistency(self, flow_forward, flow_backward, th: float = 2.0):
        from roma_tpu.models.api import conf_from_fb_consistency

        return conf_from_fb_consistency(flow_forward, flow_backward, th)

    def visualize_warp(self, warp, certainty, im_a, im_b, save_path=None):
        from roma_tpu.models.api import visualize_warp

        return visualize_warp(
            warp, certainty, im_a, im_b, symmetric=False, save_path=save_path
        )
