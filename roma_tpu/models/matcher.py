"""Full RoMa: DINOv2-L coarse + VGG19 fine encoder, GP + transformer match
decoder, coarse-to-fine ConvRefiners, and the two-pass matcher API.

TPU-native re-design of the reference model stack
(/root/reference/romatch/models/matcher.py:275-766 Decoder/RegressionMatcher,
encoders.py:80-122 CNNandDinov2, assembled per model_zoo/roma_models.py:18-170).

Key structural choices (vs the reference):
- NHWC, channels-last flows; bf16 compute, fp32 params/BN/GP.
- one flax module tree; DINOv2 runs under stop_gradient (frozen, as
  encoders.py:104,115-118 hides it from DDP/autograd).
- `old_stuff` recurrent ViT state is dropped: with a single coarse scale it
  is never consumed (matcher.py:341-379 threads zeros through one call).
- the decoder's scale list is a static argument, so the 560^2 first pass and
  the 864^2 upsample pass (VGG-only pyramid, scales 8..1; matcher.py:664-682)
  jit separately with fixed shapes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from roma_tpu.config import RomaConfig
from roma_tpu.models.dinov2 import DinoViT
from roma_tpu.models.gp import GP
from roma_tpu.models.refiner import ConvRefiner
from roma_tpu.models.transformer import TransformerDecoder
from roma_tpu.models.vgg import VGG19
from roma_tpu.ops.corr import coord_grid
from roma_tpu.ops.resize import (
    interpolate_bilinear,
    pil_bicubic_matrix,
    pil_bicubic_resize_device,
    resize_bicubic,
)
from roma_tpu.utils.geometry import cls_to_flow_refine, normalized_to_pixel
from roma_tpu.utils.sampling import sample_matches

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class CNNandDinov2(nn.Module):
    """Feature pyramid: VGG19 {1,2,4,8} + frozen DINOv2 patch tokens at 16.

    `coarse=False` (the upsample pass) skips DINOv2 entirely
    (encoders.py:114)."""

    cfg: RomaConfig = RomaConfig()
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        # remat'd VGG: at 560^2 its pre-pool activations dominate encoder
        # memory in training; recomputing them in backward keeps the batch-2
        # train step inside a 16 GB v5e (inference is unaffected — remat is
        # an autodiff-only transform)
        self.cnn = nn.remat(VGG19, static_argnums=(2,))(dtype=self.dtype)
        self.dinov2 = DinoViT(
            embed_dim=self.cfg.dinov2_dim,
            depth=self.cfg.dinov2_depth,
            num_heads=self.cfg.dinov2_heads,
            dtype=self.dtype,
        )

    def __call__(self, x: jax.Array, coarse: bool = True, train: bool = False):
        pyramid = dict(self.cnn(x, train))
        if coarse:
            feats16 = self.dinov2(x, train=train)
            pyramid[16] = jax.lax.stop_gradient(feats16)
        return pyramid


class Decoder(nn.Module):
    """Coarse-to-fine decode: GP + transformer at 1/16, refiners down to 1/1."""

    cfg: RomaConfig

    def setup(self):
        c = self.cfg
        dt = jnp.dtype(c.dtype)
        self.embedding_decoder = TransformerDecoder(
            hidden_dim=c.decoder_dim,
            out_dim=c.cls_res**2 + 1,
            num_blocks=c.num_decoder_blocks,
            num_heads=c.decoder_heads,
            dtype=dt,
        )
        self.gp16 = GP(gp_dim=c.gp.gp_dim, T=c.gp.kernel_temperature,
                       sigma_noise=c.gp.sigma_noise)
        self.proj = {
            s: nn.Sequential([
                nn.Conv(out, (1, 1), use_bias=True, dtype=dt,
                        param_dtype=jnp.float32),
                nn.BatchNorm(momentum=0.9, dtype=jnp.float32),
            ], name=f"proj_{s}")
            for s, (_in, out) in c.proj_dims.items()
        }
        self.refiners = {
            s: ConvRefiner(
                hidden_dim=rc.hidden_dim,
                displacement_emb_dim=rc.displacement_emb_dim,
                local_corr_radius=rc.local_corr_radius,
                hidden_blocks=rc.hidden_blocks,
                kernel_size=rc.kernel_size,
                disp_emb_gain=c.disp_emb_gain,
                dtype=dt,
                smooth_warp=c.smooth_warp_gather,
                name=f"refiner_{s}",
            )
            for s, rc in c.refiners.items()
        }

    def _proj(self, s: str, x: jax.Array, train: bool) -> jax.Array:
        conv, bn = self.proj[s].layers
        x = conv(x)
        return bn(x.astype(jnp.float32), use_running_average=not train).astype(x.dtype)

    def __call__(
        self,
        f1: Mapping[int, jax.Array],
        f2: Mapping[int, jax.Array],
        upsample: bool = False,
        flow: jax.Array | None = None,
        certainty: jax.Array | None = None,
        scale_factor: float = 1.0,
        train: bool = False,
    ) -> dict[int, dict[str, jax.Array]]:
        c = self.cfg
        scales = ["8", "4", "2", "1"] if upsample else ["16", "8", "4", "2", "1"]
        sizes = {s: f1[s].shape[1:3] for s in f1}
        # delta-flow normalization uses the FULL-RES dims (reference
        # matcher.py:338 `h, w = sizes[1]`, used at :397-399) — NOT the
        # per-scale feature dims: at "scale 16" the DINOv2 grid is actually
        # /14, so ins/(refine_init*W_full) != 1/(refine_init*w_s)
        h_full, w_full = sizes[1]
        coarsest = int(scales[0])
        b = f1[coarsest].shape[0]
        h_c, w_c = sizes[coarsest]

        if not upsample:
            flow = jnp.broadcast_to(coord_grid(h_c, w_c), (b, h_c, w_c, 2))
            certainty = jnp.zeros((b, h_c, w_c, 1), jnp.float32)
        else:
            flow = interpolate_bilinear(flow, (h_c, w_c))
            certainty = interpolate_bilinear(certainty, (h_c, w_c))

        corresps: dict[int, dict[str, jax.Array]] = {}
        for s in scales:
            ins = int(s)
            corresps[ins] = {}
            f1_s = self._proj(s, f1[ins], train)
            f2_s = self._proj(s, f2[ins], train)

            if ins == 16:
                gp_posterior = self.gp16(f1_s, f2_s)
                gm_cls, certainty = self.embedding_decoder(gp_posterior, f1_s, train=train)
                flow = cls_to_flow_refine(gm_cls)
                if train:
                    corresps[ins]["gm_cls"] = gm_cls
                    corresps[ins]["gm_certainty"] = certainty

            if s in self.refiners:
                if train:
                    corresps[ins]["flow_pre_delta"] = flow
                delta_flow, delta_cert = self.refiners[s](
                    f1_s, f2_s, flow, scale_factor=scale_factor, train=train
                )
                if train:
                    corresps[ins]["delta_flow"] = delta_flow
                # displacement in normalized units: ins * delta /
                # (refine_init * full_res) (matcher.py:397-399)
                disp = ins * jnp.stack(
                    [
                        delta_flow[..., 0] / (c.refine_init * w_full),
                        delta_flow[..., 1] / (c.refine_init * h_full),
                    ],
                    axis=-1,
                )
                flow = flow + disp
                certainty = certainty + delta_cert

            corresps[ins]["flow"] = flow
            corresps[ins]["certainty"] = certainty
            if s != "1":
                nh, nw = sizes[ins // 2]
                flow = interpolate_bilinear(flow, (nh, nw))
                certainty = interpolate_bilinear(certainty, (nh, nw))
                # detach between scales (Decoder(detach=True), matcher.py:418-420)
                flow = jax.lax.stop_gradient(flow)
                certainty = jax.lax.stop_gradient(certainty)
        return corresps


class RomaModel(nn.Module):
    """Encoder + decoder; one forward = one decode pass at one resolution."""

    cfg: RomaConfig = RomaConfig()

    def setup(self):
        self.encoder = CNNandDinov2(self.cfg, dtype=jnp.dtype(self.cfg.dtype))
        self.decoder = Decoder(self.cfg)

    def encode(self, x: jax.Array, coarse: bool = True, train: bool = False):
        return self.encoder(x, coarse=coarse, train=train)

    def __call__(
        self,
        im_a: jax.Array,
        im_b: jax.Array,
        symmetric: bool = True,
        upsample: bool = False,
        flow: jax.Array | None = None,
        certainty: jax.Array | None = None,
        scale_factor: float = 1.0,
        train: bool = False,
    ):
        """Images are ImageNet-normalized (B, H, W, 3).

        symmetric: decode A->B and B->A in one batched pass (matcher.py:516-528);
        outputs have leading dim 2B (A->B stacked over B->A).
        """
        B = im_a.shape[0]
        x = jnp.concatenate([im_a, im_b], axis=0)
        # the upsample pass skips DINOv2 — VGG-only pyramid, scale 16 unused
        pyramid = self.encode(x, coarse=not upsample, train=train)
        if symmetric:
            f_q = pyramid
            f_s = {
                k: jnp.concatenate([v[B:], v[:B]], axis=0) for k, v in pyramid.items()
            }
        else:
            f_q = {k: v[:B] for k, v in pyramid.items()}
            f_s = {k: v[B:] for k, v in pyramid.items()}
        return self.decoder(
            f_q, f_s, upsample=upsample, flow=flow, certainty=certainty,
            scale_factor=scale_factor, train=train,
        )


@dataclass
class RomaMatcher:
    """User-facing full-RoMa matcher (reference RegressionMatcher.match,
    matcher.py:593-730): two-pass coarse->upsample inference, certainty
    attenuation, symmetric warp assembly, balanced sampling."""

    params: Any
    cfg: RomaConfig = field(default_factory=RomaConfig)

    def __post_init__(self):
        self.model = RomaModel(self.cfg)
        self._fwd = jax.jit(
            lambda p, a, b: self.model.apply(
                p, a, b, symmetric=self.cfg.symmetric, train=False
            )
        )
        self._fwd_up = jax.jit(
            lambda p, a, b, flow, cert, sf: self.model.apply(
                p, a, b, symmetric=self.cfg.symmetric, upsample=True,
                flow=flow, certainty=cert, scale_factor=sf, train=False,
            )
        )
        # one jitted postprocess (attenuation + sigmoid + oob mask + warp
        # assembly): ~12 eager dispatches otherwise, each a network
        # round-trip on the remote-TPU runtime
        self._post = jax.jit(
            self._postprocess, static_argnames=("hs", "ws", "symmetric", "attenuate")
        )
        # fused resize+normalize for both images in one dispatch
        self._prep = jax.jit(self._preprocess, static_argnames=("hs", "ws"))
        self._norm_jit = jax.jit(self._norm_u8)
        self._prep_raw = jax.jit(self._prep_raw_impl, static_argnames=("up",))

    @staticmethod
    def _preprocess(im_a, im_b, *, hs, ws):
        if im_a.shape[1:3] == im_b.shape[1:3]:
            x = jnp.concatenate([im_a, im_b], axis=0)
            x = (resize_bicubic(x, (hs, ws)) - IMAGENET_MEAN) / IMAGENET_STD
            B = im_a.shape[0]
            return x[:B], x[B:]
        # differently-sized inputs (the reference resizes each before
        # batching, matcher.py:633-648): resize separately, then normalize
        a = (resize_bicubic(im_a, (hs, ws)) - IMAGENET_MEAN) / IMAGENET_STD
        b = (resize_bicubic(im_b, (hs, ws)) - IMAGENET_MEAN) / IMAGENET_STD
        return a, b

    @staticmethod
    def _postprocess(flow, certainty, cert16, *, hs, ws, symmetric, attenuate):
        """Final-scale outputs -> (warp, certainty) (matcher.py:653-725)."""
        B = flow.shape[0] // 2 if symmetric else flow.shape[0]
        if attenuate:
            lrc = interpolate_bilinear(cert16, (hs, ws))
            certainty = certainty - 0.5 * lrc * (lrc < 0)
        certainty = jax.nn.sigmoid(certainty[..., 0])
        # zero certainty for out-of-bounds targets, clamp flow (matcher.py:708-711)
        oob = jnp.any(jnp.abs(flow) > 1, axis=-1)
        certainty = jnp.where(oob, 0.0, certainty)
        flow = jnp.clip(flow, -1, 1)

        grid = jnp.broadcast_to(coord_grid(hs, ws), (B, hs, ws, 2))
        if symmetric:
            a_to_b, b_to_a = flow[:B], flow[B:]
            q_warp = jnp.concatenate([grid, a_to_b], axis=-1)
            s_warp = jnp.concatenate([b_to_a, grid], axis=-1)
            warp = jnp.concatenate([q_warp, s_warp], axis=2)  # side-by-side in W
            certainty = jnp.concatenate([certainty[:B], certainty[B:]], axis=2)
        else:
            warp = jnp.concatenate([grid, flow], axis=-1)
        return warp, certainty

    @staticmethod
    def init(key: jax.Array, cfg: RomaConfig = RomaConfig()):
        model = RomaModel(cfg)
        h, w = 224, 224  # shapes don't matter for param shapes; init small
        x = jnp.zeros((1, h, w, 3), jnp.float32)
        # one jitted call: eager flax init dispatches hundreds of tiny ops,
        # each a network round-trip on the remote-TPU runtime (~4 min); a
        # single compiled graph (persistent-cached) takes seconds
        init_fn = jax.jit(
            lambda k, a, b: model.init(k, a, b, symmetric=False, train=False)
        )
        params = init_fn(key, x, x)
        return RomaMatcher(params, cfg)

    @staticmethod
    def normalize(im: jax.Array) -> jax.Array:
        return (im - IMAGENET_MEAN) / IMAGENET_STD

    @staticmethod
    def _norm_u8(x: jax.Array) -> jax.Array:
        """uint8 [0,255] -> ImageNet-normalized float32, on device. The
        host->device link on the tunneled runtime moves ~38 MB/s, so images
        ship as uint8 (4x fewer bytes than f32) and normalize on-chip —
        identical f32 math to the host path."""
        x = x.astype(jnp.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def _host_prep(self, pil_im, hs: int, ws: int) -> jax.Array:
        """Reference-protocol host preprocessing for PIL inputs: PIL bicubic
        resize (torchvision Resize on a PIL image = PIL's antialiased
        bicubic, utils.py:165-174), shipped uint8, + /255 + ImageNet
        normalize on device. The device graphs then only ever see the FIXED
        (hs, ws) shapes, so a real-data eval over hundreds of unique image
        sizes compiles O(1) times instead of once per size (the device
        `_prep` jit is keyed on the raw input shape)."""
        r = self.host_resize_np(pil_im, hs, ws)
        return self._norm_jit(jnp.asarray(r[None]))

    def match(self, im_a, im_b, batched: bool = False):
        """im_a, im_b: (H, W, 3) or (B, H, W, 3) float [0,1], image paths, or
        PIL Images (paths/PIL resize on host — one compile for any eval set).

        Returns (warp, certainty): symmetric warp (B, hs, 2*ws, 4) + certainty
        (B, hs, 2*ws) at the output resolution (upsample_res when two-pass)."""
        from PIL import Image

        if isinstance(im_a, (str, bytes)) or hasattr(im_a, "__fspath__"):
            im_a = Image.open(im_a).convert("RGB")
            im_b = Image.open(im_b).convert("RGB")
        pil_mode = isinstance(im_a, Image.Image)
        if pil_mode:
            im_a = im_a.convert("RGB")
            im_b = im_b.convert("RGB")
        elif im_a.ndim == 3:
            im_a, im_b = im_a[None], im_b[None]
        cfg = self.cfg
        hs, ws = cfg.coarse_resolution
        if pil_mode:
            a = self._host_prep(im_a, hs, ws)
            b = self._host_prep(im_b, hs, ws)
        else:
            a, b = self._prep(im_a, im_b, hs=hs, ws=ws)
        corresps = self._fwd(self.params, a, b)
        cert16 = corresps[16]["certainty"] if cfg.attenuate_cert else None

        if cfg.upsample_preds:
            hs, ws = cfg.upsample_resolution
            finest = corresps[1]
            if pil_mode:
                # re-transform the ORIGINALS at the upsample resolution
                # (reference matcher.py:667-676)
                a2 = self._host_prep(im_a, hs, ws)
                b2 = self._host_prep(im_b, hs, ws)
            else:
                a2, b2 = self._prep(im_a, im_b, hs=hs, ws=ws)
            sf = float(np.sqrt(
                (hs * ws) / (cfg.coarse_resolution[0] * cfg.coarse_resolution[1])
            ))
            corresps = self._fwd_up(
                self.params, a2, b2, finest["flow"], finest["certainty"], sf
            )

        if cert16 is None:
            cert16 = jnp.zeros_like(corresps[1]["certainty"][:, :1, :1])
        warp, certainty = self._post(
            corresps[1]["flow"], corresps[1]["certainty"], cert16,
            hs=hs, ws=ws, symmetric=cfg.symmetric, attenuate=cfg.attenuate_cert,
        )
        if batched:
            return warp, certainty
        return warp[0], certainty[0]

    def sample(self, warp, certainty, num: int = 10000, key: jax.Array | None = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return sample_matches(
            key, warp, certainty, num=num, sample_thresh=self.cfg.sample_thresh
        )

    # ---- batched-eval fast path (VERDICT r3 #2: the reference harness runs
    # pairs serially at batch 1, megadepth_pose_estimation_benchmark.py:33-42;
    # TPU-first eval stacks pairs on the batch axis so the chip never idles
    # between host RANSAC calls). The harness feeds these when present.

    @staticmethod
    def host_resize_np(pil_im, hs: int, ws: int) -> np.ndarray:
        """Protocol host resize only: PIL bicubic -> (hs, ws, 3) uint8.
        Safe to call from loader threads; normalization happens on device
        (`_norm_u8`) so the host->device transfer ships 1/4 the bytes."""
        from PIL import Image

        r = pil_im.convert("RGB").resize((ws, hs), Image.BICUBIC)
        return np.asarray(r, np.uint8)

    def host_prep_np(self, pil_im, hs: int, ws: int) -> np.ndarray:
        """PIL bicubic resize + ImageNet normalize on host -> (hs, ws, 3)
        float32 (prefer host_resize_np + uint8 shipping on slow links)."""
        x = self.host_resize_np(pil_im, hs, ws).astype(np.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    def _as_normalized(self, x) -> jax.Array:
        x = jnp.asarray(x)
        return self._norm_jit(x) if x.dtype == jnp.uint8 else x

    def match_prepped(self, a, b, a2=None, b2=None):
        """Two-pass match on already-prepped batches: `a`/`b` (B, hc, wc, 3)
        at coarse_resolution, `a2`/`b2` (B, hu, wu, 3) at upsample_resolution
        (required iff cfg.upsample_preds) — either host_prep_np-normalized
        float32 or host_resize_np uint8 (normalized on device). Returns
        batched (warp, certainty) exactly like match(batched=True)."""
        cfg = self.cfg
        hs, ws = cfg.coarse_resolution
        corresps = self._fwd(
            self.params, self._as_normalized(a), self._as_normalized(b)
        )
        cert16 = corresps[16]["certainty"] if cfg.attenuate_cert else None
        if cfg.upsample_preds:
            hs, ws = cfg.upsample_resolution
            finest = corresps[1]
            sf = float(np.sqrt(
                (hs * ws) / (cfg.coarse_resolution[0] * cfg.coarse_resolution[1])
            ))
            corresps = self._fwd_up(
                self.params, self._as_normalized(a2), self._as_normalized(b2),
                finest["flow"], finest["certainty"], sf,
            )
        if cert16 is None:
            cert16 = jnp.zeros_like(corresps[1]["certainty"][:, :1, :1])
        return self._post(
            corresps[1]["flow"], corresps[1]["certainty"], cert16,
            hs=hs, ws=ws, symmetric=cfg.symmetric, attenuate=cfg.attenuate_cert,
        )

    # ---- device-side resize fast path (VERDICT r4 #3): the tunneled
    # host->device link moves ~38 MB/s, and shipping BOTH model resolutions
    # as uint8 still costs ~6.4 MB/pair. Shipping the ORIGINAL-resolution
    # uint8 once (~1.8 MB/pair for 480x640 sources) and doing PIL-parity
    # antialiased bicubic on device via per-size interpolation-matrix banks
    # cuts the upload 3.5x and serves both passes from one transfer.

    def build_resize_banks(self, sizes, bucket):
        """Device-resident PIL-parity resize matrix banks.

        sizes: list of unique source (h, w); bucket: (Hb, Wb) padded-canvas
        dims (>= every source). Returns a tuple of stacked device arrays
        (ry_c, rx_c[, ry_u, rx_u]): bank row i resizes a zero-padded
        (Hb, Wb) canvas holding a sizes[i] image exactly as PIL BICUBIC
        resizes the unpadded image (columns beyond the source are zero).
        Upload once; reuse for the whole eval."""
        hb, wb = bucket
        hc, wc = self.cfg.coarse_resolution
        ry_c = np.stack([pil_bicubic_matrix(h, hc, hb) for h, _ in sizes])
        rx_c = np.stack([pil_bicubic_matrix(w, wc, wb) for _, w in sizes])
        banks = [jax.device_put(ry_c), jax.device_put(rx_c)]
        if self.cfg.upsample_preds:
            hu, wu = self.cfg.upsample_resolution
            ry_u = np.stack([pil_bicubic_matrix(h, hu, hb) for h, _ in sizes])
            rx_u = np.stack([pil_bicubic_matrix(w, wu, wb) for _, w in sizes])
            banks += [jax.device_put(ry_u), jax.device_put(rx_u)]
        return tuple(banks)

    @staticmethod
    def _prep_raw_impl(raw, idx, ry_c, rx_c, ry_u=None, rx_u=None, *, up=False):
        """(2B, Hb, Wb, 3) uint8 canvases + per-image bank rows -> normalized
        model-resolution batches for both passes, in one fused dispatch."""
        x = raw.astype(jnp.float32)
        xc = pil_bicubic_resize_device(x, ry_c[idx], rx_c[idx]) / 255.0
        xc = (xc - IMAGENET_MEAN) / IMAGENET_STD
        if not up:
            return xc
        xu = pil_bicubic_resize_device(x, ry_u[idx], rx_u[idx]) / 255.0
        xu = (xu - IMAGENET_MEAN) / IMAGENET_STD
        return xc, xu

    def match_raw(self, raw, idx, banks):
        """Batched two-pass match from ORIGINAL-resolution uint8 canvases.

        raw: (2B, Hb, Wb, 3) uint8, zero-padded originals — the first B rows
        are the A images, the last B the B images; idx: (2B,) int32 bank
        rows; banks: from build_resize_banks. Equivalent to match_prepped on
        host PIL resizes up to the <=1-uint8-level matrix-resize parity."""
        B = raw.shape[0] // 2
        if self.cfg.upsample_preds:
            xc, xu = self._prep_raw(raw, idx, *banks, up=True)
            return self.match_prepped(xc[:B], xc[B:], xu[:B], xu[B:])
        xc = self._prep_raw(raw, idx, *banks, up=False)
        return self.match_prepped(xc[:B], xc[B:])

    def sample_batched(self, warps, certs, num: int, keys):
        """Per-pair balanced sampling vmapped over the batch axis: one
        dispatch for B pairs (identical per-pair math to `sample`)."""
        if not hasattr(self, "_sample_vmapped"):
            self._sample_vmapped = {}
        fn = self._sample_vmapped.get(num)
        if fn is None:
            thresh = self.cfg.sample_thresh
            fn = jax.jit(jax.vmap(
                lambda k, w, c: sample_matches(
                    k, w, c, num=num, sample_thresh=thresh
                )
            ))
            self._sample_vmapped[num] = fn
        return fn(jnp.stack(list(keys)), warps, certs)

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
            warp, certainty, im_a, im_b,
            symmetric=self.cfg.symmetric, save_path=save_path,
        )
