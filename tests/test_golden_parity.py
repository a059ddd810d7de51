"""Golden numerical-parity tests vs the torch reference (VERDICT r1 #1).

Each test instantiates the corresponding reference torch module with random
init, ports its state_dict through `roma_tpu.models.port`, runs both
forwards in fp32 on identical inputs, and asserts max-abs-error within a
stated budget. The reference is imported via tests/ref_oracle.py as a black
box; see PARITY.md for the measured error table and tolerance budget.

Budgets: single convs / BN / resamplers are exact to fp32 roundoff (~1e-6);
deep stacks (24-block ViT, 9-block refiners) accumulate reassociation noise
through matmul/conv reduction-order differences, budgeted relative to the
output scale.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_oracle import load_romatch, nchw_to_nhwc, to_numpy

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def romatch():
    return load_romatch()


def _seed(n: int = 0):
    torch.manual_seed(n)
    np.random.seed(n)


def _randomize_bn_stats(module, gen):
    """Give every BatchNorm non-trivial running stats so eval-mode parity
    actually exercises the ported statistics."""
    for m in module.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(
                    torch.tensor(
                        gen.standard_normal(m.running_mean.shape) * 0.1,
                        dtype=torch.float32,
                    )
                )
                m.running_var.copy_(
                    torch.tensor(
                        gen.uniform(0.5, 1.5, m.running_var.shape),
                        dtype=torch.float32,
                    )
                )


def _report(name: str, ours: np.ndarray, ref: np.ndarray, tol: float):
    err = np.max(np.abs(ours - ref))
    scale = max(np.max(np.abs(ref)), 1e-12)
    print(f"PARITY {name}: max_abs_err={err:.3e} ref_scale={scale:.3e} "
          f"rel={err / scale:.3e} tol={tol:.1e}")
    assert err < tol, f"{name}: max abs err {err} >= {tol} (ref scale {scale})"


# ---------------------------------------------------------------------------
# DINOv2 ViT-L
# ---------------------------------------------------------------------------

def test_dinov2_parity(romatch):
    """Full-depth ViT-L/14 forward_features patch tokens, non-square input
    (exercises the +0.1 pos-embed interpolation kludge, dinov2.py:166-190)."""
    from romatch.models.transformer import vit_large

    from roma_tpu.models.dinov2 import DinoViT
    from roma_tpu.models.port import port_dinov2

    _seed(0)
    ref = vit_large(
        img_size=518, patch_size=14, init_values=1.0, block_chunks=0
    ).eval()
    # random-but-nontrivial weights: default init gives ~0 LayerScale inputs
    gen = np.random.default_rng(0)
    with torch.no_grad():
        ref.pos_embed.copy_(torch.tensor(
            gen.standard_normal(ref.pos_embed.shape) * 0.02, dtype=torch.float32))

    H, W = 224, 154  # 16 x 11 patches
    x = gen.standard_normal((1, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref.forward_features(torch.tensor(x))["x_norm_patchtokens"]
    out_ref = to_numpy(out_ref).reshape(1, H // 14, W // 14, -1)

    model = DinoViT(dtype=jnp.float32)
    variables = port_dinov2(ref.state_dict())  # already {"params": ...}
    out = np.asarray(model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    _report("dinov2_vitl14", out, out_ref, 5e-4)


# ---------------------------------------------------------------------------
# VGG19-bn pyramid
# ---------------------------------------------------------------------------

def test_vgg19_parity(romatch):
    from romatch.models.encoders import VGG19 as RefVGG19

    from roma_tpu.models.port import port_vgg19
    from roma_tpu.models.vgg import VGG19

    _seed(1)
    gen = np.random.default_rng(1)
    ref = RefVGG19(pretrained=False).eval()
    _randomize_bn_stats(ref, gen)

    x = gen.standard_normal((2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        feats_ref = ref(torch.tensor(x))

    variables = port_vgg19(ref.state_dict(), prefix="layers.")
    model = VGG19(dtype=jnp.float32)
    feats = model.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), train=False,
    )
    for s in (1, 2, 4, 8):
        _report(f"vgg19_scale{s}", np.asarray(feats[s]), nchw_to_nhwc(feats_ref[s]), 2e-4)


# ---------------------------------------------------------------------------
# GP coarse matcher (Cholesky vs the reference's dense inverse)
# ---------------------------------------------------------------------------

def test_gp_parity(romatch):
    from romatch.models.matcher import GP as RefGP, CosKernel

    from roma_tpu.models.gp import GP
    from roma_tpu.models.port import port_gp

    _seed(2)
    gen = np.random.default_rng(2)
    ref = RefGP(
        CosKernel, T=0.2, gp_dim=64, basis="fourier", no_cov=True,
        sigma_noise=0.1,
    ).eval()

    B, C, H, W = 2, 32, 12, 16
    x = gen.standard_normal((B, C, H, W)).astype(np.float32)
    y = gen.standard_normal((B, C, H, W)).astype(np.float32)
    with torch.no_grad():
        mu_ref = ref(torch.tensor(x), torch.tensor(y))

    model = GP(gp_dim=64)
    out = model.apply(
        {"params": port_gp(ref.state_dict())},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y.transpose(0, 2, 3, 1)),
    )
    _report("gp_posterior", np.asarray(out), nchw_to_nhwc(mu_ref), 1e-4)


# ---------------------------------------------------------------------------
# Transformer match decoder
# ---------------------------------------------------------------------------

def test_transformer_decoder_parity(romatch):
    from romatch.models.matcher import GP  # noqa: F401  (matcher import side effects)
    from romatch.models.transformer import (
        Block as RefBlock,
        MemEffAttention,
        TransformerDecoder as RefDecoder,
    )

    from roma_tpu.models.port import port_transformer_decoder
    from roma_tpu.models.transformer import TransformerDecoder

    _seed(3)
    gen = np.random.default_rng(3)
    hidden, out_dim, n_blocks = 128, 8 * 8 + 1, 2
    ref = RefDecoder(
        torch.nn.Sequential(
            *[RefBlock(hidden, 8, attn_class=MemEffAttention) for _ in range(n_blocks)]
        ),
        hidden, out_dim, is_classifier=True, amp=True, pos_enc=False,
    ).eval()

    B, H, W = 2, 6, 8
    gp_post = gen.standard_normal((B, 64, H, W)).astype(np.float32)
    feats = gen.standard_normal((B, 64, H, W)).astype(np.float32)
    with torch.no_grad():
        warp_ref, cert_ref, _ = ref(
            torch.tensor(gp_post), torch.tensor(feats), None, None
        )

    model = TransformerDecoder(
        hidden_dim=hidden, out_dim=out_dim, num_blocks=n_blocks, num_heads=8,
        dtype=jnp.float32,
    )
    cls, cert = model.apply(
        {"params": port_transformer_decoder(ref.state_dict(), num_blocks=n_blocks)},
        jnp.asarray(gp_post.transpose(0, 2, 3, 1)),
        jnp.asarray(feats.transpose(0, 2, 3, 1)),
    )
    _report("decoder_cls", np.asarray(cls), nchw_to_nhwc(warp_ref), 2e-4)
    _report("decoder_cert", np.asarray(cert), nchw_to_nhwc(cert_ref), 2e-4)


# ---------------------------------------------------------------------------
# ConvRefiner (warp gather + local correlation + depthwise stack)
# ---------------------------------------------------------------------------

def test_conv_refiner_parity(romatch):
    from romatch.models.matcher import ConvRefiner as RefConvRefiner

    from roma_tpu.models.port import port_conv_refiner
    from roma_tpu.models.refiner import ConvRefiner

    _seed(4)
    gen = np.random.default_rng(4)
    C, emb, r, blocks = 32, 16, 2, 3
    in_dim = 2 * C + emb + (2 * r + 1) ** 2
    ref = RefConvRefiner(
        in_dim, in_dim, 3, kernel_size=5, dw=True, hidden_blocks=blocks,
        displacement_emb="linear", displacement_emb_dim=emb,
        local_corr_radius=r, corr_in_other=True, amp=False, bn_momentum=0.01,
    ).eval()
    _randomize_bn_stats(ref, gen)

    B, H, W = 2, 12, 16
    x = gen.standard_normal((B, C, H, W)).astype(np.float32)
    y = gen.standard_normal((B, C, H, W)).astype(np.float32)
    # plausible flow: identity + noise, some samples out of bounds
    gy, gx = np.meshgrid(
        np.linspace(-1 + 1 / H, 1 - 1 / H, H),
        np.linspace(-1 + 1 / W, 1 - 1 / W, W), indexing="ij",
    )
    flow = np.stack([gx, gy], 0)[None].repeat(B, 0).astype(np.float32)
    flow += gen.standard_normal(flow.shape).astype(np.float32) * 0.15
    with torch.no_grad():
        d_ref, c_ref = ref(
            torch.tensor(x), torch.tensor(y), torch.tensor(flow), scale_factor=2.0
        )

    params, stats = port_conv_refiner(ref.state_dict(), hidden_blocks=blocks)
    model = ConvRefiner(
        hidden_dim=in_dim, displacement_emb_dim=emb, local_corr_radius=r,
        hidden_blocks=blocks, dtype=jnp.float32,
    )
    d, c = model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(y.transpose(0, 2, 3, 1)),
        jnp.asarray(flow.transpose(0, 2, 3, 1)), scale_factor=2.0,
    )
    _report("refiner_delta_flow", np.asarray(d), nchw_to_nhwc(d_ref), 5e-4)
    _report("refiner_delta_cert", np.asarray(c), nchw_to_nhwc(c_ref), 5e-4)


# ---------------------------------------------------------------------------
# cls_to_flow_refine decoding
# ---------------------------------------------------------------------------

def test_cls_to_flow_refine_parity(romatch):
    from romatch.utils.utils import cls_to_flow_refine as ref_fn

    from roma_tpu.utils.geometry import cls_to_flow_refine

    gen = np.random.default_rng(5)
    B, res, H, W = 2, 16, 6, 8
    logits = (gen.standard_normal((B, res * res, H, W)) * 3).astype(np.float32)
    with torch.no_grad():
        ref = ref_fn(torch.tensor(logits))  # returns (B, H, W, 2) already
    out = cls_to_flow_refine(jnp.asarray(logits.transpose(0, 2, 3, 1)))
    _report("cls_to_flow_refine", np.asarray(out), to_numpy(ref), 1e-5)


# ---------------------------------------------------------------------------
# Composed full-RoMa forward (flagship parity test)
# ---------------------------------------------------------------------------

def _build_reference_matcher(romatch, vit_sd):
    """Assemble the reference RegressionMatcher exactly as
    roma_models.py:18-170 does (using the reference's own classes), with
    amp_dtype=float32 so the CPU forward is fp32 end to end."""
    import torch.nn as tnn

    from romatch.models.encoders import CNNandDinov2
    from romatch.models.matcher import (
        ConvRefiner, CosKernel, Decoder, GP, RegressionMatcher,
    )
    from romatch.models.transformer import (
        Block, MemEffAttention, TransformerDecoder,
    )

    gp_dim, feat_dim = 512, 512
    decoder_dim = gp_dim + feat_dim
    coordinate_decoder = TransformerDecoder(
        tnn.Sequential(*[Block(decoder_dim, 8, attn_class=MemEffAttention)
                         for _ in range(5)]),
        decoder_dim, 64 * 64 + 1, is_classifier=True, amp=True, pos_enc=False,
    )
    rk = dict(kernel_size=5, dw=True, hidden_blocks=8,
              displacement_emb="linear", corr_in_other=True, amp=True,
              disable_local_corr_grad=True, bn_momentum=0.01,
              amp_dtype=torch.float32)
    conv_refiner = tnn.ModuleDict({
        "16": ConvRefiner(2 * 512 + 128 + 15 ** 2, 2 * 512 + 128 + 15 ** 2, 3,
                          displacement_emb_dim=128, local_corr_radius=7, **rk),
        "8": ConvRefiner(2 * 512 + 64 + 7 ** 2, 2 * 512 + 64 + 7 ** 2, 3,
                         displacement_emb_dim=64, local_corr_radius=3, **rk),
        "4": ConvRefiner(2 * 256 + 32 + 5 ** 2, 2 * 256 + 32 + 5 ** 2, 3,
                         displacement_emb_dim=32, local_corr_radius=2, **rk),
        "2": ConvRefiner(2 * 64 + 16, 128 + 16, 3,
                         displacement_emb_dim=16, local_corr_radius=None, **rk),
        "1": ConvRefiner(2 * 9 + 6, 24, 3,
                         displacement_emb_dim=6, local_corr_radius=None, **rk),
    })
    gp16 = GP(CosKernel, T=0.2, learn_temperature=False, only_attention=False,
              gp_dim=gp_dim, basis="fourier", no_cov=True)
    gps = tnn.ModuleDict({"16": gp16})
    proj = tnn.ModuleDict({
        "16": tnn.Sequential(tnn.Conv2d(1024, 512, 1, 1), tnn.BatchNorm2d(512)),
        "8": tnn.Sequential(tnn.Conv2d(512, 512, 1, 1), tnn.BatchNorm2d(512)),
        "4": tnn.Sequential(tnn.Conv2d(256, 256, 1, 1), tnn.BatchNorm2d(256)),
        "2": tnn.Sequential(tnn.Conv2d(128, 64, 1, 1), tnn.BatchNorm2d(64)),
        "1": tnn.Sequential(tnn.Conv2d(64, 9, 1, 1), tnn.BatchNorm2d(9)),
    })
    decoder = Decoder(coordinate_decoder, gps, proj, conv_refiner,
                      detach=True, scales=["16", "8", "4", "2", "1"],
                      amp_dtype=torch.float32)
    encoder = CNNandDinov2(
        cnn_kwargs=dict(pretrained=False, amp=True),
        amp=True, use_vgg=True, dinov2_weights=vit_sd,
        amp_dtype=torch.float32,
    )
    return RegressionMatcher(
        encoder, decoder, h=224, w=224, upsample_preds=False,
        symmetric=True, attenuate_cert=True,
    ).eval()


@pytest.fixture(scope="module")
def composed_pair(romatch):
    """Reference matcher + ported flax variables + a shared input pair."""
    from romatch.models.transformer import vit_large

    from roma_tpu.config import RefinerConfig, RomaConfig
    from roma_tpu.models.port import port_roma

    _seed(10)
    gen = np.random.default_rng(10)
    vit = vit_large(img_size=518, patch_size=14, init_values=1.0,
                    block_chunks=0)
    with torch.no_grad():
        vit.pos_embed.copy_(torch.tensor(
            gen.standard_normal(vit.pos_embed.shape) * 0.02,
            dtype=torch.float32))
    vit_sd = vit.state_dict()
    ref = _build_reference_matcher(romatch, vit_sd)
    _randomize_bn_stats(ref, gen)

    cfg = RomaConfig(
        coarse_resolution=(224, 224), upsample_resolution=(336, 336),
        dtype="float32",
    )
    variables = port_roma(ref.state_dict(), dinov2_state=vit_sd)

    a = gen.standard_normal((1, 3, 224, 224)).astype(np.float32)
    b = gen.standard_normal((1, 3, 224, 224)).astype(np.float32)
    return ref, cfg, variables, a, b


def test_full_roma_forward_parity(composed_pair):
    """One symmetric coarse pass at 224^2 through the REAL architecture
    (ViT-L 24 blocks, 5-block decoder, 5 refiners at shipped dims), random
    init ported torch->flax; per-scale flow/certainty must agree."""
    from roma_tpu.models.matcher import RomaModel

    ref, cfg, variables, a, b = composed_pair
    with torch.no_grad():
        corr_ref = ref.forward_symmetric(
            {"im_A": torch.tensor(a), "im_B": torch.tensor(b)}, batched=True
        )

    model = RomaModel(cfg)
    corr = model.apply(
        variables, jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1)), symmetric=True, train=False,
    )
    for s in (16, 8, 4, 2, 1):
        _report(f"roma_flow_s{s}", np.asarray(corr[s]["flow"]),
                nchw_to_nhwc(corr_ref[s]["flow"]), 1e-4)
        _report(f"roma_cert_s{s}", np.asarray(corr[s]["certainty"]),
                nchw_to_nhwc(corr_ref[s]["certainty"]), 1e-4)


def test_full_roma_upsample_pass_parity(composed_pair):
    """The 336^2 second pass (VGG-only pyramid, flow/certainty init from the
    coarse pass, scale_factor=sqrt(area ratio))."""
    from roma_tpu.models.matcher import RomaModel

    ref, cfg, variables, a, b = composed_pair
    gen = np.random.default_rng(11)
    a2 = gen.standard_normal((1, 3, 336, 336)).astype(np.float32)
    b2 = gen.standard_normal((1, 3, 336, 336)).astype(np.float32)
    # a plausible finest flow/certainty to init from
    gy, gx = np.meshgrid(np.linspace(-1 + 1 / 224, 1 - 1 / 224, 224),
                         np.linspace(-1 + 1 / 224, 1 - 1 / 224, 224),
                         indexing="ij")
    flow = np.stack([gx, gy], 0)[None].repeat(2, 0).astype(np.float32)
    flow += gen.standard_normal(flow.shape).astype(np.float32) * 0.05
    cert = gen.standard_normal((2, 1, 224, 224)).astype(np.float32)
    sf = float(np.sqrt(336 * 336 / (224 * 224)))

    with torch.no_grad():
        corr_ref = ref.forward_symmetric(
            {"im_A": torch.tensor(a2), "im_B": torch.tensor(b2),
             "corresps": {"flow": torch.tensor(flow),
                          "certainty": torch.tensor(cert)}},
            batched=True, upsample=True, scale_factor=sf,
        )

    model = RomaModel(cfg)
    corr = model.apply(
        variables, jnp.asarray(a2.transpose(0, 2, 3, 1)),
        jnp.asarray(b2.transpose(0, 2, 3, 1)), symmetric=True, upsample=True,
        flow=jnp.asarray(flow.transpose(0, 2, 3, 1)),
        certainty=jnp.asarray(cert.transpose(0, 2, 3, 1)),
        scale_factor=sf, train=False,
    )
    for s in (8, 4, 2, 1):
        _report(f"roma_up_flow_s{s}", np.asarray(corr[s]["flow"]),
                nchw_to_nhwc(corr_ref[s]["flow"]), 1e-4)
        _report(f"roma_up_cert_s{s}", np.asarray(corr[s]["certainty"]),
                nchw_to_nhwc(corr_ref[s]["certainty"]), 1e-4)


# ---------------------------------------------------------------------------
# Tiny RoMa forward
# ---------------------------------------------------------------------------

def _make_torch_xfeat():
    """torch twin of the XFeat trunk (channel plan per models/xfeat.py,
    visible in the fork's from-scratch copy, model_tiny1.py:34-117)."""
    import torch.nn as tnn

    from romatch.models.tiny import BasicLayer

    class XFeatTwin(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm = tnn.InstanceNorm2d(1)
            self.skip1 = tnn.Sequential(
                tnn.AvgPool2d(4, stride=4), tnn.Conv2d(1, 24, 1)
            )
            self.block1 = tnn.Sequential(
                BasicLayer(1, 4, stride=1), BasicLayer(4, 8, stride=2),
                BasicLayer(8, 8, stride=1), BasicLayer(8, 24, stride=2),
            )
            self.block2 = tnn.Sequential(
                BasicLayer(24, 24), BasicLayer(24, 24),
            )
            self.block3 = tnn.Sequential(
                BasicLayer(24, 64, stride=2), BasicLayer(64, 64),
                BasicLayer(64, 64, kernel_size=1, padding=0),
            )
            self.block4 = tnn.Sequential(
                BasicLayer(64, 64, stride=2), BasicLayer(64, 64),
                BasicLayer(64, 64),
            )
            self.block5 = tnn.Sequential(
                BasicLayer(64, 128, stride=2), BasicLayer(128, 128),
                BasicLayer(128, 128),
                BasicLayer(128, 64, kernel_size=1, padding=0),
            )
            self.block_fusion = tnn.Sequential(
                BasicLayer(64, 64), BasicLayer(64, 64), tnn.Conv2d(64, 64, 1)
            )
            self.heatmap_head = tnn.Identity()
            self.keypoint_head = tnn.Identity()
            self.fine_matcher = tnn.Identity()

    return XFeatTwin()


@pytest.mark.parametrize("exact_softmax", [True, False])
def test_tiny_roma_forward_parity(romatch, exact_softmax):
    """Full TinyRoMa forward (XFeat trunk + corr volume + pos_embed +
    coarse/fine matchers), exact path and the reference's strided-argmax
    inference shortcut (faithful quirk mode)."""
    from romatch.models.tiny import TinyRoMa as RefTinyRoma

    from roma_tpu.config import TinyRomaConfig
    from roma_tpu.models.port import port_tiny_roma
    from roma_tpu.models.tiny_roma import TinyRoma

    _seed(20)
    gen = np.random.default_rng(20)
    ref = RefTinyRoma(
        xfeat=_make_torch_xfeat(), freeze_xfeat=False,
        exact_softmax=exact_softmax,
    ).eval()
    _randomize_bn_stats(ref, gen)

    B, H, W = 1, 64, 96
    a = gen.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    b = gen.uniform(0, 1, (B, 3, H, W)).astype(np.float32)
    with torch.no_grad():
        corr_ref = ref({"im_A": torch.tensor(a), "im_B": torch.tensor(b)})

    cfg = TinyRomaConfig(
        exact_softmax=exact_softmax, faithful_fast_path=True, dtype="float32"
    )
    variables = port_tiny_roma(ref.state_dict())
    model = TinyRoma(cfg)
    corr = model.apply(
        variables, jnp.asarray(a.transpose(0, 2, 3, 1)),
        jnp.asarray(b.transpose(0, 2, 3, 1)), train=False,
    )
    tag = "exact" if exact_softmax else "fast"
    for s in (8, 4):
        _report(f"tiny_{tag}_flow_s{s}", np.asarray(corr[s]["flow"]),
                nchw_to_nhwc(corr_ref[s]["flow"]), 1e-3)
        _report(f"tiny_{tag}_cert_s{s}", np.asarray(corr[s]["certainty"]),
                nchw_to_nhwc(corr_ref[s]["certainty"]), 1e-3)


# ---------------------------------------------------------------------------
# get_gt_warp + RobustLosses on a shared synthetic fixture
# ---------------------------------------------------------------------------

def _loss_fixture(gen, B=2, H=64, W=64):
    """Synthetic two-view batch: smooth positive depths + plausible pose."""
    def smooth(shape):
        x = gen.standard_normal(shape)
        for ax in (-1, -2):
            for _ in range(6):
                x = 0.5 * x + 0.25 * (np.roll(x, 1, ax) + np.roll(x, -1, ax))
        return x

    d1 = (5.0 + smooth((B, H, W))).astype(np.float32)
    d2 = (5.0 + smooth((B, H, W))).astype(np.float32)
    a = np.deg2rad(5.0)
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]])
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = R
    T[:3, 3] = [0.3, 0.05, 0.02]
    T_1to2 = np.stack([T] * B)
    K = np.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]],
                 np.float32)
    Ks = np.stack([K] * B)
    return d1, d2, T_1to2, Ks


def test_get_gt_warp_parity(romatch):
    from romatch.utils.utils import get_gt_warp as ref_fn

    from roma_tpu.utils.geometry import get_gt_warp

    gen = np.random.default_rng(30)
    d1, d2, T_1to2, Ks = _loss_fixture(gen)
    with torch.no_grad():
        x2_ref, prob_ref = ref_fn(
            torch.tensor(d1), torch.tensor(d2), torch.tensor(T_1to2),
            torch.tensor(Ks), torch.tensor(Ks), H=16, W=16,
        )
    x2, prob = get_gt_warp(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(T_1to2),
        jnp.asarray(Ks), jnp.asarray(Ks), H=16, W=16,
    )
    assert float(prob_ref.float().mean()) > 0.3  # fixture is covisible
    # the validity mask must agree exactly; warps where valid
    np.testing.assert_array_equal(np.asarray(prob), to_numpy(prob_ref.float()))
    m = np.asarray(prob) > 0
    _report("gt_warp", np.asarray(x2)[m], to_numpy(x2_ref.float())[m], 1e-4)


def test_robust_loss_parity(romatch):
    """Full-RoMa RobustLosses vs ours on a shared corresps+batch fixture —
    covers the anchor-CE branch, Charbonnier regression, certainty BCE, and
    the hierarchical locality gate at every scale."""
    import romatch as rm_pkg  # noqa: F401
    from romatch.losses.robust_loss import RobustLosses

    from roma_tpu.losses.robust_loss import RobustLossConfig, robust_loss

    gen = np.random.default_rng(31)
    B, H, W = 2, 64, 64
    d1, d2, T_1to2, Ks = _loss_fixture(gen, B, H, W)

    corresps_t = {}
    corresps_j = {}
    for s in (16, 8, 4, 2, 1):
        h, w = H // s, W // s
        # flows roughly identity + noise so the gate passes a mix
        gy, gx = np.meshgrid(np.linspace(-1 + 1 / h, 1 - 1 / h, h),
                             np.linspace(-1 + 1 / w, 1 - 1 / w, w),
                             indexing="ij")
        flow = np.stack([gx, gy], 0)[None].repeat(B, 0).astype(np.float32)
        flow += gen.standard_normal(flow.shape).astype(np.float32) * 0.02
        cert = gen.standard_normal((B, 1, h, w)).astype(np.float32)
        entry_t = {"flow": torch.tensor(flow), "certainty": torch.tensor(cert),
                   "flow_pre_delta": torch.tensor(flow)}
        entry_j = {"flow": jnp.asarray(flow.transpose(0, 2, 3, 1)),
                   "certainty": jnp.asarray(cert.transpose(0, 2, 3, 1))}
        if s == 16:
            gm_cls = gen.standard_normal((B, 64 * 64, h, w)).astype(np.float32)
            gm_cert = gen.standard_normal((B, 1, h, w)).astype(np.float32)
            entry_t["gm_cls"] = torch.tensor(gm_cls)
            entry_t["gm_certainty"] = torch.tensor(gm_cert)
            entry_j["gm_cls"] = jnp.asarray(gm_cls.transpose(0, 2, 3, 1))
            entry_j["gm_certainty"] = jnp.asarray(gm_cert.transpose(0, 2, 3, 1))
        corresps_t[s] = entry_t
        corresps_j[s] = entry_j

    batch_t = {"im_A_depth": torch.tensor(d1), "im_B_depth": torch.tensor(d2),
               "T_1to2": torch.tensor(T_1to2), "K1": torch.tensor(Ks),
               "K2": torch.tensor(Ks)}
    batch_j = {"im_A_depth": jnp.asarray(d1), "im_B_depth": jnp.asarray(d2),
               "T_1to2": jnp.asarray(T_1to2), "K1": jnp.asarray(Ks),
               "K2": jnp.asarray(Ks)}

    ref_loss_fn = RobustLosses(
        ce_weight=0.01, local_dist={1: 4, 2: 4, 4: 8, 8: 8},
        local_largest_scale=8, alpha=0.5, c=1e-4,
        relative_depth_error_threshold=0.05,
    )
    with torch.no_grad():
        tot_ref = float(ref_loss_fn(corresps_t, batch_t))

    tot, metrics = robust_loss(
        corresps_j, batch_j,
        RobustLossConfig(alpha=0.5, c=1e-4,
                         local_dist={1: 4, 2: 4, 4: 8, 8: 8}),
    )
    print(f"PARITY robust_loss: ours={float(tot):.6f} ref={tot_ref:.6f}")
    assert abs(float(tot) - tot_ref) < 1e-3 * max(abs(tot_ref), 1.0)


def test_tiny_robust_loss_parity(romatch):
    """Tiny-RoMa RobustLosses (EPE-gated certainty targets, per-scale
    locality gate, alpha dict) vs ours on a shared fixture, with the shipped
    recipe's settings (train_tiny_roma_v1_outdoor.py:91-98). The reference's
    corr_volume branch is dead in the shipped forward (tiny.py:330-367 never
    emits the key), so corresps carry flow/certainty only."""
    from romatch.losses.robust_loss_tiny_roma import RobustLosses as RefTinyLoss

    from roma_tpu.losses.robust_loss import RobustLossConfig, tiny_robust_loss

    gen = np.random.default_rng(32)
    B, H, W = 2, 64, 64
    d1, d2, T_1to2, Ks = _loss_fixture(gen, B, H, W)

    corresps_t, corresps_j = {}, {}
    for s in (8, 4):
        h, w = H // s, W // s
        gy, gx = np.meshgrid(np.linspace(-1 + 1 / h, 1 - 1 / h, h),
                             np.linspace(-1 + 1 / w, 1 - 1 / w, w),
                             indexing="ij")
        flow = np.stack([gx, gy], 0)[None].repeat(B, 0).astype(np.float32)
        flow += gen.standard_normal(flow.shape).astype(np.float32) * 0.01
        cert = gen.standard_normal((B, 1, h, w)).astype(np.float32)
        corresps_t[s] = {"flow": torch.tensor(flow),
                         "certainty": torch.tensor(cert)}
        corresps_j[s] = {"flow": jnp.asarray(flow.transpose(0, 2, 3, 1)),
                         "certainty": jnp.asarray(cert.transpose(0, 2, 3, 1))}

    batch_t = {"im_A_depth": torch.tensor(d1), "im_B_depth": torch.tensor(d2),
               "T_1to2": torch.tensor(T_1to2), "K1": torch.tensor(Ks),
               "K2": torch.tensor(Ks)}
    batch_j = {"im_A_depth": jnp.asarray(d1), "im_B_depth": jnp.asarray(d2),
               "T_1to2": jnp.asarray(T_1to2), "K1": jnp.asarray(Ks),
               "K2": jnp.asarray(Ks)}

    ref_fn = RefTinyLoss(ce_weight=0.01, local_dist={4: 4},
                         alpha={4: 0.15, 8: 0.15}, c=1e-4,
                         epe_mask_prob_th=0.001)
    with torch.no_grad():
        tot_ref = float(ref_fn(corresps_t, batch_t))
    tot, _ = tiny_robust_loss(
        corresps_j, batch_j,
        RobustLossConfig(ce_weight=0.01, alpha={4: 0.15, 8: 0.15}, c=1e-4,
                         local_dist={4: 4}, epe_mask_prob_th=0.001),
    )
    print(f"PARITY tiny_robust_loss: ours={float(tot):.6f} ref={tot_ref:.6f}")
    assert abs(float(tot) - tot_ref) < 1e-3 * max(abs(tot_ref), 1.0)
