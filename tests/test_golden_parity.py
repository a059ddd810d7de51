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
