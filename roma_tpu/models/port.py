"""Torch-checkpoint -> flax parameter porting helpers.

The reference distributes weights as torch state_dicts
(model_zoo/__init__.py:5-14). These helpers convert tensor layouts
(torch conv OIHW -> flax HWIO, linear (O,I) -> (I,O), BatchNorm running
stats -> flax batch_stats) so checkpoints can be loaded when available.
No network access is assumed; porting operates on local files only.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def linear_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (O, I) -> flax (I, O)."""
    return np.transpose(np.asarray(w), (1, 0))


def set_in(tree: dict, path: tuple[str, ...], value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def port_conv(state: Mapping[str, Any], prefix: str, params: dict, path: tuple[str, ...]):
    set_in(params, path + ("kernel",), conv_kernel(state[f"{prefix}.weight"]))
    if f"{prefix}.bias" in state:
        set_in(params, path + ("bias",), np.asarray(state[f"{prefix}.bias"]))


def port_batchnorm(
    state: Mapping[str, Any],
    prefix: str,
    params: dict,
    batch_stats: dict,
    path: tuple[str, ...],
):
    set_in(batch_stats, path + ("mean",), np.asarray(state[f"{prefix}.running_mean"]))
    set_in(batch_stats, path + ("var",), np.asarray(state[f"{prefix}.running_var"]))
    if f"{prefix}.weight" in state:
        set_in(params, path + ("scale",), np.asarray(state[f"{prefix}.weight"]))
        set_in(params, path + ("bias",), np.asarray(state[f"{prefix}.bias"]))


def port_conv_block(
    state: Mapping[str, Any],
    conv_prefix: str,
    bn_prefix: str,
    params: dict,
    batch_stats: dict,
    block_path: tuple[str, ...],
):
    """One reference BasicLayer (conv + BN [+ relu]) -> one ConvBlock."""
    port_conv(state, conv_prefix, params, block_path + ("Conv_0",))
    port_batchnorm(state, bn_prefix, params, batch_stats, block_path + ("BatchNorm_0",))


# ---------------------------------------------------------------------------
# whole-model porters (reference checkpoints -> flax variables)
# ---------------------------------------------------------------------------

# XFeat trunk layout inside the tiny checkpoint (torch-hub XFeat wrapped as
# `xfeat.0.*` when trainable, reference model_zoo/__init__.py:22-28 +
# tiny.py:105-110). Each entry: (torch sequential prefix, flax block name).
_XFEAT_BLOCKS = [
    ("block1.0", "block1_0"), ("block1.1", "block1_1"),
    ("block1.2", "block1_2"), ("block1.3", "block1_3"),
    ("block2.0", "block2_0"), ("block2.1", "block2_1"),
    ("block3.0", "block3_0"), ("block3.1", "block3_1"), ("block3.2", "block3_2"),
    ("block4.0", "block4_0"), ("block4.1", "block4_1"), ("block4.2", "block4_2"),
    ("block5.0", "block5_0"), ("block5.1", "block5_1"),
    ("block5.2", "block5_2"), ("block5.3", "block5_3"),
    ("block_fusion.0", "fusion_0"), ("block_fusion.1", "fusion_1"),
]


def port_tiny_roma(state: Mapping[str, Any]) -> dict:
    """Reference Tiny RoMa checkpoint -> flax variables for `TinyRoma`.

    Accepts a flat {name: array} state_dict (torch tensors or numpy). Handles
    both the frozen (`xfeat` hidden, no trunk keys) and trainable
    (`xfeat.0.*` keys present) layouts; trunk keys may also be bare
    (`block1.0...`) when porting the raw XFeat hub checkpoint.
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    params: dict = {}
    stats: dict = {}

    def trunk_key(suffix: str) -> str | None:
        for prefix in ("xfeat.0.", "net.", ""):
            if f"{prefix}{suffix}" in state:
                return f"{prefix}{suffix}"
        return None

    # trunk
    for tprefix, fname in _XFEAT_BLOCKS:
        k = trunk_key(f"{tprefix}.layer.0.weight")
        if k is None:
            continue
        base = k[: -len("layer.0.weight")]
        port_conv_block(
            state, f"{base}layer.0", f"{base}layer.1",
            params, stats, ("backbone", fname),
        )
    k = trunk_key("skip1.1.weight")
    if k is not None:
        port_conv(state, k[: -len(".weight")], params, ("backbone", "skip1_conv"))
    k = trunk_key("block_fusion.2.weight")
    if k is not None:
        port_conv(state, k[: -len(".weight")], params, ("backbone", "fusion_conv"))

    # matchers: 4 BasicLayers + 1x1 head (reference tiny.py:113-125)
    for tname, fname in (("coarse_matcher", "coarse_matcher"),
                         ("fine_matcher", "fine_matcher")):
        for i in range(4):
            if f"{tname}.{i}.layer.0.weight" not in state:
                continue
            port_conv_block(
                state, f"{tname}.{i}.layer.0", f"{tname}.{i}.layer.1",
                params, stats, (fname, f"block_{i}"),
            )
        if f"{tname}.4.weight" in state:
            port_conv(state, f"{tname}.4", params, (fname, "head"))
    return {"params": params, "batch_stats": stats}


def port_dinov2(state: Mapping[str, Any], depth: int = 24) -> dict:
    """DINOv2 ViT checkpoint (dinov2_vitl14_pretrain.pth layout) -> flax
    params for `DinoViT`."""
    state = {k: np.asarray(v) for k, v in state.items()}
    p: dict = {}
    p["cls_token"] = state["cls_token"]
    p["pos_embed"] = state["pos_embed"]
    port_conv(state, "patch_embed.proj", p, ("patch_embed",))
    for i in range(depth):
        tgt: dict = {}
        port_vit_block(state, f"blocks.{i}", tgt, layer_scale=True)
        p[f"block_{i}"] = tgt
    set_in(p, ("norm", "scale"), state["norm.weight"])
    set_in(p, ("norm", "bias"), state["norm.bias"])
    return {"params": p}


def port_vit_block(state: Mapping[str, Any], prefix: str, tgt: dict,
                   layer_scale: bool = False) -> None:
    """One ViT block (reference layers/block.py naming: norm1/attn/norm2/mlp
    [+ls1/ls2]) -> flax Block params, written into `tgt`."""
    set_in(tgt, ("norm1", "scale"), np.asarray(state[f"{prefix}.norm1.weight"]))
    set_in(tgt, ("norm1", "bias"), np.asarray(state[f"{prefix}.norm1.bias"]))
    set_in(tgt, ("attn", "qkv", "kernel"), linear_kernel(state[f"{prefix}.attn.qkv.weight"]))
    if f"{prefix}.attn.qkv.bias" in state:  # qkv_bias=False in the match decoder
        set_in(tgt, ("attn", "qkv", "bias"), np.asarray(state[f"{prefix}.attn.qkv.bias"]))
    set_in(tgt, ("attn", "proj", "kernel"), linear_kernel(state[f"{prefix}.attn.proj.weight"]))
    set_in(tgt, ("attn", "proj", "bias"), np.asarray(state[f"{prefix}.attn.proj.bias"]))
    set_in(tgt, ("norm2", "scale"), np.asarray(state[f"{prefix}.norm2.weight"]))
    set_in(tgt, ("norm2", "bias"), np.asarray(state[f"{prefix}.norm2.bias"]))
    set_in(tgt, ("mlp", "fc1", "kernel"), linear_kernel(state[f"{prefix}.mlp.fc1.weight"]))
    set_in(tgt, ("mlp", "fc1", "bias"), np.asarray(state[f"{prefix}.mlp.fc1.bias"]))
    set_in(tgt, ("mlp", "fc2", "kernel"), linear_kernel(state[f"{prefix}.mlp.fc2.weight"]))
    set_in(tgt, ("mlp", "fc2", "bias"), np.asarray(state[f"{prefix}.mlp.fc2.bias"]))
    if layer_scale:
        set_in(tgt, ("ls1", "gamma"), np.asarray(state[f"{prefix}.ls1.gamma"]))
        set_in(tgt, ("ls2", "gamma"), np.asarray(state[f"{prefix}.ls2.gamma"]))


def port_transformer_decoder(
    state: Mapping[str, Any], prefix: str = "", num_blocks: int = 5
) -> dict:
    """Reference TransformerDecoder (transformer/__init__.py:10-46:
    `blocks.{i}` Sequential + `to_out` Linear) -> flax params."""
    state = {k: np.asarray(v) for k, v in state.items()}
    p: dict = {}
    for i in range(num_blocks):
        tgt: dict = {}
        port_vit_block(state, f"{prefix}blocks.{i}", tgt)
        p[f"block_{i}"] = tgt
    set_in(p, ("to_out", "kernel"), linear_kernel(state[f"{prefix}to_out.weight"]))
    set_in(p, ("to_out", "bias"), np.asarray(state[f"{prefix}to_out.bias"]))
    return p


def port_gp(state: Mapping[str, Any], prefix: str = "") -> dict:
    """Reference GP (matcher.py:165-273: `pos_conv` 1x1) -> flax params."""
    p: dict = {}
    port_conv(state, f"{prefix}pos_conv", p, ("pos_conv",))
    return p


def port_conv_refiner(
    state: Mapping[str, Any],
    prefix: str = "",
    hidden_blocks: int = 8,
) -> tuple[dict, dict]:
    """Reference ConvRefiner (matcher.py:17-143: disp_emb, block1,
    hidden_blocks.{i} [Sequential(conv k5, BN, relu, conv 1x1)], out_conv)
    -> (flax params, batch_stats)."""
    state = {k: np.asarray(v) for k, v in state.items()}
    params: dict = {}
    stats: dict = {}
    port_conv(state, f"{prefix}disp_emb", params, ("disp_emb",))

    def port_dw(src: str, dst: tuple[str, ...]) -> None:
        port_conv(state, f"{src}.0", params, dst + ("conv1",))
        port_batchnorm(state, f"{src}.1", params, stats, dst + ("norm",))
        port_conv(state, f"{src}.3", params, dst + ("conv2",))

    port_dw(f"{prefix}block1", ("block_in",))
    for i in range(hidden_blocks):
        port_dw(f"{prefix}hidden_blocks.{i}", (f"block_{i}",))
    port_conv(state, f"{prefix}out_conv", params, ("out_conv",))
    return params, stats


# torchvision vgg19_bn().features conv indices for the first 4 stages
_VGG_CONV_IDX = [0, 3, 7, 10, 14, 17, 20, 23, 27, 30, 33, 36]


def port_vgg19(state: Mapping[str, Any], prefix: str = "") -> dict:
    """VGG19-bn `features` checkpoint slice -> flax `VGG19` variables."""
    state = {k: np.asarray(v) for k, v in state.items()}
    params: dict = {}
    stats: dict = {}
    for j, idx in enumerate(_VGG_CONV_IDX):
        port_conv(state, f"{prefix}{idx}", params, (f"conv_{j}",))
        port_batchnorm(state, f"{prefix}{idx + 1}", params, stats, (f"bn_{j}",))
    return {"params": params, "batch_stats": stats}


def port_roma(state: Mapping[str, Any], dinov2_state: Mapping[str, Any] | None = None,
              num_decoder_blocks: int = 5, refiner_blocks: int = 8) -> dict:
    """Full-RoMa checkpoint (roma_outdoor.pth layout, assembled per
    roma_models.py:18-170) -> flax variables for `RomaModel`.

    DINOv2 weights ship separately in the reference (frozen ViT hidden from
    state_dict, encoders.py:104); pass them as `dinov2_state`.
    """
    state = {k: np.asarray(v) for k, v in state.items()}
    params: dict = {}
    stats: dict = {}

    # encoder.cnn: VGG19 under "encoder.cnn.layers.{idx}"
    vgg = port_vgg19(state, prefix="encoder.cnn.layers.")
    params["encoder"] = {"cnn": vgg["params"]}
    stats["encoder"] = {"cnn": vgg["batch_stats"]}
    if dinov2_state is not None:
        params["encoder"]["dinov2"] = port_dinov2(dinov2_state)["params"]

    dec: dict = {}
    dec_stats: dict = {}

    # transformer match decoder: decoder.embedding_decoder.blocks.{i} + to_out
    dec["embedding_decoder"] = port_transformer_decoder(
        state, prefix="decoder.embedding_decoder.", num_blocks=num_decoder_blocks
    )

    # GP coordinate basis conv
    dec["gp16"] = port_gp(state, prefix="decoder.gps.16.")

    # per-scale projections: decoder.proj.{s}.{0 conv, 1 bn}
    for s in ("16", "8", "4", "2", "1"):
        port_conv(state, f"decoder.proj.{s}.0", dec, (f"proj_{s}", "layers_0"))
        port_batchnorm(state, f"decoder.proj.{s}.1", dec, dec_stats,
                       (f"proj_{s}", "layers_1"))

    # refiners: decoder.conv_refiner.{s}
    for s in ("16", "8", "4", "2", "1"):
        rp, rs = port_conv_refiner(
            state, prefix=f"decoder.conv_refiner.{s}.", hidden_blocks=refiner_blocks
        )
        dec[f"refiner_{s}"] = rp
        dec_stats[f"refiner_{s}"] = rs

    params["decoder"] = dec
    stats["decoder"] = dec_stats
    return {"params": params, "batch_stats": stats}
