"""Checkpoint porters: synthesize reference-layout state dicts from flax
shapes, port them back, and require exact tree/value round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from roma_tpu.models.dinov2 import DinoViT
from roma_tpu.models.port import (
    _VGG_CONV_IDX,
    _XFEAT_BLOCKS,
    port_dinov2,
    port_roma,
    port_tiny_roma,
    port_vgg19,
)
from roma_tpu.models.tiny_roma import TinyRoma
from roma_tpu.models.vgg import VGG19


def get(tree, path):
    for k in path:
        tree = tree[k]
    return np.asarray(tree)


def conv_to_torch(k):
    return np.transpose(k, (3, 2, 0, 1))


def linear_to_torch(k):
    return np.transpose(k, (1, 0))


def tree_equal(a, b, path=""):
    assert set(a) == set(b), f"{path}: {set(a) ^ set(b)}"
    for k in a:
        if isinstance(a[k], dict):
            tree_equal(a[k], b[k], path + "/" + str(k))
        else:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                          err_msg=path + "/" + str(k))


def test_port_tiny_roma_roundtrip():
    model = TinyRoma()
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x, x, train=False)
    params, stats = v["params"], v["batch_stats"]

    state = {}
    for tpre, fname in _XFEAT_BLOCKS:
        base = ("backbone", fname)
        state[f"xfeat.0.{tpre}.layer.0.weight"] = conv_to_torch(
            get(params, base + ("Conv_0", "kernel"))
        )
        state[f"xfeat.0.{tpre}.layer.1.running_mean"] = get(
            stats, base + ("BatchNorm_0", "mean")
        )
        state[f"xfeat.0.{tpre}.layer.1.running_var"] = get(
            stats, base + ("BatchNorm_0", "var")
        )
    state["xfeat.0.skip1.1.weight"] = conv_to_torch(
        get(params, ("backbone", "skip1_conv", "kernel"))
    )
    state["xfeat.0.skip1.1.bias"] = get(params, ("backbone", "skip1_conv", "bias"))
    state["xfeat.0.block_fusion.2.weight"] = conv_to_torch(
        get(params, ("backbone", "fusion_conv", "kernel"))
    )
    state["xfeat.0.block_fusion.2.bias"] = get(params, ("backbone", "fusion_conv", "bias"))
    for tname in ("coarse_matcher", "fine_matcher"):
        for i in range(4):
            base = (tname, f"block_{i}")
            state[f"{tname}.{i}.layer.0.weight"] = conv_to_torch(
                get(params, base + ("Conv_0", "kernel"))
            )
            state[f"{tname}.{i}.layer.1.running_mean"] = get(
                stats, base + ("BatchNorm_0", "mean")
            )
            state[f"{tname}.{i}.layer.1.running_var"] = get(
                stats, base + ("BatchNorm_0", "var")
            )
        state[f"{tname}.4.weight"] = conv_to_torch(get(params, (tname, "head", "kernel")))
        state[f"{tname}.4.bias"] = get(params, (tname, "head", "bias"))

    ported = port_tiny_roma(state)
    tree_equal(ported["params"], jax.tree_util.tree_map(np.asarray, params))
    tree_equal(ported["batch_stats"], jax.tree_util.tree_map(np.asarray, stats))

    # ported variables drive a forward
    out = model.apply(
        {"params": ported["params"], "batch_stats": ported["batch_stats"]},
        x, x, train=False,
    )
    assert out[8]["flow"].shape == (1, 8, 8, 2)


def test_port_dinov2_roundtrip():
    model = DinoViT(embed_dim=32, depth=2, num_heads=4, pretrain_img_size=28)
    x = jnp.zeros((1, 28, 28, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    params = v["params"]

    state = {
        "cls_token": get(params, ("cls_token",)),
        "pos_embed": get(params, ("pos_embed",)),
        "patch_embed.proj.weight": conv_to_torch(get(params, ("patch_embed", "kernel"))),
        "patch_embed.proj.bias": get(params, ("patch_embed", "bias")),
        "norm.weight": get(params, ("norm", "scale")),
        "norm.bias": get(params, ("norm", "bias")),
    }
    for i in range(2):
        blk = (f"block_{i}",)
        b = f"blocks.{i}"
        state[f"{b}.norm1.weight"] = get(params, blk + ("norm1", "scale"))
        state[f"{b}.norm1.bias"] = get(params, blk + ("norm1", "bias"))
        state[f"{b}.attn.qkv.weight"] = linear_to_torch(get(params, blk + ("attn", "qkv", "kernel")))
        state[f"{b}.attn.qkv.bias"] = get(params, blk + ("attn", "qkv", "bias"))
        state[f"{b}.attn.proj.weight"] = linear_to_torch(get(params, blk + ("attn", "proj", "kernel")))
        state[f"{b}.attn.proj.bias"] = get(params, blk + ("attn", "proj", "bias"))
        state[f"{b}.ls1.gamma"] = get(params, blk + ("ls1", "gamma"))
        state[f"{b}.norm2.weight"] = get(params, blk + ("norm2", "scale"))
        state[f"{b}.norm2.bias"] = get(params, blk + ("norm2", "bias"))
        state[f"{b}.mlp.fc1.weight"] = linear_to_torch(get(params, blk + ("mlp", "fc1", "kernel")))
        state[f"{b}.mlp.fc1.bias"] = get(params, blk + ("mlp", "fc1", "bias"))
        state[f"{b}.mlp.fc2.weight"] = linear_to_torch(get(params, blk + ("mlp", "fc2", "kernel")))
        state[f"{b}.mlp.fc2.bias"] = get(params, blk + ("mlp", "fc2", "bias"))
        state[f"{b}.ls2.gamma"] = get(params, blk + ("ls2", "gamma"))

    ported = port_dinov2(state, depth=2)
    tree_equal(ported["params"], jax.tree_util.tree_map(np.asarray, params))
    out = model.apply({"params": ported["params"]}, x)
    assert out.shape == (1, 2, 2, 32)


def test_port_vgg19_roundtrip():
    model = VGG19(dtype=jnp.float32)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    params, stats = v["params"], v["batch_stats"]
    state = {}
    for j, idx in enumerate(_VGG_CONV_IDX):
        state[f"{idx}.weight"] = conv_to_torch(get(params, (f"conv_{j}", "kernel")))
        state[f"{idx}.bias"] = get(params, (f"conv_{j}", "bias"))
        state[f"{idx + 1}.weight"] = get(params, (f"bn_{j}", "scale"))
        state[f"{idx + 1}.bias"] = get(params, (f"bn_{j}", "bias"))
        state[f"{idx + 1}.running_mean"] = get(stats, (f"bn_{j}", "mean"))
        state[f"{idx + 1}.running_var"] = get(stats, (f"bn_{j}", "var"))
    ported = port_vgg19(state)
    tree_equal(ported["params"], jax.tree_util.tree_map(np.asarray, params))
    tree_equal(ported["batch_stats"], jax.tree_util.tree_map(np.asarray, stats))
