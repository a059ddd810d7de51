"""ViT building blocks + the match decoder, NHWC/token-major flax.

Replaces the reference's vendored DINOv2 layer stack
(/root/reference/romatch/models/transformer/layers/: attention.py, block.py,
mlp.py, layer_scale.py) and the TransformerDecoder
(transformer/__init__.py:10-46). The one CUDA dependency on the reference
model path is xformers memory_efficient_attention (attention.py:66-81); here
attention routes through `jax.nn.dot_product_attention`, which XLA lowers to
a fused (flash) TPU kernel. Stochastic depth / nested-tensor paths are
inference-dead in the reference and intentionally not carried over.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from roma_tpu.utils.geometry import get_grid


class Attention(nn.Module):
    """Standard MHA with fused qkv projection (DINOv2 layout, port-ready)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, N, C = x.shape
        H = self.num_heads
        qkv = nn.Dense(
            3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name="qkv",
        )(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, H, C // H), 3, axis=2)
        out = jax.nn.dot_product_attention(q[:, :, 0], k[:, :, 0], v[:, :, 0])
        out = out.reshape(B, N, C)
        return nn.Dense(
            C, dtype=self.dtype, param_dtype=jnp.float32, name="proj"
        )(out)


class Mlp(nn.Module):
    dim: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.Dense(
            int(self.dim * self.mlp_ratio), dtype=self.dtype,
            param_dtype=jnp.float32, name="fc1",
        )(x)
        h = nn.gelu(h, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)


class LayerScale(nn.Module):
    """Learned per-channel residual scale (DINOv2 init_values=1.0)."""

    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param(
            "gamma", lambda k: jnp.full((self.dim,), self.init_value, jnp.float32)
        )
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    """Pre-norm ViT block: LN -> attn -> (LayerScale) -> + ; LN -> MLP -> (LS) -> +."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x.astype(jnp.float32))
        h = Attention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(
            h.astype(self.dtype)
        )
        if self.layer_scale:
            h = LayerScale(self.dim, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x.astype(jnp.float32))
        h = Mlp(self.dim, self.mlp_ratio, dtype=self.dtype, name="mlp")(h.astype(self.dtype))
        if self.layer_scale:
            h = LayerScale(self.dim, name="ls2")(h)
        return x + h


class TransformerDecoder(nn.Module):
    """Coarse match decoder (reference transformer/__init__.py:10-46).

    Input: GP posterior (B, H, W, gp_dim) + projected feats (B, H, W, feat_dim)
    -> concat to (B, HW, hidden) tokens -> N blocks -> linear head emitting
    cls_res^2 anchor logits + 1 certainty channel. No positional encoding
    (pos_enc=False in all shipped configs).
    """

    hidden_dim: int = 1024
    out_dim: int = 64 * 64 + 1
    num_blocks: int = 5
    num_heads: int = 8
    dtype: jnp.dtype = jnp.bfloat16

    # coarse scales handled by this decoder (Decoder queries this)
    def scales(self) -> list[int]:
        return [16]

    @nn.compact
    def __call__(self, gp_posterior: jax.Array, feats: jax.Array):
        B, H, W, _ = gp_posterior.shape
        x = jnp.concatenate([gp_posterior, feats], axis=-1)
        tokens = x.reshape(B, H * W, self.hidden_dim).astype(self.dtype)
        for i in range(self.num_blocks):
            tokens = Block(
                self.hidden_dim, self.num_heads, dtype=self.dtype, name=f"block_{i}"
            )(tokens)
        out = nn.Dense(
            self.out_dim, dtype=jnp.float32, param_dtype=jnp.float32, name="to_out"
        )(tokens.astype(jnp.float32))
        out = out.reshape(B, H, W, self.out_dim)
        return out[..., :-1], out[..., -1:]  # (anchor logits, certainty)
