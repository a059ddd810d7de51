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


def _flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, train: bool = False
) -> jax.Array:
    """Flash attention on (B, N, H, d) via the Pallas TPU kernel.

    XLA's unfused attention materializes the (B, H, N, N) logits in HBM —
    at RoMa's 1601 coarse tokens that is ~6 ms/block on v5e, 92% of each
    ViT block (the entire DINOv2 encode is 24 such blocks). The streaming
    kernel never leaves VMEM for the logits. Sequences are padded to a
    128-multiple with segment ids masking pad<->real attention (padded
    query rows are sliced off afterwards)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    B, N, H, d = q.shape
    # v5e-measured block sweep at N=1601: a full-sequence K block beats 896
    # streaming (4.57 vs 4.99 ms at batch 8 incl dispatch — fewer grid
    # steps, ~4% less padding) which beats 256 by ~1.5x. TRAINING graphs use
    # the 896-streaming geometry throughout: the DIFFERENTIATED kernel adds
    # saved-residual outputs (a full-square 1664 block overflows the 16 MB
    # scoped-vmem stack by 0.6 MB — found compiling the 560^2 train step),
    # and the dkv/dq backward kernels require 128-multiple blocks that
    # DIVIDE the padded length (1664 = 2^7 * 13 admits only 128, a 13x
    # slower geometry). Inference keeps the one-block fast path.
    if train or N > 1664:
        Np = -(-N // 896) * 896
        bq = bk = 896
    else:
        Np = -(-N // 128) * 128
        bk = bq = Np
    pad = Np - N
    qp, kp, vp = (
        jnp.moveaxis(jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0))), 2, 1)
        for t in (q, k, v)
    )
    seg = jnp.broadcast_to(
        (jnp.arange(Np) >= N).astype(jnp.int32), (B, Np)
    )
    sizes = fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bq,
        block_k_dkv=bq, block_q_dkv=bq,
        block_k_major_dq=bq, block_k_dq=bq, block_q_dq=bq,
    )
    out = fa.flash_attention(
        qp, kp, vp, segment_ids=fa.SegmentIds(q=seg, kv=seg),
        sm_scale=1.0 / (d ** 0.5), block_sizes=sizes,
    )
    return jnp.moveaxis(out, 1, 2)[:, :N]


class Attention(nn.Module):
    """Standard MHA with fused qkv projection (DINOv2 layout, port-ready).

    Routes through the Pallas flash-attention kernel on TPU (replacing the
    reference's xformers memory_efficient_attention, attention.py:66-81);
    falls back to `jax.nn.dot_product_attention` off-TPU (CPU test mesh)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        B, N, C = x.shape
        H = self.num_heads
        qkv = nn.Dense(
            3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name="qkv",
        )(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, H, C // H), 3, axis=2)
        q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
        if jax.default_backend() == "tpu":
            out = _flash_attention(q, k, v, train=train)
        else:
            out = jax.nn.dot_product_attention(q, k, v)
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


class SwiGLUFFN(nn.Module):
    """SwiGLU feed-forward (reference layers/swiglu_ffn.py:13-63; hidden dim
    rounded to 2/3 * 4d, multiple of 8, as in the fused variant). Selected by
    ffn_layer="swiglu"; every shipped config uses "mlp" (encoders.py:89)."""

    dim: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        hidden = int(self.dim * self.mlp_ratio * 2 / 3 + 7) // 8 * 8
        x12 = nn.Dense(2 * hidden, dtype=self.dtype, param_dtype=jnp.float32,
                       name="w12")(x)
        x1, x2 = jnp.split(x12, 2, axis=-1)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="w3")(nn.silu(x1) * x2)


def drop_path(x: jax.Array, rate: float, deterministic: bool,
              rng: jax.Array | None = None) -> jax.Array:
    """Stochastic depth on the residual branch (reference
    layers/drop_path.py:15-35). Identity when deterministic or rate=0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, mask_shape)
    return jnp.where(mask, x / keep, 0.0)


class DINOHead(nn.Module):
    """DINO projection head (reference layers/dino_head.py:13-59): MLP ->
    L2-normalized bottleneck -> weight-normalized prototype layer. Unused at
    inference; provided for SSL-pretraining parity."""

    out_dim: int
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        for i in range(self.nlayers - 1):
            x = nn.Dense(self.hidden_dim, dtype=self.dtype, name=f"mlp_{i}")(x)
            x = nn.gelu(x, approximate=False)
        x = nn.Dense(self.bottleneck_dim, dtype=self.dtype,
                     name=f"mlp_{self.nlayers - 1}")(x)
        eps = 1e-6 if x.dtype == jnp.float16 else 1e-12
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
        # weight-normalized last layer with unit gain
        v = self.param("last_layer_v",
                       nn.initializers.normal(0.02),
                       (self.bottleneck_dim, self.out_dim))
        w = v / jnp.linalg.norm(v, axis=0, keepdims=True)
        return x @ w.astype(x.dtype)


class Block(nn.Module):
    """Pre-norm ViT block: LN -> attn -> (LayerScale) -> + ; LN -> FFN -> (LS) -> +.

    drop_path_rate enables stochastic depth in training (reference
    block.py:110-201); shipped configs run with it at 0."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layer_scale: bool = False
    ffn_layer: str = "mlp"  # "mlp" | "swiglu"
    drop_path_rate: float = 0.0
    # DINOv2 uses qkv_bias=True (dinov2.py:53); the match decoder's blocks
    # use the reference Block default False (roma_models.py:27-33)
    qkv_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        def residual(h):
            if self.drop_path_rate > 0.0:
                rng = self.make_rng("drop_path") if not deterministic else None
                h = drop_path(h, self.drop_path_rate, deterministic, rng)
            return h

        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x.astype(jnp.float32))
        h = Attention(
            self.dim, self.num_heads, qkv_bias=self.qkv_bias,
            dtype=self.dtype, name="attn",
        )(h.astype(self.dtype), train=not deterministic)
        if self.layer_scale:
            h = LayerScale(self.dim, name="ls1")(h)
        x = x + residual(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x.astype(jnp.float32))
        ffn = (
            SwiGLUFFN(self.dim, self.mlp_ratio, dtype=self.dtype, name="mlp")
            if self.ffn_layer == "swiglu"
            else Mlp(self.dim, self.mlp_ratio, dtype=self.dtype, name="mlp")
        )
        h = ffn(h.astype(self.dtype))
        if self.layer_scale:
            h = LayerScale(self.dim, name="ls2")(h)
        return x + residual(h)


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
    def __call__(self, gp_posterior: jax.Array, feats: jax.Array,
                 train: bool = False):
        B, H, W, _ = gp_posterior.shape
        x = jnp.concatenate([gp_posterior, feats], axis=-1)
        tokens = x.reshape(B, H * W, self.hidden_dim).astype(self.dtype)
        for i in range(self.num_blocks):
            tokens = Block(
                self.hidden_dim, self.num_heads, qkv_bias=False,
                dtype=self.dtype, name=f"block_{i}",
            )(tokens, deterministic=not train)
        out = nn.Dense(
            self.out_dim, dtype=jnp.float32, param_dtype=jnp.float32, name="to_out"
        )(tokens.astype(jnp.float32))
        out = out.reshape(B, H, W, self.out_dim)
        return out[..., :-1], out[..., -1:]  # (anchor logits, certainty)
