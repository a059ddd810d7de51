"""DINOv2 ViT-L/14 encoder (frozen coarse-feature backbone), flax/NHWC.

From-scratch equivalent of the reference's vendored DinoVisionTransformer
(/root/reference/romatch/models/transformer/dinov2.py:43-359, vit_large
config: patch 14, embed 1024, depth 24, heads 16, LayerScale init 1.0,
mlp FFN). Only the inference path RoMa uses is implemented:
patch-embed -> +interpolated pos-embed -> 24 blocks -> final LayerNorm ->
patch tokens reshaped to a (B, H/14, W/14, 1024) feature map
(encoders.py:110-122 consumes exactly this).

The ViT is frozen in RoMa (dinov2.py:154-155); callers wrap it in
`jax.lax.stop_gradient` / keep its params out of the optimizer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from roma_tpu.models.transformer import Block
from roma_tpu.ops.resize import torch_bicubic_resize


class DinoViT(nn.Module):
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    pretrain_img_size: int = 518   # pos-embed grid is 37x37 (+cls)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """(B, H, W, 3), H and W divisible by 14 -> (B, H/14, W/14, embed_dim).

        `train` only selects differentiation-safe attention block geometry
        (the ViT itself is frozen; see models/transformer._flash_attention)."""
        B, H, W, _ = x.shape
        p = self.patch_size
        h, w = H // p, W // p

        # patchify: conv k=s=14
        tokens = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID",
            dtype=self.dtype, param_dtype=jnp.float32, name="patch_embed",
        )(x.astype(self.dtype))
        tokens = tokens.reshape(B, h * w, self.embed_dim)

        n0 = self.pretrain_img_size // p
        cls_token = self.param(
            "cls_token", nn.initializers.normal(1e-6), (1, 1, self.embed_dim)
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, n0 * n0 + 1, self.embed_dim),
        )
        # bicubic-resize the patch pos-embed grid to (h, w) for arbitrary
        # resolutions, torch-exact incl. the reference's +0.1 scale-factor
        # offset kludge (dinov2.py:166-190): the coordinate mapping uses the
        # passed scale_factor (h+0.1)/n0, which shifts every sampling
        # position sub-pixel — weight-compatibility requires reproducing it
        patch_pos = pos_embed[:, 1:].reshape(1, n0, n0, self.embed_dim)
        if (h, w) != (n0, n0):
            patch_pos = torch_bicubic_resize(
                patch_pos.astype(jnp.float32), (h, w),
                scale=((h + 0.1) / n0, (w + 0.1) / n0),
            )
        patch_pos = patch_pos.reshape(1, h * w, self.embed_dim)

        tokens = tokens + patch_pos.astype(tokens.dtype)
        cls = (cls_token + pos_embed[:, :1]).astype(tokens.dtype)
        tokens = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.embed_dim)), tokens], axis=1)

        for i in range(self.depth):
            tokens = Block(
                self.embed_dim, self.num_heads, layer_scale=True,
                dtype=self.dtype, name=f"block_{i}",
            )(tokens, deterministic=not train)

        tokens = nn.LayerNorm(dtype=jnp.float32, name="norm")(tokens.astype(jnp.float32))
        patches = tokens[:, 1:].astype(self.dtype)
        return patches.reshape(B, h, w, self.embed_dim)
