"""XFeat CNN trunk (the Tiny-RoMa backbone), NHWC flax.

Architecture per "XFeat: Accelerated Features for Lightweight Image Matching"
(CVPR'24), as consumed by the reference Tiny RoMa
(/root/reference/romatch/models/tiny.py:144-162: blocks 1-5 + skip1 +
block_fusion, detection/matching heads dropped). Channel plan:

  input: grayscale-mean -> InstanceNorm
  block1: 1->4->8->8->24 (strides 1,2,1,2)            -> 1/4
  skip1:  AvgPool(4,4) + 1x1 conv 1->24               -> 1/4
  block2: 24->24->24                                  -> 1/4   (= fine feats)
  block3: 24->64(s2)->64->64(1x1)                     -> 1/8
  block4: 64->64(s2)->64->64                          -> 1/16
  block5: 64->128(s2)->128->128->64(1x1)              -> 1/32
  fusion: bilinear-up block4/5 to 1/8, sum with block3,
          64->64->64(1x1 plain conv)                  -> 1/8   (= coarse feats)

All conv blocks are Conv(bias=False) + BatchNorm(affine=False) + ReLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from roma_tpu.models.layers import ConvBlock, instance_norm
from roma_tpu.ops.resize import interpolate_bilinear


class XFeatBackbone(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> tuple[jax.Array, jax.Array]:
        """(B, H, W, C) image in [0,1] -> (fine (B,H/4,W/4,24), coarse (B,H/8,W/8,64))."""
        x = jnp.mean(x, axis=-1, keepdims=True)
        x = jax.lax.stop_gradient(instance_norm(x)).astype(self.dtype)

        cb = lambda f, k=3, s=1, name=None: ConvBlock(
            f, kernel_size=k, stride=s, dtype=self.dtype, name=name
        )

        x1 = cb(4, name="block1_0")(x, train)
        x1 = cb(8, s=2, name="block1_1")(x1, train)
        x1 = cb(8, name="block1_2")(x1, train)
        x1 = cb(24, s=2, name="block1_3")(x1, train)

        skip = nn.avg_pool(x, (4, 4), strides=(4, 4))
        skip = nn.Conv(
            24, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            name="skip1_conv",
        )(skip)

        x2 = cb(24, name="block2_0")(x1 + skip, train)
        x2 = cb(24, name="block2_1")(x2, train)

        x3 = cb(64, s=2, name="block3_0")(x2, train)
        x3 = cb(64, name="block3_1")(x3, train)
        x3 = cb(64, k=1, name="block3_2")(x3, train)

        x4 = cb(64, s=2, name="block4_0")(x3, train)
        x4 = cb(64, name="block4_1")(x4, train)
        x4 = cb(64, name="block4_2")(x4, train)

        x5 = cb(128, s=2, name="block5_0")(x4, train)
        x5 = cb(128, name="block5_1")(x5, train)
        x5 = cb(128, name="block5_2")(x5, train)
        x5 = cb(64, k=1, name="block5_3")(x5, train)

        h8, w8 = x3.shape[-3], x3.shape[-2]
        x4 = interpolate_bilinear(x4.astype(jnp.float32), (h8, w8)).astype(self.dtype)
        x5 = interpolate_bilinear(x5.astype(jnp.float32), (h8, w8)).astype(self.dtype)

        f = cb(64, name="fusion_0")(x3 + x4 + x5, train)
        f = cb(64, name="fusion_1")(f, train)
        f = nn.Conv(
            64, (1, 1), use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
            name="fusion_conv",
        )(f)
        return x2, f
