"""VGG19-bn fine-feature pyramid, flax/NHWC.

Equivalent of the reference's torchvision-sliced encoder
(/root/reference/romatch/models/encoders.py:61-78: `vgg19_bn().features[:40]`,
recording the pre-maxpool activation at each scale). Pyramid contract:
{1: 64ch, 2: 128ch, 4: 256ch, 8: 512ch} at strides 1/2/4/8.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from roma_tpu.models.layers import torch_padding

# convs per stage, channels per stage (VGG-19 cfg E through block4)
_STAGES = [(2, 64), (2, 128), (4, 256), (4, 512)]


class VGG19(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict[int, jax.Array]:
        feats: dict[int, jax.Array] = {}
        scale = 1
        x = x.astype(self.dtype)
        idx = 0
        for n_convs, ch in _STAGES:
            for _ in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=torch_padding(3), dtype=self.dtype,
                    param_dtype=jnp.float32, name=f"conv_{idx}",
                )(x)
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9, epsilon=1e-5,
                    dtype=jnp.float32, name=f"bn_{idx}",
                )(x.astype(jnp.float32))
                x = nn.relu(x).astype(self.dtype)
                idx += 1
            feats[scale] = x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            scale *= 2
        return feats
