"""ResNet-50 alternative fine encoder, flax/NHWC.

Equivalent of the reference's torchvision-backed option
(/root/reference/romatch/models/encoders.py:11-59): pyramid
{1: input, 2: 64ch stem, 4: 256ch, 8: 512ch, 16: 1024ch, 32: 2048ch},
with `replace_stride_with_dilation` per stage, `early_exit` after 1/8
(the only configuration matcher decoders consume), and frozen batch-norm
statistics (`freeze_bn` — here BN always runs in inference mode, the
training path simply never updates it; reference overrides .train()).

Not used by any shipped RoMa config (use_vgg=True everywhere,
roma_models.py:159) — provided for encoder parity and experimentation.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from roma_tpu.models.layers import torch_padding

# (blocks, mid_channels) per stage; out = 4 * mid
_STAGES = [(3, 64), (4, 128), (6, 256), (3, 512)]


class Bottleneck(nn.Module):
    mid: int
    stride: int = 1
    dilation: int = 1
    project: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        def bn(h, name):
            return nn.BatchNorm(
                use_running_average=True, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name=name,
            )(h.astype(jnp.float32)).astype(self.dtype)

        out = self.mid * 4
        h = nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        h = nn.relu(bn(h, "bn1"))
        d = self.dilation
        h = nn.Conv(
            self.mid, (3, 3), strides=(self.stride, self.stride),
            padding=[(d, d), (d, d)], kernel_dilation=(d, d),
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv2",
        )(h)
        h = nn.relu(bn(h, "bn2"))
        h = nn.Conv(out, (1, 1), use_bias=False, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(h)
        h = bn(h, "bn3")
        if self.project:
            x = nn.Conv(out, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype,
                        param_dtype=jnp.float32, name="proj")(x)
            x = bn(x, "bn_proj")
        return nn.relu(h + x)


class ResNet50(nn.Module):
    """dilation: per-stage replace-stride-with-dilation flags for the last
    three stages (reference `dilation=[False,False,False]` default)."""

    dilation: Sequence[bool] = (False, False, False)
    early_exit: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> dict[int, jax.Array]:
        del train  # freeze_bn: statistics are never updated
        feats: dict[int, jax.Array] = {1: x}
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=torch_padding(7),
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn1")(x.astype(jnp.float32))
        x = nn.relu(x).astype(self.dtype)
        feats[2] = x
        # torch MaxPool2d(3, 2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # nominal pyramid keys are fixed (4, 8, 16, 32) even when dilation
        # replaces the stride (torchvision semantics; reference keys likewise)
        dil = 1
        for i, (blocks, mid) in enumerate(_STAGES):
            stride = 1 if i == 0 else 2
            if i > 0 and self.dilation[i - 1]:
                dil *= stride
                stride = 1
            for j in range(blocks):
                x = Bottleneck(
                    mid=mid, stride=stride if j == 0 else 1, dilation=dil,
                    project=(j == 0), dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x)
            key = 4 * 2**i
            feats[key] = x
            if self.early_exit and key == 8:
                return feats
        return feats
