"""ConvRefiner: per-scale warp refinement CNN.

TPU re-design of the reference refiner
(/root/reference/romatch/models/matcher.py:17-143). Per scale it:
1. warps im_B features to im_A via the current flow (bilinear gather),
2. embeds the displacement from the identity grid with a 1x1 conv, scaled by
   40/32 * scale_factor (the constant is weight-compatibility-critical,
   matcher.py:120),
3. optionally concatenates a (2r+1)^2 local correlation around the warp
   target (scales 16/8/4; radius from config),
4. runs 1 in-block + N hidden depthwise-separable conv blocks
   (k=5 grouped conv -> BN(momentum .01) -> ReLU -> 1x1 conv),
5. emits (delta_flow x2, delta_certainty x1) from a float32 1x1 head.

The reference's per-batch python loop in local correlation
(utils/local_correlation.py:40) is replaced by the vectorized/scanned
`roma_tpu.ops.local_correlation`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from roma_tpu.models.layers import torch_padding
from roma_tpu.ops.corr import coord_grid
from roma_tpu.ops.grid_sample import grid_sample
from roma_tpu.ops.local_corr import local_correlation
from roma_tpu.ops.pallas.block_gather import local_correlation_dma
from roma_tpu.ops.pallas.depthwise import dw5x5_affine_relu, dw5x5_mm_chain


def use_dma_local_corr(train: bool, radius: int, channels: int) -> bool:
    """Gate for routing local correlation through the DMA block-gather
    Pallas kernel (module-level so bench.py --selftest can assert the model
    shapes actually engage it — a silent flip costs ~0.7 pairs/s)."""
    return (
        not train
        and radius <= 7
        and channels % 128 == 0
        and jax.default_backend() == "tpu"
    )


class _ConvParams(nn.Module):
    """Registers conv kernel/bias params (same names/shapes as nn.Conv) so
    DWBlock can route the math through a fused kernel at inference."""

    shape: tuple[int, ...]

    @nn.compact
    def __call__(self) -> tuple[jax.Array, jax.Array]:
        kernel = self.param("kernel", nn.initializers.lecun_normal(), self.shape)
        bias = self.param("bias", nn.initializers.zeros, (self.shape[-1],))
        return kernel, bias


class _BNParams(nn.Module):
    """Registers BatchNorm params/stats (same names as nn.BatchNorm)."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean", nn.initializers.zeros, None, (self.features,)
        )
        var = self.variable(
            "batch_stats", "var", nn.initializers.ones, None, (self.features,)
        )
        return scale, bias, mean, var


class DWBlock(nn.Module):
    """Depthwise-separable block: grouped k=5 conv -> BN -> ReLU -> 1x1 conv.

    At inference the BatchNorm affine is folded into the conv epilogue and
    the depthwise conv + affine + ReLU run as one fused op
    (`roma_tpu.ops.pallas.depthwise.dw5x5_affine_relu`: a Pallas kernel for
    narrow channels, XLA's own near-roofline conv otherwise). Training keeps
    the unfused path with live batch statistics (torch BatchNorm semantics:
    normalize with biased batch variance, running_var tracks the unbiased
    estimate; ra = m*ra + (1-m)*batch)."""

    features: int
    kernel_size: int = 5
    depthwise: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    bn_momentum: float = 0.99
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(
        self, x: jax.Array | None, train: bool = False, collect: bool = False
    ) -> jax.Array | tuple:
        """collect=True: register the params and return the inference-fused
        tensors (dw kernel (5,5,C), BN-folded scale/shift (C,), 1x1 weights
        (C,C), bias (C,)) WITHOUT computing — the ConvRefiner stacks them
        and runs all blocks through one chained Pallas call
        (ops/pallas/depthwise.py::dw5x5_mm_chain)."""
        in_c = self.features if collect else x.shape[-1]
        groups = in_c if self.depthwise else 1
        k = self.kernel_size
        kernel, cbias = _ConvParams(
            (k, k, in_c // groups, self.features), name="conv1"
        )()
        scale, bbias, ra_mean, ra_var = _BNParams(self.features, name="norm")()
        k2, b2 = _ConvParams((1, 1, self.features, self.features), name="conv2")()

        fused_ok = (
            not train
            and self.depthwise
            and k == 5
            and in_c == self.features
            and not self.is_mutable_collection("batch_stats")
        )
        if collect:
            assert fused_ok, "fused chain is an inference-only fast path"
            inv = scale / jnp.sqrt(ra_var.value + self.bn_eps)
            return (
                kernel[:, :, 0, :].astype(self.dtype),
                inv,
                (cbias - ra_mean.value) * inv + bbias,
                k2[0, 0],
                b2,
            )
        if fused_ok:
            inv = scale / jnp.sqrt(ra_var.value + self.bn_eps)
            x = dw5x5_affine_relu(
                x.astype(self.dtype),
                kernel[:, :, 0, :].astype(self.dtype),
                inv,
                (cbias - ra_mean.value) * inv + bbias,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype), (1, 1),
                torch_padding(k), feature_group_count=groups,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + cbias.astype(self.dtype)
            y = y.astype(jnp.float32)
            if train:
                axes = tuple(range(y.ndim - 1))
                mean = jnp.mean(y, axes)
                var = jnp.mean(jnp.square(y), axes) - jnp.square(mean)
                if not self.is_initializing() and self.is_mutable_collection(
                    "batch_stats"
                ):
                    # torch BatchNorm convention: normalize with the biased
                    # batch variance but track the unbiased (Bessel) estimate
                    # in running_var — keeps from-scratch training stats
                    # torch-parity (ADVICE r1)
                    n = y.size // y.shape[-1]
                    m = self.bn_momentum
                    ra_mean.value = m * ra_mean.value + (1 - m) * mean
                    ra_var.value = m * ra_var.value + (1 - m) * var * (
                        n / max(n - 1, 1)
                    )
            else:
                mean, var = ra_mean.value, ra_var.value
            y = (y - mean) * (scale / jnp.sqrt(var + self.bn_eps)) + bbias
            x = nn.relu(y).astype(self.dtype)
        # 1x1 as conv, not matmul: XLA's conv path measured ~2x faster here
        # (the 4D matmul inserts layout bitcast copies; 432^2 x144 x9 blocks:
        # 40 vs 89 ms)
        return jax.lax.conv_general_dilated(
            x, k2.astype(self.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b2.astype(self.dtype)


class ConvRefiner(nn.Module):
    hidden_dim: int
    displacement_emb_dim: int
    local_corr_radius: int | None = None
    hidden_blocks: int = 8
    kernel_size: int = 5
    disp_emb_gain: float = 40.0 / 32.0
    dtype: jnp.dtype = jnp.bfloat16
    smooth_warp: bool | str = False  # RomaConfig.smooth_warp_gather:
                                  # False | True/"exact" | "fast"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        y: jax.Array,
        flow: jax.Array,
        scale_factor: float = 1.0,
        train: bool = False,
    ) -> tuple[jax.Array, jax.Array]:
        """x, y: (B,H,W,C) projected A/B feats; flow: (B,H,W,2) normalized.

        Returns (delta_flow (B,H,W,2), delta_certainty (B,H,W,1)) — raw conv
        output; the Decoder applies the refine_init/ins scaling.
        """
        B, H, W, C = x.shape
        if self.smooth_warp and not train and y.shape[-1] <= 16:
            from roma_tpu.ops.pallas.windowed_sample import grid_sample_smooth

            mode = "fast" if self.smooth_warp == "fast" else "exact"
            x_hat = grid_sample_smooth(y, flow, mode=mode).astype(self.dtype)
        else:
            x_hat = grid_sample(y, flow).astype(self.dtype)

        grid = jnp.broadcast_to(coord_grid(H, W), (B, H, W, 2))
        disp = (flow - grid).astype(jnp.float32)
        emb = nn.Conv(
            self.displacement_emb_dim, (1, 1), use_bias=True, dtype=self.dtype,
            param_dtype=jnp.float32, name="disp_emb",
        )((self.disp_emb_gain * scale_factor * disp).astype(self.dtype))

        parts = [x.astype(self.dtype), x_hat, emb]
        if self.local_corr_radius is not None:
            # gradient semantics match the reference exactly
            # (local_correlation.py:41-47): the window gather of y at the
            # flow targets runs under no_grad, but grads DO flow into x
            # through the outer product. (The reference's
            # disable_local_corr_grad flag is stored but never read.)
            # bf16 features in: the gathers inside are bandwidth-bound
            #
            # inference on TPU routes through the DMA block-gather Pallas
            # kernel (ops/pallas/block_gather.py) when the window fits its
            # shift layout (8-deep for r <= 3 -> scales 8/4; 16-deep for
            # r <= 7 -> the scale-16 refiner) and C is a lane multiple:
            # per-pixel block DMAs pipeline at ~160-190 GB/s vs
            # the XLA gather emitter's 49-65 GB/s on this access pattern —
            # 2.5-3.3x at the model shapes (experiments/profile_local_corr).
            # Training keeps the XLA path (autodiff into x).
            use_dma = use_dma_local_corr(
                train, self.local_corr_radius, x.shape[-1]
            )
            corr_fn = local_correlation_dma if use_dma else local_correlation
            corr = corr_fn(
                x.astype(self.dtype),
                jax.lax.stop_gradient(y.astype(self.dtype)),
                self.local_corr_radius,
                jax.lax.stop_gradient(flow),
            )
            parts.append(corr.astype(self.dtype))
        d = jnp.concatenate(parts, axis=-1)

        # narrow-channel refiners (scale 1: 24ch) run the whole block stack
        # width-major at inference: one transpose in/out, each block one
        # fused Pallas kernel (dw taps + affine + relu on the VPU, the 1x1
        # as an MXU matmul over the same VMEM band) instead of HBM round
        # trips between the depthwise and the 1x1. Tried and rejected for
        # scale 2 (144ch): in-model XLA NHWC pipelines those blocks at
        # ~2.2 ms vs ~4.8 ms through the width-major kernel (isolated-op
        # probes mislead here — experiments/probe_refiner_blocks.py)
        ncw = (
            not train
            and self.hidden_dim < 64
            and d.shape[-1] == self.hidden_dim
            and self.kernel_size == 5
            and jax.default_backend() == "tpu"
            and not self.is_mutable_collection("batch_stats")
        )
        ko, bo = _ConvParams((1, 1, self.hidden_dim, 3), name="out_conv")()
        # remat each block in training: the 9-block stacks at 5 scales are
        # the activation-memory hog of the 560^2 train graph (without this
        # the batch-2 step OOMs a 16 GB v5e); recompute-in-backward trades
        # ~15% FLOPs for fitting
        block_cls = nn.remat(DWBlock, static_argnums=(2,)) if train else DWBlock
        blocks = [
            block_cls(
                self.hidden_dim, self.kernel_size, dtype=self.dtype, name=n
            )
            for n in ["block_in"] + [f"block_{i}" for i in range(self.hidden_blocks)]
        ]
        if ncw:
            # collect every block's inference-fused params and run the whole
            # stack through the chained padded-frame Pallas kernel: one
            # transpose+pad in, one slice out, zero inter-block copies
            cols = [blk(None, False, True) for blk in blocks]
            d = dw5x5_mm_chain(
                d.astype(self.dtype),
                jnp.stack([c[0] for c in cols]),
                jnp.stack([c[1] for c in cols]),
                jnp.stack([c[2] for c in cols]),
                jnp.stack([c[3] for c in cols]),
                jnp.stack([c[4] for c in cols]),
            )
        else:
            for blk in blocks:
                d = blk(d, train)
        # fp32 out head (reference matcher.py:141-143)
        if ncw:
            out = jnp.einsum(
                "bhcw,cd->bhdw", d.astype(jnp.float32), ko[0, 0]
            ) + bo[:, None]
            out = out.transpose(0, 1, 3, 2)
        else:
            out = jax.lax.conv_general_dilated(
                d.astype(jnp.float32), ko, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bo
        return out[..., :2], out[..., 2:]
