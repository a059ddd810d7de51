"""Micro-profile of full-RoMa decoder components at real pipeline shapes.

Times each building block in isolation (GP, transformer decoder, each
ConvRefiner, grid_sample, local correlation) to find where the decode time
goes. Shapes follow the 560^2 coarse + 864^2 upsample two-pass config with
symmetric batching (4 images through the decoder for a 2-pair batch).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import time

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.utils.profiling import enable_compilation_cache


def timed(fn, *args, iters=8, trials=3, name=""):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:44s} {best * 1e3:9.2f} ms")
    return best


def main():
    enable_compilation_cache()
    from roma_tpu.config import RomaConfig
    from roma_tpu.models.gp import GP
    from roma_tpu.models.refiner import ConvRefiner
    from roma_tpu.models.transformer import TransformerDecoder
    from roma_tpu.ops.corr import coord_grid
    from roma_tpu.ops.grid_sample import grid_sample
    from roma_tpu.ops.local_corr import local_correlation

    cfg = RomaConfig()
    B = 4  # symmetric pair batch of 2
    rng = np.random.default_rng(0)

    def arr(*shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32), dtype)

    # ---- GP at 1/16 of 560: 35x35 = 1225 tokens
    gp = GP(gp_dim=cfg.gp.gp_dim, T=cfg.gp.kernel_temperature,
            sigma_noise=cfg.gp.sigma_noise)
    x16 = arr(B, 40, 40, 512, dtype=jnp.float32)
    p_gp = jax.jit(gp.init)(jax.random.PRNGKey(0), x16, x16)
    gp_fn = jax.jit(lambda p, a, b: gp.apply(p, a, b))
    timed(gp_fn, p_gp, x16, x16, name="GP 40x40 (1600 tokens)")

    # ---- transformer decoder: 1225 tokens, 1024d, 5 blocks
    td = TransformerDecoder(hidden_dim=cfg.decoder_dim, out_dim=cfg.cls_res**2 + 1,
                            num_blocks=cfg.num_decoder_blocks,
                            num_heads=cfg.decoder_heads)
    gpost = arr(B, 40, 40, 512)
    feats = arr(B, 40, 40, 512)
    p_td = jax.jit(td.init)(jax.random.PRNGKey(0), gpost, feats)
    td_fn = jax.jit(lambda p, a, b: td.apply(p, a, b))
    timed(td_fn, p_td, gpost, feats, name="TransformerDecoder 1600 tok")

    # ---- refiners at coarse-pass resolutions (560 base)
    scale_hw = {"16": 40, "8": 70, "4": 140, "2": 280, "1": 560}
    proj_out = {s: d[1] for s, d in cfg.proj_dims.items()}
    for s, rc in cfg.refiners.items():
        hw = scale_hw[s]
        C = proj_out[s]
        ref = ConvRefiner(
            hidden_dim=rc.hidden_dim, displacement_emb_dim=rc.displacement_emb_dim,
            local_corr_radius=rc.local_corr_radius, hidden_blocks=rc.hidden_blocks,
            kernel_size=rc.kernel_size, disp_emb_gain=cfg.disp_emb_gain,
        )
        f = arr(B, hw, hw, C)
        flow = jnp.broadcast_to(coord_grid(hw, hw), (B, hw, hw, 2))
        p = jax.jit(ref.init)(jax.random.PRNGKey(0), f, f, flow)
        fn = jax.jit(lambda p, a, b, fl, ref=ref: ref.apply(p, a, b, fl))
        timed(fn, p, f, f, flow, name=f"refiner[{s}] @{hw}x{hw} C={C} h={rc.hidden_dim}")

    # ---- refiners at upsample-pass resolutions (864 base)
    scale_hw_up = {"8": 108, "4": 216, "2": 432, "1": 864}
    for s in ["8", "4", "2", "1"]:
        rc = cfg.refiners[s]
        hw = scale_hw_up[s]
        C = proj_out[s]
        ref = ConvRefiner(
            hidden_dim=rc.hidden_dim, displacement_emb_dim=rc.displacement_emb_dim,
            local_corr_radius=rc.local_corr_radius, hidden_blocks=rc.hidden_blocks,
            kernel_size=rc.kernel_size, disp_emb_gain=cfg.disp_emb_gain,
        )
        f = arr(B, hw, hw, C)
        flow = jnp.broadcast_to(coord_grid(hw, hw), (B, hw, hw, 2))
        p = jax.jit(ref.init)(jax.random.PRNGKey(0), f, f, flow)
        fn = jax.jit(lambda p, a, b, fl, ref=ref: ref.apply(p, a, b, fl))
        timed(fn, p, f, f, flow,
              name=f"refiner[{s}]up @{hw}x{hw} C={C} h={rc.hidden_dim}")

    # ---- raw ops
    f8 = arr(B, 108, 108, 512)
    flow8 = jnp.broadcast_to(coord_grid(108, 108), (B, 108, 108, 2))
    gs = jax.jit(grid_sample)
    timed(gs, f8, flow8, name="grid_sample 108x108x512")
    lc = jax.jit(lambda a, b, fl: local_correlation(a, b, 3, fl))
    timed(lc, f8, f8, flow8, name="local_corr r=3 108x108x512")
    f1 = arr(B, 864, 864, 9)
    flow1 = jnp.broadcast_to(coord_grid(864, 864), (B, 864, 864, 2))
    timed(gs, f1, flow1, name="grid_sample 864x864x9")


if __name__ == "__main__":
    main()
