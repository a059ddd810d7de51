"""Headline benchmark — prints ONE JSON line for the driver.

Metric: full RoMa dense matching throughput (pairs/s) at the reference's
shipped inference config — coarse 560^2 + upsampled 864^2 second pass,
symmetric (BASELINE.json primary metric). The reference repo publishes no
GPU throughput (BASELINE.md "gaps"); vs_baseline uses the DERIVED 2.5
pairs/s reference-on-A100 estimate from XLA cost analysis of the
architecture-identical graph (experiments/baseline_estimate.py, PERF.md
"derived baseline") — deliberately generous to the reference.

Timing forces a host readback per batch: on the remote-TPU runtime used in
this environment, block_until_ready returns before execution completes.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from roma_tpu.utils.profiling import enable_compilation_cache

enable_compilation_cache()

# Derived reference baseline (experiments/baseline_estimate.py + BASELINE.md
# "derived baseline"): the architecture-identical graph costs ~6-7 TF/pair;
# eager torch fp16 on A100 at the 25-40% utilization its structure supports
# (python-loop local correlation, unfused chains, empty_cache between
# passes) gives 2.5-4.5 pairs/s compute-bound — before its gather-bound
# stages. 2.5 pairs/s is the defensible reference-on-A100 estimate.
BASELINE_FULL_ROMA_PAIRS_PER_S = 2.5
BASELINE_TINY_NPU_PAIRS_PER_S = 1000.0 / 73.9  # NOTE.md:147-149, 640x320


def _smooth_flow_params(matcher):
    """Variant params that make every predicted flow field smooth: the match
    decoder's head is pinned to one anchor (weights 0, peaked bias) and all
    refiner deltas zeroed. Real trained-weight flow is smooth; random-init
    flow is worst-case for the gather-bound stages — this brackets the other
    side (VERDICT r1 #4: representative gather locality)."""
    import jax.tree_util as jtu

    params = jax.tree.map(lambda x: x, matcher.params)  # shallow-ish copy

    def zero_out(tree, path_parts):
        node = tree
        for p in path_parts[:-1]:
            node = node[p]
        leaf = node[path_parts[-1]]
        node[path_parts[-1]] = {
            "kernel": jnp.zeros_like(leaf["kernel"]),
            "bias": jnp.zeros_like(leaf["bias"]),
        }

    params = jax.device_get(params)  # to mutable host tree
    import flax

    params = flax.core.unfreeze(params) if hasattr(flax.core, "unfreeze") else params
    dec = params["params"]["decoder"]
    head = dec["embedding_decoder"]["to_out"]
    kernel = np.zeros(np.shape(head["kernel"]), np.float32)
    bias = np.zeros(np.shape(head["bias"]), np.float32)
    res = int(round((bias.shape[0] - 1) ** 0.5))
    bias[(res // 2) * res + res // 2] = 20.0  # peak at the center anchor
    dec["embedding_decoder"]["to_out"] = {"kernel": kernel, "bias": bias}
    for s in ("16", "8", "4", "2", "1"):
        zero_out(dec, (f"refiner_{s}", "out_conv"))
    return jax.device_put(params)


def bench_full_roma(batch: int = 8, iters: int = 3, flow: str = "random",
                    smooth_mode: str = "fast") -> dict:
    from roma_tpu.models.zoo import roma_outdoor

    # the smooth variant also turns on the windowed warp-gather kernel
    # (RomaConfig.smooth_warp_gather): with every flow field smooth, its
    # validity check passes and the scale-1 warps take the windowed path —
    # the closest available estimate of trained-weight (real-data) behavior.
    # smooth_mode: "fast" (unconditional windowed, clamped rough tiles —
    # the deployment mode and the recorded smooth metric) or "exact"
    # (proven lax.cond fallback; ~4% slower — see the negative-result note
    # in windowed_sample.py / PERF.md round 5).
    matcher = roma_outdoor(
        smooth_warp_gather=smooth_mode if flow == "smooth" else False
    )
    if flow == "smooth":
        matcher.params = _smooth_flow_params(matcher)
    rng = np.random.default_rng(0)
    h, w = matcher.cfg.coarse_resolution
    ims = [
        jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32))
        for _ in range(iters + 1)
    ]
    # warmup / compile both passes
    warp, cert = matcher.match(ims[0], ims[1], batched=True)
    _ = float(cert.sum())
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            warp, cert = matcher.match(ims[i], ims[i + 1], batched=True)
        _ = float(cert.sum())
        best = min(best, time.perf_counter() - t0)
    pairs_per_s = batch * iters / best
    return {
        "metric": "full_roma_pairs_per_s_560_864",
        "value": round(pairs_per_s, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_FULL_ROMA_PAIRS_PER_S, 2),
    }


def bench_tiny(batch: int = 8, h: int = 320, w: int = 640, iters: int = 10) -> dict:
    from roma_tpu.models.tiny_roma import TinyRomaMatcher

    matcher = TinyRomaMatcher.init(jax.random.PRNGKey(0), hw=(h, w))

    @jax.jit
    def match(params, im_a, im_b):
        corresps = matcher.model.apply(params, im_a, im_b, train=False)
        return corresps[8]["flow"], corresps[8]["certainty"]

    rng = np.random.default_rng(0)
    ims = [
        jnp.asarray(rng.uniform(0, 1, (batch, h, w, 3)).astype(np.float32))
        for _ in range(iters + 1)
    ]
    _ = float(match(matcher.params, ims[0], ims[1])[0].sum())
    best = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for i in range(iters):
            out = match(matcher.params, ims[i], ims[i + 1])
        _ = float(out[0].sum())
        best = min(best, time.perf_counter() - t0)
    pairs_per_s = batch * iters / best
    return {
        "metric": "tiny_roma_pairs_per_s_640x320",
        "value": round(pairs_per_s, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / BASELINE_TINY_NPU_PAIRS_PER_S, 2),
    }


def kernel_selftest() -> dict:
    """On-device agreement of every Pallas kernel vs its XLA reference at
    model shapes (VERDICT r1 #7: CPU CI runs interpret mode; this guards the
    real-TPU lowering against libtpu gather/fusion cliffs)."""
    rng = np.random.default_rng(0)
    out = {"metric": "kernel_selftest_max_abs_err", "unit": "abs err"}

    # flash attention at the ViT-L coarse shape (1601 tokens)
    from roma_tpu.models.transformer import _flash_attention

    q = jnp.asarray(rng.standard_normal((2, 1601, 4, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((2, 1601, 4, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((2, 1601, 4, 64)), jnp.bfloat16)
    ref = jax.nn.dot_product_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = _flash_attention(q, k, v).astype(jnp.float32)
    out["flash_attention"] = float(jnp.max(jnp.abs(got - ref)))

    # fused depthwise (both layouts) at the scale-1 refiner shape
    from roma_tpu.ops.pallas.depthwise import _jax_reference, dw5x5_affine_relu

    x = jnp.asarray(rng.standard_normal((2, 216, 216, 24)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((5, 5, 24)) * 0.2, jnp.bfloat16)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (24,)), jnp.float32)
    shift = jnp.asarray(rng.standard_normal((24,)) * 0.1, jnp.float32)
    ref = _jax_reference(x, w, scale, shift).astype(jnp.float32)
    got = dw5x5_affine_relu(x, w, scale, shift).astype(jnp.float32)
    out["dw5x5_nhwc"] = float(jnp.max(jnp.abs(got - ref)))
    got = dw5x5_affine_relu(
        x.transpose(0, 1, 3, 2), w, scale, shift, "NHCW"
    ).transpose(0, 1, 3, 2).astype(jnp.float32)
    out["dw5x5_nhcw"] = float(jnp.max(jnp.abs(got - ref)))

    # streaming corr-softmax at a tiny-RoMa-like shape
    from roma_tpu.ops.pallas.corr_softmax import fused_pos_embed

    f0 = jnp.asarray(rng.standard_normal((2, 40 * 80, 64)), jnp.float32)
    f1 = jnp.asarray(rng.standard_normal((2, 40 * 80, 64)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1, 1, (40 * 80, 2)), jnp.float32)
    cv = jnp.einsum("bic,bjc->bij", f0, f1) / 8.0
    p = jax.nn.softmax(cv, axis=-1)
    ref = jnp.einsum("bij,jd->bid", p, grid)
    got = fused_pos_embed(f0, f1, grid)
    out["fused_corr_softmax"] = float(jnp.max(jnp.abs(got - ref)))

    # grid_sample corner-packed gather vs XLA one-hot matmul oracle
    from roma_tpu.ops.grid_sample import grid_sample

    y = jnp.asarray(rng.standard_normal((2, 64, 64, 32)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-1.2, 1.2, (2, 48, 48, 2)), jnp.float32)
    got = grid_sample(y, flow)
    # oracle: dense one-hot bilinear (exact, memory-heavy — fine at 64^2)
    gx = (flow[..., 0] + 1) * 64 / 2 - 0.5
    gy = (flow[..., 1] + 1) * 64 / 2 - 0.5
    x0 = jnp.floor(gx); y0 = jnp.floor(gy)
    wx = gx - x0; wy = gy - y0
    def fetch(yy, xx):
        valid = (yy >= 0) & (yy < 64) & (xx >= 0) & (xx < 64)
        yc = jnp.clip(yy, 0, 63).astype(jnp.int32)
        xc = jnp.clip(xx, 0, 63).astype(jnp.int32)
        flat = y.reshape(2, 64 * 64, 32)
        idx = yc * 64 + xc
        g = jnp.take_along_axis(
            flat, idx.reshape(2, -1, 1).astype(jnp.int32), axis=1
        ).reshape(2, 48, 48, 32)
        return g * valid[..., None]
    ref = (
        fetch(y0, x0) * ((1 - wx) * (1 - wy))[..., None]
        + fetch(y0, x0 + 1) * (wx * (1 - wy))[..., None]
        + fetch(y0 + 1, x0) * ((1 - wx) * wy)[..., None]
        + fetch(y0 + 1, x0 + 1) * (wx * wy)[..., None]
    )
    out["grid_sample"] = float(jnp.max(jnp.abs(got - ref)))

    # DMA block-gather local correlation vs the XLA packed-gather path at a
    # refiner-like shape. On-device the two differ at bf16 level — and the
    # fp64 oracle says the DMA kernel is the accurate one (7e-6 vs the XLA
    # einsum's 5e-3), so this entry guards integration, not kernel quality.
    from roma_tpu.ops.local_corr import local_correlation
    from roma_tpu.ops.pallas.block_gather import local_correlation_dma

    f0 = jnp.asarray(rng.standard_normal((2, 40, 40, 128)), jnp.bfloat16)
    f1 = jnp.asarray(rng.standard_normal((2, 40, 40, 128)), jnp.bfloat16)
    fl = jnp.asarray(rng.uniform(-1.3, 1.3, (2, 40, 40, 2)), jnp.float32)
    ref = local_correlation(f0, f1, 2, fl).astype(jnp.float32)
    got = local_correlation_dma(f0, f1, 2, fl).astype(jnp.float32)
    out["local_corr_dma_vs_xla"] = float(jnp.max(jnp.abs(got - ref)))

    # fused full-block kernel (dw5x5+affine+relu+1x1 matmul, width-major)
    # vs its composed reference at the scale-1 refiner shape
    from roma_tpu.ops.pallas.depthwise import _mm_reference, _mm_tpu_path

    xm = jnp.asarray(rng.standard_normal((2, 120, 160, 24)), jnp.bfloat16)
    wm = jnp.asarray(rng.standard_normal((5, 5, 24)) * 0.2, jnp.bfloat16)
    mm = jnp.asarray(rng.standard_normal((24, 24)) * 0.2, jnp.bfloat16)
    bm = jnp.asarray(rng.standard_normal((24,)) * 0.1, jnp.float32)
    ref = _mm_reference(xm, wm, scale, shift, mm, bm).astype(jnp.float32)
    got = _mm_tpu_path(
        xm.transpose(0, 1, 3, 2), wm, scale, shift, mm, bm
    ).transpose(0, 1, 3, 2).astype(jnp.float32)
    out["dw5x5_mm_fused"] = float(jnp.max(jnp.abs(got - ref)))

    # DMA gate ENGAGEMENT (VERDICT r3 #5): the scale-8 refiner at model
    # shapes must actually lower through the Pallas block-gather kernel — at
    # C=512 every depthwise runs on XLA's own conv, so the refiner graph
    # contains a tpu_custom_call IFF the DMA local-corr routing engaged.
    # A regression flipping `use_dma_local_corr` fails this loudly.
    from roma_tpu.models.refiner import ConvRefiner, use_dma_local_corr
    from roma_tpu.ops.corr import coord_grid

    assert use_dma_local_corr(False, 3, 512), "DMA gate flipped off!"
    ref_mod = ConvRefiner(
        hidden_dim=2 * 512 + 64 + 49, displacement_emb_dim=64,
        local_corr_radius=3, hidden_blocks=1,
    )
    f8 = jnp.zeros((2, 70, 70, 512), jnp.bfloat16)
    fl8 = jnp.broadcast_to(coord_grid(70, 70), (2, 70, 70, 2))
    p8 = jax.eval_shape(ref_mod.init, jax.random.PRNGKey(0), f8, f8, fl8)
    p8 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p8)
    hlo = jax.jit(
        lambda p, a, b, fl: ref_mod.apply(p, a, b, fl)
    ).lower(p8, f8, f8, fl8).as_text()
    out["dma_gate_engaged"] = float(0.0 if "tpu_custom_call" in hlo else 1.0)

    # windowed smooth-warp gate ENGAGEMENT (VERDICT r4 weak #2): a refiner
    # built with smooth_warp="fast" at scale-1-like shapes must lower its
    # warp through the windowed Pallas kernel. hidden_dim=64 keeps the
    # dw-chain fusion off and local_corr_radius=None keeps the DMA kernel
    # out, so this graph contains a tpu_custom_call IFF the windowed
    # routing (refiner gate + wrapper backend/C gates) engaged.
    sw_mod = ConvRefiner(
        hidden_dim=64, displacement_emb_dim=46, hidden_blocks=1,
        smooth_warp="fast",
    )
    f1s = jnp.zeros((1, 16, 128, 9), jnp.bfloat16)
    fl1 = jnp.broadcast_to(coord_grid(16, 128), (1, 16, 128, 2))
    p1 = jax.eval_shape(sw_mod.init, jax.random.PRNGKey(0), f1s, f1s, fl1)
    p1 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), p1)
    hlo = jax.jit(
        lambda p, a, b, fl: sw_mod.apply(p, a, b, fl)
    ).lower(p1, f1s, f1s, fl1).as_text()
    out["windowed_gate_engaged"] = float(
        0.0 if "tpu_custom_call" in hlo else 1.0
    )

    out["value"] = max(
        out["flash_attention"], out["dw5x5_nhwc"], out["dw5x5_nhcw"],
        out["fused_corr_softmax"], out["grid_sample"],
        out["local_corr_dma_vs_xla"], out["dw5x5_mm_fused"],
        out["dma_gate_engaged"], out["windowed_gate_engaged"],
    )
    out["vs_baseline"] = 1.0
    return out


if __name__ == "__main__":
    if "--selftest" in sys.argv:
        print(json.dumps(kernel_selftest()))
    elif "--smooth" in sys.argv:
        print(json.dumps(bench_full_roma(flow="smooth")))
    elif "--tiny" in sys.argv:
        print(json.dumps(bench_tiny()))
    else:
        # the conservative random-flow number is the headline; the
        # smooth-flow (trained-weight-regime, windowed-gather) number rides
        # along in the same JSON line so the driver records BOTH
        # trajectories per round (VERDICT r4 #7)
        res = bench_full_roma()
        sm = bench_full_roma(flow="smooth")
        res["smooth_pairs_per_s"] = sm["value"]
        res["smooth_vs_baseline"] = sm["vs_baseline"]
        print(json.dumps(res))
