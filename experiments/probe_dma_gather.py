"""Probe: can a Pallas kernel with many outstanding DMAs beat the XLA gather
emitter's ~45-50 GB/s effective bandwidth on random block reads?

Decides whether a DMA-pipelined local-correlation kernel is worth building
(PERF.md round-2): fetches T random (K2, K2*C) blocks per grid step from an
HBM-resident feature map into a rotating VMEM buffer (S-deep pipeline), does
a trivial reduction so nothing is dead-code-eliminated, and reports GB/s vs
the XLA take_along_axis equivalent.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from roma_tpu.utils.profiling import enable_compilation_cache


def _kernel(idx_ref, f1_ref, out_ref, buf, sem, K2, C, T, S):
    """Grid step: T block fetches, S-deep DMA pipeline, checksum out.

    f1_ref is the 8-SHIFTED layout (8, Hp/1, Wp*C): copy s holds rows
    shifted by s, so any y0 maps to (s = y0 % 8, row (y0//8)*8) — an
    8-aligned sublane start with extent 8, satisfying Mosaic's tiled-HBM
    slicing rules. Lane offsets are x0*C with C a multiple of 128."""
    def dma(i, slot):
        y0 = idx_ref[0, 2 * i]
        x0 = idx_ref[0, 2 * i + 1]
        s = jax.lax.rem(y0, 8)
        yb = jax.lax.div(y0, 8)
        # 5D layout (8, Hp/8, Wp, 8, C): all dynamic offsets land on UNTILED
        # leading dims; the tiled last-two (8 sublanes, C lanes) are sliced
        # full — satisfies Mosaic's tiled-HBM slicing rules
        return pltpu.make_async_copy(
            f1_ref.at[s, yb, pl.ds(x0, K2)],
            buf.at[slot], sem.at[slot],
        )

    def start(i, slot):
        dma(i, slot).start()

    def wait(i, slot):
        dma(i, slot).wait()

    for i in range(S):
        start(i, i)
    acc = jnp.zeros((8, 128), jnp.float32)

    def body(i, acc):
        slot = jax.lax.rem(i, S)
        wait(i, slot)
        acc = acc + buf[slot, 0, :, :128].astype(jnp.float32)
        nxt = i + S

        @pl.when(nxt < T)
        def _():
            start(nxt, jax.lax.rem(nxt, S))

        return acc

    acc = jax.lax.fori_loop(0, T, body, acc)
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("K2", "C", "T", "S"))
def dma_gather_probe(f1_flat, idx, K2, C, T, S):
    n_steps = idx.shape[0]
    return pl.pallas_call(
        functools.partial(_kernel, K2=K2, C=C, T=T, S=S),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((None, 1, 2 * T), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, 8, 128), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S, K2, 8, C), f1_flat.dtype),
            pltpu.SemaphoreType.DMA((S,)),
        ],
    )(idx, f1_flat)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=216)
    ap.add_argument("--C", type=int, default=256)
    ap.add_argument("--r", type=int, default=2)
    ap.add_argument("--T", type=int, default=256)
    args = ap.parse_args()
    enable_compilation_cache()

    H = W = args.hw
    C, r = args.C, args.r
    K2 = 2 * r + 2
    rng = np.random.default_rng(0)
    pad = r + 1
    Hp = -(-(H + 2 * pad + 8) // 8) * 8
    Wp = W + 2 * pad
    base = rng.standard_normal((Hp + 8, Wp, C)).astype(np.float32)
    # f1_5d[s, yb, x, r, c] = base[yb*8 + r + s, x, c]
    f1 = np.stack([
        base[s : s + Hp].reshape(Hp // 8, 8, Wp, C).transpose(0, 2, 1, 3)
        for s in range(8)
    ])
    f1 = jnp.asarray(f1, jnp.bfloat16)

    n_pix = H * W * 4  # 4 images
    y0 = rng.integers(0, H, n_pix).astype(np.int32)
    x0 = rng.integers(0, W, n_pix).astype(np.int32)
    T = args.T
    n_steps = n_pix // T
    idx = np.stack([y0, x0], -1).reshape(n_steps, 1, 2 * T).astype(np.int32)
    idx = jnp.asarray(idx)

    bytes_total = n_steps * T * 8 * K2 * C * 2  # (K2, 8, C) fetches

    for S in (2, 4, 8, 16):
        fn = lambda: dma_gather_probe(f1, idx, K2, C, T, S)
        out = fn()
        _ = float(out.sum())
        best = 1e9
        for _t in range(3):
            t0 = time.perf_counter()
            for _ in range(4):
                out = fn()
            _ = float(out.sum())
            best = min(best, (time.perf_counter() - t0) / 4)
        print(f"S={S:2d}: {best*1e3:7.2f} ms  {bytes_total/best/1e9:7.1f} GB/s")

    # XLA gather baseline: same bytes via take_along_axis of K2*C-wide rows
    f1_rows = f1.reshape(-1, K2 * C // K2 * K2)[: (H + 2 * pad) * (W + 2 * pad) // 1]
    f1_r = jnp.asarray(
        rng.standard_normal((H * W, K2 * C)).astype(np.float32), jnp.bfloat16
    )
    ridx = jnp.asarray(rng.integers(0, H * W, (n_pix * K2,)).astype(np.int32))

    @jax.jit
    def xla_gather(f, ii):
        return jnp.take_along_axis(
            f, ii[:, None], axis=0, mode="promise_in_bounds"
        ).sum(dtype=jnp.float32)

    out = xla_gather(f1_r, ridx)
    _ = float(out)
    best = 1e9
    for _t in range(3):
        t0 = time.perf_counter()
        for _ in range(4):
            out = xla_gather(f1_r, ridx)
        _ = float(out)
        best = min(best, (time.perf_counter() - t0) / 4)
    xbytes = n_pix * K2 * K2 * C * 2
    print(f"XLA row-gather same bytes: {best*1e3:7.2f} ms  {xbytes/best/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
