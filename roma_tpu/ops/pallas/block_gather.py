"""DMA-pipelined local correlation (Pallas/TPU).

The XLA gather emitter moves random (2r+2)^2-corner window reads at
~45-105 GB/s effective; a Pallas kernel issuing per-pixel block DMAs with a
deep in-flight pipeline reaches ~330 GB/s on the same access pattern
(experiments/probe_dma_gather.py, v5e) — local correlation is the dominant
non-matmul cost of full-RoMa decode (PERF.md round 2), so this kernel
replaces `roma_tpu.ops.local_corr.local_correlation` on TPU for
128-multiple channel widths.

Key constraints designed around (Mosaic tiled-HBM slicing):
- dynamic offsets are only legal on UNTILED leading dims, so the source map
  is pre-arranged as a 5D "S-shift" layout per image (S = 8 for r <= 3,
  S = 16 for the scale-16 refiner's r <= 7)
      f1s[b, s, yb, x, rr, c] = padded[b, yb*S + rr + s, x, c]
  and a window at arbitrary (ys, xs) becomes the fully-aligned slice
      f1s[b, ys % S, ys // S, xs : xs + K2]   ->  (K2, S, C)
  (rows rr = 0..K2-1 are exactly padded rows ys .. ys+K2-1).
- the map is zero-padded K2 pixels per side, so any window whose clamped
  origin was moved is ENTIRELY inside the zero pad (partially-visible
  windows are never clamped) — bit-exact zeros-padding grid_sample
  semantics with no per-corner masking.

Per grid step: T pixels. Phase A fires T block DMAs (all in flight), phase B
computes the (2r+2)^2 corner dots vectorized over the T pixels; the bilinear
4-corner combine runs outside in XLA (cheap elementwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_cur, idx_nxt, f0_ref, f1_ref, out_ref, buf, sem0, sem1,
            *, K2, C, T, S, n_steps):
    """Double-buffered: while step s's corner dots run on the VPU, step
    s+1's T block DMAs are already in flight into the other half of `buf`
    (round 3 serialized fire->wait->compute per step at ~180 GB/s effective;
    overlapping compute under the copies recovers most of the ~330 GB/s the
    DMA engines sustain on this access pattern — probe_dma_gather).

    Two semaphores, one per buffer parity: a single shared semaphore counts
    completions anonymously, so a wait for step s's T copies could be
    satisfied by early completions of step s+1's — parity-split semaphores
    make each wait drain exactly its own step's copies. Within a parity the
    copies are all equal-sized, so T waits drain T completions (the r3
    shared-semaphore argument, now per parity)."""
    s = pl.program_id(0)

    def fire(idx_ref, slot, sem):
        def dma(i):
            # (b, s, yb, xs) precomputed on the XLA side: the fire loop is
            # the scalar-core bottleneck at small blocks (~130 ns/descriptor
            # at r=2), so no rem/div here
            b = idx_ref[0, 4 * i]
            sh = idx_ref[0, 4 * i + 1]
            yb = idx_ref[0, 4 * i + 2]
            xs = idx_ref[0, 4 * i + 3]
            return pltpu.make_async_copy(
                f1_ref.at[b, sh, yb, pl.ds(xs, K2)], buf.at[slot, i], sem
            )

        # rolled fori_loop, not Python unroll: starts are non-blocking either
        # way, and unrolled per-slot code ballooned Mosaic compile to minutes
        jax.lax.fori_loop(0, T, lambda i, c: (dma(i).start(), c)[1], 0)

    def wait(slot, sem):
        def dma(i):
            return pltpu.make_async_copy(
                f1_ref.at[0, 0, 0, pl.ds(0, K2)], buf.at[slot, i], sem
            )

        jax.lax.fori_loop(0, T, lambda i, c: (dma(i).wait(), c)[1], 0)

    cur = jax.lax.rem(s, 2)
    nxt = jax.lax.rem(s + 1, 2)
    # prologue: step 0 fires its own copies first (parity 0)
    @pl.when(s == 0)
    def _():
        fire(idx_cur, 0, sem0)

    # fire next step's copies before waiting on the current ones
    @pl.when((s + 1 < n_steps) & (nxt == 0))
    def _():
        fire(idx_nxt, 0, sem0)

    @pl.when((s + 1 < n_steps) & (nxt == 1))
    def _():
        fire(idx_nxt, 1, sem1)

    @pl.when(cur == 0)
    def _():
        wait(0, sem0)

    @pl.when(cur == 1)
    def _():
        wait(1, sem1)

    # corner dots, vectorized over the T pixels
    f0 = f0_ref[...].astype(jnp.float32)  # (T, C)
    for dy in range(K2):
        for dx in range(K2):
            red = jnp.sum(
                buf[cur, :, dx, dy, :].astype(jnp.float32) * f0, axis=-1
            )
            out_ref[dy * K2 + dx, :] = red
    for k in range(K2 * K2, out_ref.shape[0]):
        out_ref[k, :] = jnp.zeros((T,), jnp.float32)


def _shift_depth(radius: int) -> int:
    """Shift-layout depth: 8 rows cover r <= 3; 16 rows cover r <= 7 (the
    scale-16 refiner). Memory cost of the layout is S copies of the map."""
    assert radius <= 7, "shift layout covers K2 = 2r+2 <= 16 rows"
    return 8 if radius <= 3 else 16


def _pipeline_depth(radius: int, C: int) -> int:
    """T in-flight block DMAs per buffer, sized so the DOUBLE (2, T, K2, S,
    C) bf16 landing buffer stays within ~8 MB of VMEM (multiple of 8, max
    128)."""
    K2 = 2 * radius + 2
    block = K2 * _shift_depth(radius) * C * 2
    # (T=80 via a 5 MB budget measured identical to T=64 — ~210 GB/s is this
    # access pattern's ceiling; keep the smaller footprint for fusion headroom)
    return max(8, min(128, (4 * 1024 * 1024 // block) // 8 * 8))


@functools.partial(jax.jit, static_argnames=("radius", "T", "interpret"))
def _block_corr(f0_flat, f1s, bidx, ys, xs, radius, T=128, interpret=False):
    """f0_flat (N, C); f1s (B, S, Hb, Wp, S, C); bidx/ys/xs (N,) int32 ->
    (N, K2*K2) f32 corner dots (row-major dy, dx). N a multiple of T."""
    S = _shift_depth(radius)
    K2 = 2 * radius + 2
    C = f0_flat.shape[-1]
    N = f0_flat.shape[0]
    n_steps = N // T
    NK = -(-(K2 * K2) // 8) * 8
    idx = jnp.stack(
        [bidx, jax.lax.rem(ys, S), jax.lax.div(ys, S), xs], axis=-1
    ).reshape(n_steps, 1, 4 * T)

    # the SAME idx array enters twice: once at block s (current step's
    # pixels) and once at block s+1 (the copies fired ahead into the other
    # buffer half)
    out = pl.pallas_call(
        functools.partial(_kernel, K2=K2, C=C, T=T, S=S, n_steps=n_steps),
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((None, 1, 4 * T), lambda s: (s, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (None, 1, 4 * T),
                lambda s: (jnp.minimum(s + 1, n_steps - 1), 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((None, T, C), lambda s: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((None, NK, T), lambda s: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, NK, T), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, T, K2, S, C), f0_flat.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, idx, f0_flat.reshape(n_steps, T, C), f1s)
    # (n_steps, NK, T) -> (N, K2*K2)
    return out.transpose(0, 2, 1).reshape(N, NK)[:, : K2 * K2]


def _shift_layout(f1p: jax.Array, S: int = 8) -> jax.Array:
    """(B, Hp, Wp, C) zero-padded map -> (B, S, Hb, Wp, S, C) S-shift layout
    with f1s[b, s, yb, x, rr] = f1p[b, yb*S + rr + s, x]."""
    B, Hp, Wp, C = f1p.shape
    Hb = (Hp + S - 1) // S
    f1p = jnp.pad(f1p, ((0, 0), (0, Hb * S + S - 1 - Hp), (0, 0), (0, 0)))
    shifts = [
        f1p[:, s : s + Hb * S].reshape(B, Hb, S, Wp, C).transpose(0, 1, 3, 2, 4)
        for s in range(S)
    ]
    return jnp.stack(shifts, axis=1)  # (B, S, Hb, Wp, S, C)


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def local_correlation_dma(
    f0: jax.Array,
    f1: jax.Array,
    radius: int,
    flow: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for `roma_tpu.ops.local_corr.local_correlation` (C a multiple
    of 128, flow required): (B,H,W,C) x2 + flow (B,H,W,2) ->
    (B,H,W,(2r+1)^2) with zeros-padding bilinear semantics."""
    B, H, W, C = f0.shape
    r = radius
    k = 2 * r + 1
    K2 = 2 * r + 2

    gx = (flow[..., 0].astype(jnp.float32) + 1.0) * (W / 2) - 0.5
    gy = (flow[..., 1].astype(jnp.float32) + 1.0) * (H / 2) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0).astype(jnp.float32)
    wy = (gy - y0).astype(jnp.float32)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    scale = 1.0 / jnp.sqrt(jnp.asarray(C, jnp.float32))
    f0s = (f0.astype(jnp.float32) * scale).astype(f0.dtype)

    # pad K2 per side: a window whose origin clamps is entirely in the pad
    f1p = jnp.pad(f1, ((0, 0), (K2, K2), (K2, K2), (0, 0)))
    Hp, Wp = H + 2 * K2, W + 2 * K2
    f1s = _shift_layout(f1p, _shift_depth(radius))

    ys = jnp.clip(y0i - r + K2, 0, Hp - K2).reshape(B * H * W)
    xs = jnp.clip(x0i - r + K2, 0, Wp - K2).reshape(B * H * W)
    bidx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), H * W)

    T = _pipeline_depth(radius, C)
    N = B * H * W
    Np = -(-N // T) * T
    padn = Np - N
    f0_fl = jnp.pad(f0s.reshape(N, C), ((0, padn), (0, 0)))
    g = _block_corr(
        f0_fl,
        f1s,
        jnp.pad(bidx, (0, padn)),
        jnp.pad(ys, (0, padn)),
        jnp.pad(xs, (0, padn)),
        radius,
        T=T,
        interpret=interpret,
    )[:N]
    g = g.reshape(B, H, W, K2, K2)

    def sub(dy0, dx0):
        return jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(g, dy0, dy0 + k, axis=3), dx0, dx0 + k, axis=4
        ).reshape(B, H, W, k * k)

    w00 = ((1 - wy) * (1 - wx))[..., None]
    w01 = ((1 - wy) * wx)[..., None]
    w10 = (wy * (1 - wx))[..., None]
    w11 = (wy * wx)[..., None]
    return (
        w00 * sub(0, 0) + w01 * sub(0, 1) + w10 * sub(1, 0) + w11 * sub(1, 1)
    )
