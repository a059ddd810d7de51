"""Smoothness-exploiting windowed warp gather (Pallas/TPU).

`grid_sample` on a random flow is gather-emitter-bound (~16 ns/row at 3M
rows for the 864^2 x9 scale-1 warp — PERF.md). Real trained-weight flow
fields are SMOOTH: neighbouring output pixels sample neighbouring source
pixels, so an (8, 128) tile of outputs reads from a small source window.
This kernel exploits that:

- the source is pre-arranged (B, Yb, Xb, C, 8, 128) — y in 8-row blocks, x
  in 128-col blocks, so BOTH window origins resolve at DMA time via untiled
  leading dims at block granularity (a 16-deep row-shift layout gave exact
  y origins but cost 16 source copies — 5.8 GB at the bench batch — the
  block-granular origins cost only a wider row enumeration);
- per output tile, 3x3 blocks (24 rows x 384 cols) land in VMEM; a dynamic
  lane ROLL aligns the x-origin (Mosaic supports dynamic positive roll
  amounts; dynamic lane SLICES do not compile);
- the bilinear sample then becomes a static (rr, j) enumeration over the
  24 x E window: value = sum_rr sum_j wrow_rr * wcol_j * buf[c, rr, j:j+128]
  — all static slices, all (8, 128) vector ops.

EXACTNESS CONTRACT: the public wrapper computes per-tile validity on the
XLA side (y-range <= 14, x-disparity-range <= E-2, coords in the padded
frame) and `lax.cond`s between this kernel (ALL tiles valid) and the plain
`grid_sample` packed-gather path — so callers get bit-consistent zeros-pad
bilinear semantics for ANY flow, and the windowed win whenever the whole
batch is smooth (real weights); a random/violating flow costs only the
validity reduction on top of the fallback (~"no cliff", VERDICT r3 #8).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# window geometry (static): 3 fetched 8-row y-blocks (24 rows: <=14 of
# y-range + 8 of block-alignment slop + the +1 bilinear row), E-wide
# x-disparity window, (TH, TW) = (8, 128) output tiles, 3 128-col x-blocks
_E = 8
_TH, _TW = 8, 128
_NXB = 3
_NYB = 3


def _kernel(tile_ref, y0r_ref, e_ref, wx_ref, wy_ref, L_ref, out_ref,
            buf, sem, *, C, n_tx):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    t = ty * n_tx + tx
    yb = tile_ref[t, 0]       # y0min // 8 (block-granular y origin)
    xb = tile_ref[t, 1]       # j0_abs // 128
    off = tile_ref[t, 2]      # j0_abs % 128
    for i in range(_NYB):
        for j in range(_NXB):
            pltpu.make_async_copy(
                L_ref.at[b, yb + i, xb + j], buf.at[i, j], sem
            ).start()
    for i in range(_NYB):
        for j in range(_NXB):
            pltpu.make_async_copy(
                L_ref.at[b, yb + i, xb + j], buf.at[i, j], sem
            ).wait()

    y0r = y0r_ref[...]        # (TH, TW) int32: y0 - yb*8 in [0, 22]
    e = e_ref[...]            # (TH, TW) int32: x0 - w - j0_abs in [0, E-2]
    wx = wx_ref[...]          # (TH, TW) f32
    wy = wy_ref[...]
    # row weights: source row rr gets (y0==rr)*(1-wy) + (y0==rr-1)*wy
    wrow = [
        jnp.where(y0r == rr, 1.0 - wy, 0.0)
        + (jnp.where(y0r == rr - 1, wy, 0.0) if rr >= 1 else 0.0)
        for rr in range(_NYB * 8)
    ]
    wcol = [
        jnp.where(e == j, 1.0 - wx, 0.0)
        + (jnp.where(e == j - 1, wx, 0.0) if j >= 1 else 0.0)
        for j in range(_E)
    ]
    for c in range(C):
        # (24, 3*128) channel plane, x-origin aligned to lane 0 via dynamic
        # roll (positive amounts only — negative dynamic rolls miscompile;
        # bf16 dynamic_rotate doesn't lower on v5e Mosaic, so roll in f32)
        plane = jnp.concatenate(
            [
                jnp.concatenate(
                    [buf[i, j, c].astype(jnp.float32) for j in range(_NXB)],
                    axis=1,
                )
                for i in range(_NYB)
            ],
            axis=0,
        )
        plane = pltpu.roll(plane, _NXB * _TW - off, 1)
        acc = jnp.zeros((_TH, _TW), jnp.float32)
        for rr in range(_NYB * 8):
            for j in range(_E):
                w = wrow[rr] * wcol[j]
                acc = acc + w * jax.lax.broadcast_in_dim(
                    plane[rr, j : j + _TW].astype(jnp.float32),
                    (_TH, _TW), (1,),
                )
        out_ref[c] = acc.astype(out_ref.dtype)


def _block_layout(src: jax.Array) -> jax.Array:
    """(B, Hp, Wp, C) zero-padded source -> (B, Yb, Xb, C, 8, 128): pure
    blocked reshape, NO copies beyond the one relayout (the y/x origins are
    block-granular; the kernel's row enumeration absorbs the slop)."""
    B, Hp, Wp, C = src.shape
    Yb = (Hp + 7) // 8
    Xb = Wp // 128
    srcp = jnp.pad(src, ((0, 0), (0, Yb * 8 - Hp), (0, 0), (0, 0)))
    return srcp.reshape(B, Yb, 8, Xb, 128, C).transpose(0, 1, 3, 5, 2, 4)


def _plan(feat, grid, valid_hw=None):
    """Everything the kernel needs, plus a consistency-checked validity
    flag: (tile, y0r, e, wx, wy, Wp, ok). `ok` is computed on the EXACT
    indices the kernel would use, so fast path == packed path whenever it
    fires. `valid_hw`: (Ho0, Wo0) real output extent — pixels beyond it are
    tile-padding whose results get sliced off: they are excluded from the
    per-tile minima/validity and their indices clamped into the window."""
    B, H, W, C = feat.shape
    Ho, Wo = grid.shape[1:3]
    Ho0, Wo0 = valid_hw if valid_hw is not None else (Ho, Wo)
    n_ty, n_tx = Ho // _TH, Wo // _TW
    PAD = 2
    # frame geometry: a full 128 block of LEFT margin (negative disparities
    # must keep every tile's fetch origin >= 0 — e cannot index left of the
    # window), and _NXB blocks of right margin so the LAST tile's origin
    # (up to Wo-128 + disparity) stays clip-free
    PADX = 128
    Wp = PADX + (-(-(W + PAD) // 128) * 128) + _NXB * 128

    gx = (grid[..., 0].astype(jnp.float32) + 1.0) * (W / 2) - 0.5
    gy = (grid[..., 1].astype(jnp.float32) + 1.0) * (H / 2) - 0.5
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx = (gx - x0).astype(jnp.float32)
    wy = (gy - y0).astype(jnp.float32)
    x0r = x0.astype(jnp.int32)
    y0r_ = y0.astype(jnp.int32)
    # far-OOB corners would need weight zeroing the windowed kernel doesn't
    # do — such batches simply fail validity and take the fallback
    inb = (x0r >= -1) & (x0r < W) & (y0r_ >= -1) & (y0r_ < H)
    x0i = jnp.clip(x0r + PADX, 0, Wp - 2)
    y0i = jnp.clip(y0r_ + PAD, 0, H + 2 * PAD - 2)

    real = (
        (jnp.arange(Ho, dtype=jnp.int32) < Ho0)[:, None]
        & (jnp.arange(Wo, dtype=jnp.int32) < Wo0)[None, :]
    )[None]  # (1, Ho, Wo)
    realt = real.reshape(1, n_ty, _TH, n_tx, _TW)

    y0t = y0i.reshape(B, n_ty, _TH, n_tx, _TW)
    big = jnp.int32(1 << 29)
    y0min = jnp.min(jnp.min(
        jnp.where(realt, y0t, big), axis=4), axis=2)     # (B, n_ty, n_tx)
    # disparity vs the GLOBAL output column: d = x0 - w_global
    wg = jnp.arange(Wo, dtype=jnp.int32).reshape(1, 1, 1, n_tx, _TW)
    d = x0i.reshape(B, n_ty, _TH, n_tx, _TW) - wg
    j0 = jnp.min(jnp.min(jnp.where(realt, d, big), axis=4), axis=2)
    txo = (jnp.arange(n_tx, dtype=jnp.int32) * _TW)[None, None, :]
    # clip the fetch origin into the frame, then derive e from the CLIPPED
    # base so kernel indices and validity agree
    j0_abs = jnp.clip(j0 + txo, 0, Wp - _NXB * 128)
    j0c = j0_abs - txo
    y0min = jnp.clip(y0min, 0, H + 2 * PAD - 2)

    # y origin at 8-row block granularity: the enumeration covers
    # y0rel in [0, _NYB*8 - 2] (range <= 14 + 7 alignment slop + 1 bilinear)
    ybase = (y0min // 8) * 8
    y0rel = y0t - ybase[:, :, None, :, None]
    e5 = d - j0c[:, :, None, :, None]
    ok = (
        jnp.all(jnp.where(realt, y0rel, 0) <= _NYB * 8 - 2)
        & jnp.all(jnp.where(realt, (e5 >= 0) & (e5 <= _E - 2), True))
        & jnp.all(jnp.where(real, inb, True))
    )
    # tile-padding pixels: clamp into the fetched window (results discarded)
    y0rel = jnp.clip(y0rel, 0, _NYB * 8 - 2)
    e5 = jnp.clip(e5, 0, _E - 2)
    tile = jnp.stack(
        [y0min // 8, j0_abs // 128, j0_abs % 128], axis=-1
    ).reshape(B, n_ty * n_tx, 3)
    return (
        tile, y0rel.reshape(B, Ho, Wo), e5.reshape(B, Ho, Wo),
        wx, wy, Wp, ok,
    )


def _layout_padded(feat: jax.Array, Wp: int) -> jax.Array:
    """Zero-pad the source into the kernel frame and block it — hoistable
    OUT of the exact-mode cond (it is flow-independent, ~one relayout copy),
    so the cond's true branch carries only the kernel itself."""
    PAD = 2
    PADX = 128
    featp = jnp.pad(feat, ((0, 0), (PAD, PAD + 3 * 8), (PADX, 0), (0, 0)))
    featp = jnp.pad(featp, ((0, 0), (0, 0), (0, Wp - featp.shape[2]), (0, 0)))
    return _block_layout(featp)


def _kernel_call(L, tile, y0r, e, wx, wy, *, C, dtype, interpret):
    """The pallas_call on a precomputed plan + blocked layout."""
    B, Ho, Wo = y0r.shape
    n_ty, n_tx = Ho // _TH, Wo // _TW
    out = pl.pallas_call(
        functools.partial(_kernel, C=C, n_tx=n_tx),
        grid=(B, n_ty, n_tx),
        in_specs=[
            pl.BlockSpec((None, n_ty * n_tx, 3), lambda b, i, j: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, _TH, _TW), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _TH, _TW), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _TH, _TW), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, _TH, _TW), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (None, C, _TH, _TW), lambda b, i, j: (b, 0, i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, Ho, Wo), dtype),
        scratch_shapes=[
            pltpu.VMEM((_NYB, _NXB, C, 8, 128), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(tile, y0r, e, wx, wy, L)
    return out.transpose(0, 2, 3, 1)


@functools.partial(jax.jit, static_argnames=("interpret", "valid_hw"))
def _windowed_path(feat, grid, interpret=False, valid_hw=None):
    """The fast path (assumes validity; wrapper guards). feat (B,H,W,C),
    grid (B, Ho, Wo, 2) -> (B, Ho, Wo, C)."""
    C = feat.shape[3]
    tile, y0r, e, wx, wy, Wp, _ok = _plan(feat, grid, valid_hw)
    L = _layout_padded(feat, Wp)
    return _kernel_call(
        L, tile, y0r, e, wx, wy, C=C, dtype=feat.dtype, interpret=interpret
    )


@functools.partial(jax.jit, static_argnames=("valid_hw",))
def smoothness_ok(feat, grid, valid_hw=None):
    """Scalar: may the windowed fast path serve this batch exactly?"""
    return _plan(feat, grid, valid_hw)[6]


# Tests set this True to route grid_sample_smooth through the windowed
# kernel in INTERPRET mode off-TPU — the wrapper (mode dispatch, edge-pad,
# valid_hw slicing, the exact-mode lax.cond) then executes in CPU CI instead
# of only on hardware (VERDICT r4 weak #2).
_FORCE_INTERPRET = False


def grid_sample_smooth(
    feat: jax.Array,
    grid: jax.Array,
    mode: str = "exact",
    *,
    interpret: bool | None = None,
    with_ok: bool = False,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """grid_sample(zeros padding) exploiting flow smoothness.

    mode="exact": proves whole-batch tile-smoothness on the XLA side and
    `lax.cond`s between the windowed kernel and the packed emitter —
    bit-consistent for ANY flow, but the cond (branch-isolation copies) +
    validity plan cost ~0.2x of the kernel's win in-model.
    mode="fast": runs the windowed kernel unconditionally with the plan
    indices CLAMPED into each tile's fetched window — pixel-exact wherever
    a tile is smooth and in-bounds (everywhere, for trained-weight flows),
    window-clamped approximation on rough tiles. The deployment path for
    real weights: +16% end-to-end on the smooth-flow bench variant where
    "exact" nets -4% (PERF.md round 4).

    `interpret`: None = auto (real kernel on TPU, plain grid_sample
    elsewhere); True = force the windowed path in Pallas interpret mode
    (tests). `with_ok=True` additionally returns the whole-batch validity
    scalar so fast-mode deployments can audit how often clamping actually
    fires (ADVICE r4)."""
    from roma_tpu.ops.grid_sample import grid_sample

    B, H, W, C = feat.shape
    Ho, Wo = grid.shape[1], grid.shape[2]
    if interpret is None and _FORCE_INTERPRET:
        interpret = True
    interp = bool(interpret)
    use_windowed = C <= 16 and (
        interp or jax.default_backend() == "tpu"
    )
    # pad the output grid to tile multiples by edge replication (edge-clone
    # flows are smooth and in-bounds whenever the batch is); slice after
    ph = (-Ho) % _TH
    pw = (-Wo) % _TW
    vhw = (Ho, Wo)

    def _pad_grid():
        return jnp.pad(grid, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")

    if not use_windowed:
        out = grid_sample(feat, grid)
        if with_ok:
            return out, smoothness_ok(feat, _pad_grid(), valid_hw=vhw)
        return out
    gp = _pad_grid()
    if mode == "fast":
        out = _windowed_path(
            feat, gp, interpret=interp, valid_hw=vhw
        )[:, :Ho, :Wo]
        if with_ok:
            return out, smoothness_ok(feat, gp, valid_hw=vhw)
        return out
    # exact mode: validity outside (temps die after the reduction), the
    # full plan + relayout recomputed INSIDE the true branch. A round-5
    # restructure tried the "obvious" fix — one plan serving validity AND
    # the kernel, with the pad+block relayout hoisted out of the cond — and
    # it was strictly WORSE: ~560 MB of plan/layout tensors live ACROSS the
    # cond OOM'd the batch-8 bench graph (16.04/15.75 GB) and the batch-4
    # smooth bench dropped 4.03 -> 3.92 pairs/s. The cond's cost is not the
    # duplicated plan; keep the memory-lean shape and treat "fast" as the
    # trained-weight deployment mode (PERF.md round 5).
    ok = smoothness_ok(feat, gp, valid_hw=vhw)
    out = jax.lax.cond(
        ok,
        lambda f, g: _windowed_path(f, g, interpret=interp, valid_hw=vhw),
        lambda f, g: grid_sample(f, g),
        feat, gp,
    )
    out = out[:, :Ho, :Wo]
    return (out, ok) if with_ok else out
