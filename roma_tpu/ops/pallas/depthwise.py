"""Fused depthwise 5x5 conv + affine (folded BatchNorm) + ReLU, Pallas/TPU.

The ConvRefiner stacks (reference matcher.py:77-103: Conv2d k=5
groups=channels -> BatchNorm -> ReLU -> 1x1 conv, x9 blocks x9 scales) spend
most of full RoMa's decode time in the depthwise convs: XLA lowers a NHWC
feature_group_count=C conv at ~0.8 TF/s on v5e (6.8 ms at 216^2 x569),
~25x off the VPU roofline. This kernel computes the 25 taps as shifted
multiply-accumulates from a VMEM-resident row slab instead:

  out[h, w, c] = relu( (sum_{dy,dx} x[h+dy, w+dx, c] * k[dy, dx, c])
                       * scale[c] + shift[c] )

with `scale`/`shift` the inference-folded BatchNorm affine (+ conv bias).
Accumulation is fp32 (matching XLA's conv accumulator); inputs/outputs bf16.

Grid: (B, H/TH) row-bands. Each program DMAs its (TH+4, W+4, C) halo slab
HBM->VMEM and runs the taps on the VPU. Two layouts, chosen by C:
- C >= 64: NHWC slab, lanes = channels.
- C < 64: the caller transposes to (B, H, C, W) so lanes = width; a narrow-C
  NHWC slab would waste (128-C)/128 of every vector op on lane padding.

Measured v5e reality check (in-jit, x4 batch): the kernel only beats XLA's
own fused conv for the narrow-C layout (864^2 x24: 5.3 vs 9.1 ms/app,
560^2 x24: 3.1 vs 4.1) — XLA's depthwise emitter is already ~50% of the
VPU roofline at C >= 64 lanes, where this kernel's scratch-accumulated tap
loop is ~2x slower. `dw5x5_affine_relu` therefore only takes the Pallas
path when C < 64; wider channels use the identical fused XLA computation.

Interpret mode (CPU) is used automatically off-TPU so the op stays testable
on the CPU mesh. Gradients: `jax.custom_vjp` with the backward computed from
the plain-JAX reference implementation (training uses live BatchNorm stats
and takes the XLA path anyway; see models/refiner.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _jax_reference(x, w, scale, shift):
    """Plain-JAX fused block (also the VJP and CPU path). x: (B,H,W,C)."""
    C = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w[..., None, :].astype(jnp.float32), (1, 1),
        [(2, 2), (2, 2)], feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y * scale.astype(jnp.float32) + shift.astype(jnp.float32)
    return jnp.maximum(y, 0.0).astype(x.dtype)


def _kernel_nhwc(x_ref, w_ref, a_ref, out_ref, slab, sem, acc):
    th, w_out, cb = out_ref.shape
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(i * th, th + 4), :, pl.ds(j * cb, cb)], slab, sem
    )
    dma.start()
    dma.wait()
    wv = w_ref[:].astype(jnp.float32)
    av = a_ref[:]
    # accumulate through a scratch ref: the in-place store after every tap
    # serializes lifetimes so Mosaic's stack allocator reuses one temp
    # instead of keeping all 25 tap slices live at once
    acc[:] = jnp.zeros(out_ref.shape, jnp.float32)
    for dy in range(5):
        for dx in range(5):
            tap = slab[dy : dy + th, dx : dx + w_out, :].astype(jnp.float32)
            acc[:] = acc[:] + tap * wv[dy, dx]
    y = acc[:] * av[0] + av[1]
    out_ref[:] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


def _kernel_ncw(x_ref, w_ref, a_ref, out_ref, slab, sem, acc):
    th, _, w_out = out_ref.shape
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        x_ref.at[b, pl.ds(i * th, th + 4)], slab, sem
    )
    dma.start()
    dma.wait()
    wv = w_ref[:].astype(jnp.float32)
    av = a_ref[:]
    acc[:] = jnp.zeros(out_ref.shape, jnp.float32)
    for dy in range(5):
        for dx in range(5):
            tap = slab[dy : dy + th, :, dx : dx + w_out].astype(jnp.float32)
            acc[:] = acc[:] + tap * wv[dy, dx][:, None]
    y = acc[:] * av[0][:, None] + av[1][:, None]
    out_ref[:] = jnp.maximum(y, 0.0).astype(out_ref.dtype)


def _tile_rows(H: int, W: int, C: int, nhwc: bool) -> tuple[int, int]:
    """(TH, CB): row-band height and channel block fitting VMEM. Budget
    counts the slab, the double-buffered output block, and ~3 fp32
    accumulator-sized temporaries (Mosaic's stack allocator keeps the tap
    cast, the product, and the running sum live simultaneously)."""
    if nhwc:
        wp = -(-(W + 4) // 8) * 8
        cp = -(-C // 128) * 128
        for cb in (512, 256, 128):
            if cb > cp:
                continue
            for th in (32, 16, 8):
                area = cb * ((th + 4) * wp * 2 + th * W * (2 * 2 + 3 * 4))
                if area <= 12 * 1024 * 1024:
                    return th, cb
        return 8, 128
    wp = -(-(W + 4) // 128) * 128
    cp = -(-max(C, 8) // 8) * 8
    for th in (32, 16, 8):
        area = cp * wp * ((th + 4) * 2 + th * (2 * 2 + 3 * 4))
        if area <= 12 * 1024 * 1024:
            return th, cp
    return 8, cp


@functools.partial(jax.jit, static_argnames=("interpret", "layout"))
def _pallas_call(x, w, scale, shift, interpret=False, layout=None):
    B, H, W, C = x.shape
    nhwc = (C >= 64) if layout is None else (layout == "nhwc")
    th, cb = _tile_rows(H, W, C, nhwc)
    n_h = -(-H // th)
    Hp = n_h * th
    # The per-program DMA slices a (th+4, Wp, cb) slab out of the padded
    # input; Mosaic requires the sliced sublane extent be 8-aligned and the
    # sliced lane extent 128-aligned (full dims are exempt, but the stored
    # memref is already lane-padded, so the nominal dim must align too).
    if nhwc:
        Wp = -(-(W + 4) // 8) * 8
        n_c = -(-C // cb)
        Cp = n_c * cb
    else:
        Wp = -(-(W + 4) // 128) * 128
        n_c = 1
        Cp = cb
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C)))
    a = jnp.pad(
        jnp.stack([scale, shift]).astype(jnp.float32), ((0, 0), (0, Cp - C))
    )
    xp = jnp.pad(x, ((0, 0), (2, 2 + Hp - H), (2, Wp - W - 2), (0, Cp - C)))
    if nhwc:
        out = pl.pallas_call(
            _kernel_nhwc,
            grid=(B, n_h, n_c),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(
                    (5, 5, cb), lambda b, i, j: (0, 0, j),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (2, cb), lambda b, i, j: (0, j), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (None, th, W, cb), lambda b, i, j: (b, i, 0, j),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((B, Hp, W, Cp), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((th + 4, Wp, cb), x.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.VMEM((th, W, cb), jnp.float32),
            ],
            interpret=interpret,
        )(xp, wp, a)
        return out[:, :H, :, :C]
    # narrow-C: lanes = width
    xt = xp.transpose(0, 1, 3, 2)  # (B, Hp+4, Cp, Wp)
    return _pallas_call_ncw(xt, wp, a, H, W, interpret=interpret)[
        :, :, :C
    ].transpose(0, 1, 3, 2)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _pallas_call_ncw(xt, wp, a, H, W, interpret=False):
    """Width-major kernel on an already-padded (B, Hp+4, Cp, Wp) input;
    returns (B, H, Cp, W). Factored out so NCW-resident callers (the
    scale-1 refiner threads this layout through all nine blocks) skip the
    per-block HBM transpose copies entirely."""
    B, Hp4, Cp, Wp = xt.shape
    th, _ = _tile_rows(H, W, Cp, nhwc=False)
    n_h = -(-H // th)
    out = pl.pallas_call(
        _kernel_ncw,
        grid=(B, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, th, Cp, W), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_h * th, Cp, W), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 4, Cp, Wp), xt.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((th, Cp, W), jnp.float32),
        ],
        interpret=interpret,
    )(xt, wp, a)
    return out[:, :H]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def dw5x5_affine_relu(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    data_format: str = "NHWC",
) -> jax.Array:
    """relu(dwconv5x5(x, w) * scale + shift); w (5,5,C).

    data_format "NHWC": x (B,H,W,C). "NHCW": x (B,H,C,W) in and out —
    width-major, for callers that keep activations in that layout."""
    ncw_io = data_format == "NHCW"
    if jax.default_backend() != "tpu":
        y = x.transpose(0, 1, 3, 2) if ncw_io else x
        y = _jax_reference(y, w, scale, shift)
        return y.transpose(0, 1, 3, 2) if ncw_io else y
    if ncw_io:
        B, H, C, W = x.shape
        Wp = -(-(W + 4) // 128) * 128
        Cp = -(-max(C, 8) // 8) * 8
        th, _ = _tile_rows(H, W, Cp, nhwc=False)
        Hp = -(-H // th) * th
        xt = jnp.pad(
            x, ((0, 0), (2, 2 + Hp - H), (0, Cp - C), (2, Wp - W - 2))
        )
        wp = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C)))
        a = jnp.pad(
            jnp.stack([scale, shift]).astype(jnp.float32),
            ((0, 0), (0, Cp - C)),
        )
        return _pallas_call_ncw(xt, wp, a, H, W)[:, :, :C]
    if x.shape[-1] >= 64:
        return _jax_reference(x, w, scale, shift)
    return _pallas_call(x, w, scale, shift, interpret=False)


def _kernel_ncw_mm(x_ref, w_ref, a_ref, mt_ref, out_ref, slab, sem, acc):
    """Fused full block, width-major: depthwise 5x5 taps (VPU) -> affine ->
    relu -> 1x1 channel-mixing matmul (MXU) on the same VMEM-resident row
    band. One HBM read + one HBM write per block instead of four (the dw and
    the 1x1 each round-tripped the activation through HBM when separate)."""
    th, Dp, w_out = out_ref.shape
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(x_ref.at[b, pl.ds(i * th, th + 4)], slab, sem)
    dma.start()
    dma.wait()
    wv = w_ref[:].astype(jnp.float32)
    av = a_ref[:]
    acc[:] = jnp.zeros(acc.shape, jnp.float32)
    for dy in range(5):
        for dx in range(5):
            tap = slab[dy : dy + th, :, dx : dx + w_out].astype(jnp.float32)
            acc[:] = acc[:] + tap * wv[dy, dx][:, None]
    mt = mt_ref[:]
    bias = av[2][:, None]  # (Cp==Dp, 1) out-bias lane-broadcast
    for t in range(th):
        y = jnp.maximum(acc[t] * av[0][:, None] + av[1][:, None], 0.0)
        z = jax.lax.dot(
            mt, y.astype(mt.dtype), preferred_element_type=jnp.float32
        )
        out_ref[t] = (z + bias).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def _pallas_call_ncw_mm(xt, wp, a, mtp, H, W, interpret=False):
    """(B, Hp+4, Cp, Wp) padded input -> (B, H, Dp, W) fused-block output."""
    B, Hp4, Cp, Wp = xt.shape
    Dp = mtp.shape[0]
    th = 8
    for cand in (32, 16, 8):
        area = (
            (cand + 4) * Cp * Wp * 2      # slab bf16
            + cand * Cp * W * 4           # fp32 accumulator
            + 2 * cand * Dp * W * 2       # double-buffered output
            + Dp * Cp * 2
        )
        if area <= 11 * 1024 * 1024:
            th = cand
            break
    n_h = -(-H // th)
    out = pl.pallas_call(
        _kernel_ncw_mm,
        grid=(B, n_h),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, th, Dp, W), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_h * th, Dp, W), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 4, Cp, Wp), xt.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((th, Cp, W), jnp.float32),
        ],
        interpret=interpret,
    )(xt, wp, a, mtp)
    return out[:, :H]


def _kernel_ncw_mm_frame(x_ref, w_ref, a_ref, mt_ref, out_ref, slab, sem, acc,
                         *, H, W, M, n_bands):
    """Padded-frame variant of the fused block for CHAINED use: input and
    output share one geometry — (B, n_bands*th, Cp, Wp) with the real image
    at rows [M, M+H), cols [2, W+2), zeros elsewhere — so N blocks run
    back-to-back with NO pad/slice/transpose copies between them (each such
    copy cost ~1.5 ms and a scheduling stall at 864^2; xplane trace, PERF.md
    round 4). Margin bands only zero-fill; interior bands mask their output
    to keep the zero frame exact (the next block's taps read it as the
    conv's zeros padding)."""
    th, Dp, Wp = out_ref.shape
    b = pl.program_id(0)
    i = pl.program_id(1)
    edge = (i == 0) | (i == n_bands - 1)

    @pl.when(edge)
    def _():
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

    @pl.when(~edge)
    def _():
        dma = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(i * th - 2, th + 4)], slab, sem
        )
        dma.start()
        dma.wait()
        wv = w_ref[:].astype(jnp.float32)
        av = a_ref[:]
        acc[:] = jnp.zeros(acc.shape, jnp.float32)
        for dy in range(5):
            for dx in range(5):
                tap = slab[dy : dy + th, :, dx : dx + Wp - 4].astype(
                    jnp.float32
                )
                acc[:] = acc[:] + tap * wv[dy, dx][:, None]
        mt = mt_ref[:]
        bias = av[2][:, None]
        col = jax.lax.broadcasted_iota(jnp.int32, (Dp, Wp), 1)
        col_ok = (col >= 2) & (col < W + 2)
        for t in range(th):
            y = jnp.maximum(acc[t] * av[0][:, None] + av[1][:, None], 0.0)
            z = jax.lax.dot(
                mt, y.astype(mt.dtype), preferred_element_type=jnp.float32
            ) + bias
            row = i * th + t
            ok = col_ok & (row >= M) & (row < M + H)
            z = jnp.pad(z, ((0, 0), (2, 2)))
            out_ref[t] = jnp.where(ok, z, 0.0).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "M", "th", "interpret")
)
def _frame_block(xf, wp, a, mtp, H, W, M, th, interpret=False):
    B, R, Cp, Wp = xf.shape
    n_bands = R // th
    Dp = mtp.shape[0]
    return pl.pallas_call(
        functools.partial(
            _kernel_ncw_mm_frame, H=H, W=W, M=M, n_bands=n_bands
        ),
        grid=(B, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, th, Dp, Wp), lambda b, i: (b, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, R, Dp, Wp), xf.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 4, Cp, Wp), xf.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((th, Cp, Wp - 4), jnp.float32),
        ],
        interpret=interpret,
    )(xf, wp, a, mtp)


def dw5x5_mm_chain(
    x: jax.Array,
    ws: jax.Array,
    scales: jax.Array,
    shifts: jax.Array,
    ms: jax.Array,
    biases: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """N fused refiner blocks chained on a padded-resident frame.

    x (B, H, W, C) NHWC; ws (N, 5, 5, C); scales/shifts/biases (N, C);
    ms (N, C, C). Returns (B, H, C, W) width-major (the refiner head
    consumes this layout). One transpose+pad in, one slice out, zero
    inter-block copies. Inference-only (the refiner's NCW gate guarantees
    no batch stats / grads on this path)."""
    B, H, W, C = x.shape
    N = ws.shape[0]
    if jax.default_backend() != "tpu" and not interpret:
        y = x
        for j in range(N):
            y = _mm_reference(
                y, ws[j], scales[j], shifts[j], ms[j], biases[j]
            )
        return y.transpose(0, 1, 3, 2)
    Wp = -(-(W + 4) // 128) * 128
    Cp = -(-max(C, 8) // 8) * 8
    # th: prefer a divisor-ish band height fitting VMEM
    th = 8
    for cand in (32, 16, 8):
        area = (
            (cand + 4) * Cp * Wp * 2
            + cand * Cp * Wp * 4
            + 2 * cand * Cp * Wp * 2
            + Cp * Cp * 2
        )
        if area <= 11 * 1024 * 1024:
            th = cand
            break
    M = th
    n_h = -(-H // th)
    R = (n_h + 2) * th
    xt = x.transpose(0, 1, 3, 2)
    xf = jnp.pad(
        xt, ((0, 0), (M, R - M - H), (0, Cp - C), (2, Wp - W - 2))
    ).astype(x.dtype)
    a3 = jnp.stack(
        [scales, shifts, biases], axis=1
    ).astype(jnp.float32)  # (N, 3, C)
    a3 = jnp.pad(a3, ((0, 0), (0, 0), (0, Cp - C)))
    wsp = jnp.pad(ws, ((0, 0), (0, 0), (0, 0), (0, Cp - C))).astype(x.dtype)
    mts = jnp.pad(
        jnp.swapaxes(ms, -1, -2).astype(x.dtype),
        ((0, 0), (0, Cp - C), (0, Cp - C)),
    )
    for j in range(N):
        xf = _frame_block(
            xf, wsp[j], a3[j], mts[j], H, W, M, th, interpret=interpret
        )
    return xf[:, M : M + H, :C, 2 : W + 2]


def _mm_reference(x, w, scale, shift, m, bias):
    """NHWC composition oracle for the fused block (CPU path + VJP)."""
    y = _jax_reference(x, w, scale, shift)
    return (
        jnp.einsum("bhwc,cd->bhwd", y.astype(jnp.float32), m.astype(jnp.float32))
        + bias
    ).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def dw5x5_affine_relu_mm(
    x: jax.Array,
    w: jax.Array,
    scale: jax.Array,
    shift: jax.Array,
    m: jax.Array,
    bias: jax.Array,
) -> jax.Array:
    """Fused refiner block: 1x1(relu(dw5x5(x, w) * scale + shift)) + bias,
    width-major. x (B, H, C, W); w (5, 5, C); m (C, D) with D == C; out
    (B, H, D, W). TPU inference path for the narrow/odd-width refiner
    hidden dims (24, 144) where NHWC lane padding wastes the VPU and the
    separate 1x1 costs two extra HBM round trips per block."""
    if jax.default_backend() != "tpu":
        y = _mm_reference(x.transpose(0, 1, 3, 2), w, scale, shift, m, bias)
        return y.transpose(0, 1, 3, 2)
    return _mm_tpu_path(x, w, scale, shift, m, bias)


def _mm_tpu_path(x, w, scale, shift, m, bias, interpret=False):
    B, H, C, W = x.shape
    Wp = -(-(W + 4) // 128) * 128
    Cp = -(-max(C, 8) // 8) * 8
    xt = jnp.pad(x, ((0, 0), (2, 2), (0, Cp - C), (2, Wp - W - 2)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, Cp - C)))
    a = jnp.pad(
        jnp.stack([scale, shift, bias]).astype(jnp.float32),
        ((0, 0), (0, Cp - C)),
    )
    mtp = jnp.pad(
        m.T.astype(x.dtype), ((0, Cp - C), (0, Cp - C))
    )
    # pad rows so every row band is full (th chosen inside)
    th_max = 32
    Hp = -(-H // 8) * 8 + th_max  # conservative; kernel slices [:H]
    xt = jnp.pad(xt, ((0, 0), (0, Hp + 4 - xt.shape[1]), (0, 0), (0, 0)))
    return _pallas_call_ncw_mm(xt, wp, a, mtp, H, W, interpret=interpret)[
        :, :, :C
    ]


def _mm_fwd(x, w, scale, shift, m, bias):
    return dw5x5_affine_relu_mm(x, w, scale, shift, m, bias), (
        x, w, scale, shift, m, bias,
    )


def _mm_bwd(res, g):
    x, w, scale, shift, m, bias = res
    ref = lambda x, w, s, t, m, b: _mm_reference(
        x.transpose(0, 1, 3, 2), w, s, t, m, b
    ).transpose(0, 1, 3, 2)
    _, vjp = jax.vjp(ref, x, w, scale, shift, m, bias)
    return vjp(g)


dw5x5_affine_relu_mm.defvjp(_mm_fwd, _mm_bwd)


def _fwd(x, w, scale, shift, data_format="NHWC"):
    return dw5x5_affine_relu(x, w, scale, shift, data_format), (
        x, w, scale, shift,
    )


def _bwd(data_format, res, g):
    x, w, scale, shift = res
    if data_format == "NHCW":
        ref = lambda x, w, s, t: _jax_reference(
            x.transpose(0, 1, 3, 2), w, s, t
        ).transpose(0, 1, 3, 2)
    else:
        ref = _jax_reference
    _, vjp = jax.vjp(ref, x, w, scale, shift)
    return vjp(g)


dw5x5_affine_relu.defvjp(_fwd, _bwd)
