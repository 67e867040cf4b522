"""Fused NAFBlock Pallas TPU kernels (forward + hand-written backward).

The NAFBlock (reference ``NAFNet_base/basicsr/models/archs/NAFNet_arch.py:
27-80``) is the innermost hot path: LN -> 1x1 conv -> 3x3 depthwise ->
SimpleGate -> SCA -> 1x1 conv -> residual, then LN -> 1x1 -> gate -> 1x1 ->
residual. Under XLA at SID shapes (512^2, width 32) each block costs ~12-16
HBM round trips and runs at 25% lane occupancy because the channel (lane)
axis holds only 32 values; measured round-1: 137 ms/step with ~41 ms of
layout copies.

These kernels re-lay the activation as ``[C, S]`` with **channels in
sublanes and flattened spatial (H*W, row-major) in lanes** — full 128-lane
occupancy at any channel width — and fuse the whole block into four
``pallas_call``s:

- kernel A  (fwd): LN1 -> 1x1 (MXU) -> depthwise 3x3 (lane shifts + VPU
  FMA) -> SimpleGate, emitting the gate output ``g`` plus per-batch spatial
  sums for the SCA global mean (accumulated across row tiles in VMEM).
- kernel B  (fwd): SCA scale -> 1x1 -> beta-residual -> LN2 -> 1x1 -> gate
  -> 1x1 -> gamma-residual, emitting the block output.
- kernel P1 (bwd): recomputes the second half from ``(x, g, a)`` and
  backpropagates it, emitting ``dz`` (grad at the mid residual), the local
  gate grad ``dv*a``, per-batch SCA-mean grad partials, and all second-half
  weight grads (accumulated across the whole grid in VMEM).
- kernel P2 (bwd): recomputes LN1/1x1/depthwise from ``x`` (cheaper than
  storing the 2C-wide intermediates), folds in the global SCA-mean grad,
  and backpropagates to ``dx`` plus first-half weight grads.

The only cross-tile dependency in each direction is the SCA global mean /
its gradient — hence the A/B and P1/P2 split, with the tiny ``[N, C]``
SCA 1x1 conv itself done in plain XLA between the calls.

Depthwise 3x3 on the flat layout: a shift by ``(dr, dc)`` is a static lane
shift by ``dr*W + dc`` plus a column-validity mask (``lane % W``) — no
relayouts, and the adjoint is the same helper with negated shifts. Row
halos (one or two rows of the neighbouring tiles) are fetched by manual
async DMA with edge zero-fill, mirroring SAME zero padding of the conv
*input* (the 1x1 output), exactly as in the reference conv semantics.

Numerics: LN statistics and all elementwise math in fp32; matmuls run on
the MXU in the activation dtype (bf16 in training) with fp32 accumulation;
weight-gradient accumulators are fp32. Interpret mode (off-TPU) keeps the
kernels hermetically testable on CPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

import os

# v5e scoped-VMEM default is 16 MB; the P2 kernel's fp32 recompute
# intermediates need more headroom, and the 2-slot DMA pipeline doubles
# the input scratch. Both knobs are env-overridable for tile sweeps
# (tools/bench_kernels.py measured th=16 / 48 MB as the v5e sweet spot).
_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=int(os.environ.get("LLIE_NAFBLOCK_VMEM_MB", "48"))
    * 1024 * 1024)

# Upper bound on elements of the widest (2C-channel) fp32 intermediate per
# row tile. Swept on v5e at the flagship shape set (tools/bench_fused_sweep
# .py): 640k -> 41.9 ms/step, 1.31M -> 39.7 (winner), 2.62M -> 41.3 and
# needs a 64 MB VMEM limit; larger tiles amortize halo DMA until the
# working set spills the scoped-VMEM budget.
_TILE_ELEM_BUDGET = int(os.environ.get("LLIE_NAFBLOCK_TILE_BUDGET",
                                       str(1280 * 1024)))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Measurement-only kernel ablations (``LLIE_NAFBLOCK_ABLATE``: comma list
# from {tapgrads, adjoint, dwrecompute, p1wgrads, p2wgrads}). Each replaces
# one backward component with a same-shaped stand-in so its device cost can
# be attributed by subtraction on a trace. Gradients become WRONG — never
# set while training; consumed by tools/bench_kernels.py ablation sweeps.
def _ablated(name: str) -> bool:
    return name in os.environ.get("LLIE_NAFBLOCK_ABLATE", "").split(",")


class BlockConfig(NamedTuple):
    """Static geometry of one fused block call (hashable: custom_vjp
    nondiff arg).

    ``ha``/``hx``/``hg`` are halo row counts for kernel A's x fetch, kernel
    P2's x fetch, and P2's dg fetch. They are multiples of
    ``128 / gcd(w, 128)`` so every HBM DMA offset/size is 128-lane aligned.
    ``ha == 0`` marks the whole-image variant (``th == h``, no manual DMA —
    the depthwise shifts' zero fill at the array edge IS the SAME padding).
    """

    h: int
    w: int
    th: int          # rows per grid tile (divides h)
    c: int           # block features
    dw_ch: int       # c * dw_expand (pre-gate width of the conv branch)
    ffn_ch: int      # c * ffn_expand (pre-gate width of the FFN branch)
    ha: int          # kernel A x halo rows (0 => whole-image variant)
    hx: int          # kernel P2 x halo rows
    hg: int          # kernel P2 dg halo rows
    eps: float
    interpret: bool


def _gcd(a, b):
    while b:
        a, b = b, a % b
    return a


def choose_row_tile(h: int, w: int, dw_ch: int, halo: int, ar: int,
                    budget: int = _TILE_ELEM_BUDGET):
    """Largest divisor ``th`` of ``h`` (multiple of ``ar``, >= ``halo``)
    with ``(th + 2*halo) * w * dw_ch <= budget``. None when nothing fits."""
    best = None
    for th in range(max(halo, ar), h + 1):
        if h % th or th % ar:
            continue
        if (th + 2 * halo) * w * dw_ch <= budget:
            best = th
    return best


def make_block_config(h: int, w: int, c: int, dw_expand: int,
                      ffn_expand: int, eps: float = 1e-6,
                      budget: int = _TILE_ELEM_BUDGET):
    """Build a :class:`BlockConfig`, or None when the shape is untileable."""
    dw_ch = c * dw_expand
    ffn_ch = c * ffn_expand
    if dw_ch != 2 * c:
        # the gate split in the kernels assumes dw_expand == 2 (the only
        # value the reference ever uses, NAFNet_arch.py:30)
        return None
    max_c = int(os.environ.get("LLIE_NAFBLOCK_WHOLE_IMAGE_MAX_C", "256"))
    if h * w * dw_ch <= budget and c <= max_c:
        # whole image per grid step: no halo machinery at all
        return BlockConfig(h, w, h, c, dw_ch, ffn_ch, 0, 0, 0, float(eps),
                           _interpret())
    ar = 128 // _gcd(w, 128)     # rows per 128-lane-aligned transfer
    ha = ar                       # >= 1
    hg = ar                       # >= 1
    hx = hg + ar                  # >= 2 and >= hg + 1, multiple of ar
    th = choose_row_tile(h, w, dw_ch, hx, ar, budget)
    if th is None:
        return None
    return BlockConfig(h, w, th, c, dw_ch, ffn_ch, ha, hx, hg, float(eps),
                       _interpret())


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _shift_rows(x: Array, dr: int, w: int) -> Array:
    """Whole-row lane shift by ``dr`` rows with zero fill at the array
    edge. Column alignment is preserved (shift is a multiple of ``w``);
    halo rows supply cross-tile validity."""
    d = dr * w
    ch, _ = x.shape
    if d > 0:
        return jnp.concatenate(
            [x[:, d:], jnp.zeros((ch, d), x.dtype)], axis=1)
    if d < 0:
        return jnp.concatenate(
            [jnp.zeros((ch, -d), x.dtype), x[:, :d]], axis=1)
    return x


def _col_masks(w: int, length: int):
    """Hoisted column-validity masks, computed once per kernel body.

    ``m0`` zeroes column 0 (the sources a ``dc=+1`` shift must not read
    across the row boundary); ``mW`` zeroes column ``w-1`` (ditto for
    ``dc=-1``). Premasking the *source* once replaces the per-tap
    postmask of the naive 9-shift lowering."""
    col = jax.lax.broadcasted_iota(jnp.int32, (1, length), 1) % w
    return col != 0, col != (w - 1)


def _shift_cols(x: Array, dc: int, masks) -> Array:
    """Single-column lane shift with row-boundary premask (see
    :func:`_col_masks`). ``dc`` in {-1, 0, +1}."""
    if dc == 0:
        return x
    ch, _ = x.shape
    xm = jnp.where(masks[0] if dc > 0 else masks[1], x,
                   jnp.zeros((), x.dtype))
    if dc > 0:
        return jnp.concatenate(
            [xm[:, dc:], jnp.zeros((ch, dc), x.dtype)], axis=1)
    return jnp.concatenate(
        [jnp.zeros((ch, -dc), x.dtype), xm[:, :dc]], axis=1)


def _dwconv(t: Array, kdw: Array, w: int, masks=None,
            adjoint: bool = False, return_rows: bool = False):
    """Depthwise 3x3 (or its adjoint) on the flat layout, factorized.

    ``t``: [DW, L]; ``kdw``: [DW, 9] with tap order ``kh*3+kw`` (torch/Flax
    HWIO). Forward matches ``nn.Conv(feature_group_count=DW, SAME)``; the
    adjoint negates the shifts (``conv_transpose`` with the same kernel,
    reference ``NewBP_model/newbp_layer.py:7-21`` precedent).

    Lowering: ``out = sum_dc shift_col(dc, sum_dr k[dr,dc] *
    shift_row(dr, t))`` — 2 row shifts (no masks: halo rows carry
    validity), 9 FMAs, 2 premasked column shifts. ~23 VPU ops/element vs
    ~45 for the naive per-tap shift+mask form (measured bottleneck).

    ``return_rows``: also return the ``{dr: shift_row(dr, t)}`` dict so
    callers needing shifted-``t`` tensors (P2's tap grads) can reuse them
    instead of re-shifting."""
    if masks is None:
        masks = _col_masks(w, t.shape[1])
    sgn = -1 if adjoint else 1
    rows = {dr: _shift_rows(t, sgn * dr, w) for dr in (-1, 0, 1)}
    out = None
    for dc in (-1, 0, 1):
        s = None
        for dr in (-1, 0, 1):
            tap = kdw[:, (dr + 1) * 3 + dc + 1 : (dr + 1) * 3 + dc + 2]
            term = tap * rows[dr]
            s = term if s is None else s + term
        s = _shift_cols(s, sgn * dc, masks)
        out = s if out is None else out + s
    if return_rows:
        return out, rows
    return out


def _row_validity(i, th: int, w: int, length: int, halo: int, h: int):
    """[1, length] bool — does flat position p lie inside the image rows?

    Row tile i covers logical rows ``[i*th - halo, i*th + th + halo)``
    mapped to local rows ``p // w``."""
    row = jax.lax.broadcasted_iota(jnp.int32, (1, length), 1) // w
    grow = i * th - halo + row
    return (grow >= 0) & (grow < h)


def _ln_fwd(xf: Array, wn: Array, bn: Array, eps: float):
    """Channel-LN over sublanes: returns (h, xhat, rstd)."""
    mu = jnp.mean(xf, axis=0, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=0, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat * wn + bn, xhat, rstd


def _ln_bwd(dh: Array, xhat: Array, rstd: Array, wn: Array):
    """Analytic channel-LN input grad (matches ``ops.layernorm._ln_bwd``)."""
    gxh = dh * wn
    mean_g = jnp.mean(gxh, axis=0, keepdims=True)
    mean_gx = jnp.mean(gxh * xhat, axis=0, keepdims=True)
    return (gxh - mean_g - xhat * mean_gx) * rstd


def _dot(a: Array, b: Array, dims, cdt) -> Array:
    """MXU matmul in compute dtype with fp32 accumulation."""
    return jax.lax.dot_general(
        a.astype(cdt), b.astype(cdt),
        dimension_numbers=(dims, ((), ())),
        preferred_element_type=jnp.float32,
    )


def _accumulate(ref, value, first):
    @pl.when(first)
    def _():
        ref[...] = value

    @pl.when(jnp.logical_not(first))
    def _():
        ref[...] = ref[...] + value


def _aligned(off):
    """Mosaic divisibility hint: every DMA offset here is a multiple of
    128 lanes by construction (th*w and halo*w are 128-multiples)."""
    return pl.multiple_of(off, 128)


def _dma_copies(hbm_ref, scratch_ref, sems, sem_base, n, i, th: int,
                w: int, halo: int, n_i: int):
    """The three DMA descriptors moving rows ``[i*th - halo,
    (i+1)*th + halo)`` of ``hbm_ref[n]`` into ``scratch_ref``
    ([ch, (th + 2*halo)*w]): (body, top halo, bottom halo). top/bot are
    valid iff ``i > 0`` / ``i < n_i - 1``."""
    thw = th * w
    hw_ = halo * w

    def body_copy():
        return pltpu.make_async_copy(
            hbm_ref.at[n, :, pl.ds(_aligned(i * thw), thw)],
            scratch_ref.at[:, pl.ds(hw_, thw)],
            sems.at[sem_base],
        )

    def top_copy():
        # rows [i*th - halo, i*th)  (valid iff i > 0, since th >= halo)
        return pltpu.make_async_copy(
            hbm_ref.at[n, :, pl.ds(_aligned(i * thw - hw_), hw_)],
            scratch_ref.at[:, pl.ds(0, hw_)],
            sems.at[sem_base + 1],
        )

    def bot_copy():
        # rows [(i+1)*th, (i+1)*th + halo)  (valid iff i < n_i - 1)
        return pltpu.make_async_copy(
            hbm_ref.at[n, :, pl.ds(_aligned((i + 1) * thw), hw_)],
            scratch_ref.at[:, pl.ds(hw_ + thw, hw_)],
            sems.at[sem_base + 2],
        )

    return body_copy, top_copy, bot_copy


def _dma_rows_start(hbm_ref, scratch_ref, sems, sem_base, n, i, th: int,
                    w: int, halo: int, n_i: int, ch: int, dtype):
    """Start the three copies for grid step ``(n, i)`` and zero-fill the
    edge halo rows. Pair with :func:`_dma_rows_wait` (same arguments) —
    issued one grid step ahead, the copies overlap the previous step's
    compute (2-slot software pipeline)."""
    thw = th * w
    hw_ = halo * w
    body_copy, top_copy, bot_copy = _dma_copies(
        hbm_ref, scratch_ref, sems, sem_base, n, i, th, w, halo, n_i)

    body_copy().start()

    @pl.when(i > 0)
    def _():
        top_copy().start()

    @pl.when(i == 0)
    def _():
        scratch_ref[:, 0:hw_] = jnp.zeros((ch, hw_), dtype)

    @pl.when(i < n_i - 1)
    def _():
        bot_copy().start()

    @pl.when(i == n_i - 1)
    def _():
        scratch_ref[:, hw_ + thw:2 * hw_ + thw] = jnp.zeros((ch, hw_), dtype)


def _dma_rows_wait(hbm_ref, scratch_ref, sems, sem_base, n, i, th: int,
                   w: int, halo: int, n_i: int):
    """Wait for the copies started by :func:`_dma_rows_start` for ``(n,
    i)`` (descriptors are rebuilt; they must match the started ones)."""
    body_copy, top_copy, bot_copy = _dma_copies(
        hbm_ref, scratch_ref, sems, sem_base, n, i, th, w, halo, n_i)
    body_copy().wait()

    @pl.when(i > 0)
    def _():
        top_copy().wait()

    @pl.when(i < n_i - 1)
    def _():
        bot_copy().wait()


def _next_step(n, i, n_i: int):
    """Grid-order successor of ``(n, i)`` (i fastest)."""
    wrap = i == n_i - 1
    return jnp.where(wrap, n + 1, n), jnp.where(wrap, 0, i + 1)


def _pipelined_fetch(fetches, n, i, n_i: int, n_n: int):
    """2-slot software pipeline over manual row DMAs.

    ``fetches``: list of (hbm_ref, scratch2_ref [2, ch, L], sems, halo,
    th, w, ch, dtype). Starts step (n,i)'s copies at the previous grid
    step (prefetch), waits them here, and returns the VMEM views for the
    current step. Overlaps the halo DMAs with compute — the serialized
    wait cost ~30-50% of kernel A/P2 time before this."""
    step = n * n_i + i
    par = step % 2
    n2, i2 = _next_step(n, i, n_i)
    last = step == n_n * n_i - 1

    @pl.when(step == 0)
    def _():
        # no previous step started our copies — start them now (slot 0)
        for hbm, scr, sems, halo, th, w, ch, dt in fetches:
            _dma_rows_start(hbm, scr.at[0], sems, 0, n, i,
                            th, w, halo, n_i, ch, dt)

    for slot in (0, 1):
        @pl.when(jnp.logical_not(last) & (par != slot))
        def _(slot=slot):
            # prefetch the NEXT grid step's rows into the other slot
            for hbm, scr, sems, halo, th, w, ch, dt in fetches:
                _dma_rows_start(hbm, scr.at[slot], sems, slot * 3, n2, i2,
                                th, w, halo, n_i, ch, dt)

    views = []
    for hbm, scr, sems, halo, th, w, ch, dt in fetches:
        for slot in (0, 1):
            @pl.when(par == slot)
            def _(hbm=hbm, scr=scr, sems=sems, halo=halo, th=th, w=w,
                  slot=slot):
                _dma_rows_wait(hbm, scr.at[slot], sems, slot * 3, n, i,
                               th, w, halo, n_i)
        views.append(scr[par])
    return views


def _full_spec(arr):
    """Whole-array VMEM spec with a constant index map (weights)."""
    nd = arr.ndim
    return pl.BlockSpec(arr.shape, lambda n, i, _nd=nd: (0,) * _nd,
                        memory_space=pltpu.VMEM)


def _tile_spec(c: int, thw: int):
    """[N, C, S] activation blocked (1, C, ThW) over the (n, i) grid."""
    return pl.BlockSpec((1, c, thw), lambda n, i: (n, 0, i),
                        memory_space=pltpu.VMEM)


def _pern_spec(c: int):
    """Per-batch [C] vector carried as [N, C, 128] (payload in lane 0 —
    Mosaic requires the last block dim be 128-divisible or full)."""
    return pl.BlockSpec((1, c, 128), lambda n, i: (n, 0, 0),
                        memory_space=pltpu.VMEM)


def _pern_read(ref):
    """[C, 1] column from a per-batch block."""
    return ref[0, :, 0:1]


def _pern_pad(col):
    """[C, 1] -> [C, 128] lane-0 payload."""
    return jnp.pad(col, ((0, 0), (0, 127)))


def _pern_wrap(vec_nc):
    """[N, C] -> [N, C, 128] host-side."""
    return jnp.pad(vec_nc.astype(jnp.float32)[:, :, None],
                   ((0, 0), (0, 0), (0, 127)))


# ---------------------------------------------------------------------------
# forward kernel A: LN1 -> conv1 -> dw3x3 -> gate (+ SCA mean partials)
# ---------------------------------------------------------------------------


def _kernel_a(x_hbm, w1n, b1n, w1m, b1, kdw, bk,          # inputs
              g_out, m_out,                                # outputs
              xin, sems,                                   # scratch
              *, cfg: BlockConfig, cdt):
    n = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    th, w, c, ha = cfg.th, cfg.w, cfg.c, cfg.ha
    rl = (th + 2 * ha) * w

    if ha == 0:
        xv = x_hbm[0]          # whole-image variant: x is a VMEM block
    else:
        (xv,) = _pipelined_fetch(
            [(x_hbm, xin, sems, ha, th, w, c, xin.dtype)],
            n, i, n_i, pl.num_programs(0))

    xf = xv.astype(jnp.float32)
    h, _, _ = _ln_fwd(xf, w1n[...], b1n[...], cfg.eps)
    t = _dot(w1m[...], h, ((1,), (0,)), cdt) + b1[...]
    if ha > 0:
        t = jnp.where(_row_validity(i, th, w, rl, ha, cfg.h), t,
                      jnp.zeros((), t.dtype))
    u = _dwconv(t, kdw[...], w) + bk[...]
    g = u[:c] * u[c:]
    gm = g[:, ha * w:(ha + th) * w]
    g_out[0] = gm.astype(g_out.dtype)
    part = jnp.sum(gm, axis=1, keepdims=True)
    _accumulate(m_out, _pern_pad(part)[None], i == 0)


def _call_a(x, p, cfg: BlockConfig, cdt):
    n, c, s = x.shape
    thw = cfg.th * cfg.w
    n_i = s // thw
    grid = (n, n_i)
    x_spec = (_tile_spec(c, thw) if cfg.ha == 0
              else pl.BlockSpec(memory_space=pl.ANY))
    g, m_part = pl.pallas_call(
        functools.partial(_kernel_a, cfg=cfg, cdt=cdt),
        grid=grid,
        name="nafblk_A",
        in_specs=[
            x_spec,
            _full_spec(p["w1n"]), _full_spec(p["b1n"]),
            _full_spec(p["W1"]), _full_spec(p["b1"]),
            _full_spec(p["kdw"]), _full_spec(p["bk"]),
        ],
        out_specs=[
            _tile_spec(c, thw),
            _pern_spec(c),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, s), x.dtype),
            jax.ShapeDtypeStruct((n, c, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cfg.c, (cfg.th + 2 * max(cfg.ha, 1)) * cfg.w),
                       x.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=cfg.interpret,
    )(x, p["w1n"], p["b1n"], p["W1"], p["b1"], p["kdw"], p["bk"])
    return g, m_part


# ---------------------------------------------------------------------------
# forward kernel B: SCA scale -> conv3 -> residual -> LN2 -> FFN -> residual
# ---------------------------------------------------------------------------


def _kernel_b(x_in, g_in, att, w3m, b3, w2n, b2n, w4m, b4, w5m, b5,
              beta, gamma, out_ref, *, cfg: BlockConfig, cdt):
    c = cfg.c
    xf = x_in[0].astype(jnp.float32)
    gf = g_in[0].astype(jnp.float32)
    v = gf * _pern_read(att)
    pth = _dot(w3m[...], v, ((1,), (0,)), cdt) + b3[...]
    z = xf + beta[...] * pth
    h2, _, _ = _ln_fwd(z, w2n[...], b2n[...], cfg.eps)
    q = _dot(w4m[...], h2, ((1,), (0,)), cdt) + b4[...]
    wv = q[: cfg.ffn_ch // 2] * q[cfg.ffn_ch // 2 :]
    s = _dot(w5m[...], wv, ((1,), (0,)), cdt) + b5[...]
    out_ref[0] = (z + gamma[...] * s).astype(out_ref.dtype)


def _call_b(x, g, att, p, cfg: BlockConfig, cdt):
    n, c, s = x.shape
    thw = cfg.th * cfg.w
    grid = (n, s // thw)
    return pl.pallas_call(
        functools.partial(_kernel_b, cfg=cfg, cdt=cdt),
        grid=grid,
        name="nafblk_B",
        in_specs=[
            _tile_spec(c, thw), _tile_spec(c, thw), _pern_spec(c),
            _full_spec(p["W3"]), _full_spec(p["b3"]),
            _full_spec(p["w2n"]), _full_spec(p["b2n"]),
            _full_spec(p["W4"]), _full_spec(p["b4"]),
            _full_spec(p["W5"]), _full_spec(p["b5"]),
            _full_spec(p["beta"]), _full_spec(p["gamma"]),
        ],
        out_specs=_tile_spec(c, thw),
        out_shape=jax.ShapeDtypeStruct((n, c, s), x.dtype),
        compiler_params=_COMPILER_PARAMS,
        interpret=cfg.interpret,
    )(x, g, att, p["W3"], p["b3"], p["w2n"], p["b2n"], p["W4"], p["b4"],
      p["W5"], p["b5"], p["beta"], p["gamma"])


# ---------------------------------------------------------------------------
# backward kernel P1: second half (recompute from x, g, a) -> dz, dg_local,
# SCA partials, second-half weight grads
# ---------------------------------------------------------------------------


def _kernel_p1(x_in, g_in, dout_in, att,
               w3m, b3, w2n, b2n, w4m, b4, w5m, b5, beta, gamma,
               dz_out, da_out,
               dw3_a, db3_a, dw2n_a, db2n_a, dw4_a, db4_a, dw5_a, db5_a,
               dbeta_a, dgamma_a,
               *, cfg: BlockConfig, cdt):
    n = pl.program_id(0)
    i = pl.program_id(1)
    first = jnp.logical_and(n == 0, i == 0)
    fh = cfg.ffn_ch // 2

    xf = x_in[0].astype(jnp.float32)
    gf = g_in[0].astype(jnp.float32)
    dout = dout_in[0].astype(jnp.float32)
    a = _pern_read(att)
    betav = beta[...]
    gammav = gamma[...]

    # --- recompute the second half ---
    v = gf * a
    pth = _dot(w3m[...], v, ((1,), (0,)), cdt) + b3[...]
    z = xf + betav * pth
    h2, xhat2, rstd2 = _ln_fwd(z, w2n[...], b2n[...], cfg.eps)
    q = _dot(w4m[...], h2, ((1,), (0,)), cdt) + b4[...]
    q1, q2 = q[:fh], q[fh:]
    wv = q1 * q2
    s = _dot(w5m[...], wv, ((1,), (0,)), cdt) + b5[...]

    # --- backward ---
    c = cfg.c
    if _ablated("p1wgrads"):
        def _acc_w(ref, thunk, shape):
            _accumulate(ref, jnp.zeros(shape, jnp.float32), first)
    else:
        def _acc_w(ref, thunk, shape):
            _accumulate(ref, thunk(), first)
    _acc_w(dgamma_a,
           lambda: jnp.sum(dout * s, axis=1, keepdims=True), (c, 1))
    ds = gammav * dout
    _acc_w(dw5_a, lambda: _dot(ds, wv, ((1,), (1,)), cdt), (c, fh))
    _acc_w(db5_a, lambda: jnp.sum(ds, axis=1, keepdims=True), (c, 1))
    dwv = _dot(w5m[...], ds, ((0,), (0,)), cdt)
    dq = jnp.concatenate([dwv * q2, dwv * q1], axis=0)
    _acc_w(dw4_a, lambda: _dot(dq, h2, ((1,), (1,)), cdt), (cfg.ffn_ch, c))
    _acc_w(db4_a, lambda: jnp.sum(dq, axis=1, keepdims=True),
           (cfg.ffn_ch, 1))
    dh2 = _dot(w4m[...], dq, ((0,), (0,)), cdt)
    _acc_w(dw2n_a, lambda: jnp.sum(dh2 * xhat2, axis=1, keepdims=True),
           (c, 1))
    _acc_w(db2n_a, lambda: jnp.sum(dh2, axis=1, keepdims=True), (c, 1))
    dz = dout + _ln_bwd(dh2, xhat2, rstd2, w2n[...])
    _acc_w(dbeta_a, lambda: jnp.sum(dz * pth, axis=1, keepdims=True),
           (c, 1))
    dp = betav * dz
    _acc_w(dw3_a, lambda: _dot(dp, v, ((1,), (1,)), cdt), (c, c))
    _acc_w(db3_a, lambda: jnp.sum(dp, axis=1, keepdims=True), (c, 1))
    dv = _dot(w3m[...], dp, ((0,), (0,)), cdt)
    _accumulate(da_out, _pern_pad(jnp.sum(dv * gf, axis=1,
                                          keepdims=True))[None], i == 0)
    # dz is P1's ONLY tensor output: P2 recomputes the local gate grad
    # dgl = (W3^T @ (beta*dz)) * a from it (one extra small matmul
    # there) instead of this kernel writing a second [N, C, S] tensor —
    # saves a full HBM round-trip per block and a VMEM-resident buffer
    # at the stage transitions (measured copy-stall hotspot).
    dz_out[0] = dz.astype(dz_out.dtype)


def _call_p1(x, g, dout, att, p, cfg: BlockConfig, cdt):
    n, c, s = x.shape
    thw = cfg.th * cfg.w
    grid = (n, s // thw)
    fh = cfg.ffn_ch // 2
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_kernel_p1, cfg=cfg, cdt=cdt),
        grid=grid,
        name="nafblk_P1",
        in_specs=[
            _tile_spec(c, thw), _tile_spec(c, thw), _tile_spec(c, thw),
            _pern_spec(c),
            _full_spec(p["W3"]), _full_spec(p["b3"]),
            _full_spec(p["w2n"]), _full_spec(p["b2n"]),
            _full_spec(p["W4"]), _full_spec(p["b4"]),
            _full_spec(p["W5"]), _full_spec(p["b5"]),
            _full_spec(p["beta"]), _full_spec(p["gamma"]),
        ],
        out_specs=[
            _tile_spec(c, thw), _pern_spec(c),
        ] + [pl.BlockSpec(sh, lambda n_, i_, _nd=len(sh): (0,) * _nd,
                          memory_space=pltpu.VMEM)
             for sh in [(c, c), (c, 1), (c, 1), (c, 1),
                        (cfg.ffn_ch, c), (cfg.ffn_ch, 1),
                        (c, fh), (c, 1), (c, 1), (c, 1)]],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, s), dout.dtype),
            jax.ShapeDtypeStruct((n, c, 128), f32),
            jax.ShapeDtypeStruct((c, c), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((cfg.ffn_ch, c), f32),
            jax.ShapeDtypeStruct((cfg.ffn_ch, 1), f32),
            jax.ShapeDtypeStruct((c, fh), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=cfg.interpret,
    )(x, g, dout, att, p["W3"], p["b3"], p["w2n"], p["b2n"], p["W4"],
      p["b4"], p["W5"], p["b5"], p["beta"], p["gamma"])
    return outs


# ---------------------------------------------------------------------------
# backward kernel P2: first half (recompute from x) -> dx + weight grads
# ---------------------------------------------------------------------------


def _kernel_p2(x_hbm, dz_hbm, dgc, att,
               w1n, b1n, w1m, b1, kdw, w3m, betav,
               dx_out, dw1_a, db1_a, dw1n_a, db1n_a, dkdw_a, dbk_a,
               xin, dzin, semx, semz,
               *, cfg: BlockConfig, cdt):
    n = pl.program_id(0)
    i = pl.program_id(1)
    n_i = pl.num_programs(1)
    first = jnp.logical_and(n == 0, i == 0)
    th, w, c, dwc = cfg.th, cfg.w, cfg.c, cfg.dw_ch
    hx, hg = cfg.hx, cfg.hg
    r2l = (th + 2 * hx) * w   # x halo grid
    r1l = (th + 2 * hg) * w   # dg/u halo grid

    if hx == 0:
        xv = x_hbm[0]
        dzv = dz_hbm[0]
    else:
        xv, dzv = _pipelined_fetch(
            [(x_hbm, xin, semx, hx, th, w, c, xin.dtype),
             (dz_hbm, dzin, semz, hg, th, w, c, dzin.dtype)],
            n, i, n_i, pl.num_programs(0))

    # --- recompute LN1 / conv1 / depthwise on the x halo grid ---
    xf = xv.astype(jnp.float32)
    w1nv = w1n[...]
    h, xhat, rstd = _ln_fwd(xf, w1nv, b1n[...], cfg.eps)
    t = _dot(w1m[...], h, ((1,), (0,)), cdt) + b1[...]
    if hx > 0:
        t = jnp.where(_row_validity(i, th, w, r2l, hx, cfg.h), t,
                      jnp.zeros((), t.dtype))
    if _ablated("dwrecompute"):
        u_full, rows_full = t, {dr: t for dr in (-1, 0, 1)}
    else:
        u_full, rows_full = _dwconv(t, kdw[...], w, return_rows=True)
    # slice to the dg halo grid (hx >= hg + 1 keeps u valid there)
    u_h = u_full[:, (hx - hg) * w:(hx + th + hg) * w]

    # --- gate backward on the dg halo grid ---
    # Recompute the local gate grad from dz (P1 no longer writes it):
    # dgl = (W3^T @ (beta * dz)) * a. Costs one small MXU matmul here,
    # saves a [N, C, S] HBM round-trip per block. Halo dz rows are the
    # neighbour tiles' (valid) values; edge fills are zero.
    dzf = dzv.astype(jnp.float32)
    dv = _dot(w3m[...], betav[...] * dzf, ((0,), (0,)), cdt)
    dg = dv * _pern_read(att) + _pern_read(dgc)
    if hg > 0:
        dg = jnp.where(_row_validity(i, th, w, r1l, hg, cfg.h), dg,
                       jnp.zeros((), dg.dtype))
    du = jnp.concatenate([dg * u_h[c:], dg * u_h[:c]], axis=0)

    # --- depthwise backward, factorized with shared shift tensors ---
    # D[dc][p] = du[p - dc] (premasked column shifts) feeds BOTH the
    # adjoint (dt = sum_dr shift_row(-dr, sum_dc k[dr,dc] D[dc])) and,
    # row-masked to this tile's mid region (Dz), the tap grads
    # dK[dr,dc] = sum Dz[dc] * shift_row(dr, t) — so the 9-tap gradient
    # costs 9 multiply-reduces instead of 9 masked shifts.
    masks_g = _col_masks(w, r1l)
    D = {dc: _shift_cols(du, -dc, masks_g) for dc in (-1, 0, 1)}
    if hg > 0:
        lrow = jax.lax.broadcasted_iota(jnp.int32, (1, r1l), 1) // w
        mid = (lrow >= hg) & (lrow < hg + th)
        Dz = {dc: jnp.where(mid, v, jnp.zeros((), v.dtype))
              for dc, v in D.items()}
    else:
        Dz = D
    _accumulate(dbk_a, jnp.sum(Dz[0], axis=1, keepdims=True), first)
    # Reuse the recompute's row-shift tensors for the tap grads: slicing
    # shift_row(t) to the dg grid differs from shift_row(t_h) only on r1l
    # halo rows, where Dz is zero — the products are identical.
    rows_t = {dr: rows_full[dr][:, (hx - hg) * w:(hx + th + hg) * w]
              for dr in (-1, 0, 1)}
    if _ablated("tapgrads"):
        dk = jnp.zeros_like(kdw[...])
    else:
        dk_cols = [
            jnp.sum(Dz[kw_ - 1] * rows_t[kh - 1], axis=1, keepdims=True)
            for kh in range(3) for kw_ in range(3)
        ]
        dk = jnp.concatenate(dk_cols, axis=1)
    _accumulate(dkdw_a, dk, first)
    kdwv = kdw[...]
    if _ablated("adjoint"):
        dt = D[0][:, hg * w:(hg + th) * w]
    else:
        dt = None
        for dr in (-1, 0, 1):
            s = None
            for dc in (-1, 0, 1):
                tap = kdwv[:, (dr + 1) * 3 + dc + 1 : (dr + 1) * 3 + dc + 2]
                term = tap * D[dc]
                s = term if s is None else s + term
            s = _shift_rows(s, -dr, w)
            dt = s if dt is None else dt + s
        dt = dt[:, hg * w:(hg + th) * w]

    # --- conv1 backward ---
    h_mid = h[:, hx * w:(hx + th) * w]
    if _ablated("p2wgrads"):
        _accumulate(dw1_a, jnp.zeros((cfg.dw_ch, c), jnp.float32), first)
        _accumulate(db1_a, jnp.zeros((cfg.dw_ch, 1), jnp.float32), first)
    else:
        _accumulate(dw1_a, _dot(dt, h_mid, ((1,), (1,)), cdt), first)
        _accumulate(db1_a, jnp.sum(dt, axis=1, keepdims=True), first)
    dh = _dot(w1m[...], dt, ((0,), (0,)), cdt)

    # --- LN1 backward ---
    xhat_m = xhat[:, hx * w:(hx + th) * w]
    rstd_m = rstd[:, hx * w:(hx + th) * w]
    if _ablated("p2wgrads"):
        _accumulate(dw1n_a, jnp.zeros((c, 1), jnp.float32), first)
        _accumulate(db1n_a, jnp.zeros((c, 1), jnp.float32), first)
    else:
        _accumulate(dw1n_a, jnp.sum(dh * xhat_m, axis=1, keepdims=True),
                    first)
        _accumulate(db1n_a, jnp.sum(dh, axis=1, keepdims=True), first)
    dz_mid = dzf[:, hg * w:(hg + th) * w] if hg > 0 else dzf
    dx = _ln_bwd(dh, xhat_m, rstd_m, w1nv) + dz_mid
    dx_out[0] = dx.astype(dx_out.dtype)


def _call_p2(x, dz, dgc, att, p, cfg: BlockConfig, cdt):
    n, c, s = x.shape
    thw = cfg.th * cfg.w
    grid = (n, s // thw)
    dwc = cfg.dw_ch
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_kernel_p2, cfg=cfg, cdt=cdt),
        grid=grid,
        name="nafblk_P2",
        in_specs=[
            (_tile_spec(c, thw) if cfg.hx == 0
             else pl.BlockSpec(memory_space=pl.ANY)),   # x
            (_tile_spec(c, thw) if cfg.hx == 0
             else pl.BlockSpec(memory_space=pl.ANY)),   # dz
            _pern_spec(c),
            _pern_spec(c),
            _full_spec(p["w1n"]), _full_spec(p["b1n"]),
            _full_spec(p["W1"]), _full_spec(p["b1"]),
            _full_spec(p["kdw"]),
            _full_spec(p["W3"]), _full_spec(p["beta"]),
        ],
        out_specs=[
            _tile_spec(c, thw),
        ] + [pl.BlockSpec(sh, lambda n_, i_, _nd=len(sh): (0,) * _nd,
                          memory_space=pltpu.VMEM)
             for sh in [(dwc, c), (dwc, 1), (c, 1), (c, 1),
                        (dwc, 9), (dwc, 1)]],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, s), dz.dtype),
            jax.ShapeDtypeStruct((dwc, c), f32),
            jax.ShapeDtypeStruct((dwc, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((c, 1), f32),
            jax.ShapeDtypeStruct((dwc, 9), f32),
            jax.ShapeDtypeStruct((dwc, 1), f32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, c, (cfg.th + 2 * max(cfg.hx, 1)) * cfg.w),
                       x.dtype),
            pltpu.VMEM((2, c, (cfg.th + 2 * max(cfg.hg, 1)) * cfg.w),
                       dz.dtype),
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        # NOTE: no dz->dx aliasing. dz is read with an hg-row halo by
        # the NEXT grid step's prefetch while this step writes dx; with
        # aliasing those DMAs overlap in memory with no ordering
        # guarantee.
        compiler_params=_COMPILER_PARAMS,
        interpret=cfg.interpret,
    )(x, dz, dgc, att, p["w1n"], p["b1n"], p["W1"], p["b1"], p["kdw"],
      p["W3"], p["beta"])
    return outs


# ---------------------------------------------------------------------------
# the fused op (custom VJP)
# ---------------------------------------------------------------------------


def _compute_dtype(x):
    return jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32


def _fwd_impl(x, p, cfg: BlockConfig):
    cdt = _compute_dtype(x)
    g, m_part = _call_a(x, p, cfg, cdt)
    area = float(cfg.h * cfg.w)
    m = m_part[:, :, 0] / area                             # [N, C]
    a = m @ p["Wsca"].T + p["bsca"][:, 0]                  # [N, C]
    att = _pern_wrap(a)                                    # [N, C, 128]
    out = _call_b(x, g, att, p, cfg, cdt)
    return out, (x, g, m, att)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_nafblock(x: Array, p: dict, cfg: BlockConfig) -> Array:
    """One NAFBlock forward on ``x: [N, C, H*W]`` via the fused kernels.

    ``p`` holds kernel-ready parameters (see :func:`pack_params`); ``cfg``
    is the static :class:`BlockConfig`. Behavioural contract = reference
    ``NAFBlock.forward`` (``NAFNet_arch.py:59-80``) with dropout disabled.
    """
    out, _ = _fwd_impl(x, p, cfg)
    return out


def _vjp_fwd(x, p, cfg):
    out, (x_, g, m, att) = _fwd_impl(x, p, cfg)
    return out, (x_, g, m, att, p)


def _bwd_config(cfg: BlockConfig) -> BlockConfig:
    """Optionally re-tile the backward kernels (P1/P2 hold more live
    VMEM than A/B, so their sweet-spot row tile can differ). Set
    ``LLIE_NAFBLOCK_TILE_BUDGET_BWD`` to re-derive ``th`` for the bwd
    grid from a separate element budget; default = same tiling."""
    bwd_budget = os.environ.get("LLIE_NAFBLOCK_TILE_BUDGET_BWD")
    if not bwd_budget or cfg.ha == 0:
        return cfg
    ar = 128 // _gcd(cfg.w, 128)
    th = choose_row_tile(cfg.h, cfg.w, cfg.dw_ch, cfg.hx, ar,
                         int(bwd_budget))
    if th is None or th == cfg.th:
        return cfg
    return cfg._replace(th=th)


def _vjp_bwd(cfg: BlockConfig, res, dout):
    x, g, m, att, p = res
    cfg = _bwd_config(cfg)
    cdt = _compute_dtype(x)
    (dz, da_part, dW3, db3, dw2n, db2n, dW4, db4, dW5, db5,
     dbeta, dgamma) = _call_p1(x, g, dout, att, p, cfg, cdt)
    da = da_part[:, :, 0]                                  # [N, C]
    dWsca = da.T @ m                                       # [C, C]
    dbsca = jnp.sum(da, axis=0)[:, None]
    dm = da @ p["Wsca"]                                    # [N, C]
    dgc = _pern_wrap(dm / float(cfg.h * cfg.w))            # [N, C, 128]
    dx, dW1, db1, dw1n, db1n, dkdw, dbk = _call_p2(
        x, dz, dgc, att, p, cfg, cdt)
    dp = {
        "w1n": dw1n, "b1n": db1n, "W1": dW1, "b1": db1,
        "kdw": dkdw, "bk": dbk,
        "Wsca": dWsca, "bsca": dbsca,
        "W3": dW3, "b3": db3,
        "w2n": dw2n, "b2n": db2n,
        "W4": dW4, "b4": db4, "W5": dW5, "b5": db5,
        "beta": dbeta, "gamma": dgamma,
    }
    dp = {k: v.astype(p[k].dtype) for k, v in dp.items()}
    return dx.astype(x.dtype), dp


fused_nafblock.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# parameter packing from the Flax NAFBlock tree
# ---------------------------------------------------------------------------


def pack_params(norm1_w, norm1_b, conv1_k, conv1_b, conv2_k, conv2_b,
                sca_k, sca_b, conv3_k, conv3_b, norm2_w, norm2_b,
                conv4_k, conv4_b, conv5_k, conv5_b, beta, gamma) -> dict:
    """Repack Flax NAFBlock parameters into kernel-ready matrices.

    Flax 1x1 conv kernels are HWIO ``[1, 1, Cin, Cout]``; the kernels use
    ``[Cout, Cin]`` (``t = W @ h``). The depthwise kernel ``[3, 3, 1, DW]``
    becomes ``[DW, 9]`` with tap order ``kh*3+kw``. Vectors become
    ``[C, 1]`` columns (lane-broadcastable). All transposes are tiny,
    differentiable XLA ops, so autodiff reaches the original tree."""
    col = lambda v: v.astype(jnp.float32)[:, None]
    return {
        "w1n": col(norm1_w), "b1n": col(norm1_b),
        "W1": conv1_k[0, 0].T.astype(jnp.float32), "b1": col(conv1_b),
        "kdw": conv2_k[:, :, 0, :].reshape(9, -1).T.astype(jnp.float32),
        "bk": col(conv2_b),
        "Wsca": sca_k[0, 0].T.astype(jnp.float32), "bsca": col(sca_b),
        "W3": conv3_k[0, 0].T.astype(jnp.float32), "b3": col(conv3_b),
        "w2n": col(norm2_w), "b2n": col(norm2_b),
        "W4": conv4_k[0, 0].T.astype(jnp.float32), "b4": col(conv4_b),
        "W5": conv5_k[0, 0].T.astype(jnp.float32), "b5": col(conv5_b),
        "beta": col(beta), "gamma": col(gamma),
    }
