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

# v5e scoped-VMEM default is 16 MB; the P2 kernel's fp32 recompute
# intermediates at th=16/512-wide rows need slightly more headroom.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024)

# Upper bound on elements of the widest (2C-channel) fp32 intermediate per
# row tile — keeps per-kernel VMEM usage around a few MB.
_TILE_ELEM_BUDGET = 640 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


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
    if h * w * dw_ch <= budget and c <= 256:
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


def _shift_flat(x: Array, dr: int, dc: int, w: int) -> Array:
    """``out[c, r*w+col] = x[c, (r+dr)*w + (col+dc)]`` with zero fill for
    out-of-range *columns*. Row validity is the caller's job (halo rows)."""
    d = dr * w + dc
    ch, length = x.shape
    if d > 0:
        y = jnp.concatenate(
            [x[:, d:], jnp.zeros((ch, d), x.dtype)], axis=1)
    elif d < 0:
        y = jnp.concatenate(
            [jnp.zeros((ch, -d), x.dtype), x[:, :d]], axis=1)
    else:
        y = x
    if dc != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, length), 1) % w
        valid = (col <= w - 2) if dc == 1 else (col >= 1)
        y = jnp.where(valid, y, jnp.zeros((), x.dtype))
    return y


def _dwconv(t: Array, kdw: Array, w: int, adjoint: bool = False) -> Array:
    """Depthwise 3x3 (or its adjoint) on the flat layout.

    ``t``: [DW, L]; ``kdw``: [DW, 9] with tap order ``kh*3+kw`` (torch/Flax
    HWIO). Forward matches ``nn.Conv(feature_group_count=DW, SAME)``; the
    adjoint negates the shifts (``conv_transpose`` with the same kernel,
    reference ``NewBP_model/newbp_layer.py:7-21`` precedent)."""
    out = None
    for kh in range(3):
        for kw_ in range(3):
            dr, dc = kh - 1, kw_ - 1
            if adjoint:
                dr, dc = -dr, -dc
            tap = kdw[:, kh * 3 + kw_ : kh * 3 + kw_ + 1]
            term = tap * _shift_flat(t, dr, dc, w)
            out = term if out is None else out + term
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


def _dma_rows(hbm_ref, scratch_ref, sems, sem_base, n, i, th: int, w: int,
              halo: int, n_i: int, ch: int, dtype):
    """Copy rows ``[i*th - halo, (i+1)*th + halo)`` of ``hbm_ref[n]`` into
    ``scratch_ref`` ([ch, (th + 2*halo)*w]), zero-filling rows outside the
    image. Three aligned DMAs (top halo, body, bottom halo). Returns a
    closure that waits on every started copy."""
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

    def wait():
        body_copy().wait()

        @pl.when(i > 0)
        def _():
            top_copy().wait()

        @pl.when(i < n_i - 1)
        def _():
            bot_copy().wait()

    return wait


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
        wait = _dma_rows(x_hbm, xin, sems, 0, n, i, th, w, ha, n_i, c,
                         xin.dtype)
        wait()
        xv = xin[...]

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
            pltpu.VMEM((cfg.c, (cfg.th + 2 * max(cfg.ha, 1)) * cfg.w),
                       x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
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
               dz_out, dgl_out, da_out,
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
    _accumulate(dgamma_a, jnp.sum(dout * s, axis=1, keepdims=True), first)
    ds = gammav * dout
    _accumulate(dw5_a, _dot(ds, wv, ((1,), (1,)), cdt), first)
    _accumulate(db5_a, jnp.sum(ds, axis=1, keepdims=True), first)
    dwv = _dot(w5m[...], ds, ((0,), (0,)), cdt)
    dq = jnp.concatenate([dwv * q2, dwv * q1], axis=0)
    _accumulate(dw4_a, _dot(dq, h2, ((1,), (1,)), cdt), first)
    _accumulate(db4_a, jnp.sum(dq, axis=1, keepdims=True), first)
    dh2 = _dot(w4m[...], dq, ((0,), (0,)), cdt)
    _accumulate(dw2n_a, jnp.sum(dh2 * xhat2, axis=1, keepdims=True), first)
    _accumulate(db2n_a, jnp.sum(dh2, axis=1, keepdims=True), first)
    dz = dout + _ln_bwd(dh2, xhat2, rstd2, w2n[...])
    _accumulate(dbeta_a, jnp.sum(dz * pth, axis=1, keepdims=True), first)
    dp = betav * dz
    _accumulate(dw3_a, _dot(dp, v, ((1,), (1,)), cdt), first)
    _accumulate(db3_a, jnp.sum(dp, axis=1, keepdims=True), first)
    dv = _dot(w3m[...], dp, ((0,), (0,)), cdt)
    _accumulate(da_out, _pern_pad(jnp.sum(dv * gf, axis=1,
                                          keepdims=True))[None], i == 0)
    dz_out[0] = dz.astype(dz_out.dtype)
    dgl_out[0] = (dv * a).astype(dgl_out.dtype)


def _call_p1(x, g, dout, att, p, cfg: BlockConfig, cdt):
    n, c, s = x.shape
    thw = cfg.th * cfg.w
    grid = (n, s // thw)
    fh = cfg.ffn_ch // 2
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_kernel_p1, cfg=cfg, cdt=cdt),
        grid=grid,
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
            _tile_spec(c, thw), _tile_spec(c, thw), _pern_spec(c),
        ] + [pl.BlockSpec(sh, lambda n_, i_, _nd=len(sh): (0,) * _nd,
                          memory_space=pltpu.VMEM)
             for sh in [(c, c), (c, 1), (c, 1), (c, 1),
                        (cfg.ffn_ch, c), (cfg.ffn_ch, 1),
                        (c, fh), (c, 1), (c, 1), (c, 1)]],
        out_shape=[
            jax.ShapeDtypeStruct((n, c, s), dout.dtype),
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


def _kernel_p2(x_hbm, dz_in, dgl_hbm, dgc,
               w1n, b1n, w1m, b1, kdw,
               dx_out, dw1_a, db1_a, dw1n_a, db1n_a, dkdw_a, dbk_a,
               xin, dgin, sems,
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
        dgv = dgl_hbm[0]
    else:
        wait_x = _dma_rows(x_hbm, xin, sems, 0, n, i, th, w, hx, n_i, c,
                           xin.dtype)
        wait_g = _dma_rows(dgl_hbm, dgin, sems, 3, n, i, th, w, hg, n_i, c,
                           dgin.dtype)
        wait_x()
        wait_g()
        xv = xin[...]
        dgv = dgin[...]

    # --- recompute LN1 / conv1 / depthwise on the x halo grid ---
    xf = xv.astype(jnp.float32)
    w1nv = w1n[...]
    h, xhat, rstd = _ln_fwd(xf, w1nv, b1n[...], cfg.eps)
    t = _dot(w1m[...], h, ((1,), (0,)), cdt) + b1[...]
    if hx > 0:
        t = jnp.where(_row_validity(i, th, w, r2l, hx, cfg.h), t,
                      jnp.zeros((), t.dtype))
    u_full = _dwconv(t, kdw[...], w)
    # slice to the dg halo grid (hx >= hg + 1 keeps u valid there)
    u_h = u_full[:, (hx - hg) * w:(hx + th + hg) * w]
    t_h = t[:, (hx - hg) * w:(hx + th + hg) * w]

    # --- gate backward on the dg halo grid ---
    dg = dgv.astype(jnp.float32) + _pern_read(dgc)
    if hg > 0:
        dg = jnp.where(_row_validity(i, th, w, r1l, hg, cfg.h), dg,
                       jnp.zeros((), dg.dtype))
    du = jnp.concatenate([dg * u_h[c:], dg * u_h[:c]], axis=0)

    # --- depthwise backward ---
    du_mid = du[:, hg * w:(hg + th) * w]
    _accumulate(dbk_a, jnp.sum(du_mid, axis=1, keepdims=True), first)
    dk_cols = []
    for kh in range(3):
        for kw_ in range(3):
            shifted = _shift_flat(t_h, kh - 1, kw_ - 1,
                                  w)[:, hg * w:(hg + th) * w]
            dk_cols.append(
                jnp.sum(du_mid * shifted, axis=1, keepdims=True))
    _accumulate(dkdw_a, jnp.concatenate(dk_cols, axis=1), first)
    dt = _dwconv(du, kdw[...], w, adjoint=True)[:, hg * w:(hg + th) * w]

    # --- conv1 backward ---
    h_mid = h[:, hx * w:(hx + th) * w]
    _accumulate(dw1_a, _dot(dt, h_mid, ((1,), (1,)), cdt), first)
    _accumulate(db1_a, jnp.sum(dt, axis=1, keepdims=True), first)
    dh = _dot(w1m[...], dt, ((0,), (0,)), cdt)

    # --- LN1 backward ---
    xhat_m = xhat[:, hx * w:(hx + th) * w]
    rstd_m = rstd[:, hx * w:(hx + th) * w]
    _accumulate(dw1n_a, jnp.sum(dh * xhat_m, axis=1, keepdims=True), first)
    _accumulate(db1n_a, jnp.sum(dh, axis=1, keepdims=True), first)
    dx = _ln_bwd(dh, xhat_m, rstd_m, w1nv) + dz_in[0].astype(jnp.float32)
    dx_out[0] = dx.astype(dx_out.dtype)


def _call_p2(x, dz, dgl, dgc, p, cfg: BlockConfig, cdt):
    n, c, s = x.shape
    thw = cfg.th * cfg.w
    grid = (n, s // thw)
    dwc = cfg.dw_ch
    f32 = jnp.float32
    outs = pl.pallas_call(
        functools.partial(_kernel_p2, cfg=cfg, cdt=cdt),
        grid=grid,
        in_specs=[
            (_tile_spec(c, thw) if cfg.hx == 0
             else pl.BlockSpec(memory_space=pl.ANY)),   # x
            _tile_spec(c, thw),
            (_tile_spec(c, thw) if cfg.hx == 0
             else pl.BlockSpec(memory_space=pl.ANY)),   # dg_local
            _pern_spec(c),
            _full_spec(p["w1n"]), _full_spec(p["b1n"]),
            _full_spec(p["W1"]), _full_spec(p["b1"]),
            _full_spec(p["kdw"]),
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
            pltpu.VMEM((c, (cfg.th + 2 * max(cfg.hx, 1)) * cfg.w), x.dtype),
            pltpu.VMEM((c, (cfg.th + 2 * max(cfg.hg, 1)) * cfg.w),
                       dgl.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=cfg.interpret,
    )(x, dz, dgl, dgc, p["w1n"], p["b1n"], p["W1"], p["b1"], p["kdw"])
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


def _vjp_bwd(cfg: BlockConfig, res, dout):
    x, g, m, att, p = res
    cdt = _compute_dtype(x)
    (dz, dgl, da_part, dW3, db3, dw2n, db2n, dW4, db4, dW5, db5,
     dbeta, dgamma) = _call_p1(x, g, dout, att, p, cfg, cdt)
    da = da_part[:, :, 0]                                  # [N, C]
    dWsca = da.T @ m                                       # [C, C]
    dbsca = jnp.sum(da, axis=0)[:, None]
    dm = da @ p["Wsca"]                                    # [N, C]
    dgc = _pern_wrap(dm / float(cfg.h * cfg.w))            # [N, C, 128]
    dx, dW1, db1, dw1n, db1n, dkdw, dbk = _call_p2(
        x, dz, dgl, dgc, p, cfg, cdt)
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
