"""Fused ReLU + 2x2/stride-2 max-pool Pallas TPU kernels (fwd + bwd).

**Status: correct, fast in isolation, and measured-WORSE inside conv
chains — not wired into VGG.** The kernels themselves beat the stock
pool lowering (0.26 + 0.51 ms/step vs ~2.3 ms of reduce-window +
select-and-scatter + standalone relu at the flagship VGG shapes), but
placing a custom call between VGG convs blocks XLA's TPU space-to-depth
conv rewrite (stock conv1_2 runs as ONE rewritten ``%convolution`` in
``[512,16,65,64]`` layout at ~85% MFU; with the custom call adjacent it
fell back ~2x slower), a net +10 ms on the perceptual term (18.0 ->
28.4 ms measured on v5e). Inside conv pipelines use the pure-XLA
``relu(maxpool(x))`` reorder instead (``models/vgg.py``); these kernels
remain for pool sites that are NOT embedded in an XLA conv chain.

Original motivation: the VGG19 perceptual term (reference
``NewBP_model/losses.py:32-69``) spends ~3 ms/step of the flagship
train step in the stock pool lowering (``reduce-window`` fwd +
``select-and-scatter`` bwd + the standalone relu fusions around it,
measured on v5e — see ``tools/profile_step_families.py``).

Semantics match torch exactly (``MaxPool2d(2)`` after ``ReLU``):

- forward: ``y = maxpool2x2(relu(x))`` (equal to ``relu(maxpool(x))``
  by monotonicity; computed on the relu'd values),
- backward: the gradient routes to the FIRST window position (scan
  order (0,0),(0,1),(1,0),(1,1)) attaining the window max of the
  relu'd values — SelectAndScatter/torch tie semantics — then the relu
  mask ``x > 0`` is applied (torch ReLU passes no gradient at 0).

Layout: NHWC with C in lanes. The caller-side wrapper reshapes
``[N,H,W,C] -> [N,H,W/2,2C]`` (a free bitcast on contiguous HBM, C
minor) so width pairs sit in lane halves; in-kernel the W-axis pool is
then a lane slice + max, and the H-axis pool a leading-dim split. Both
kernels are pure VMEM elementwise work — no scatter, no windows, no
Mosaic-unsupported shape casts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

_VMEM_TILE_BYTES = 4 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def supported(shape) -> bool:
    """True when (N, H, W, C) tiles cleanly onto the fused kernels."""
    if len(shape) != 4:
        return False
    _, h, w, c = shape
    return (
        h % 2 == 0 and w % 2 == 0 and w >= 16
        and (2 * c) % 128 == 0
        and (w // 2) % 8 == 0
    )


def _row_tile(h2: int, w: int, c: int, itemsize: int, n_bufs: int) -> int:
    """Largest tr dividing h2 with ~n_bufs input-sized buffers in budget."""
    per_row = 2 * w * c * itemsize  # bytes of x per output row
    tr = max(1, _VMEM_TILE_BYTES // max(1, n_bufs * per_row))
    tr = min(tr, h2)
    while h2 % tr:
        tr -= 1
    return tr


def _split_h(r: Array):
    """[2T, W2, C2] -> even/odd row planes [T, W2, C2] (leading-dim only)."""
    t2, w2, c2 = r.shape
    rr = r.reshape(t2 // 2, 2, w2, c2)
    return rr[:, 0], rr[:, 1]


def _fwd_kernel(x_ref, y_ref, *, c: int):
    v = x_ref[0]                       # [2T, W/2, 2C]
    r = jnp.maximum(v, jnp.zeros((), v.dtype))
    r0, r1 = _split_h(r)
    a = jnp.maximum(r0, r1)            # [T, W/2, 2C]
    y_ref[0] = jnp.maximum(a[:, :, :c], a[:, :, c:])


def _bwd_kernel(x_ref, dy_ref, dx_ref, *, c: int, relu: bool = True):
    # Comparisons run in f32: this target's VPU has no bf16 cmpf, and
    # f32 compares of bf16-exact values keep tie routing exact.
    v = x_ref[0].astype(jnp.float32)   # [2T, W/2, 2C]
    r = jnp.maximum(v, jnp.zeros((), v.dtype)) if relu else v
    re, ro = _split_h(r)
    r00, r01 = re[:, :, :c], re[:, :, c:]
    r10, r11 = ro[:, :, :c], ro[:, :, c:]
    m = jnp.maximum(jnp.maximum(r00, r01), jnp.maximum(r10, r11))
    d = dy_ref[0]                      # [T, W/2, C]
    zero = jnp.zeros((), d.dtype)
    p00 = r00 == m
    p01 = (r01 == m) & ~p00
    p10 = (r10 == m) & ~p00 & ~p01
    # p11 is the unconditional remainder so gradient mass is conserved
    # even when the window max is NaN (all `== m` compares false): the
    # gradient then routes to the last window position instead of being
    # dropped, matching XLA select-and-scatter's route-somewhere
    # behavior under NaN.
    p11 = ~p00 & ~p01 & ~p10
    de = jnp.concatenate(
        [jnp.where(p00, d, zero), jnp.where(p01, d, zero)], axis=2)
    do = jnp.concatenate(
        [jnp.where(p10, d, zero), jnp.where(p11, d, zero)], axis=2)
    t = d.shape[0]
    dx = jnp.stack([de, do], axis=1).reshape(2 * t, *de.shape[1:])
    if relu:
        dx = jnp.where(v > jnp.zeros((), v.dtype), dx, zero)
    dx_ref[0] = dx


def _pool_fwd_impl(x: Array) -> Array:
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xr = x.reshape(n, h, w2, 2 * c)    # free bitcast, C minor
    tr = _row_tile(h2, w, c, x.dtype.itemsize, n_bufs=2)
    grid = (n, h2 // tr)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, c=c),
        grid=grid,
        name="relu_pool2x2_fwd",
        in_specs=[
            pl.BlockSpec((1, 2 * tr, w2, 2 * c), lambda n_, i: (n_, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tr, w2, c), lambda n_, i: (n_, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h2, w2, c), x.dtype),
        interpret=_interpret(),
    )(xr)


def _pool_bwd_impl(x: Array, dy: Array, relu: bool = True) -> Array:
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    xr = x.reshape(n, h, w2, 2 * c)
    # n_bufs=5: x tile + its f32 widening (2x) + dy + dx.
    tr = _row_tile(h2, w, c, x.dtype.itemsize, n_bufs=5)
    grid = (n, h2 // tr)
    dxr = pl.pallas_call(
        functools.partial(_bwd_kernel, c=c, relu=relu),
        grid=grid,
        name="relu_pool2x2_bwd",
        in_specs=[
            pl.BlockSpec((1, 2 * tr, w2, 2 * c), lambda n_, i: (n_, i, 0, 0)),
            pl.BlockSpec((1, tr, w2, c), lambda n_, i: (n_, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2 * tr, w2, 2 * c),
                               lambda n_, i: (n_, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w2, 2 * c), x.dtype),
        interpret=_interpret(),
    )(xr, dy)
    return dxr.reshape(n, h, w, c)


@jax.custom_vjp
def relu_max_pool_2x2(x: Array) -> Array:
    """``maxpool2x2(relu(x))`` fused, NHWC, torch tie/relu-0 semantics."""
    return _pool_fwd_impl(x)


def _vjp_fwd(x):
    return _pool_fwd_impl(x), x


def _vjp_bwd(x, dy):
    return (_pool_bwd_impl(x, dy),)


relu_max_pool_2x2.defvjp(_vjp_fwd, _vjp_bwd)


def max_pool_2x2_bwd(x: Array, dy: Array) -> Array:
    """Pure maxpool2x2 backward: route ``dy`` to the FIRST window
    position attaining the max of ``x`` (SelectAndScatter/torch tie
    semantics), no relu. For use as a custom VJP under a stock XLA
    ``reduce_window`` forward — replaces the select-and-scatter op,
    which on v5e runs in linear layout with relayout copies around it
    (~1.3 ms for VGG pool1 bwd vs ~0.2 ms bandwidth floor).

    Measured END-TO-END and REJECTED as a default
    (``LLIE_MAXPOOL_IMPL=pallas_bwd`` keeps it available): in the full
    recipe step the select-and-scatter family does drop 2.6 -> 1.0 ms,
    but the ``custom_vjp`` boundary splits XLA's VGG-backward fusion
    clusters (conv + relu-select chains), inflating ``fusion`` time
    15.4 -> 24.7 ms for a net 39.2 -> 49.3 ms/step regression. The
    kernel is only profitable where the surrounding graph is not
    fusion-dominated."""
    return _pool_bwd_impl(x, dy, relu=False)
