"""Misc image/arch operations (reference ``archs/arch_util.py:24-350``).

- :func:`pixel_unshuffle` — inverse pixel shuffle (space -> channel).
- :func:`flow_warp` — bilinear backward warping by an optical-flow field.
- :func:`resize_flow` — resize + rescale a flow field.
- :func:`upsample_pixelshuffle` helper mirrored in ``models.nafnet``.
- :func:`measure_inference_speed` — fps loop (perf-counter, device-fenced).

All NHWC; flow fields are ``[N, H, W, 2]`` in (dx, dy) pixel units
(matching the reference's ``flow_warp`` convention where flow[..., 0] is
the horizontal displacement).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _pool_fwd_slices(x: Array) -> Array:
    a = x[:, 0::2, 0::2, :]
    b = x[:, 0::2, 1::2, :]
    c = x[:, 1::2, 0::2, :]
    d = x[:, 1::2, 1::2, :]
    return jnp.maximum(jnp.maximum(a, b), jnp.maximum(c, d))


def _repeat2(y: Array) -> Array:
    """[N, H, W, C] -> [N, 2H, 2W, C] nearest upsample (broadcast, no
    gather/pad)."""
    n, h, w, c = y.shape
    y = jnp.broadcast_to(y[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return y.reshape(n, 2 * h, 2 * w, c)


@jax.custom_vjp
def _pool_cmp(x: Array) -> Array:
    return _pool_fwd_slices(x)


def _pool_cmp_fwd(x):
    y = _pool_fwd_slices(x)
    return y, (x, y)


def _pool_cmp_bwd(res, g):
    # route grad by comparing each input against its window max: pure
    # elementwise + broadcast upsample (no interior pads, no scatter).
    # Exact float ties receive the gradient MULTIPLE times (torch routes
    # to the first argmax) — measure-zero for real activations.
    x, y = res
    yu = _repeat2(y)
    gu = _repeat2(g)
    return (jnp.where(x == yu, gu, jnp.zeros((), gu.dtype)),)


_pool_cmp.defvjp(_pool_cmp_fwd, _pool_cmp_bwd)


@jax.custom_vjp
def _pool_pallas_bwd(x: Array) -> Array:
    import flax.linen as fnn

    return fnn.max_pool(x, (2, 2), strides=(2, 2))


def _pool_pallas_bwd_fwd(x):
    return _pool_pallas_bwd(x), x


def _pool_pallas_bwd_bwd(x, g):
    # Stock reduce_window FORWARD (keeps XLA's TPU conv space-to-depth
    # rewrite intact around it) + Pallas recompute router BACKWARD
    # (replaces select-and-scatter, which runs in linear layout with
    # relayout copies around it). Same first-argmax tie semantics.
    from lowlight_image_enhancement_tpu.ops.pallas.pool import (
        max_pool_2x2_bwd,
    )

    return (max_pool_2x2_bwd(x, g),)


_pool_pallas_bwd.defvjp(_pool_pallas_bwd_fwd, _pool_pallas_bwd_bwd)


def max_pool_2x2(x: Array) -> Array:
    """2x2/stride-2 max pool, forward-identical to
    ``nn.max_pool((2,2),(2,2))`` / torch ``MaxPool2d(2)`` (odd trailing
    row/col floored away, torch semantics).

    The BACKWARD implementation is selectable via ``$LLIE_MAXPOOL_IMPL``;
    all three were measured on v5e via ``tools/bench_vgg.py`` (the VGG19
    perceptual term, 512^2 b2 bf16, value+grad) and **XLA's stock
    lowering won decisively** — SelectAndScatter is well optimized on
    this generation, contrary to its old reputation:

    - ``reduce_window`` (default): the stock lowering (SelectAndScatter
      grad; exact torch tie semantics). Measured 18.8 ms.
    - ``cmp``: custom-VJP — backward routes grads by comparing inputs
      against the broadcast-upsampled window max (exact float ties get
      the gradient multiply). Measured 28.0 ms — rejected.
    - ``slice``: strided-slice maxima with XLA's native AD (selects +
      interior pads). Measured 47.1 ms — rejected.
    - ``pallas_bwd``: stock forward + Pallas recompute-router backward
      (``ops/pallas/pool.py``). Wins the pool ops in isolation but the
      custom_vjp boundary splits the VGG backward's conv fusion
      clusters: full-recipe step 39.2 -> 49.3 ms — rejected as default,
      kept as an opt-in for graphs that are not fusion-dominated.
    """
    h2, w2 = x.shape[1] // 2, x.shape[2] // 2
    x = x[:, : h2 * 2, : w2 * 2, :]
    impl = os.environ.get("LLIE_MAXPOOL_IMPL", "reduce_window")
    if impl == "pallas_bwd":
        from lowlight_image_enhancement_tpu.ops.pallas.pool import (
            supported as _pool_supported,
        )

        if _pool_supported(x.shape):
            return _pool_pallas_bwd(x)
        impl = "reduce_window"
    if impl == "reduce_window":
        import flax.linen as fnn

        return fnn.max_pool(x, (2, 2), strides=(2, 2))
    if impl == "slice":
        return _pool_fwd_slices(x)
    return _pool_cmp(x)


def pixel_unshuffle(x: Array, r: int = 2) -> Array:
    """NHWC pixel unshuffle with torch channel ordering ``(c, r1, r2)``."""
    n, h, w, c = x.shape
    if h % r or w % r:
        raise ValueError(f"spatial dims {(h, w)} not divisible by {r}")
    x = x.reshape(n, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # n, h/r, w/r, c, r1, r2
    return x.reshape(n, h // r, w // r, c * r * r)


def flow_warp(
    x: Array,
    flow: Array,
    interp_mode: str = "bilinear",
    padding_mode: str = "zeros",
) -> Array:
    """Backward-warp ``x`` by ``flow`` (bilinear gather, NHWC).

    ``out[n, i, j] = x[n, i + flow[n,i,j,1], j + flow[n,i,j,0]]`` with
    bilinear interpolation; out-of-bounds samples are 0 (``zeros``) or
    edge-clamped (``border``).
    """
    if interp_mode not in {"bilinear", "nearest"}:
        raise ValueError("interp_mode must be bilinear|nearest")
    if padding_mode not in {"zeros", "border"}:
        raise ValueError("padding_mode must be zeros|border")
    n, h, w, c = x.shape
    if flow.shape != (n, h, w, 2):
        raise ValueError(f"flow shape {flow.shape} != {(n, h, w, 2)}")

    gy = jnp.arange(h, dtype=flow.dtype)[None, :, None]
    gx = jnp.arange(w, dtype=flow.dtype)[None, None, :]
    sy = gy + flow[..., 1]
    sx = gx + flow[..., 0]

    if interp_mode == "nearest":
        iy = jnp.round(sy).astype(jnp.int32)
        ix = jnp.round(sx).astype(jnp.int32)
        valid = ((iy >= 0) & (iy < h) & (ix >= 0) & (ix < w))
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        out = x[jnp.arange(n)[:, None, None], iyc, ixc]
        if padding_mode == "zeros":
            out = out * valid[..., None].astype(x.dtype)
        return out

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy = (sy - y0)[..., None]
    wx = (sx - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(iy, ix):
        valid = ((iy >= 0) & (iy < h) & (ix >= 0) & (ix < w))
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        vals = x[jnp.arange(n)[:, None, None], iyc, ixc]
        if padding_mode == "zeros":
            vals = vals * valid[..., None].astype(x.dtype)
        return vals

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def resize_flow(
    flow: Array,
    size_type: str,
    sizes: Tuple[float, float],
    interp_mode: str = "bilinear",
) -> Array:
    """Resize a flow field and rescale its displacement magnitudes.

    ``size_type='ratio'``: sizes are (ratio_h, ratio_w);
    ``size_type='shape'``: sizes are the target (H, W).
    """
    n, h, w, _ = flow.shape
    if size_type == "ratio":
        out_h, out_w = int(h * sizes[0]), int(w * sizes[1])
    elif size_type == "shape":
        out_h, out_w = int(sizes[0]), int(sizes[1])
    else:
        raise ValueError("size_type must be ratio|shape")
    resized = jax.image.resize(flow, (n, out_h, out_w, 2),
                               method=interp_mode)
    scale = jnp.asarray([out_w / w, out_h / h], dtype=flow.dtype)
    return resized * scale


def measure_inference_speed(
    fn: Callable, *args, max_iter: int = 100, log_interval: int = 50
) -> float:
    """fps loop (reference ``measure_inference_speed``,
    ``arch_util.py:313-350``): perf-counter timing with device fencing,
    first half treated as warmup. Returns images/sec (fps)."""
    num_warmup = max_iter // 2
    start = None
    out = None
    for i in range(max_iter):
        if i == num_warmup:
            jax.block_until_ready(out)
            start = time.perf_counter()
        out = fn(*args)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - start
    return (max_iter - num_warmup) / elapsed
