"""Per-pixel channel LayerNorm ("LayerNorm2d") with analytic custom VJP.

Rebuild of the reference's hand-written autograd LayerNorm
(``NAFNet_base/basicsr/models/archs/arch_util.py:264-300``, component C13):
normalization over the **channel axis only** at every spatial location,
with per-channel affine weight/bias, and an explicit analytic backward
(saved mean/rstd, gx formula, per-channel weight/bias grads).

Layout: NHWC — the channel axis is the last (lane) axis, so the reduction
is a cheap cross-lane VPU reduce and XLA fuses the whole op into
surrounding elementwise work. The analytic custom VJP mirrors the
reference's backward exactly and avoids autodiff re-materializing the
normalized activations.

A fused Pallas kernel variant lives in ``ops/pallas/layernorm.py`` and is
selected automatically on TPU via :func:`layer_norm_2d` when beneficial.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_2d(x: Array, weight: Array, bias: Array, eps: float = 1e-6) -> Array:
    """LayerNorm over the channel (last) axis of an NHWC tensor.

    ``y = (x - mean_c) * rsqrt(var_c + eps) * weight + bias`` with
    ``mean_c``/``var_c`` computed per (n, h, w) location. ``weight`` and
    ``bias`` are ``[C]``.
    """
    y, _ = _ln_fwd_impl(x, weight, bias, eps)
    return y


def _ln_fwd_impl(x, weight, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    y = xhat * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    # residual xhat stored in the activation dtype: halves the saved-
    # activation HBM traffic under bf16 training; backward re-promotes.
    return y.astype(x.dtype), (xhat.astype(x.dtype), rstd, weight)


def _ln_fwd(x, weight, bias, eps):
    y, res = _ln_fwd_impl(x, weight, bias, eps)
    return y, res


def _ln_bwd(eps, res, g):
    xhat, rstd, weight = res
    xhat = xhat.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    c = xhat.shape[-1]
    # d/dxhat = g * w; standard LN backward over the channel axis:
    gxhat = gf * weight.astype(jnp.float32)
    mean_g = jnp.mean(gxhat, axis=-1, keepdims=True)
    mean_gx = jnp.mean(gxhat * xhat, axis=-1, keepdims=True)
    gx = (gxhat - mean_g - xhat * mean_gx) * rstd
    gw = jnp.sum(gf * xhat, axis=(0, 1, 2))
    gb = jnp.sum(gf, axis=(0, 1, 2))
    return gx.astype(g.dtype), gw.astype(weight.dtype), gb.astype(weight.dtype)


layer_norm_2d.defvjp(_ln_fwd, _ln_bwd)


def layer_norm_2d_auto(x: Array, weight: Array, bias: Array,
                       eps: float = 1e-6) -> Array:
    """Backend-dispatching channel-LN: the fused Pallas kernel on TPU for
    eligible shapes, the jnp custom-VJP implementation otherwise.

    Disable the Pallas path globally with ``LLIE_DISABLE_PALLAS=1`` (e.g.
    for A/B benchmarking — see ``tools/bench_kernels.py``).
    """
    import os

    if os.environ.get("LLIE_DISABLE_PALLAS"):
        return layer_norm_2d(x, weight, bias, eps)
    if jax.default_backend() != "tpu":
        return layer_norm_2d(x, weight, bias, eps)
    from lowlight_image_enhancement_tpu.ops.pallas.layernorm import (
        layer_norm_2d_pallas,
        pallas_ln_supported,
    )

    if not pallas_ln_supported(x):
        return layer_norm_2d(x, weight, bias, eps)
    return layer_norm_2d_pallas(x, weight, bias, eps)
