"""Strict linear-domain PSNR / SSIM with explicit data_range contracts.

TPU-native rebuild of reference ``metrics/linear.py:82-324``:

- :func:`psnr_linear` — per-image MSE with an eps floor, ``inf`` masking on
  (numerically) zero MSE, reduction ``mean|sum|none``, optional clamping to
  ``[0, data_range]``. The reference accumulates in float64; on TPU we
  accumulate in float32 by default and in float64 when ``jax_enable_x64``
  is set (documented tolerance: < 1e-4 dB for [0,1] images).
- :func:`ssim_linear` — from-scratch SSIM: cached Gaussian (or uniform)
  window, reflect/replicate/zero padding, variance clamped >= 0,
  per-channel or mean aggregation.

Layout: NHWC ``[N, H, W, C]`` (reference is NCHW — documented difference).
All functions are pure jnp and jit-safe for fixed shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.ops.psf import depthwise_conv

Array = jax.Array

_REDUCTIONS = {"mean", "sum", "none"}


def _validate_pair(pred: Array, target: Array) -> None:
    if pred.shape != target.shape:
        raise ValueError(
            f"shape mismatch: pred {pred.shape} vs target {target.shape}"
        )
    if pred.ndim != 4:
        raise ValueError(f"expected NHWC [N,H,W,C], got ndim={pred.ndim}")


def _acc_dtype(x: Array) -> jnp.dtype:
    """float64 accumulation when x64 is enabled, else float32."""
    if jax.config.jax_enable_x64:
        return jnp.float64
    return jnp.float32


def psnr_linear(
    pred: Array,
    target: Array,
    *,
    data_range: float = 1.0,
    reduction: str = "mean",
    clamp: bool = False,
    eps: float = 1e-12,
) -> Array:
    """Linear-domain PSNR in dB (reference ``metrics/linear.py:139-210``).

    Per-image MSE over all pixels/channels; images whose MSE falls below
    ``eps`` report ``inf``.

    Args:
      pred/target: NHWC ``[N, H, W, C]`` linear-domain images.
      data_range: full-scale value (1.0 for normalized, 4095.0 for 12-bit RAW).
      reduction: ``'mean' | 'sum' | 'none'`` over the batch. ``inf`` entries
        propagate into mean/sum, matching the reference's masking semantics
        only for finite batches (reference returns inf when any image is
        exact).
      clamp: clip both images to ``[0, data_range]`` first.
    """
    if reduction not in _REDUCTIONS:
        raise ValueError(f"reduction must be one of {_REDUCTIONS}")
    if data_range <= 0:
        raise ValueError("data_range must be positive")
    _validate_pair(pred, target)
    dt = _acc_dtype(pred)
    p = jnp.asarray(pred, dtype=dt)
    t = jnp.asarray(target, dtype=dt)
    if clamp:
        p = jnp.clip(p, 0.0, data_range)
        t = jnp.clip(t, 0.0, data_range)
    mse = jnp.mean((p - t) ** 2, axis=(1, 2, 3))
    psnr = 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, eps))
    psnr = jnp.where(mse <= eps, jnp.inf, psnr)
    if reduction == "none":
        return psnr
    if reduction == "sum":
        return jnp.sum(psnr)
    return jnp.mean(psnr)


@functools.lru_cache(maxsize=32)
def _window_np(
    kernel_size: int, sigma: float, uniform: bool
) -> np.ndarray:
    """Cached 1-D window ``[k]`` summing to 1 (reference
    ``_kernel_cache_base``; Gaussian and uniform windows are separable, so
    the 2-D blur runs as two 1-D passes — each an elementwise shift-add on
    TPU instead of a pathological small-channel conv)."""
    if uniform:
        w = np.ones((kernel_size,), dtype=np.float64)
    else:
        ax = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
        w = np.exp(-(ax**2) / (2.0 * sigma**2))
    return (w / w.sum()).astype(np.float32)


_SSIM_PAD = {"reflect": "reflect", "replicate": "replicate", "zero": "zero"}


def ssim_linear(
    pred: Array,
    target: Array,
    *,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    gaussian: bool = True,
    padding: str = "reflect",
    reduction: str = "mean",
    per_channel: bool = False,
) -> Array:
    """From-scratch linear-domain SSIM (reference ``metrics/linear.py:213-324``).

    Local statistics via a depthwise window convolution (SAME, chosen
    padding), variances clamped to >= 0, SSIM map averaged over space.

    Returns per-image scores reduced over the batch, or per-image-per-channel
    ``[N, C]`` when ``per_channel`` with ``reduction='none'``.
    """
    if reduction not in _REDUCTIONS:
        raise ValueError(f"reduction must be one of {_REDUCTIONS}")
    if padding not in _SSIM_PAD:
        raise ValueError(f"padding must be one of {sorted(_SSIM_PAD)}")
    if kernel_size % 2 != 1 or kernel_size < 3:
        raise ValueError("kernel_size must be an odd integer >= 3")
    _validate_pair(pred, target)
    if min(pred.shape[1], pred.shape[2]) < kernel_size:
        raise ValueError(
            f"image spatial dims {pred.shape[1:3]} smaller than SSIM window "
            f"{kernel_size}"
        )

    dt = _acc_dtype(pred)
    x = jnp.asarray(pred, dtype=dt)
    y = jnp.asarray(target, dtype=dt)

    win1d = jnp.asarray(_window_np(kernel_size, sigma, not gaussian),
                        dtype=dt)
    win_row = win1d[None, None, :]  # [1, 1, k] — horizontal pass
    win_col = win1d[None, :, None]  # [1, k, 1] — vertical pass

    def blur(z: Array) -> Array:
        return depthwise_conv(
            depthwise_conv(z, win_col, padding=padding),
            win_row, padding=padding,
        )

    mu_x = blur(x)
    mu_y = blur(y)
    mu_x2 = mu_x * mu_x
    mu_y2 = mu_y * mu_y
    mu_xy = mu_x * mu_y
    # variance/covariance clamped >= 0 (reference clamps var)
    sigma_x2 = jnp.clip(blur(x * x) - mu_x2, min=0.0)
    sigma_y2 = jnp.clip(blur(y * y) - mu_y2, min=0.0)
    sigma_xy = blur(x * y) - mu_xy

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    ssim_map = ((2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x2 + sigma_y2 + c2)
    )

    if per_channel:
        scores = jnp.mean(ssim_map, axis=(1, 2))  # [N, C]
    else:
        scores = jnp.mean(ssim_map, axis=(1, 2, 3))  # [N]
    if reduction == "none":
        return scores
    if reduction == "sum":
        return jnp.sum(scores)
    return jnp.mean(scores)
