"""Eval-side physics-consistency operator (reference ``metrics/phys_consistency.py``).

Measures how well a restored image ``Bhat``, pushed back through the
crosstalk PSF and exposure-scaled, matches the short observation ``A``:

    residual = rho * (K * Bhat) - A          (model-faithful direction)

NOTE the deliberate contract asymmetry preserved from the reference: the
*metric* applies ``rho`` to ``K * Bhat`` (``phys_consistency.py:229-236``),
whereas the *training losses* scale ``A`` by ``rho`` instead — both
directions exist in the reference and both are kept.

Features mirrored:
- PSF validation: odd kernels, ``[C_out, kh, kw]`` (full) or ``[C_k, kh, kw]``
  depthwise, per-out-channel energy normalization with zero-sum warning,
  optional non-negativity clamp (``_prepare_psf:75-127``).
- Full conv (cross-channel coupling) or depthwise, reflect/replicate/zero
  padding (``_apply_psf:130-143``).
- Exposure broadcast: scalar / [N] / [N,1,1,1] / full maps
  (``_expand_exposure:160-190``).
- **valid-crop** removing the conv margin before the error norm
  (``_crop_valid:146-157``).
- L1 or Charbonnier penalty, per-sample means, reduction, optional residual
  map return.
- These are *metrics*: gradients are stopped (the reference stacks
  ``@torch.no_grad()``); the differentiable physics term for training lives
  in ``losses.physics``.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array
ArrayLike = Union[jax.Array, np.ndarray, float]

_PAD_MODES = {"zero": "constant", "replicate": "edge", "reflect": "reflect"}


def _prepare_psf(
    kernel: ArrayLike,
    channels: int,
    *,
    normalize: bool = True,
    clamp_nonneg: bool = False,
) -> jnp.ndarray:
    """Validate + normalize a PSF kernel to ``[C_out, C_in, kh, kw]``.

    Accepts canonical ``[C_k, kh, kw]`` depthwise kernels (``C_k in {1, C}``,
    expanded to a diagonal full kernel), plain ``[kh, kw]``, or a full
    ``[C_out, C_in, kh, kw]`` coupling kernel.
    """
    k = jnp.asarray(kernel, dtype=jnp.float32)
    if k.ndim == 2:
        k = k[None]
    if k.ndim == 3:
        ck, kh, kw = k.shape
        if ck == 1:
            k = jnp.broadcast_to(k, (channels, kh, kw))
        elif ck != channels:
            raise ValueError(
                f"depthwise kernel channels {ck} incompatible with input "
                f"channels {channels}"
            )
        # expand to diagonal full kernel [C_out, C_in, kh, kw]
        eye = jnp.eye(channels, dtype=k.dtype)[:, :, None, None]
        k = eye * k[:, None, :, :]
    elif k.ndim == 4:
        if k.shape[0] != channels or k.shape[1] not in (1, channels):
            raise ValueError(
                f"full kernel {k.shape} incompatible with {channels} channels"
            )
        if k.shape[1] == 1:
            eye = jnp.eye(channels, dtype=k.dtype)[:, :, None, None]
            k = eye * k[:, 0][:, None, :, :]
    else:
        raise ValueError(f"kernel ndim must be 2..4, got {k.ndim}")
    kh, kw = k.shape[-2:]
    if kh % 2 == 0 or kw % 2 == 0:
        raise ValueError(f"kernel spatial dims must be odd, got {(kh, kw)}")
    if clamp_nonneg:
        k = jnp.clip(k, min=0.0)
    if normalize:
        sums = jnp.sum(k.reshape(k.shape[0], -1), axis=1)
        try:  # host-side warning; skipped when traced under jit
            if bool(jnp.any(jnp.abs(sums) < 1e-8)):
                warnings.warn(
                    "PSF kernel has ~zero energy in at least one output "
                    "channel; normalization skipped for those channels.",
                    stacklevel=3,
                )
        except jax.errors.TracerBoolConversionError:
            pass
        safe = jnp.where(jnp.abs(sums) < 1e-8, 1.0, sums)
        k = k / safe[:, None, None, None]
    return k


def _apply_psf(x: Array, kernel_full: Array, padding: str) -> Array:
    """Full (cross-channel) conv of NHWC ``x`` with ``[C_out,C_in,kh,kw]``."""
    if padding not in _PAD_MODES:
        raise ValueError(f"padding must be one of {sorted(_PAD_MODES)}")
    kh, kw = kernel_full.shape[-2:]
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(
        x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=_PAD_MODES[padding]
    )
    rhs = jnp.transpose(kernel_full, (2, 3, 1, 0)).astype(x.dtype)  # HWIO
    return lax.conv_general_dilated(
        xp,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )


def _expand_exposure(expo: ArrayLike, like: Array) -> Array:
    """Broadcast scalar / [N] / [N,1,1,1] / full-map exposure to NHWC."""
    e = jnp.asarray(expo, dtype=like.dtype)
    n = like.shape[0]
    if e.ndim == 0:
        return jnp.broadcast_to(e, like.shape)
    if e.ndim == 1:
        if e.shape[0] != n:
            raise ValueError(f"exposure [N] mismatch: {e.shape[0]} vs {n}")
        return jnp.broadcast_to(e[:, None, None, None], like.shape)
    if e.ndim == 4:
        return jnp.broadcast_to(e, like.shape)
    raise ValueError(f"unsupported exposure shape {e.shape}")


def _crop_valid(x: Array, kh: int, kw: int) -> Array:
    """Remove the conv margin (the reference's valid-crop semantics)."""
    ph, pw = kh // 2, kw // 2
    if ph == 0 and pw == 0:
        return x
    return x[:, ph : x.shape[1] - ph, pw : x.shape[2] - pw, :]


def _phys_cons_core(
    bhat: Array,
    a_obs: Array,
    kernel: ArrayLike,
    expo_ratio: ArrayLike,
    *,
    padding: str,
    penalty: str,
    charbonnier_eps: float,
    normalize_kernel: bool,
    clamp_nonneg: bool,
    reduction: str,
    return_map: bool,
) -> Union[Array, Dict[str, Any]]:
    if bhat.shape != a_obs.shape:
        raise ValueError(
            f"Bhat {bhat.shape} and A {a_obs.shape} must match (NHWC)"
        )
    if bhat.ndim != 4:
        raise ValueError(f"expected NHWC [N,H,W,C], got ndim {bhat.ndim}")
    if penalty not in {"l1", "charbonnier"}:
        raise ValueError("penalty must be 'l1' or 'charbonnier'")
    if reduction not in {"mean", "sum", "none"}:
        raise ValueError("reduction must be mean|sum|none")

    bhat = lax.stop_gradient(jnp.asarray(bhat, dtype=jnp.float32))
    a_obs = lax.stop_gradient(jnp.asarray(a_obs, dtype=jnp.float32))
    c = bhat.shape[-1]
    k = _prepare_psf(
        kernel, c, normalize=normalize_kernel, clamp_nonneg=clamp_nonneg
    )
    kh, kw = k.shape[-2:]

    projected = _apply_psf(bhat, k, padding)
    rho = _expand_exposure(expo_ratio, projected)
    residual = rho * projected - a_obs  # model-faithful: rho*(K*Bhat) vs A

    residual_valid = _crop_valid(residual, kh, kw)
    if penalty == "l1":
        err_map = jnp.abs(residual_valid)
    else:
        err_map = jnp.sqrt(residual_valid**2 + charbonnier_eps**2)

    per_sample = jnp.mean(err_map, axis=(1, 2, 3))
    if reduction == "none":
        value = per_sample
    elif reduction == "sum":
        value = jnp.sum(per_sample)
    else:
        value = jnp.mean(per_sample)

    if return_map:
        return {
            "value": value,
            "per_sample": per_sample,
            "residual_map": residual,
            "meta": {
                "padding": padding,
                "penalty": penalty,
                "valid_crop": (kh // 2, kw // 2),
                "direction": "rho*(K*Bhat) - A",
            },
        }
    return value


def phys_cons_raw(
    bhat_raw: ArrayLike,
    a_raw: ArrayLike,
    kernel: ArrayLike,
    expo_ratio: ArrayLike,
    *,
    padding: str = "reflect",
    penalty: str = "l1",
    charbonnier_eps: float = 1e-3,
    normalize_kernel: bool = True,
    clamp_nonneg: bool = False,
    reduction: str = "mean",
    return_map: bool = False,
):
    """RAW-domain physics consistency (primary protocol,
    reference ``phys_consistency.py:257-318``)."""
    return _phys_cons_core(
        jnp.asarray(bhat_raw),
        jnp.asarray(a_raw),
        kernel,
        expo_ratio,
        padding=padding,
        penalty=penalty,
        charbonnier_eps=charbonnier_eps,
        normalize_kernel=normalize_kernel,
        clamp_nonneg=clamp_nonneg,
        reduction=reduction,
        return_map=return_map,
    )


def phys_cons_srgb(
    bhat_srgb: ArrayLike,
    a_srgb: ArrayLike,
    kernel: ArrayLike,
    expo_ratio: ArrayLike,
    *,
    padding: str = "reflect",
    penalty: str = "l1",
    charbonnier_eps: float = 1e-3,
    normalize_kernel: bool = True,
    clamp_nonneg: bool = False,
    reduction: str = "mean",
    return_map: bool = False,
):
    """sRGB-domain physics consistency (auxiliary protocol,
    reference ``phys_consistency.py:321-368``). Inputs in [0,1] sRGB."""
    return _phys_cons_core(
        jnp.asarray(bhat_srgb),
        jnp.asarray(a_srgb),
        kernel,
        expo_ratio,
        padding=padding,
        penalty=penalty,
        charbonnier_eps=charbonnier_eps,
        normalize_kernel=normalize_kernel,
        clamp_nonneg=clamp_nonneg,
        reduction=reduction,
        return_map=return_map,
    )
