"""Composite loss components: perceptual, SSIM, DeltaE00, physics terms.

Rebuild of ``NewBP_model/losses.py:32-220``:

- :class:`PerceptualLoss` — frozen VGG19 relu5_4 features, ImageNet
  normalization, MSE (or L1) on features (``losses.py:32-69``).
- :class:`SSIMLoss` — DSSIM ``(1 - SSIM)/2`` on [0,1]-clamped inputs,
  window 11 (``losses.py:146-155``).
- :class:`DeltaE00Loss` — differentiable CIEDE2000 mean (``losses.py:92-143``).
- :class:`PhysicsConsistencyLoss` (RAW): ``||K * pad_repl(Bhat_raw) -
  clamp(A_raw * rho)||_1`` — NOTE the training-loss direction scales **A**
  by rho (``losses.py:158-192``), opposite of the eval metric's
  ``rho*(K*Bhat)`` direction; both contracts are preserved deliberately.
- :func:`align_exposure_srgb` — ``clamp(A*rho, 0, 1)`` with scalar/[N]
  broadcast (``losses.py:195-203``).
- :class:`PhysicalConsistencyLossSRGB` — ``||PSF(Bhat_srgb) -
  align(A_srgb; rho)||_1`` using :class:`CrosstalkPSF` (``losses.py:206-220``).

All components are callables over NHWC arrays, differentiable, jit-safe.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.metrics.linear import ssim_linear
from lowlight_image_enhancement_tpu.models.vgg import load_vgg19_features
from lowlight_image_enhancement_tpu.ops.color import deltaE2000_rgb
from lowlight_image_enhancement_tpu.ops.psf import (
    CrosstalkPSF,
    depthwise_conv,
)
from lowlight_image_enhancement_tpu.utils.registry import LOSS_REGISTRY

Array = jax.Array
ArrayLike = Union[jax.Array, float]


@LOSS_REGISTRY.register()
class PerceptualLoss:
    """Frozen-VGG19 feature loss on sRGB [0,1] inputs (clamped).

    ``loss_weight`` scales the result (config-path parity with the
    reference's registered perceptual losses used by ``LowlightModel``,
    ``lowlight_model.py:79-81``)."""

    def __init__(
        self,
        criterion: str = "mse",
        taps=("relu5_4",),
        weights_path: Optional[str] = None,
        require_pretrained: bool = False,
        loss_weight: float = 1.0,
        dtype=None,
    ):
        self.loss_weight = float(loss_weight)
        if criterion not in {"mse", "l1"}:
            raise ValueError("criterion must be 'mse' or 'l1'")
        self.criterion = criterion
        # dtype: VGG conv compute dtype. Under AMP the reference runs the
        # VGG trunk in the autocast dtype (losses.py:32-69 under
        # enable_amp); pass jnp.bfloat16 for the TPU equivalent.
        self.module, self.variables, self.pretrained = load_vgg19_features(
            taps=taps, weights_path=weights_path,
            dtype=dtype if dtype is not None else jnp.float32,
        )
        if require_pretrained and not self.pretrained:
            raise RuntimeError(
                "PerceptualLoss: pretrained VGG19 weights not found. The "
                "reference trains against ImageNet VGG19 features "
                "(NewBP_model/losses.py:32-69); training with random "
                "features silently changes the objective. Provide weights "
                "(tools/convert_vgg_weights.py -> $LLIE_VGG19_NPZ or "
                "weights/vgg19_features.npz) or set `pretrained: false` in "
                "hybrid_opt to opt into random features explicitly."
            )

    def __call__(self, pred: Array, target: Array) -> Array:
        # Two separate traversals on purpose: the stop_gradient target
        # branch then builds NO VJP (2 fwd + 1 bwd passes total). Batching
        # [pred; target] into one apply looks cheaper but forces the
        # backward through the full doubled batch (4 pass-equivalents).
        fp = self.module.apply(self.variables, pred)
        ft = self.module.apply(self.variables, jax.lax.stop_gradient(target))
        total = 0.0
        for name in fp:
            d = fp[name] - ft[name]
            total = total + (
                jnp.mean(d * d) if self.criterion == "mse"
                else jnp.mean(jnp.abs(d))
            )
        return self.loss_weight * total / len(fp)


@LOSS_REGISTRY.register()
class SSIMLoss:
    """DSSIM loss ``(1 - SSIM)/2`` with inputs clamped to [0,1]
    (kornia ``SSIMLoss`` semantics: window 11, max_val 1.0)."""

    def __init__(self, window_size: int = 11, max_val: float = 1.0,
                 loss_weight: float = 1.0):
        self.window_size = window_size
        self.max_val = max_val
        self.loss_weight = float(loss_weight)

    def __call__(self, pred: Array, target: Array) -> Array:
        p = jnp.clip(pred, 0.0, 1.0)
        t = jnp.clip(target, 0.0, 1.0)
        s = ssim_linear(
            p, t, data_range=self.max_val, kernel_size=self.window_size
        )
        return self.loss_weight * (1.0 - s) / 2.0


@LOSS_REGISTRY.register()
class DeltaE00Loss:
    """Differentiable CIEDE2000 mean over sRGB [0,1] NHWC images.

    ``formula="reference_loss"`` (default) replicates the EXACT variant
    the reference trains with (``NewBP_model/losses.py:92-143`` — eps
    inside sqrts, simplified hue branches; trajectory-parity-tested
    against the reference's own torch code). ``formula="sharma"`` uses
    the exact Sharma-2005 formula shared with the evaluation metric —
    the two differ measurably (see ``ops/color.py``)."""

    def __init__(self, clamp_input: bool = True, loss_weight: float = 1.0,
                 formula: str = "reference_loss"):
        self.clamp_input = clamp_input
        self.loss_weight = float(loss_weight)
        self.formula = formula

    def __call__(self, pred: Array, target: Array) -> Array:
        if self.clamp_input:
            pred = jnp.clip(pred, 0.0, 1.0)
            target = jnp.clip(target, 0.0, 1.0)
        return self.loss_weight * jnp.mean(
            deltaE2000_rgb(pred, target, formula=self.formula))


class PhysicsConsistencyLoss:
    """RAW-domain physics term (training direction: scale A by rho).

    ``||depthwise_conv(pad_replicate(Bhat_raw), K) - clamp(A_raw*rho)||_1``

    ``kernel``: canonical ``[C_k, kh, kw]`` (``C_k in {1, C}``); the
    reference's groups=1 full-coupling path is supported by passing a
    ``[C, C, kh, kw]``-style kernel to the metric API instead — the
    training loss uses depthwise (the model's physical structure).
    """

    def __init__(self, kernel: Array, clamp_target: bool = True):
        self.kernel = jnp.asarray(kernel)
        self.clamp_target = clamp_target

    def __call__(
        self, bhat_raw: Array, a_raw: Array, expo_ratio: ArrayLike
    ) -> Array:
        projected = depthwise_conv(bhat_raw, self.kernel, padding="replicate")
        aligned = _broadcast_expo(expo_ratio, a_raw) * a_raw
        if self.clamp_target:
            aligned = jnp.clip(aligned, 0.0, 1.0)
        return jnp.mean(jnp.abs(projected - jax.lax.stop_gradient(aligned)))


def _broadcast_expo(expo: ArrayLike, like: Array) -> Array:
    e = jnp.asarray(expo, dtype=like.dtype)
    if e.ndim == 0:
        return e
    if e.ndim == 1:
        return e[:, None, None, None]
    if e.ndim == 4:
        return e
    raise ValueError(f"unsupported exposure shape {e.shape}")


def align_exposure_srgb(a_srgb: Array, expo_ratio: ArrayLike) -> Array:
    """``clamp(A_srgb * rho, 0, 1)`` (reference ``losses.py:195-203``)."""
    return jnp.clip(a_srgb * _broadcast_expo(expo_ratio, a_srgb), 0.0, 1.0)


class PhysicalConsistencyLossSRGB:
    """sRGB physics term: ``||PSF(Bhat) - align(A; rho)||_1``.

    The PSF module is applied to the *prediction only* — the loss-path-only
    Scenario-B invariant."""

    def __init__(self, psf: CrosstalkPSF):
        self.psf = psf

    def __call__(
        self, bhat_srgb: Array, a_srgb: Array, expo_ratio: ArrayLike
    ) -> Array:
        projected = self.psf(bhat_srgb)
        aligned = align_exposure_srgb(
            jax.lax.stop_gradient(a_srgb), expo_ratio
        )
        return jnp.mean(jnp.abs(projected - aligned))
