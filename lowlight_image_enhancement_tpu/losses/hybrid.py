"""Hybrid training losses (reference ``NewBP_model/losses.py:72-89, 223-372``).

- :class:`HybridLoss` — the README minimal-scaffold loss:
  ``lambda_l1 * L1 + lambda_perc * Perceptual`` returning
  ``(total, l1, perc)``.
- :class:`HybridLossPlus` — the full training loss: weighted sum of
  L1(raw) + Perceptual + optional LPIPS + optional DeltaE00 + optional SSIM
  + physics term (RAW **or** sRGB, mutually exclusive), optional
  Kendall-Gal homoscedastic uncertainty weighting
  (``L * exp(-2*s) + s`` per term, trainable ``log_sigma``), per-term logs
  with detached values.

Functional contract: ``HybridLossPlus.__call__`` is pure and jit-safe; the
trainable ``log_sigma`` pytree is owned by the caller (the trainer keeps it
alongside the network params) and passed per call. The reference's NaN/Inf
``_ensure_finite`` raise cannot happen inside jit — use
:func:`assert_finite_logs` on the returned logs host-side (the trainer does
this every log step).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.losses.components import (
    DeltaE00Loss,
    PerceptualLoss,
    PhysicalConsistencyLossSRGB,
    PhysicsConsistencyLoss,
    SSIMLoss,
)
from lowlight_image_enhancement_tpu.ops.psf import CrosstalkPSF
from lowlight_image_enhancement_tpu.utils.registry import LOSS_REGISTRY

Array = jax.Array
ArrayLike = Union[jax.Array, float]


class HybridLoss:
    """``lambda_l1 * L1 + lambda_perc * Perceptual(VGG19)``
    (reference ``losses.py:72-89``)."""

    def __init__(
        self,
        lambda_l1: float = 1.0,
        lambda_perc: float = 0.01,
        perceptual: Optional[PerceptualLoss] = None,
    ):
        self.lambda_l1 = lambda_l1
        self.lambda_perc = lambda_perc
        self.perceptual = perceptual or PerceptualLoss()

    def __call__(self, pred: Array, target: Array):
        l1 = jnp.mean(jnp.abs(pred - target))
        perc = self.perceptual(
            jnp.clip(pred, 0.0, 1.0), jnp.clip(target, 0.0, 1.0)
        )
        total = self.lambda_l1 * l1 + self.lambda_perc * perc
        return total, l1, perc


_UNCERTAINTY_TERMS = ("l1_raw", "perc", "lpips", "deltaE", "ssim", "phys")


@LOSS_REGISTRY.register()
class HybridLossPlus:
    """The full NewBP training loss (reference ``losses.py:223-372``).

    Kwargs mirror the reference defaults: ``w_l1_raw=1.0, w_perc=0.02,
    w_lpips=0.0, w_deltaE=0.02, w_ssim=0.05, w_phys=0.10``; ``use_*`` flags
    gate optional terms; exactly one of ``physics_kernel`` (RAW path) or
    ``physics_psf_module`` (sRGB path) may be given when ``use_phys``.

    Call signature (all NHWC, keyword-only)::

        total, logs = loss(
            Bhat_raw=..., B_raw=..., A_raw=..., expo_ratio=...,
            Bhat_srgb01=..., B_srgb01=..., A_srgb01=None,
            log_sigma=None,
        )

    ``logs`` holds detached per-term values (pre-weighting) plus the
    weighted total.
    """

    def __init__(
        self,
        w_l1_raw: float = 1.0,
        w_perc: float = 0.02,
        w_lpips: float = 0.0,
        w_deltaE: float = 0.02,
        w_ssim: float = 0.05,
        w_phys: float = 0.10,
        use_perc: bool = True,
        use_lpips: bool = False,
        use_deltaE: bool = True,
        use_ssim: bool = True,
        use_phys: bool = True,
        use_uncertainty: bool = False,
        physics_kernel: Optional[Array] = None,
        physics_psf_module: Optional[CrosstalkPSF] = None,
        perceptual: Optional[PerceptualLoss] = None,
        lpips_fn=None,
        require_pretrained: bool = False,
        perc_dtype=None,
        **_ignored: Any,
    ):
        if use_phys:
            if (physics_kernel is None) == (physics_psf_module is None):
                raise ValueError(
                    "use_phys requires exactly one of physics_kernel (RAW) "
                    "or physics_psf_module (sRGB)"
                )
        self.w = dict(l1_raw=w_l1_raw, perc=w_perc, lpips=w_lpips,
                      deltaE=w_deltaE, ssim=w_ssim, phys=w_phys)
        self.use = dict(perc=use_perc, lpips=use_lpips, deltaE=use_deltaE,
                        ssim=use_ssim, phys=use_phys)
        self.use_uncertainty = use_uncertainty

        self.perceptual = (
            (perceptual
             or PerceptualLoss(require_pretrained=require_pretrained,
                               dtype=perc_dtype))
            if use_perc else None
        )
        self.lpips_fn = lpips_fn
        if use_lpips and lpips_fn is None:
            from lowlight_image_enhancement_tpu.models.lpips import load_lpips

            module, variables, lpips_pretrained = load_lpips(net="vgg")
            if require_pretrained and not lpips_pretrained:
                raise RuntimeError(
                    "HybridLossPlus(use_lpips=True): pretrained LPIPS "
                    "weights not found (the reference uses LPIPS v0.1 vgg, "
                    "NewBP_model/losses.py:246-252). Provide weights "
                    "(tools/convert_lpips_weights.py -> $LLIE_LPIPS_NPZ) or "
                    "set `pretrained: false` to opt into random features."
                )
            self.lpips_fn = lambda a, b: jnp.mean(
                module.apply(variables, a * 2.0 - 1.0, b * 2.0 - 1.0)
            )
        self.deltaE = DeltaE00Loss() if use_deltaE else None
        self.ssim = SSIMLoss() if use_ssim else None
        self.phys_raw = (
            PhysicsConsistencyLoss(physics_kernel)
            if (use_phys and physics_kernel is not None)
            else None
        )
        self.phys_srgb = (
            PhysicalConsistencyLossSRGB(physics_psf_module)
            if (use_phys and physics_psf_module is not None)
            else None
        )

    # -- uncertainty ---------------------------------------------------
    def init_uncertainty_params(self) -> Dict[str, Array]:
        """Zero-initialized ``log_sigma`` per active term (trainable)."""
        out = {"l1_raw": jnp.zeros(())}
        for term in _UNCERTAINTY_TERMS[1:]:
            if self.use.get(term):
                out[term] = jnp.zeros(())
        return out

    def _weight_term(
        self, name: str, value: Array,
        log_sigma: Optional[Mapping[str, Array]],
    ) -> Array:
        if self.use_uncertainty and log_sigma is not None and name in log_sigma:
            s = log_sigma[name]
            return value * jnp.exp(-2.0 * s) + s
        return self.w[name] * value

    # -- main ----------------------------------------------------------
    def __call__(
        self,
        *,
        Bhat_raw: Array,
        B_raw: Array,
        A_raw: Array,
        expo_ratio: ArrayLike,
        Bhat_srgb01: Array,
        B_srgb01: Array,
        A_srgb01: Optional[Array] = None,
        log_sigma: Optional[Mapping[str, Array]] = None,
    ) -> Tuple[Array, Dict[str, Array]]:
        logs: Dict[str, Array] = {}
        total = jnp.zeros(())

        l1 = jnp.mean(jnp.abs(Bhat_raw - B_raw))
        logs["l_l1_raw"] = jax.lax.stop_gradient(l1)
        total = total + self._weight_term("l1_raw", l1, log_sigma)

        if self.perceptual is not None:
            perc = self.perceptual(Bhat_srgb01, B_srgb01)
            logs["l_perc"] = jax.lax.stop_gradient(perc)
            total = total + self._weight_term("perc", perc, log_sigma)

        if self.use["lpips"] and self.lpips_fn is not None:
            lp = self.lpips_fn(
                jnp.clip(Bhat_srgb01, 0, 1), jnp.clip(B_srgb01, 0, 1)
            )
            logs["l_lpips"] = jax.lax.stop_gradient(lp)
            total = total + self._weight_term("lpips", lp, log_sigma)

        if self.deltaE is not None:
            de = self.deltaE(Bhat_srgb01, B_srgb01)
            logs["l_deltaE"] = jax.lax.stop_gradient(de)
            total = total + self._weight_term("deltaE", de, log_sigma)

        if self.ssim is not None:
            ss = self.ssim(Bhat_srgb01, B_srgb01)
            logs["l_ssim"] = jax.lax.stop_gradient(ss)
            total = total + self._weight_term("ssim", ss, log_sigma)

        if self.phys_raw is not None:
            ph = self.phys_raw(Bhat_raw, A_raw, expo_ratio)
            logs["l_phys"] = jax.lax.stop_gradient(ph)
            total = total + self._weight_term("phys", ph, log_sigma)
        elif self.phys_srgb is not None:
            a_srgb = A_srgb01 if A_srgb01 is not None else jnp.clip(A_raw, 0, 1)
            ph = self.phys_srgb(Bhat_srgb01, a_srgb, expo_ratio)
            logs["l_phys"] = jax.lax.stop_gradient(ph)
            total = total + self._weight_term("phys", ph, log_sigma)

        logs["l_total"] = jax.lax.stop_gradient(total)
        return total, logs


def assert_finite_logs(logs: Mapping[str, Any]) -> None:
    """Host-side NaN/Inf guard replacing the reference's in-graph
    ``_ensure_finite`` raise (``losses.py:298-306``): call on materialized
    log values (e.g. every print-freq step)."""
    import numpy as np

    bad = {k: float(v) for k, v in logs.items()
           if not np.isfinite(np.asarray(v)).all()}
    if bad:
        raise FloatingPointError(
            f"non-finite loss terms detected: {bad} "
            f"(all logs: { {k: float(np.asarray(v)) for k, v in logs.items()} })"
        )
