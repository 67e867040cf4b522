"""Elementwise restoration losses (reference
``NAFNet_base/basicsr/models/losses/losses.py:18-139`` + ``loss_util.py``).

Each loss is a pure function ``loss(pred, target, weight=None) -> scalar``
wrapped by the same ``weighted_loss`` semantics as the reference (optional
elementwise weight, reduction mean|sum|none), plus registered class-style
factories for YAML ``type:`` resolution.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.utils.registry import LOSS_REGISTRY

Array = jax.Array

_REDUCTIONS = {"none", "mean", "sum"}


def _reduce(x: Array, weight: Optional[Array], reduction: str) -> Array:
    if reduction not in _REDUCTIONS:
        raise ValueError(f"reduction must be one of {_REDUCTIONS}")
    if weight is not None:
        x = x * weight
    if reduction == "none":
        return x
    if reduction == "sum":
        return jnp.sum(x)
    return jnp.mean(x)


def l1_loss(pred, target, weight=None, reduction: str = "mean"):
    return _reduce(jnp.abs(pred - target), weight, reduction)


def mse_loss(pred, target, weight=None, reduction: str = "mean"):
    return _reduce((pred - target) ** 2, weight, reduction)


def charbonnier_loss(pred, target, weight=None, reduction: str = "mean",
                     eps: float = 1e-12):
    return _reduce(jnp.sqrt((pred - target) ** 2 + eps), weight, reduction)


_BT601_Y = (65.481 / 255.0, 128.553 / 255.0, 24.966 / 255.0)


def psnr_loss(pred, target, *, to_y: bool = False,
              data_range: float = 1.0) -> Array:
    """Negative PSNR as a loss (reference ``PSNRLoss`` with BT.601 toY
    option). Inputs NHWC in [0, data_range]."""
    if to_y:
        w = jnp.asarray(_BT601_Y, dtype=pred.dtype)
        pred = jnp.einsum("nhwc,c->nhw", pred, w)[..., None] + 16.0 / 255.0
        target = jnp.einsum("nhwc,c->nhw", target, w)[..., None] + 16.0 / 255.0
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    psnr = 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))
    return -jnp.mean(psnr)


class _WeightedLoss:
    """Class-style wrapper matching the reference's loss constructor API
    (``loss_weight``, ``reduction``)."""

    def __init__(self, fn: Callable, loss_weight: float = 1.0,
                 reduction: str = "mean", **kwargs):
        if reduction not in _REDUCTIONS:
            raise ValueError(f"reduction must be one of {_REDUCTIONS}")
        self.fn = fn
        self.loss_weight = loss_weight
        self.reduction = reduction
        self.kwargs = kwargs

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * self.fn(
            pred, target, weight, reduction=self.reduction, **self.kwargs
        )


@LOSS_REGISTRY.register()
class L1Loss(_WeightedLoss):
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        super().__init__(l1_loss, loss_weight, reduction)


@LOSS_REGISTRY.register()
class MSELoss(_WeightedLoss):
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean"):
        super().__init__(mse_loss, loss_weight, reduction)


@LOSS_REGISTRY.register()
class CharbonnierLoss(_WeightedLoss):
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean",
                 eps: float = 1e-12):
        super().__init__(charbonnier_loss, loss_weight, reduction, eps=eps)


@LOSS_REGISTRY.register()
class PSNRLoss:
    def __init__(self, loss_weight: float = 1.0, reduction: str = "mean",
                 toY: bool = False):
        if reduction != "mean":
            raise ValueError("PSNRLoss supports reduction='mean' only")
        self.loss_weight = loss_weight
        self.toY = toY

    def __call__(self, pred, target, weight=None):
        return self.loss_weight * psnr_loss(pred, target, to_y=self.toY)
