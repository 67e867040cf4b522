"""Functional LPIPS API (reference ``metrics/perceptual.py:95-208``).

``lpips_srgb(pred, target, net=..., spatial=...)``: strict NHWC/finiteness
validation, minimum 16x16, gray replicated to 3 channels, optional clamp,
[0,1] -> [-1,1] mapping, model cache keyed (net, spatial), optional
per-pixel spatial maps.
"""

from __future__ import annotations

import warnings
from typing import Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.models.lpips import load_lpips

Array = Union[jax.Array, np.ndarray]

_LPIPS_CACHE: Dict[str, tuple] = {}


def _get_lpips_model(net: str, spatial: bool):
    key = f"{net}:{spatial}"
    if key not in _LPIPS_CACHE:
        module, variables, pretrained = load_lpips(net=net, spatial=spatial)
        apply = jax.jit(lambda a, b: module.apply(variables, a, b))
        _LPIPS_CACHE[key] = (apply, pretrained)
    return _LPIPS_CACHE[key]


def lpips_srgb(
    pred: Array,
    target: Array,
    *,
    net: str = "alex",
    spatial: bool = False,
    clamp_input: bool = True,
) -> np.ndarray:
    """LPIPS on sRGB [0,1] NHWC batches.

    Returns per-image scores ``[N]`` or per-pixel maps ``[N, H, W]`` when
    ``spatial``.
    """
    p = np.asarray(pred, dtype=np.float32)
    t = np.asarray(target, dtype=np.float32)
    if p.ndim != 4 or t.ndim != 4:
        raise ValueError("expected NHWC [N,H,W,C]")
    if p.shape != t.shape:
        raise ValueError(f"shape mismatch {p.shape} vs {t.shape}")
    if not (np.all(np.isfinite(p)) and np.all(np.isfinite(t))):
        raise ValueError("inputs must be finite")
    if min(p.shape[1], p.shape[2]) < 16:
        raise ValueError("LPIPS requires images >= 16x16")
    if p.shape[-1] == 1:
        p = np.repeat(p, 3, axis=-1)
        t = np.repeat(t, 3, axis=-1)
    if clamp_input:
        p = p.clip(0.0, 1.0)
        t = t.clip(0.0, 1.0)
    elif p.min() < 0 or p.max() > 1:
        warnings.warn("lpips_srgb inputs outside [0,1] without clamping",
                      stacklevel=2)
    apply, _ = _get_lpips_model(net, spatial)
    out = apply(jnp.asarray(p * 2.0 - 1.0), jnp.asarray(t * 2.0 - 1.0))
    return np.asarray(out)
