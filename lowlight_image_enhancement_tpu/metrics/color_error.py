"""CIEDE2000 evaluation metrics: maps, summaries, edge-masked statistics.

Rebuild of reference ``metrics/color_error.py``:

- :func:`deltaE2000_map` — per-pixel Sharma-2005 DeltaE00 between sRGB [0,1]
  NHWC images via D65/2deg Lab (``color_error.py:104-210``).
- :func:`deltaE2000_summary` — mean + arbitrary percentiles
  (``color_error.py:269-293``).
- :func:`edge_deltaE2000` — Sobel magnitude of Lab-L, per-image quantile-q
  mask, mean/p95 over edge pixels only (``color_error.py:304-344``).

A D50 whitepoint request warns (no chromatic adaptation implemented), like
the reference (``color_error.py:86-97``).
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.ops.color import (
    deltaE2000_rgb,
    rgb_to_lab,
    sobel_magnitude,
)

Array = Union[jax.Array, np.ndarray]


def _validate_rgb(pred: Array, target: Array) -> None:
    p, t = np.asarray(pred), np.asarray(target)
    if p.shape != t.shape:
        raise ValueError(f"shape mismatch: {p.shape} vs {t.shape}")
    if p.ndim != 4 or p.shape[-1] != 3:
        raise ValueError(f"expected NHWC [N,H,W,3], got {p.shape}")
    if not (np.all(np.isfinite(p)) and np.all(np.isfinite(t))):
        raise ValueError("inputs must be finite")


def _check_whitepoint(whitepoint: str) -> None:
    if whitepoint.upper() == "D50":
        warnings.warn(
            "D50 whitepoint requested but no chromatic adaptation is "
            "implemented; computing under D65 (same as reference).",
            stacklevel=3,
        )
    elif whitepoint.upper() != "D65":
        raise ValueError(f"unsupported whitepoint {whitepoint!r}")


def deltaE2000_map(
    pred: Array, target: Array, *, whitepoint: str = "D65"
) -> jax.Array:
    """Per-pixel DeltaE00 map ``[N, H, W]`` between sRGB [0,1] NHWC images."""
    _validate_rgb(pred, target)
    _check_whitepoint(whitepoint)
    return deltaE2000_rgb(jnp.asarray(pred), jnp.asarray(target))


def deltaE2000_summary(
    pred: Array,
    target: Array,
    *,
    percentiles: Sequence[float] = (95.0,),
    whitepoint: str = "D65",
) -> Dict[str, Any]:
    """Mean + percentiles of the DeltaE00 map over all pixels.

    Returns ``{"mean": float, "p95": float, ..., "meta": {...}}``.
    """
    dmap = np.asarray(deltaE2000_map(pred, target, whitepoint=whitepoint))
    out: Dict[str, Any] = {"mean": float(dmap.mean())}
    for q in percentiles:
        out[f"p{q:g}"] = float(np.percentile(dmap, q))
    out["meta"] = {"whitepoint": "D65", "observer": "2deg"}
    return out


def edge_deltaE2000(
    pred: Array,
    target: Array,
    *,
    edge_quantile: float = 0.85,
    percentiles: Sequence[float] = (95.0,),
    whitepoint: str = "D65",
) -> Dict[str, Any]:
    """DeltaE00 statistics restricted to edge pixels of the target.

    Edge mask: Sobel magnitude of the target's Lab-L channel, thresholded at
    the per-image ``edge_quantile`` (reference ``color_error.py:304-344``).
    """
    _validate_rgb(pred, target)
    if not 0.0 < edge_quantile < 1.0:
        raise ValueError("edge_quantile must be in (0, 1)")
    _check_whitepoint(whitepoint)

    dmap = np.asarray(deltaE2000_rgb(jnp.asarray(pred), jnp.asarray(target)))
    L = rgb_to_lab(jnp.asarray(target))[..., 0]  # [N,H,W]
    mag = np.asarray(sobel_magnitude(L))

    means, pcts = [], {f"p{q:g}": [] for q in percentiles}
    for i in range(dmap.shape[0]):
        thr = np.quantile(mag[i], edge_quantile)
        mask = mag[i] >= thr
        vals = dmap[i][mask]
        if vals.size == 0:  # perfectly flat image: fall back to all pixels
            vals = dmap[i].ravel()
        means.append(float(vals.mean()))
        for q in percentiles:
            pcts[f"p{q:g}"].append(float(np.percentile(vals, q)))

    out: Dict[str, Any] = {"mean": float(np.mean(means))}
    for key, vlist in pcts.items():
        out[key] = float(np.mean(vlist))
    out["meta"] = {
        "whitepoint": "D65",
        "observer": "2deg",
        "edge_quantile": edge_quantile,
        "edge_source": "sobel(Lab-L of target)",
    }
    return out
