"""Per-channel PSNR / CPSNR / per-channel SSIM (reference ``metrics/channelwise.py``).

All functions take NHWC ``[N, H, W, 3]`` images and return result dicts that
carry their measurement contract in-band (``meta={domain, data_range}``) —
the reference's deliberate reproducibility feature.
"""

from __future__ import annotations

from typing import Any, Dict, Union

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.metrics.linear import ssim_linear

Array = Union[jax.Array, np.ndarray]

_CHANNELS = ("R", "G", "B")


def _validate(pred: Array, target: Array) -> None:
    p, t = np.asarray(pred), np.asarray(target)
    if p.shape != t.shape:
        raise ValueError(f"shape mismatch: {p.shape} vs {t.shape}")
    if p.ndim != 4 or p.shape[-1] != 3:
        raise ValueError(f"expected NHWC [N,H,W,3], got {p.shape}")
    if not (np.all(np.isfinite(p)) and np.all(np.isfinite(t))):
        raise ValueError("inputs must be finite")


def rgb_psnr(
    pred: Array,
    target: Array,
    *,
    data_range: float = 1.0,
    domain: str = "linear",
) -> Dict[str, Any]:
    """Per-channel PSNR + their mean (reference ``channelwise.py:111-168``).

    Returns ``{"R": dB, "G": dB, "B": dB, "mean": dB, "meta": {...}}``.
    """
    _validate(pred, target)
    p = np.asarray(pred, dtype=np.float64)
    t = np.asarray(target, dtype=np.float64)
    out: Dict[str, Any] = {}
    vals = []
    for ci, name in enumerate(_CHANNELS):
        mse = float(np.mean((p[..., ci] - t[..., ci]) ** 2))
        v = (
            float("inf")
            if mse <= 1e-12
            else float(10.0 * np.log10(data_range**2 / mse))
        )
        out[name] = v
        vals.append(v)
    out["mean"] = float(np.mean(vals))
    out["meta"] = {"domain": domain, "data_range": data_range}
    return out


def cpsnr_rgb(
    pred: Array,
    target: Array,
    *,
    data_range: float = 1.0,
    domain: str = "linear",
) -> Dict[str, Any]:
    """CPSNR: mean-of-channel-MSE *then* log (reference ``channelwise.py:170-222``).

    This differs from averaging per-channel PSNRs — the reference preserves
    both conventions; so do we.
    """
    _validate(pred, target)
    p = np.asarray(pred, dtype=np.float64)
    t = np.asarray(target, dtype=np.float64)
    channel_mse = [
        float(np.mean((p[..., c] - t[..., c]) ** 2)) for c in range(3)
    ]
    mse = float(np.mean(channel_mse))
    v = (
        float("inf")
        if mse <= 1e-12
        else float(10.0 * np.log10(data_range**2 / mse))
    )
    return {
        "cpsnr": v,
        "channel_mse": channel_mse,
        "meta": {"domain": domain, "data_range": data_range},
    }


def rgb_ssim(
    pred: Array,
    target: Array,
    *,
    data_range: float = 1.0,
    domain: str = "linear",
    **ssim_kwargs,
) -> Dict[str, Any]:
    """Per-channel SSIM via :func:`ssim_linear` (reference ``channelwise.py:224-303``)."""
    _validate(pred, target)
    scores = ssim_linear(
        jnp.asarray(pred),
        jnp.asarray(target),
        data_range=data_range,
        per_channel=True,
        reduction="none",
        **ssim_kwargs,
    )  # [N, 3]
    per_channel = np.asarray(jnp.mean(scores, axis=0))
    out: Dict[str, Any] = {
        name: float(per_channel[ci]) for ci, name in enumerate(_CHANNELS)
    }
    out["mean"] = float(np.mean(per_channel))
    out["meta"] = {"domain": domain, "data_range": data_range}
    return out
