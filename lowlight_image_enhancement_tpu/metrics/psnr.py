"""Batch PSNR with float64 host accumulation (reference ``metrics/psnr.py``).

``calculate_psnr(img_true, img_pred, data_range)`` -> float dB over the
whole batch; returns ``inf`` when the MSE is ~0 (atol 1e-12). Accumulation
happens in NumPy float64 on host for bit-parity with the reference's
float64 contract (TPU arrays are pulled back once).
"""

from __future__ import annotations

from typing import Union

import jax
import numpy as np

Array = Union[jax.Array, np.ndarray]


def calculate_psnr(
    img_true: Array, img_pred: Array, data_range: float = 1.0
) -> float:
    """Whole-batch PSNR in dB (single scalar, float64 accumulate).

    Unlike :func:`..metrics.linear.psnr_linear` (per-image, jit-safe), this
    is the host-side convenience API mirroring reference
    ``metrics/psnr.py:18-67``.
    """
    if data_range <= 0:
        raise ValueError("data_range must be positive")
    a = np.asarray(img_true, dtype=np.float64)
    b = np.asarray(img_pred, dtype=np.float64)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch: {a.shape} vs {b.shape}")
    if not (np.all(np.isfinite(a)) and np.all(np.isfinite(b))):
        raise ValueError("inputs must be finite")
    mse = float(np.mean((a - b) ** 2))
    if mse <= 1e-12:
        return float("inf")
    return float(10.0 * np.log10((data_range**2) / mse))
