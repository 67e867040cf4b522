"""SSIM evaluator with data-range inference, align policies, streaming mode.

Rebuild of reference ``metrics/ssim.py:49-569`` on top of the from-scratch
:func:`..metrics.linear.ssim_linear` core (the reference wraps torchmetrics;
we have no torchmetrics, and the from-scratch core is validated against it
by construction of the standard constants):

- auto data-range inference among {1.0, 2.0 (=[-1,1]), 255.0}
  (``ssim.py:62-71``),
- odd-kernel clipping when the window exceeds the image (``ssim.py:74-89``),
- BT.601 luma mode (``ssim.py:116-127``),
- resize / center-crop alignment policy for mismatched shapes
  (``ssim.py:130-167``),
- per-image scores + mean/std/p50/p95 + full config echo in the result dict
  (``ssim.py:313-328``),
- streaming :class:`SSIMMetric` accumulator (``ssim.py:479-538``).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.metrics.linear import ssim_linear

Array = Union[jax.Array, np.ndarray]

_BT601 = (0.299, 0.587, 0.114)


def _infer_data_range(*imgs: np.ndarray) -> float:
    """Infer data range among {1.0, 2.0, 255.0} from observed values."""
    lo = min(float(np.min(i)) for i in imgs)
    hi = max(float(np.max(i)) for i in imgs)
    if lo < -0.01:
        return 2.0  # [-1, 1]
    if hi > 2.0:
        return 255.0
    return 1.0


def _to_luma(x: np.ndarray) -> np.ndarray:
    w = np.asarray(_BT601, dtype=x.dtype)
    return np.einsum("nhwc,c->nhw", x, w)[..., None]


def _center_crop(x: np.ndarray, h: int, w: int) -> np.ndarray:
    H, W = x.shape[1], x.shape[2]
    top, left = (H - h) // 2, (W - w) // 2
    return x[:, top : top + h, left : left + w, :]


def _resize_bilinear(x: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.asarray(
        jax.image.resize(
            jnp.asarray(x), (x.shape[0], h, w, x.shape[3]), method="bilinear"
        )
    )


def _align(
    pred: np.ndarray, target: np.ndarray, policy: str
) -> tuple[np.ndarray, np.ndarray]:
    if pred.shape == target.shape:
        return pred, target
    if policy == "error":
        raise ValueError(
            f"shape mismatch {pred.shape} vs {target.shape} with "
            "align_policy='error'"
        )
    h = min(pred.shape[1], target.shape[1])
    w = min(pred.shape[2], target.shape[2])
    if policy == "center_crop":
        return _center_crop(pred, h, w), _center_crop(target, h, w)
    if policy == "resize":
        return _resize_bilinear(pred, h, w), _resize_bilinear(target, h, w)
    raise ValueError(f"unknown align policy {policy!r}")


class SSIMEvaluator:
    """Configurable SSIM evaluator over NHWC batches.

    Args mirror the reference's evaluator: explicit or auto ``data_range``,
    Gaussian window (k=11, sigma=1.5, k1=.01, k2=.03), optional BT.601 luma
    mode, align policy for shape mismatches.
    """

    def __init__(
        self,
        data_range: Optional[float] = None,
        kernel_size: int = 11,
        sigma: float = 1.5,
        k1: float = 0.01,
        k2: float = 0.03,
        gaussian: bool = True,
        use_luma: bool = False,
        align_policy: str = "error",
        padding: str = "reflect",
    ):
        if kernel_size % 2 != 1:
            raise ValueError("kernel_size must be odd")
        self.data_range = data_range
        self.kernel_size = kernel_size
        self.sigma = sigma
        self.k1 = k1
        self.k2 = k2
        self.gaussian = gaussian
        self.use_luma = use_luma
        self.align_policy = align_policy
        self.padding = padding

    def _effective_kernel(self, h: int, w: int) -> int:
        """Clip the window to the image size, keeping it odd (>=3)."""
        k = min(self.kernel_size, h, w)
        if k % 2 == 0:
            k -= 1
        return max(k, 3)

    def per_image(self, pred: Array, target: Array) -> np.ndarray:
        """Per-image SSIM scores ``[N]``."""
        p = np.asarray(pred, dtype=np.float32)
        t = np.asarray(target, dtype=np.float32)
        if p.ndim != 4 or t.ndim != 4:
            raise ValueError("expected NHWC [N,H,W,C] batches")
        p, t = _align(p, t, self.align_policy)
        if self.use_luma:
            if p.shape[-1] != 3:
                raise ValueError("luma mode requires 3-channel input")
            p, t = _to_luma(p), _to_luma(t)
        dr = self.data_range or _infer_data_range(p, t)
        k = self._effective_kernel(p.shape[1], p.shape[2])
        scores = ssim_linear(
            jnp.asarray(p),
            jnp.asarray(t),
            data_range=dr,
            kernel_size=k,
            sigma=self.sigma,
            k1=self.k1,
            k2=self.k2,
            gaussian=self.gaussian,
            padding=self.padding,
            reduction="none",
        )
        return np.asarray(scores)

    def evaluate(self, pred: Array, target: Array) -> Dict[str, Any]:
        """Full result dict with stats + measurement config echo."""
        scores = self.per_image(pred, target)
        dr = self.data_range or _infer_data_range(
            np.asarray(pred), np.asarray(target)
        )
        return {
            "ssim_mean": float(np.mean(scores)),
            "ssim_std": float(np.std(scores)),
            "ssim_p50": float(np.percentile(scores, 50)),
            "ssim_p95": float(np.percentile(scores, 95)),
            "per_image": scores.tolist(),
            "config": {
                "data_range": dr,
                "kernel_size": self.kernel_size,
                "sigma": self.sigma,
                "k1": self.k1,
                "k2": self.k2,
                "gaussian": self.gaussian,
                "use_luma": self.use_luma,
                "align_policy": self.align_policy,
                "padding": self.padding,
            },
        }


def calculate_ssim(
    pred: Array, target: Array, data_range: float = 1.0, **kwargs
) -> float:
    """Batch-mean SSIM (functional convenience API)."""
    ev = SSIMEvaluator(data_range=data_range, **kwargs)
    return float(np.mean(ev.per_image(pred, target)))


def calculate_ssim_per_image(
    pred: Array, target: Array, data_range: float = 1.0, **kwargs
) -> np.ndarray:
    ev = SSIMEvaluator(data_range=data_range, **kwargs)
    return ev.per_image(pred, target)


def evaluate_pairs_ssim(
    pairs, data_range: Optional[float] = None, **kwargs
) -> Dict[str, Any]:
    """Evaluate an iterable of (pred, target) NHWC pairs."""
    ev = SSIMEvaluator(data_range=data_range, **kwargs)
    scores: List[float] = []
    for pred, target in pairs:
        scores.extend(ev.per_image(pred, target).tolist())
    arr = np.asarray(scores)
    return {
        "ssim_mean": float(arr.mean()),
        "ssim_std": float(arr.std()),
        "count": int(arr.size),
        "per_image": scores,
    }


class SSIMMetric:
    """Streaming SSIM accumulator (reference ``ssim.py:479-538``)."""

    def __init__(self, data_range: Optional[float] = None, **kwargs):
        self._ev = SSIMEvaluator(data_range=data_range, **kwargs)
        self.reset()

    def reset(self) -> None:
        self._sum = 0.0
        self._count = 0

    def update(self, pred: Array, target: Array) -> None:
        scores = self._ev.per_image(pred, target)
        self._sum += float(scores.sum())
        self._count += scores.size

    def compute(self) -> float:
        if self._count == 0:
            raise RuntimeError("SSIMMetric.compute() called before update()")
        return self._sum / self._count
