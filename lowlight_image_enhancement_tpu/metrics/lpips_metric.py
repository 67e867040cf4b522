"""LPIPS evaluator classes (reference ``metrics/lpips_metric.py:34-365``).

:class:`LPIPSMetric` — general evaluator: backbone ``alex``/``vgg``, lazy
frozen model, automatic range mapping ([0,255] / [0,1] -> [-1,1]), gray ->
3-channel promotion, resize/center-crop align policies, stats dict carrying
net/version/policy metadata. :class:`LPIPSEvaluator` — the legacy float
API. Weights: converted npz (see ``models/lpips.py``); when absent the
metric still runs with deterministic random features and flags
``pretrained: False`` in its metadata.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.models.lpips import load_lpips

Array = Union[jax.Array, np.ndarray]


def _to_minus1_1(x: np.ndarray) -> np.ndarray:
    """Auto range mapping (reference ``_to_minus1_1:262-273``)."""
    lo, hi = float(x.min()), float(x.max())
    if lo < -0.01:  # already [-1,1]
        return x
    if hi > 2.0:  # [0,255]
        return x / 127.5 - 1.0
    return x * 2.0 - 1.0  # [0,1]


def _gray_to_rgb(x: np.ndarray) -> np.ndarray:
    if x.shape[-1] == 1:
        return np.repeat(x, 3, axis=-1)
    return x


def _center_crop_pair(a, b):
    h = min(a.shape[1], b.shape[1])
    w = min(a.shape[2], b.shape[2])

    def cc(z):
        top = (z.shape[1] - h) // 2
        left = (z.shape[2] - w) // 2
        return z[:, top : top + h, left : left + w, :]

    return cc(a), cc(b)


def _resize_pair(a, b):
    h = min(a.shape[1], b.shape[1])
    w = min(a.shape[2], b.shape[2])

    def rs(z):
        return np.asarray(jax.image.resize(
            jnp.asarray(z), (z.shape[0], h, w, z.shape[3]),
            method="bilinear"))

    return rs(a), rs(b)


class LPIPSMetric:
    """Configurable LPIPS evaluator over NHWC batches."""

    _CACHE: Dict[str, tuple] = {}

    def __init__(self, net: str = "alex", version: str = "0.1",
                 align_policy: str = "error",
                 weights_path: Optional[str] = None):
        if version != "0.1":
            raise ValueError("only LPIPS version 0.1 is supported")
        self.net = net
        self.version = version
        self.align_policy = align_policy
        cache_key = f"{net}:{weights_path}"
        if cache_key not in self._CACHE:
            module, variables, pretrained = load_lpips(
                net=net, weights_path=weights_path
            )
            apply = jax.jit(
                lambda a, b: module.apply(variables, a, b)
            )
            self._CACHE[cache_key] = (apply, pretrained)
        self._apply, self.pretrained = self._CACHE[cache_key]

    def per_image(self, pred: Array, target: Array) -> np.ndarray:
        p = _gray_to_rgb(np.asarray(pred, dtype=np.float32))
        t = _gray_to_rgb(np.asarray(target, dtype=np.float32))
        if p.ndim != 4 or t.ndim != 4:
            raise ValueError("expected NHWC batches")
        if min(p.shape[1], p.shape[2]) < 16:
            raise ValueError("LPIPS requires images >= 16x16")
        if p.shape != t.shape:
            if self.align_policy == "center_crop":
                p, t = _center_crop_pair(p, t)
            elif self.align_policy == "resize":
                p, t = _resize_pair(p, t)
            else:
                raise ValueError(
                    f"shape mismatch {p.shape} vs {t.shape} with "
                    "align_policy='error'"
                )
        p = _to_minus1_1(p)
        t = _to_minus1_1(t)
        return np.asarray(self._apply(jnp.asarray(p), jnp.asarray(t)))

    def distance(self, pred: Array, target: Array) -> float:
        return float(np.mean(self.per_image(pred, target)))

    def evaluate(self, pred: Array, target: Array) -> Dict[str, Any]:
        scores = self.per_image(pred, target)
        return {
            "lpips_mean": float(scores.mean()),
            "lpips_std": float(scores.std()),
            "per_image": scores.tolist(),
            "config": {
                "net": self.net,
                "version": self.version,
                "align_policy": self.align_policy,
                "range_mapping": "[-1,1] auto",
                "pretrained": bool(self.pretrained),
            },
        }


class LPIPSEvaluator:
    """Legacy float API (reference ``LPIPSEvaluator``)."""

    def __init__(self, net: str = "alex", **kwargs):
        self._metric = LPIPSMetric(net=net, **kwargs)

    def __call__(self, pred: Array, target: Array) -> float:
        return self._metric.distance(pred, target)


def evaluate_pairs(pairs, net: str = "alex", **kwargs) -> Dict[str, Any]:
    metric = LPIPSMetric(net=net, **kwargs)
    scores: List[float] = []
    for pred, target in pairs:
        scores.extend(metric.per_image(pred, target).tolist())
    arr = np.asarray(scores)
    return {"lpips_mean": float(arr.mean()), "count": int(arr.size),
            "per_image": scores}
