"""Aggregate model evaluation loop (reference ``metrics/evaluation.py``).

The reference version is broken as shipped (imports ``DeltaE00Loss`` /
``PhysicsConsistencyLoss`` from the wrong modules and calls the physics
loss without its kernel — see SURVEY.md C45); this rebuild fixes the wiring
while keeping the metric set: PSNR, SSIM, LPIPS(vgg), DeltaE00 mean/p95,
edge-DeltaE00 (Sobel >= q0.90), per-channel PSNR, physics-consistency MAE.

``compute_metrics(forward, loader, psf_kernel=...)`` iterates batches of
``{lq, gt, short_raw?, expo_ratio?}`` NHWC dicts, runs the model, and
returns the aggregate dict. Linear -> sRGB conversion uses the shared EOTF
(``ops.color.linear_to_srgb``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Mapping, Optional

import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.metrics.channelwise import rgb_psnr
from lowlight_image_enhancement_tpu.metrics.color_error import (
    deltaE2000_summary,
    edge_deltaE2000,
)
from lowlight_image_enhancement_tpu.metrics.linear import (
    psnr_linear,
    ssim_linear,
)
from lowlight_image_enhancement_tpu.metrics.phys_consistency import (
    phys_cons_raw,
)
from lowlight_image_enhancement_tpu.ops.color import linear_to_srgb


def compute_metrics(
    forward: Callable,
    loader: Iterable[Mapping[str, Any]],
    *,
    data_range: float = 1.0,
    psf_kernel: Optional[Any] = None,
    use_lpips: bool = True,
    lpips_net: str = "vgg",
    srgb_convert: bool = False,
    max_batches: Optional[int] = None,
) -> Dict[str, float]:
    """Evaluate ``forward(lq) -> sr`` over a loader; returns metric means."""
    lpips_metric = None
    if use_lpips:
        from lowlight_image_enhancement_tpu.metrics.lpips_metric import (
            LPIPSMetric,
        )

        lpips_metric = LPIPSMetric(net=lpips_net)

    sums: Dict[str, float] = {}
    weights: Dict[str, float] = {}
    n_images = 0

    def acc(key: str, value: float, weight: float = 1.0):
        sums[key] = sums.get(key, 0.0) + value * weight
        weights[key] = weights.get(key, 0.0) + weight

    for bi, batch in enumerate(loader):
        if max_batches and bi >= max_batches:
            break
        lq = jnp.asarray(batch["lq"])
        gt = jnp.asarray(batch["gt"])
        sr = jnp.asarray(forward(lq))
        n = int(lq.shape[0])
        n_images += n

        acc("psnr", float(psnr_linear(sr, gt, data_range=data_range)), n)
        acc("ssim", float(ssim_linear(sr, gt, data_range=data_range)), n)
        acc("rgb_psnr_mean", rgb_psnr(sr, gt, data_range=data_range)["mean"],
            n)

        sr_srgb = linear_to_srgb(jnp.clip(sr, 0, 1)) if srgb_convert else \
            jnp.clip(sr, 0, 1)
        gt_srgb = linear_to_srgb(jnp.clip(gt, 0, 1)) if srgb_convert else \
            jnp.clip(gt, 0, 1)
        de = deltaE2000_summary(sr_srgb, gt_srgb, percentiles=(95.0,))
        acc("deltaE_mean", de["mean"], n)
        acc("deltaE_p95", de["p95"], n)
        ede = edge_deltaE2000(sr_srgb, gt_srgb, edge_quantile=0.90)
        acc("edge_deltaE_mean", ede["mean"], n)

        if lpips_metric is not None:
            acc("lpips", lpips_metric.distance(np.asarray(sr_srgb),
                                               np.asarray(gt_srgb)), n)

        if psf_kernel is not None and "short_raw" in batch:
            expo = batch.get("expo_ratio", 1.0)
            acc(
                "phys_mae",
                float(phys_cons_raw(sr, jnp.asarray(batch["short_raw"]),
                                    psf_kernel, jnp.asarray(expo))),
                n,
            )

    if n_images == 0:
        return {}
    return {k: sums[k] / weights[k] for k in sums}
