"""Metrics/evaluation library (framework-agnostic, pure JAX + host NumPy).

Exposes both the functional library (psnr/ssim/channelwise/color_error/
phys_consistency/flops/latency/params) and the **config-referenceable bridge
names** used by validation configs (reference
``basicsr/metrics/lowlight_metrics.py:211-272``):

- ``linear_psnr(sr, gt, data_range=...)``
- ``linear_ssim(sr, gt, data_range=...)``
- ``lpips_distance(sr, gt, net=...)``
- ``deltae2000_mean(sr, gt)`` / ``deltae2000_p95(sr, gt)``
- ``edge_deltae2000_mean(sr, gt, edge_quantile=...)``

All bridge functions take NHWC ``[N, H, W, C]`` arrays and return floats,
and are registered in ``METRIC_REGISTRY`` for YAML ``type:`` resolution.
"""

from __future__ import annotations

import numpy as np

from lowlight_image_enhancement_tpu.metrics.channelwise import (  # noqa: F401
    cpsnr_rgb,
    rgb_psnr,
    rgb_ssim,
)
from lowlight_image_enhancement_tpu.metrics.color_error import (  # noqa: F401
    deltaE2000_map,
    deltaE2000_summary,
    edge_deltaE2000,
)
from lowlight_image_enhancement_tpu.metrics.flops_utils import (  # noqa: F401
    FLOPsCounter,
    FLOPsResult,
    count_flops,
)
from lowlight_image_enhancement_tpu.metrics.inference_time import (  # noqa: F401
    measure_inference_time,
)
from lowlight_image_enhancement_tpu.metrics.linear import (  # noqa: F401
    psnr_linear,
    ssim_linear,
)
from lowlight_image_enhancement_tpu.metrics.parameter_utils import (  # noqa: F401
    count_parameters,
)
from lowlight_image_enhancement_tpu.metrics.phys_consistency import (  # noqa: F401
    phys_cons_raw,
    phys_cons_srgb,
)
from lowlight_image_enhancement_tpu.metrics.psnr import (  # noqa: F401
    calculate_psnr,
)
from lowlight_image_enhancement_tpu.metrics.psnr_ssim_img import (  # noqa: F401
    calculate_psnr_img,
    calculate_ssim_img,
    rgb2ycbcr,
)
from lowlight_image_enhancement_tpu.metrics.ssim import (  # noqa: F401
    SSIMEvaluator,
    SSIMMetric,
    calculate_ssim,
    calculate_ssim_per_image,
    evaluate_pairs_ssim,
)
from lowlight_image_enhancement_tpu.utils.registry import METRIC_REGISTRY


# ---------------------------------------------------------------------------
# Config-referenceable bridge names (YAML `metrics: {type: ...}`).
# ---------------------------------------------------------------------------


@METRIC_REGISTRY.register()
def linear_psnr(sr, gt, data_range: float = 1.0, **kwargs) -> float:
    """Linear-domain PSNR (dB) over the batch."""
    return float(np.mean(np.asarray(
        psnr_linear(sr, gt, data_range=data_range, reduction="none")
    )))


@METRIC_REGISTRY.register()
def linear_ssim(sr, gt, data_range: float = 1.0, **kwargs) -> float:
    """Linear-domain SSIM over the batch."""
    return float(ssim_linear(sr, gt, data_range=data_range))


@METRIC_REGISTRY.register()
def lpips_distance(sr, gt, net: str = "alex", **kwargs) -> float:
    """LPIPS distance (lower better). Lazy-imports the LPIPS evaluator;
    requires converted weights (see ``models/lpips.py``), else raises a
    clear error at call time."""
    from lowlight_image_enhancement_tpu.metrics.lpips_metric import (
        LPIPSMetric,
    )

    return LPIPSMetric(net=net).distance(sr, gt)


@METRIC_REGISTRY.register()
def deltae2000_mean(sr, gt, **kwargs) -> float:
    return deltaE2000_summary(sr, gt)["mean"]


@METRIC_REGISTRY.register()
def deltae2000_p95(sr, gt, **kwargs) -> float:
    return deltaE2000_summary(sr, gt, percentiles=(95.0,))["p95"]


@METRIC_REGISTRY.register()
def edge_deltae2000_mean(sr, gt, edge_quantile: float = 0.85, **kwargs) -> float:
    return edge_deltaE2000(sr, gt, edge_quantile=edge_quantile)["mean"]


# Image-domain (uint8, MATLAB-convention) metric names used by the stock
# ``use_image: true`` validation path (reference ``calculate_psnr/ssim``).
@METRIC_REGISTRY.register(name="psnr")
def image_psnr(sr, gt, crop_border: int = 0, test_y_channel: bool = False,
               **kwargs) -> float:
    vals = [
        calculate_psnr_img(np.asarray(sr)[i], np.asarray(gt)[i],
                           crop_border=crop_border,
                           test_y_channel=test_y_channel)
        for i in range(np.asarray(sr).shape[0])
    ]
    return float(np.mean(vals))


@METRIC_REGISTRY.register(name="ssim")
def image_ssim(sr, gt, crop_border: int = 0, test_y_channel: bool = False,
               **kwargs) -> float:
    vals = [
        calculate_ssim_img(np.asarray(sr)[i], np.asarray(gt)[i],
                           crop_border=crop_border,
                           test_y_channel=test_y_channel)
        for i in range(np.asarray(sr).shape[0])
    ]
    return float(np.mean(vals))
