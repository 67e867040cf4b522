"""TPU-native low-light image enhancement framework (NewBP / Scenario-B).

A from-scratch JAX/XLA/Pallas/pjit rebuild of the capabilities of the
reference PyTorch framework ``RUA1027/Lowlight_Image_Enhancement``:

- NAFNet / U-Net / SwinIR restoration backbones (Flax, NHWC, bf16-ready),
- the Scenario-B physical-consistency operator: a fixed cross-pixel-crosstalk
  PSF applied *only in the loss branch* (``rho * (K * Bhat) ~= A``),
- the full hybrid loss stack (L1/Charbonnier, SSIM, VGG19 perceptual, LPIPS,
  CIEDE2000, physics consistency, optional homoscedastic uncertainty),
- a bit-faithful metrics library with explicit domain/data-range contracts,
- a SID Sony data pipeline, sharded data-parallel training over a device
  mesh, YAML-compatible configs, and orbax checkpoint/auto-resume.

Layout convention: **NHWC** (TPU-native), images in ``[N, H, W, C]`` float
arrays. The reference uses NCHW; every public docstring states the expected
layout.
"""

__version__ = "0.1.0"

from lowlight_image_enhancement_tpu.utils.registry import (  # noqa: F401
    ARCH_REGISTRY,
    DATASET_REGISTRY,
    LOSS_REGISTRY,
    METRIC_REGISTRY,
    MODEL_REGISTRY,
)
