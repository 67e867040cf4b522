"""Frechet Inception Distance (stock BasicSR parity).

Rebuild of ``basicsr/metrics/fid.py``: the Frechet distance between
Gaussian fits of two feature populations,

    FID = |mu1 - mu2|^2 + tr(C1 + C2 - 2 (C1 C2)^{1/2}),

with a **pluggable feature extractor** (the reference uses InceptionV3
pool3 features; pretrained Inception weights aren't shipped in this image,
so pass any callable ``images -> [N, D] features`` — e.g. a converted
Inception, the bundled VGG19 trunk, or precomputed features).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np
from scipy import linalg


def compute_feature_stats(features: np.ndarray) -> Tuple[np.ndarray,
                                                         np.ndarray]:
    """-> (mean [D], covariance [D, D]) of a feature population [N, D]."""
    features = np.asarray(features, dtype=np.float64)
    if features.ndim != 2:
        raise ValueError(f"expected [N, D] features, got {features.shape}")
    mu = features.mean(axis=0)
    cov = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(cov)


def calculate_fid_from_stats(
    mu1: np.ndarray, cov1: np.ndarray,
    mu2: np.ndarray, cov2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Frechet distance between two Gaussians (reference numerics: sqrtm
    with eps-jitter retry, imaginary-part stripping)."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    cov1, cov2 = np.atleast_2d(cov1), np.atleast_2d(cov2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(cov1 @ cov2)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError("sqrtm produced significant imaginary part")
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


def vgg_feature_extractor() -> Callable[[np.ndarray], np.ndarray]:
    """The bundled default FID feature extractor: VGG19 relu5_4 features,
    spatially mean-pooled to ``[N, 512]``.

    Loads converted ImageNet weights when available (``models/vgg.py``
    search order); otherwise uses the deterministic random trunk — FID
    values are then self-consistent (same extractor both sides) but not
    comparable to published Inception-FID numbers. The returned callable
    carries ``.metadata`` describing what it is (the reference's in-band
    measurement-contract convention, ``metrics/ssim.py:313-328``)."""
    import jax.numpy as jnp

    from lowlight_image_enhancement_tpu.models.vgg import (
        load_vgg19_features,
    )

    module, variables, pretrained = load_vgg19_features(taps=("relu5_4",))

    def extract(images: np.ndarray) -> np.ndarray:
        feats = module.apply(variables, jnp.asarray(images,
                                                    dtype=jnp.float32))
        return np.asarray(feats["relu5_4"].mean(axis=(1, 2)))

    extract.metadata = {
        "extractor": "vgg19_relu5_4_gap",
        "pretrained": bool(pretrained),
        "note": ("not InceptionV3 pool3: values are NOT comparable to "
                 "published Inception-FID numbers"),
    }
    return extract


def inception_feature_extractor(
    allow_random: bool = False,
) -> Callable[[np.ndarray], np.ndarray]:
    """The standard-protocol FID extractor: InceptionV3 pool3 features
    (2048-d), pytorch-fid FID variant, as configured by the reference
    (``basicsr/metrics/fid.py:14-25``: ``resize_input=True``,
    ``normalize_input=False`` — inputs already in [-1, 1]; this wrapper
    takes [0, 1] NHWC images and maps them, pytorch-fid's own pipeline
    convention).

    Requires converted pretrained weights
    (``tools/convert_inception_weights.py`` -> ``$LLIE_INCEPTION_NPZ`` or
    ``weights/inception_v3_fid.npz``); raises with instructions when
    absent unless ``allow_random=True`` (random-trunk FID is
    self-consistent but NOT comparable to any published number).
    """
    import jax.numpy as jnp

    from lowlight_image_enhancement_tpu.models.inception import (
        load_inception_v3,
    )

    module, variables, pretrained = load_inception_v3()
    if not pretrained and not allow_random:
        raise RuntimeError(
            "FID: pretrained InceptionV3 weights not found. Standard-"
            "protocol FID is defined over InceptionV3 pool3 features "
            "(reference: basicsr/metrics/fid.py). Convert a checkpoint "
            "with tools/convert_inception_weights.py and set "
            "$LLIE_INCEPTION_NPZ (or place weights/inception_v3_fid.npz), "
            "pass allow_random=True for a self-consistent-only value, or "
            "use vgg_feature_extractor() explicitly.")

    import jax

    apply = jax.jit(module.apply)

    def extract(images: np.ndarray) -> np.ndarray:
        x = jnp.asarray(images, dtype=jnp.float32) * 2.0 - 1.0
        return np.asarray(apply(variables, x))

    extract.metadata = {
        "extractor": "inception_v3_pool3_fid_variant",
        "pretrained": bool(pretrained),
        "input_contract": "[0,1] NHWC -> mapped to [-1,1], resized 299",
    }
    return extract


def calculate_fid(
    images1: np.ndarray,
    images2: np.ndarray,
    feature_extractor: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    batch_size: int = 32,
) -> float:
    """FID between two image sets (NHWC float [0,1]).

    ``feature_extractor(images) -> [N, D]``; defaults to the
    standard-protocol InceptionV3 pool3 extractor
    (:func:`inception_feature_extractor` — raises with instructions if
    no converted weights are installed; pass
    :func:`vgg_feature_extractor`'s result for the bundled
    self-consistent fallback). Precomputed-feature workflows can use
    ``compute_feature_stats`` + ``calculate_fid_from_stats`` directly.
    """
    if feature_extractor is None:
        feature_extractor = inception_feature_extractor()

    def extract(images):
        feats = [
            np.asarray(feature_extractor(images[i : i + batch_size]))
            for i in range(0, len(images), batch_size)
        ]
        return np.concatenate(feats, axis=0)

    mu1, cov1 = compute_feature_stats(extract(images1))
    mu2, cov2 = compute_feature_stats(extract(images2))
    return calculate_fid_from_stats(mu1, cov1, mu2, cov2)
