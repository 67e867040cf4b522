"""NIQE no-reference quality metric (stock BasicSR parity).

Rebuild of ``basicsr/metrics/niqe.py``: MSCN (mean-subtracted contrast
normalized) coefficients -> generalized-Gaussian / asymmetric-GGD feature
fits per 96x96 block -> Mahalanobis-style distance to a pristine
multivariate-Gaussian model.

The pristine model parameters (``mu_pris_param``, ``cov_pris_param`` —
shipped by the reference as ``niqe_pris_params.npz``) are *data*, not
code; they load from ``$LLIE_NIQE_PARAMS`` or a path argument. Without
them :func:`calculate_niqe` raises a clear error (the math itself is fully
implemented and unit-tested via the feature extractor).
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import numpy as np
from scipy.ndimage import convolve
from scipy.special import gamma


def _estimate_ggd(block: np.ndarray) -> Tuple[float, float]:
    """Fit a generalized Gaussian distribution; returns (alpha, sigma^2)."""
    gam = np.arange(0.2, 10.001, 0.001)
    r_gam = (gamma(1.0 / gam) * gamma(3.0 / gam)) / (gamma(2.0 / gam) ** 2)
    sigma_sq = float(np.mean(block**2))
    sigma = math.sqrt(sigma_sq) if sigma_sq > 0 else 1e-12
    E = float(np.mean(np.abs(block)))
    rho = sigma_sq / (E**2 + 1e-12)
    alpha = gam[np.argmin(np.abs(rho - r_gam))]
    return float(alpha), sigma_sq


def _estimate_aggd(block: np.ndarray) -> Tuple[float, float, float]:
    """Fit an asymmetric GGD; returns (alpha, beta_l, beta_r)."""
    gam = np.arange(0.2, 10.001, 0.001)
    r_gam = ((gamma(2.0 / gam)) ** 2) / (gamma(1.0 / gam) * gamma(3.0 / gam))
    left = block[block < 0]
    right = block[block > 0]
    sigma_l = math.sqrt(float(np.mean(left**2))) if left.size else 1e-12
    sigma_r = math.sqrt(float(np.mean(right**2))) if right.size else 1e-12
    gamma_hat = sigma_l / (sigma_r + 1e-12)
    E = float(np.mean(np.abs(block)))
    rhat = (E**2) / (float(np.mean(block**2)) + 1e-12)
    rhat_norm = (rhat * (gamma_hat**3 + 1) * (gamma_hat + 1)) / (
        (gamma_hat**2 + 1) ** 2
    )
    alpha = gam[np.argmin((r_gam - rhat_norm) ** 2)]
    const = math.sqrt(gamma(1.0 / alpha) / gamma(3.0 / alpha))
    beta_l = sigma_l * const
    beta_r = sigma_r * const
    return float(alpha), float(beta_l), float(beta_r)


def _gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(ax**2) / (2 * sigma**2))
    w = np.outer(g, g)
    return w / w.sum()


def compute_niqe_features(img: np.ndarray) -> np.ndarray:
    """18 NIQE features of one grayscale block (MSCN GGD + 4 pairwise
    AGGD fits)."""
    features = []
    alpha, sigma_sq = _estimate_ggd(img)
    features.extend([alpha, sigma_sq])
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]
    for dy, dx in shifts:
        shifted = np.roll(np.roll(img, dy, axis=0), dx, axis=1)
        alpha, beta_l, beta_r = _estimate_aggd(img * shifted)
        mean = (beta_r - beta_l) * (gamma(2.0 / alpha) / gamma(1.0 / alpha))
        features.extend([alpha, mean, beta_l, beta_r])
    return np.asarray(features)


def _mscn(img: np.ndarray) -> np.ndarray:
    win = _gaussian_window()
    mu = convolve(img, win, mode="nearest")
    sigma = np.sqrt(np.abs(
        convolve(img * img, win, mode="nearest") - mu * mu
    ))
    return (img - mu) / (sigma + 1.0)


def _load_pris_params(path: Optional[str]):
    """Search order: explicit path -> $LLIE_NIQE_PARAMS -> the BUNDLED
    real-photo-corpus fit (``weights/niqe_pris_params_photo.npz``, from
    ``tools/make_niqe_params.py --bundled-photos``) -> the BUNDLED
    synthetic-corpus fit (``weights/niqe_pris_params_synthetic.npz``,
    produced by ``tools/make_niqe_params.py --synthetic 64 --seed 0``).

    The bundled models make NIQE runnable out of the box; values are
    self-consistent but will NOT numerically match scores computed against
    the reference's MATLAB-fit ``niqe_pris_params.npz`` (different
    pristine corpus). For reference-number parity, point
    $LLIE_NIQE_PARAMS at that file. Use :func:`niqe_model_info` to see
    which model (and corpus) is active."""
    mu, cov, _ = _load_pris_params_info(path)
    return mu, cov


def _load_pris_params_info(path: Optional[str]):
    wdir = os.path.join(os.path.dirname(__file__), "..", "weights")
    candidates = (
        path,
        os.environ.get("LLIE_NIQE_PARAMS"),
        os.path.join(wdir, "niqe_pris_params_photo.npz"),
        os.path.join(wdir, "niqe_pris_params_synthetic.npz"),
    )
    for cand in candidates:
        if cand and os.path.exists(cand):
            data = np.load(cand)
            corpus = str(data["corpus"]) if "corpus" in data else "unknown"
            return (data["mu_pris_param"], data["cov_pris_param"],
                    {"path": os.path.abspath(cand), "corpus": corpus})
    raise FileNotFoundError(
        "NIQE pristine-model parameters not found: provide "
        "niqe_pris_params.npz via the `pris_params_path` argument or "
        "$LLIE_NIQE_PARAMS (the reference ships this data file; the NIQE "
        "math itself is fully implemented here)."
    )


def niqe_model_info(pris_params_path: Optional[str] = None) -> dict:
    """Provenance of the pristine model :func:`calculate_niqe` would use:
    ``{'path': ..., 'corpus': ...}`` (corpus tag written by
    ``tools/make_niqe_params.py``). Scores are only comparable within one
    pristine model."""
    return _load_pris_params_info(pris_params_path)[2]


def calculate_niqe(
    img: np.ndarray,
    crop_border: int = 0,
    pris_params_path: Optional[str] = None,
    block_size: int = 96,
) -> float:
    """NIQE score (lower = better perceptual quality) of a grayscale or
    RGB image in [0, 255] or [0, 1]."""
    mu_pris, cov_pris = _load_pris_params(pris_params_path)

    img = np.asarray(img, dtype=np.float64)
    if img.max() <= 2.0:
        img = img * 255.0
    if img.ndim == 3 and img.shape[-1] == 3:
        img = np.dot(img, [0.299, 0.587, 0.114])  # BT.601 luma
    if crop_border:
        img = img[crop_border:-crop_border, crop_border:-crop_border]

    h, w = img.shape
    nb_h, nb_w = h // block_size, w // block_size
    if nb_h == 0 or nb_w == 0:
        raise ValueError(f"image {img.shape} smaller than one "
                         f"{block_size}x{block_size} block")
    img = img[: nb_h * block_size, : nb_w * block_size]

    feats_all = []
    for scale in (1, 2):
        mscn = _mscn(img)
        bs = block_size // scale
        feats = [
            compute_niqe_features(
                mscn[i * bs : (i + 1) * bs, j * bs : (j + 1) * bs]
            )
            for i in range(nb_h)
            for j in range(nb_w)
        ]
        feats_all.append(np.stack(feats))
        if scale == 1:
            # downsample by 2 (simple average pooling) for the second scale
            img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                          + img[0::2, 1::2] + img[1::2, 1::2])
    features = np.concatenate(feats_all, axis=1)

    mu_dist = np.nanmean(features, axis=0)
    valid = features[~np.isnan(features).any(axis=1)]
    cov_dist = np.cov(valid, rowvar=False)
    cov_avg = (cov_pris + cov_dist) / 2.0
    diff = (mu_pris - mu_dist)[None]
    quality = diff @ np.linalg.pinv(cov_avg) @ diff.T
    return float(np.sqrt(max(quality[0, 0], 0.0)))
