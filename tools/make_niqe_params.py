#!/usr/bin/env python
"""Fit NIQE pristine-model parameters from a folder of pristine images.

The reference ships ``niqe_pris_params.npz`` (mu/cov of NIQE features over
a pristine-image corpus). This tool rebuilds such a model from any corpus
so the NIQE metric is fully usable without the reference's data file::

    python tools/make_niqe_params.py --images /path/to/pristine --output niqe_pris_params.npz

Then ``export LLIE_NIQE_PARAMS=niqe_pris_params.npz``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from lowlight_image_enhancement_tpu.metrics.niqe import (  # noqa: E402
    _mscn,
    compute_niqe_features,
)


def features_of_image(img: np.ndarray, block_size: int = 96) -> np.ndarray:
    """[n_blocks, 36] two-scale NIQE features of one grayscale image."""
    if img.ndim == 3:
        img = np.dot(img[..., :3], [0.299, 0.587, 0.114])
    img = img.astype(np.float64)
    if img.max() <= 2.0:
        img = img * 255.0
    h, w = img.shape
    nb_h, nb_w = h // block_size, w // block_size
    if nb_h == 0 or nb_w == 0:
        raise ValueError(f"image {img.shape} smaller than one block")
    img = img[: nb_h * block_size, : nb_w * block_size]

    feats_scales = []
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
        feats_scales.append(np.stack(feats))
        if scale == 1:
            img = 0.25 * (img[0::2, 0::2] + img[1::2, 0::2]
                          + img[0::2, 1::2] + img[1::2, 1::2])
    return np.concatenate(feats_scales, axis=1)


def fit_pristine_model(feature_blocks: np.ndarray):
    """-> (mu [36], cov [36,36]) over all pristine blocks."""
    valid = feature_blocks[~np.isnan(feature_blocks).any(axis=1)]
    mu = valid.mean(axis=0)
    cov = np.cov(valid, rowvar=False)
    return mu, cov


def main() -> None:
    import cv2

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--output", default="niqe_pris_params.npz")
    ap.add_argument("--block-size", type=int, default=96)
    args = ap.parse_args()

    all_feats = []
    names = sorted(os.listdir(args.images))
    for name in names:
        path = os.path.join(args.images, name)
        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is None:
            continue
        try:
            all_feats.append(features_of_image(img, args.block_size))
        except ValueError:
            print(f"skip {name}: too small")
    if not all_feats:
        raise SystemExit("no usable images")
    mu, cov = fit_pristine_model(np.concatenate(all_feats, axis=0))
    np.savez(args.output, mu_pris_param=mu, cov_pris_param=cov)
    print(f"fit pristine model from {len(all_feats)} images "
          f"({sum(len(f) for f in all_feats)} blocks) -> {args.output}")


if __name__ == "__main__":
    main()
