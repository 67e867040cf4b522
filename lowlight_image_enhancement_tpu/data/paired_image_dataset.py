"""Generic paired / single image-folder datasets (stock BasicSR layer).

Rebuild of the reference's inherited stock datasets
(``basicsr/data/paired_image_dataset.py``, ``single_image_dataset.py``):
folder-backed paired restoration data for non-SID experiments.

- :class:`PairedImageDataset` — scans ``dataroot_gt`` / ``dataroot_lq``
  for images paired by stem; train phase: ``paired_random_crop`` (+
  hflip/rot augmentation); returns ``{lq, gt, lq_path, gt_path}`` float32
  [0,1] HWC.
- :class:`SingleImageDataset` — lq-only folder for blind inference.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

from lowlight_image_enhancement_tpu.data.transforms import (
    augment,
    paired_random_crop,
)
from lowlight_image_enhancement_tpu.utils.registry import DATASET_REGISTRY

_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def _scan(folder: str) -> Dict[str, str]:
    out = {}
    for name in sorted(os.listdir(folder)):
        stem, ext = os.path.splitext(name)
        if ext.lower() in _EXTS:
            out[stem] = os.path.join(folder, name)
    return out


def _read_float01(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] >= 3:
        img = img[..., :3][..., ::-1]  # BGR -> RGB
    maxv = 65535.0 if img.dtype == np.uint16 else 255.0
    return np.ascontiguousarray(img.astype(np.float32) / maxv)


@DATASET_REGISTRY.register()
class PairedImageDataset:
    def __init__(
        self,
        dataroot_gt: str,
        dataroot_lq: str,
        phase: str = "train",
        gt_size: Optional[int] = None,
        scale: int = 1,
        use_flip: bool = True,
        use_rot: bool = True,
        seed: int = 0,
        **_ignored: Any,
    ):
        gt_map = _scan(dataroot_gt)
        lq_map = _scan(dataroot_lq)
        stems = sorted(set(gt_map) & set(lq_map))
        if not stems:
            raise ValueError(
                f"no paired images between {dataroot_gt} and {dataroot_lq}"
            )
        self.pairs = [(lq_map[s], gt_map[s]) for s in stems]
        self.phase = phase
        self.gt_size = gt_size
        self.scale = scale
        self.use_flip = use_flip
        self.use_rot = use_rot
        self._rng = np.random.default_rng(seed)

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        lq_path, gt_path = self.pairs[idx % len(self.pairs)]
        lq = _read_float01(lq_path)
        gt = _read_float01(gt_path)
        if self.phase == "train" and self.gt_size:
            lq_size = self.gt_size // self.scale
            gt, lq = paired_random_crop(gt, lq, lq_size, self.scale,
                                        rng=self._rng)
            gt, lq = augment([gt, lq], hflip=self.use_flip,
                             rotation=self.use_rot, rng=self._rng)
        return {"lq": lq, "gt": gt, "lq_path": lq_path, "gt_path": gt_path}


@DATASET_REGISTRY.register()
class SingleImageDataset:
    def __init__(self, dataroot_lq: str, **_ignored: Any):
        lq_map = _scan(dataroot_lq)
        if not lq_map:
            raise ValueError(f"no images in {dataroot_lq}")
        self.paths = [lq_map[s] for s in sorted(lq_map)]

    def __len__(self) -> int:
        return len(self.paths)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        path = self.paths[idx % len(self.paths)]
        return {"lq": _read_float01(path), "lq_path": path}
