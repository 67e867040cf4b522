"""Synthetic debug SID fixture generator (the hermetic "fake backend").

Rebuild of the reference's ``data/debug_sid/`` scheme (component C63): a
tiny synthetic dataset — N 64x64 pairs with known exposure ratio — plus a
manifest and prebuilt pack files, so the full
config -> dataset -> loader -> model -> train-steps path is testable
offline with no SID download.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Tuple

import numpy as np

from lowlight_image_enhancement_tpu.data.records import SidPackWriter


def make_debug_sid(
    root: str,
    n_pairs: int = 2,
    size: int = 64,
    ratio: float = 10.0,
    subsets: Tuple[str, ...] = ("train", "val"),
    seed: int = 0,
) -> Dict[str, str]:
    """Create a synthetic SID debug set under ``root``.

    Layout::

        root/manifest_sid_debug.json
        root/{subset}_short.pack
        root/{subset}_long.pack

    The "long" image is a smooth random field in [0,1]; the "short"
    observation is ``long / ratio`` plus mild noise — so exposure-aligned
    shorts approximate the longs, and a model can overfit them.

    Returns a dict of created paths.
    """
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    records = []
    paths: Dict[str, str] = {}

    for subset in subsets:
        short_path = os.path.join(root, f"{subset}_short.pack")
        long_path = os.path.join(root, f"{subset}_long.pack")
        with SidPackWriter(short_path, comp="zlib_band") as ws, \
                SidPackWriter(long_path, comp="zlib_band") as wl:
            for i in range(n_pairs):
                pair_id = f"{subset}_{i:05d}"
                base = rng.uniform(0.1, 0.9, (8, 8, 3)).astype(np.float32)
                # smooth upsample to size x size
                reps = size // 8
                long_img = np.kron(base, np.ones((reps, reps, 1),
                                                 np.float32))
                noise = rng.normal(0, 0.002, long_img.shape).astype(
                    np.float32
                )
                short_img = np.clip(long_img / ratio + noise, 0, 1)
                long_u16 = (long_img * 65535).astype(np.uint16)
                short_u16 = (short_img * 65535).astype(np.uint16)
                ws.add(pair_id, short_u16)
                wl.add(pair_id, long_u16)
                records.append({
                    "pair_id": pair_id,
                    "subset": subset,
                    "short_key": pair_id,
                    "long_key": pair_id,
                    "short_exposure": 0.1,
                    "long_exposure": 0.1 * ratio,
                    "exposure_ratio": ratio,
                })
        paths[f"{subset}_short"] = short_path
        paths[f"{subset}_long"] = long_path

    manifest_path = os.path.join(root, "manifest_sid_debug.json")
    with open(manifest_path, "w") as f:
        json.dump(records, f, indent=1)
    paths["manifest"] = manifest_path
    return paths
