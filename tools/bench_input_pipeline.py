#!/usr/bin/env python
"""Host input-pipeline benchmark: items/sec for each backend/compression/
worker configuration. Diagnoses whether training is data-bound (compare
against the train-step time from tools/profile_train.py).

Runs entirely on host (no TPU needed).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512,
                    help="stored frame size (use 2848 to simulate real SID)")
    ap.add_argument("--patch", type=int, default=384)
    ap.add_argument("--pairs", type=int, default=6)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--workers", nargs="*", type=int, default=[0, 4])
    args = ap.parse_args()

    from lowlight_image_enhancement_tpu.data import Loader, SonySIDDataset
    from lowlight_image_enhancement_tpu.data.records import SidPackWriter

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        import json

        records = []
        for comp in ("none", "zlib", "zlib_band"):
            with SidPackWriter(f"{root}/{comp}_short.pack", comp=comp) as ws, \
                    SidPackWriter(f"{root}/{comp}_long.pack",
                                  comp=comp) as wl:
                for i in range(args.pairs):
                    img = rng.integers(0, 4096,
                                       (args.size, args.size, 3)
                                       ).astype(np.uint16)
                    key = f"p{i:05d}"
                    ws.add(key, (img // 100).astype(np.uint16))
                    wl.add(key, img)
                    if comp == "none":
                        records.append({
                            "pair_id": key, "subset": "train",
                            "short_key": key, "long_key": key,
                            "short_exposure": 0.1, "long_exposure": 10.0,
                            "exposure_ratio": 100.0,
                        })
        manifest = f"{root}/manifest.json"
        json.dump(records, open(manifest, "w"))

        print(f"frame {args.size}^2 uint16, patch {args.patch}, "
              f"batch {args.batch_size}")
        for comp in ("none", "zlib", "zlib_band"):
            ds = SonySIDDataset(
                manifest_path=manifest, subset="train", phase="train",
                patch_size=args.patch, samples_per_pair=64,
                io_backend={"type": "pack",
                            "short_path": f"{root}/{comp}_short.pack",
                            "long_path": f"{root}/{comp}_long.pack"},
            )
            for workers in args.workers:
                loader = Loader(ds, batch_size=args.batch_size,
                                shuffle=True, num_workers=workers)
                it = iter(loader)
                next(it)  # warm caches
                t0 = time.perf_counter()
                n = 0
                for batch in it:
                    n += 1
                    if n >= args.batches:
                        break
                dt = (time.perf_counter() - t0) / n
                print(f"  comp={comp:9s} workers={workers}: "
                      f"{dt * 1e3:7.1f} ms/batch "
                      f"({args.batch_size / dt:6.1f} img/s)", flush=True)


if __name__ == "__main__":
    main()
