#!/usr/bin/env python
"""Dataset sanity harness (reference ``tools/debug_dataset.py``): manifest /
ratio / pack sanity checks. Point at a real manifest+packs or run with
--synthetic to generate and verify the debug fixture set."""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def check(manifest_path: str, short_pack: str, long_pack: str,
          subset: str) -> None:
    from lowlight_image_enhancement_tpu.data import (
        Loader,
        SidPackReader,
        SonySIDDataset,
    )

    with open(manifest_path) as f:
        records = json.load(f)
    if isinstance(records, dict):
        records = records["pairs"]
    print(f"manifest: {len(records)} records, "
          f"subsets={sorted({r['subset'] for r in records})}")
    ratios = [r["exposure_ratio"] for r in records]
    print(f"exposure ratios: min={min(ratios):.1f} max={max(ratios):.1f}")

    with SidPackReader(short_pack) as rs, SidPackReader(long_pack) as rl:
        print(f"short pack: {len(rs)} keys; long pack: {len(rl)} keys")
        missing_s = [r["short_key"] for r in records
                     if r["subset"] == subset and r["short_key"] not in rs]
        missing_l = [r["long_key"] for r in records
                     if r["subset"] == subset and r["long_key"] not in rl]
        if missing_s or missing_l:
            print(f"MISSING: {len(missing_s)} shorts, {len(missing_l)} longs")
        else:
            print("all manifest keys present in packs")

    ds = SonySIDDataset(
        manifest_path=manifest_path, subset=subset, phase="train",
        patch_size=32,
        io_backend={"type": "pack", "short_path": short_pack,
                    "long_path": long_pack},
    )
    item = ds[0]
    print(f"item: lq{item['lq'].shape} gt{item['gt'].shape} "
          f"ratio={float(item['expo_ratio']):.1f} "
          f"lq range [{item['lq'].min():.3f}, {item['lq'].max():.3f}]")
    aligned_err = np.mean(np.abs(
        item["lq"] - np.clip(item["short_raw"] * float(item["expo_ratio"]),
                             0, 1)))
    print(f"lq == clip(short*ratio): err={aligned_err:.2e} "
          f"({'OK' if aligned_err < 1e-6 else 'FAIL'})")

    loader = Loader(ds, batch_size=2, shuffle=True)
    batch = next(iter(loader))
    print(f"batch: lq{batch['lq'].shape} expo{batch['expo_ratio'].shape} OK")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest")
    ap.add_argument("--short-pack")
    ap.add_argument("--long-pack")
    ap.add_argument("--subset", default="train")
    ap.add_argument("--synthetic", action="store_true")
    args = ap.parse_args()

    if args.synthetic:
        from lowlight_image_enhancement_tpu.data import make_debug_sid

        with tempfile.TemporaryDirectory() as root:
            paths = make_debug_sid(root, n_pairs=3)
            check(paths["manifest"], paths["train_short"],
                  paths["train_long"], "train")
        return
    if not (args.manifest and args.short_pack and args.long_pack):
        raise SystemExit("provide --manifest/--short-pack/--long-pack "
                         "or --synthetic")
    check(args.manifest, args.short_pack, args.long_pack, args.subset)


if __name__ == "__main__":
    main()
