#!/usr/bin/env python
"""Build the SID pair manifest (reference ``tools/prepare_sid_manifest.py``).

Scans ``{root}/short`` and ``{root}/long`` for PNGs named
``<pair_id>_<exposure><s|ms>.png`` (the SID convention, e.g.
``00001_00_0.1s.png``), pairs them by id, computes exposure ratios, applies
a seeded random train/val/test split (or an explicit split file), and
writes JSON records ``{pair_id, subset, short_key, long_key,
short_exposure, long_exposure, exposure_ratio}``.
"""

from __future__ import annotations

import argparse
import json
import os
import re
from collections import defaultdict

import numpy as np

EXPOSURE_RE = re.compile(r"(\d+(\.\d+)?)(s|ms)$")


def parse_exposure(stem: str) -> float:
    """Exposure seconds from a filename stem (reference regex
    ``sony_sid_dataset.py:25``)."""
    m = EXPOSURE_RE.search(stem)
    if not m:
        raise ValueError(f"no exposure suffix in {stem!r}")
    val = float(m.group(1))
    return val / 1000.0 if m.group(3) == "ms" else val


def pair_id_of(stem: str) -> str:
    """Leading id segment (before the first underscore group)."""
    return stem.split("_")[0]


def scan_split(root: str, sub: str):
    out = {}
    d = os.path.join(root, sub)
    if not os.path.isdir(d):
        raise FileNotFoundError(d)
    for name in sorted(os.listdir(d)):
        if not name.lower().endswith(".png"):
            continue
        stem = name[:-4]
        out.setdefault(pair_id_of(stem), []).append(stem)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True,
                    help="directory containing short/ and long/ PNGs")
    ap.add_argument("--output", required=True, help="manifest JSON path")
    ap.add_argument("--val-fraction", type=float, default=0.1)
    ap.add_argument("--test-fraction", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--split-file", default=None,
                    help="optional JSON {pair_id: subset} overriding the "
                         "random split")
    args = ap.parse_args()

    shorts = scan_split(args.root, "short")
    longs = scan_split(args.root, "long")
    ids = sorted(set(shorts) & set(longs))
    if not ids:
        raise SystemExit("no matched short/long pairs found")

    explicit = {}
    if args.split_file:
        with open(args.split_file) as f:
            explicit = json.load(f)

    rng = np.random.default_rng(args.seed)
    order = rng.permutation(len(ids))
    n_val = int(len(ids) * args.val_fraction)
    n_test = int(len(ids) * args.test_fraction)
    subset_of = {}
    for rank, idx in enumerate(order):
        pid = ids[idx]
        if rank < n_val:
            subset_of[pid] = "val"
        elif rank < n_val + n_test:
            subset_of[pid] = "test"
        else:
            subset_of[pid] = "train"
    subset_of.update(explicit)

    records = []
    for pid in ids:
        long_stem = longs[pid][0]
        long_exp = parse_exposure(long_stem)
        for short_stem in shorts[pid]:
            short_exp = parse_exposure(short_stem)
            records.append({
                "pair_id": f"{pid}:{short_stem}",
                "subset": subset_of[pid],
                "short_key": short_stem,
                "long_key": long_stem,
                "short_exposure": short_exp,
                "long_exposure": long_exp,
                "exposure_ratio": long_exp / max(short_exp, 1e-12),
            })

    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "w") as f:
        json.dump(records, f, indent=1)
    counts = defaultdict(int)
    for r in records:
        counts[r["subset"]] += 1
    print(f"wrote {len(records)} records to {args.output}: {dict(counts)}")


if __name__ == "__main__":
    main()
