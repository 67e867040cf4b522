#!/usr/bin/env python
"""End-to-end input-pipeline demonstration: wall vs device steps/s.

Answers "can the input pipeline keep the chip busy?" with one measured
run (round-2 VERDICT #3). Protocol:

1. Build a synthetic SID pack on disk (uint16 frames, banded-zlib
   compression — the production decode path, ``data/records.py``).
2. Measure three rates in ONE process, sequentially:
   - ``loader_only``: Loader(num_workers=W) + random 384^2 crops, host
     only — the host's ceiling (items/s -> steps/s at batch 2);
   - ``device_only``: the no-perc hybrid train step on one
     device-resident batch, data-chained — the chip's ceiling;
   - ``end_to_end``: Loader -> prefetch_to_device -> train step — the
     wall rate users see.
3. Report ``wall/device`` and ``wall/min(host, device)`` (overlap
   efficiency). On a multi-core host wall -> min(host, device); on this
   1-core tunnel host the breakdown quantifies how much of the gap is the
   host's decode ceiling vs framework overhead.

Mirrors the intent of the reference CUDAPrefetcher
(``prefetch_dataloader.py:111-128``): decode on host workers, transfer
async, compute never waits on the transfer.

NOTE (axon tunnel): every host->device transfer leaks one host staging
copy (BASELINE.md); at 384^2 b2 that is ~18 MB/step, so --steps is kept
moderate by default. Run this tool alone (1-core host: any concurrent
process inflates step time ~4x).

Usage: python tools/train_pipeline_e2e.py [--steps 100] [--workers 2]
       [--pairs 8] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def build_pack(root: str, pairs: int, size: int, comp: str) -> str:
    from lowlight_image_enhancement_tpu.data.records import SidPackWriter

    rng = np.random.default_rng(0)
    records = []
    with SidPackWriter(f"{root}/short.pack", comp=comp) as ws, \
            SidPackWriter(f"{root}/long.pack", comp=comp) as wl:
        for i in range(pairs):
            img = rng.integers(0, 4096, (size, size, 3)).astype(np.uint16)
            key = f"p{i:05d}"
            ws.add(key, (img // 100).astype(np.uint16))
            wl.add(key, img)
            records.append({
                "pair_id": key, "subset": "train",
                "short_key": key, "long_key": key,
                "short_exposure": 0.1, "long_exposure": 10.0,
                "exposure_ratio": 100.0,
            })
    manifest = f"{root}/manifest.json"
    json.dump(records, open(manifest, "w"))
    return manifest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--patch", type=int, default=384)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--pairs", type=int, default=8)
    ap.add_argument("--frame-size", type=int, default=512)
    ap.add_argument("--comp", default="zlib_band")
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from lowlight_image_enhancement_tpu.data import Loader, SonySIDDataset
    from lowlight_image_enhancement_tpu.data.pipeline import (
        epochs,
        prefetch_to_device,
    )
    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.models import create_newbp_net
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.training import (
        create_train_state,
        make_optimizer,
        make_schedule,
        make_train_step,
    )

    with tempfile.TemporaryDirectory() as root:
        manifest = build_pack(root, args.pairs, args.frame_size, args.comp)
        ds = SonySIDDataset(
            manifest, subset="train", phase="train",
            patch_size=args.patch, samples_per_pair=64,
            random_crop=True, use_augment=True,
            io_backend={"type": "pack",
                        "short_path": f"{root}/short.pack",
                        "long_path": f"{root}/long.pack"},
        )
        loader = Loader(ds, batch_size=args.batch_size, shuffle=True,
                        num_workers=args.workers)

        # --- 1. host-only ceiling ---
        n_host = min(args.steps, 48)
        it = epochs(loader)
        next(it)  # warm caches / open packs
        t0 = time.perf_counter()
        for _ in range(n_host):
            next(it)
        host_sps = n_host / (time.perf_counter() - t0)

        # --- 2. device-only ceiling (chained, one resident batch) ---
        net = create_newbp_net(
            nafnet_params=dict(img_channel=3, width=32,
                               enc_blk_nums=(2, 2, 4, 8),
                               middle_blk_num=12,
                               dec_blk_nums=(2, 2, 2, 2)),
            dtype=jnp.bfloat16)
        loss = HybridLossPlus(
            use_perc=False, use_deltaE=True, use_ssim=False,
            physics_psf_module=create_crosstalk_psf("mono", "P2"))
        tx = make_optimizer(make_schedule(
            {"type": "TrueCosineAnnealingLR", "T_max": 300000,
             "eta_min": 1e-6}, base_lr=5e-4))
        state = create_train_state(net, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)), loss=loss)
        step = make_train_step(net, loss, tx, donate=False)

        first = next(epochs(loader))
        dev_batch = {k: jnp.asarray(v) for k, v in first.items()
                     if k not in ("pair_id", "key")}
        for _ in range(3):
            state, logs = step(state, dev_batch)
        jax.block_until_ready(logs["l_total"])
        n_dev = min(args.steps, 60)
        t0 = time.perf_counter()
        for _ in range(n_dev):
            state, logs = step(state, dev_batch)
        jax.block_until_ready(logs["l_total"])
        dev_sps = n_dev / (time.perf_counter() - t0)

        # --- 3. end-to-end: loader -> prefetch -> step ---
        stream = prefetch_to_device(epochs(loader), size=2)
        state2 = create_train_state(net, tx, jax.random.PRNGKey(1),
                                    jnp.zeros((1, 64, 64, 3)), loss=loss)
        for _ in range(2):  # warmup (already-compiled step)
            state2, logs = step(state2, next(stream))
        jax.block_until_ready(logs["l_total"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state2, logs = step(state2, next(stream))
        jax.block_until_ready(logs["l_total"])
        wall_sps = args.steps / (time.perf_counter() - t0)

    bytes_per_item = 2 * (args.frame_size ** 2) * 3 * 2  # short+long u16
    result = {
        "protocol": {
            "patch": args.patch, "batch_size": args.batch_size,
            "frame_size": args.frame_size, "comp": args.comp,
            "workers": args.workers, "steps": args.steps,
            "nproc": os.cpu_count(),
        },
        "host_only_steps_per_sec": round(host_sps, 3),
        "host_only_items_per_sec": round(host_sps * args.batch_size, 2),
        "host_decoded_mb_per_sec": round(
            host_sps * args.batch_size * bytes_per_item / 1e6, 1),
        "device_only_steps_per_sec": round(dev_sps, 3),
        "end_to_end_steps_per_sec": round(wall_sps, 3),
        "wall_over_device": round(wall_sps / dev_sps, 4),
        "wall_over_bound": round(wall_sps / min(host_sps, dev_sps), 4),
        "bound": "host" if host_sps < dev_sps else "device",
    }
    print(json.dumps(result, indent=2))
    if args.json:
        json.dump(result, open(args.json, "w"), indent=2)


if __name__ == "__main__":
    main()
