#!/usr/bin/env python
"""Matched-budget quality A/B: reference-parity NAFNet vs NAFNetTPU.

Round-2 validation item (VERDICT r1 weak #5 / next #5): train both
architectures with the IDENTICAL reference recipe (384^2 crops, AdamW
5e-4 cosine, bf16, hybrid loss L1 + deltaE00 + phys) on the same
realistic synthetic SID set (``make_synthetic_sid``: natural-image longs,
SID-magnitude ratios, signal-dependent short noise) for the same step
budget, then evaluate PSNR / SSIM / LPIPS / deltaE00 / phys-consistency
on the held-out val split.

Usage (defaults reproduce the BASELINE.md table)::

    python tools/quality_ab.py --steps 5000 --out quality_ab.json

The result JSON carries the full protocol; BASELINE.md quotes it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ARCHS = {
    "nafnet_w32": {
        "type": "NewBPNAFNet",
        "in_channels": 3,
        "kernel_type": "panchromatic",
        "kernel_spec": "P2",
        "nafnet_params": {
            "img_channel": 3, "width": 32,
            "enc_blk_nums": [2, 2, 4, 8], "middle_blk_num": 12,
            "dec_blk_nums": [2, 2, 2, 2],
        },
    },
    "nafnet_tpu_w64": {
        "type": "NAFNetTPU",
        "width": 32,
        "enc_blk_nums": [2, 2, 4, 8], "middle_blk_num": 12,
        "dec_blk_nums": [2, 2, 2, 2],
    },
}


def build_opt(name, net_opt, data_root, workdir, steps, batch, crop,
              seed=7):
    return {
        "name": f"quality_ab_{name}",
        "model_type": "ImageRestorationModel",
        "is_train": True,
        "manual_seed": seed,
        "datasets": {
            "train": {
                "name": "synth-train", "type": "SonySIDDataset",
                "phase": "train",
                "manifest_path": f"{data_root}/manifest_sid_synth.json",
                "subset": "train", "patch_size": crop,
                "samples_per_pair": 4, "random_crop": True,
                "batch_size_per_gpu": batch,
                "num_worker_per_gpu": 4,
                "io_backend": {
                    "type": "pack",
                    "short_path": f"{data_root}/train_short.pack",
                    "long_path": f"{data_root}/train_long.pack",
                },
            },
            "val": {
                "name": "synth-val", "type": "SonySIDDataset",
                "phase": "val", "subset": "val",
                "manifest_path": f"{data_root}/manifest_sid_synth.json",
                "random_crop": False, "samples_per_pair": 1,
                "patch_size": crop,
                "batch_size_per_gpu": 1,
                "io_backend": {
                    "type": "pack",
                    "short_path": f"{data_root}/val_short.pack",
                    "long_path": f"{data_root}/val_long.pack",
                },
            },
        },
        "network_g": net_opt,
        "path": {
            "models": os.path.join(workdir, name, "models"),
            "training_states": os.path.join(workdir, name, "states"),
            "log": os.path.join(workdir, name, "log"),
            "visualization": os.path.join(workdir, name, "vis"),
        },
        "train": {
            "total_iter": steps,
            "warmup_iter": -1,
            "enable_amp": True,            # bf16 on TPU
            "optim_g": {"type": "AdamW", "lr": 5.0e-4,
                        "betas": [0.9, 0.9], "weight_decay": 0.0},
            "scheduler": {"type": "TrueCosineAnnealingLR",
                          "T_max": steps, "eta_min": 1.0e-6},
            "use_grad_clip": True,
            "hybrid_opt": {
                "type": "HybridLossPlus",
                "use_perc": False,          # no pretrained VGG in-image
                "use_lpips": False,
                "use_deltaE": True, "use_ssim": False, "use_phys": True,
                "w_l1_raw": 1.0, "w_deltaE": 0.02, "w_phys": 0.10,
                "physics": {"mode": "mono", "kernel_spec": "P2"},
            },
        },
        "logger": {"print_freq": max(steps // 10, 1),
                   "save_checkpoint_freq": steps},
        "val": {
            "val_freq": 0,
            "metrics": {
                "psnr": {"type": "linear_psnr", "data_range": 1.0},
                "ssim": {"type": "linear_ssim", "data_range": 1.0},
                "deltae": {"type": "deltae2000_mean"},
            },
        },
    }


def evaluate_full(trainer, opt):
    """Val metrics incl. phys-consistency (needs the short observation,
    which the (sr, gt) metric reflection can't see) and LPIPS (random-init
    trunk when no converted weights ship: self-consistent across archs,
    absolute values not publication-comparable — flagged in the result)."""
    import jax.numpy as jnp
    import numpy as np

    from lowlight_image_enhancement_tpu.metrics.phys_consistency import (
        phys_cons_srgb,
    )
    from lowlight_image_enhancement_tpu.models.lpips import load_lpips
    from lowlight_image_enhancement_tpu.ops.psf import (
        build_psf_kernels,
        normalize_psf_energy,
    )
    from lowlight_image_enhancement_tpu.training.validation import (
        compute_metrics,
    )

    lpips_mod, lpips_vars, lpips_pretrained = load_lpips(net="alex")
    kernel = normalize_psf_energy(build_psf_kernels("mono", "P2"))
    params = trainer.state.params
    metrics_opt = opt["val"]["metrics"]
    sums, n = {}, 0
    for batch in trainer.val_loader:
        sr = trainer.eval_fn(params, jnp.asarray(batch["lq"]))
        gt = jnp.asarray(batch["gt"])
        per = compute_metrics(sr, gt, metrics_opt)
        per["lpips"] = float(jnp.mean(lpips_mod.apply(
            lpips_vars, jnp.clip(sr, 0, 1) * 2 - 1, gt * 2 - 1)))
        # model-faithful direction (reference phys_consistency.py:229-236):
        # rho*(K*Bhat) ~ A with rho = short/long exposure quotient, i.e.
        # the INVERSE of the dataset's alignment ratio.
        rho = 1.0 / jnp.asarray(batch["expo_ratio"]).reshape(-1)
        per["phys_mae"] = float(phys_cons_srgb(
            jnp.clip(sr, 0, 1), jnp.asarray(batch["short_obs"]), kernel,
            rho))
        for k, v in per.items():
            sums[k] = sums.get(k, 0.0) + v
        n += 1
    out = {k: v / n for k, v in sums.items()}
    out["lpips_pretrained"] = bool(lpips_pretrained)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--crop", type=int, default=384)
    ap.add_argument("--archs", nargs="*", default=list(ARCHS))
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n-train", type=int, default=32)
    ap.add_argument("--out", default="quality_ab.json")
    args = ap.parse_args()

    from lowlight_image_enhancement_tpu.data.debug_fixtures import (
        make_synthetic_sid,
    )
    from lowlight_image_enhancement_tpu.training.trainer import Trainer

    data_root = args.data_root or os.path.join(
        tempfile.gettempdir(), f"sid_synth_{args.size}_{args.n_train}")
    manifest = os.path.join(data_root, "manifest_sid_synth.json")
    if not os.path.exists(manifest):
        print(f"generating synthetic SID set at {data_root} ...",
              flush=True)
        make_synthetic_sid(data_root, n_train=args.n_train,
                           size=args.size)

    results = {"protocol": {
        "steps": args.steps, "batch": args.batch, "crop": args.crop,
        "data": f"make_synthetic_sid(n_train={args.n_train}, "
                f"size={args.size}, ratios=100/250/300, seed=0)",
        "recipe": "AdamW 5e-4 cosine->1e-6, bf16, grad-clip, "
                  "hybrid L1+deltaE00+phys (reference "
                  "configs/colab/sid_newbp_mono.yml:65-96)",
    }, "archs": {}}
    if len(args.archs) > 1:
        # One architecture per process: the hosted TPU tunnel leaks one
        # host staging copy per host->device transfer (~batch_bytes/step,
        # see BASELINE.md "Host-environment caveat"), so a single process
        # running several 5k-step trainings OOMs the host.
        import subprocess

        for name in args.archs:
            sub_out = f"{args.out}.{name}.json"
            cmd = [sys.executable, os.path.abspath(__file__),
                   "--steps", str(args.steps), "--batch", str(args.batch),
                   "--crop", str(args.crop), "--archs", name,
                   "--data-root", data_root, "--size", str(args.size),
                   "--n-train", str(args.n_train), "--out", sub_out]
            rc = subprocess.run(cmd).returncode
            if rc != 0:
                raise SystemExit(f"{name} sub-run failed rc={rc}")
            with open(sub_out) as f:
                results["archs"][name] = json.load(f)["archs"][name]
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results))
        return

    workdir = tempfile.mkdtemp(prefix="quality_ab_")
    for name in args.archs:
        opt = build_opt(name, ARCHS[name], data_root, workdir,
                        args.steps, args.batch, args.crop)
        print(f"=== training {name} for {args.steps} steps ===", flush=True)
        t0 = time.time()
        trainer = Trainer(opt)
        trainer.train()
        wall = time.time() - t0
        metrics = evaluate_full(trainer, opt)
        metrics = {k: (float(v) if not isinstance(v, bool) else v)
                   for k, v in metrics.items()}
        results["archs"][name] = {
            "metrics": metrics,
            "wall_s": round(wall, 1),
            "steps_per_sec_wall": round(args.steps / wall, 2),
        }
        print(f"{name}: {json.dumps(results['archs'][name])}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
