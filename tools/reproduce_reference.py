#!/usr/bin/env python
"""Reference-reproduction harness: the ±0.05 dB parity table, one command.

Runs the reference protocol end-to-end on BOTH frameworks over the SAME
val items and emits the BASELINE.md parity table (VERDICT r1 next #9):

* **reference side** — the reference's own torch ``NAFNet``
  (``/root/reference/NAFNet_base/basicsr/models/archs/NAFNet_arch.py``,
  executed read-only in place, never copied) with a reference ``.pth``
  checkpoint when given (``--torch-checkpoint``; ``params``-key unwrap +
  ``module.``-prefix strip per ``base_model.py:262-287``), else a
  seed-initialized net.
* **TPU side** — this framework's Flax NAFNet, with either an orbax
  checkpoint (``--jax-checkpoint``: compares independently trained runs)
  or, by default, the torch net's own weights converted via
  ``tools/convert_torch_nafnet.py`` (isolates *framework* deltas at
  matched weights — the harness's self-check mode).

Both sides are scored with the identical metric implementations
(``metrics/evaluation.compute_metrics``: linear PSNR/SSIM, RGB-PSNR,
ΔE00 mean/p95, edge-ΔE00, LPIPS, phys-consistency MAE — the reference
protocol, ``configs/colab/sid_newbp_mono.yml:102-115``), so the table
compares models, not metric reimplementations. Parity targets from
``BASELINE.md``: ±0.05 dB PSNR, ±0.001 SSIM/LPIPS.

Dry-runnable today with zero external data (the VERDICT "done" bar)::

    python tools/reproduce_reference.py --dry-run

Real reproduction, once a SID root and a trained reference checkpoint
are mounted::

    python tools/reproduce_reference.py -opt configs/sid_newbp_mono.yml \
        --torch-checkpoint /path/to/net_g_300000.pth \
        --jax-checkpoint experiments/SID_NewBP_Mono/models/net_g_latest \
        --out repro_report.json --markdown parity_table.md
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import tempfile
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_ROOT = os.environ.get("LLIE_REFERENCE_ROOT", "/root/reference")
_ARCHS = "NAFNet_base/basicsr/models/archs"

# metric -> (absolute tolerance, unit) for the pass/fail column; None =
# informational only (no published target in BASELINE.md).
PARITY_TARGETS = {
    "psnr": (0.05, "dB"),
    "ssim": (0.001, ""),
    "lpips": (0.001, ""),
}


def load_reference_nafnet():
    """Import the reference torch NAFNet in place with a stubbed package
    chain (its parent package drags optional heavy deps like lmdb)."""
    import torch  # noqa: F401  (fail fast if torch missing)

    for name in ("basicsr", "basicsr.models", "basicsr.models.archs",
                 "basicsr.utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["basicsr.utils"].get_root_logger = (
        lambda *a, **k: __import__("logging").getLogger("stub")
    )

    def load(fname, modname):
        path = os.path.join(REFERENCE_ROOT, _ARCHS, fname)
        spec = importlib.util.spec_from_file_location(modname, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[modname] = mod
        spec.loader.exec_module(mod)
        return mod

    load("arch_util.py", "basicsr.models.archs.arch_util")
    load("local_arch.py", "basicsr.models.archs.local_arch")
    arch = load("NAFNet_arch.py", "basicsr.models.archs.NAFNet_arch")
    return arch.NAFNet


def load_torch_checkpoint(path):
    """Reference checkpoint load semantics (``base_model.py:262-287``):
    unwrap a ``params``/``params_ema`` key, strip ``module.`` prefixes."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    for key in ("params", "params_ema", "state_dict"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
            break
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in sd.items()}


def make_torch_forward(net):
    """NCHW no-grad fp32 forward over NHWC numpy batches."""
    import torch

    net.eval()

    def forward(lq):
        import numpy as np

        x = torch.from_numpy(
            np.transpose(np.asarray(lq, dtype=np.float32), (0, 3, 1, 2)))
        with torch.no_grad():
            y = net(x)
        return np.transpose(y.numpy(), (0, 2, 3, 1))

    return forward


def build_table(ref_metrics, jax_metrics, mode):
    rows = []
    for key in sorted(set(ref_metrics) | set(jax_metrics)):
        r, j = ref_metrics.get(key), jax_metrics.get(key)
        delta = None if (r is None or j is None) else j - r
        target = PARITY_TARGETS.get(key)
        status = "—"
        if target and delta is not None:
            status = "PASS" if abs(delta) <= target[0] else "FAIL"
        rows.append({
            "metric": key, "reference_torch": r, "tpu_jax": j,
            "delta": delta,
            "target": (f"±{target[0]} {target[1]}".strip()
                       if target else None),
            "status": status,
        })
    return rows


def table_markdown(rows, mode):
    lines = [
        "| Metric | Reference (torch) | TPU rebuild (JAX) | Δ (jax−torch)"
        " | Target | Status |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        fmt = lambda v: "—" if v is None else f"{v:.5f}"
        lines.append(
            f"| {r['metric']} | {fmt(r['reference_torch'])} | "
            f"{fmt(r['tpu_jax'])} | {fmt(r['delta'])} | "
            f"{r['target'] or '—'} | {r['status']} |")
    lines.append("")
    lines.append(
        f"*Mode: {mode}. Both columns scored by the same metric "
        "implementations over the same items; Δ isolates the model/"
        "framework difference.*")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", default=None, help="framework config (yaml); "
                    "its datasets.<split> block supplies the data")
    ap.add_argument("--split", default="val")
    ap.add_argument("--torch-checkpoint", default=None,
                    help="reference .pth (params-key/module.-prefix aware)")
    ap.add_argument("--jax-checkpoint", default=None,
                    help="orbax network checkpoint; default: convert the "
                         "torch net's weights (framework-delta mode)")
    ap.add_argument("--dry-run", action="store_true",
                    help="hermetic self-check on a generated synthetic SID "
                         "set with a tiny NAFNet — no external data")
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--no-lpips", action="store_true")
    ap.add_argument("--out", default="repro_report.json")
    ap.add_argument("--markdown", default=None,
                    help="also write the markdown parity table here")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from convert_torch_nafnet import convert_state_dict, flat_to_tree
    from lowlight_image_enhancement_tpu.data import (
        create_dataset,
        create_loader,
    )
    from lowlight_image_enhancement_tpu.metrics.evaluation import (
        compute_metrics,
    )
    from lowlight_image_enhancement_tpu.models.nafnet import NAFNet
    from lowlight_image_enhancement_tpu.ops.psf import (
        build_psf_kernels,
        normalize_psf_energy,
    )
    from lowlight_image_enhancement_tpu.training import checkpoint as ckpt
    from lowlight_image_enhancement_tpu.training.train_step import (
        make_eval_step,
    )

    if args.dry_run:
        nafnet_kw = dict(width=8, enc_blk_nums=(1, 1), middle_blk_num=1,
                         dec_blk_nums=(1, 1))
        root = os.path.join(tempfile.gettempdir(), "repro_ref_dryrun")
        manifest = os.path.join(root, "manifest_sid_synth.json")
        if not os.path.exists(manifest):
            from lowlight_image_enhancement_tpu.data.debug_fixtures import (
                make_synthetic_sid,
            )

            make_synthetic_sid(root, n_train=2, n_val=4, size=96)
        ds_opt = {
            "name": "repro-dryrun", "type": "SonySIDDataset",
            "phase": "val", "subset": "val", "manifest_path": manifest,
            "random_crop": False, "samples_per_pair": 1, "patch_size": 96,
            "batch_size_per_gpu": 1,
            "io_backend": {
                "type": "pack",
                "short_path": os.path.join(root, "val_short.pack"),
                "long_path": os.path.join(root, "val_long.pack"),
            },
        }
        physics = {"mode": "mono", "kernel_spec": "P2"}
    else:
        if not args.opt:
            raise SystemExit("need -opt (or --dry-run)")
        from lowlight_image_enhancement_tpu.training.config import parse

        opt = parse(args.opt, is_train=False)
        ds_opt = (opt.get("datasets") or {}).get(args.split)
        if ds_opt is None:
            raise SystemExit(f"config has no datasets.{args.split}")
        np_ = opt["network_g"].get("nafnet_params", opt["network_g"])
        nafnet_kw = dict(
            width=np_.get("width", 32),
            enc_blk_nums=tuple(np_.get("enc_blk_nums", (2, 2, 4, 8))),
            middle_blk_num=np_.get("middle_blk_num", 12),
            dec_blk_nums=tuple(np_.get("dec_blk_nums", (2, 2, 2, 2))),
        )
        physics = ((opt.get("train", {}) or {}).get("hybrid_opt", {})
                   or {}).get("physics")

    ds = create_dataset(ds_opt)
    loader_opt = {**ds_opt, "phase": "val"}

    psf_kernel = None
    if physics:
        psf_kernel = normalize_psf_energy(build_psf_kernels(
            physics.get("mode", "mono"), physics.get("kernel_spec", "P2")))

    # ---- reference side: torch NAFNet, executed from /root/reference ----
    TorchNAFNet = load_reference_nafnet()
    torch.manual_seed(0)
    tnet = TorchNAFNet(
        img_channel=3, width=nafnet_kw["width"],
        enc_blk_nums=list(nafnet_kw["enc_blk_nums"]),
        middle_blk_num=nafnet_kw["middle_blk_num"],
        dec_blk_nums=list(nafnet_kw["dec_blk_nums"]),
    )
    if args.torch_checkpoint:
        tnet.load_state_dict(load_torch_checkpoint(args.torch_checkpoint))
        torch_desc = f"reference NAFNet @ {args.torch_checkpoint}"
    else:
        torch_desc = "reference NAFNet (seed-0 init; no checkpoint given)"
    ref_metrics = compute_metrics(
        make_torch_forward(tnet), create_loader(ds, loader_opt),
        psf_kernel=psf_kernel, use_lpips=not args.no_lpips,
        max_batches=args.max_batches)

    # ---- TPU side: Flax NAFNet ----
    jnet = NAFNet(img_channel=3, dtype=jnp.float32, **nafnet_kw)
    if args.jax_checkpoint:
        params = jnet.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))["params"]
        params = ckpt.restore_network(args.jax_checkpoint, params)
        jax_desc = f"Flax NAFNet @ {args.jax_checkpoint}"
        mode = "independent checkpoints (end-to-end reproduction)"
    else:
        params = flat_to_tree(convert_state_dict(tnet.state_dict()))
        params = jax.tree.map(jnp.asarray, params)
        jax_desc = "Flax NAFNet (converted from the torch net's weights)"
        mode = ("matched weights (framework-delta self-check; Δ must be "
                "~0)")
    eval_fn = make_eval_step(jnet)
    jax_metrics = compute_metrics(
        lambda lq: eval_fn(params, jnp.asarray(np.asarray(lq))),
        create_loader(ds, loader_opt),
        psf_kernel=psf_kernel, use_lpips=not args.no_lpips,
        max_batches=args.max_batches)

    rows = build_table(ref_metrics, jax_metrics, mode)
    report = {
        "mode": mode,
        "reference_model": torch_desc,
        "tpu_model": jax_desc,
        "dataset": ds_opt.get("name"),
        "num_items": len(ds),
        "table": rows,
        "parity_targets": {k: v[0] for k, v in PARITY_TARGETS.items()},
    }
    md = table_markdown(rows, mode)
    print(md)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    if args.markdown:
        with open(args.markdown, "w") as f:
            f.write(md + "\n")
    worst = [r for r in rows if r["status"] == "FAIL"]
    print(f"\nwrote {args.out}; "
          + ("ALL PARITY TARGETS MET" if not worst else
             f"{len(worst)} metric(s) outside target: "
             + ", ".join(r["metric"] for r in worst)))


if __name__ == "__main__":
    main()
