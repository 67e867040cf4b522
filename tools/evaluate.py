#!/usr/bin/env python
"""Standalone evaluation CLI: run the full metric suite over a val/test set
and emit a JSON report (the user-facing surface of ``metrics/evaluation``).

Examples::

    # evaluate a trained checkpoint on the config's val set
    python tools/evaluate.py -opt configs/sid_newbp_mono.yml \
        --checkpoint experiments/SID_NewBP_Mono/models/net_g_latest \
        --output report.json

    # identity-model sanity pass over the hermetic debug set
    DEBUG_SID_ROOT=/tmp/debug_sid python tools/evaluate.py \
        -opt configs/debug/sid_newbp_mono_debug.yml --identity
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True)
    ap.add_argument("--checkpoint", default=None,
                    help="params checkpoint (orbax dir); default: config "
                         "path.pretrain_network_g")
    ap.add_argument("--split", default="val",
                    help="datasets.<split> block to evaluate")
    ap.add_argument("--output", default=None, help="JSON report path")
    ap.add_argument("--identity", action="store_true",
                    help="evaluate the identity model (pipeline sanity)")
    ap.add_argument("--lpips-net", default="vgg")
    ap.add_argument("--no-lpips", action="store_true")
    ap.add_argument("--max-batches", type=int, default=None)
    args = ap.parse_args()

    from lowlight_image_enhancement_tpu.data import (
        create_dataset,
        create_loader,
    )
    from lowlight_image_enhancement_tpu.metrics.evaluation import (
        compute_metrics,
    )
    from lowlight_image_enhancement_tpu.models import define_network
    from lowlight_image_enhancement_tpu.ops.psf import (
        build_psf_kernels,
        normalize_psf_energy,
    )
    from lowlight_image_enhancement_tpu.training import checkpoint as ckpt
    from lowlight_image_enhancement_tpu.training.config import parse
    from lowlight_image_enhancement_tpu.training.train_step import (
        make_eval_step,
    )

    opt = parse(args.opt, is_train=False)
    ds_opt = (opt.get("datasets") or {}).get(args.split)
    if ds_opt is None:
        raise SystemExit(f"config has no datasets.{args.split}")
    ds = create_dataset(ds_opt)
    loader = create_loader(ds, {**ds_opt, "phase": "val"})

    if args.identity:
        forward = lambda x: x
        model_desc = "identity"
    else:
        net = define_network(dict(opt["network_g"]))
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3)))
        params = variables["params"]
        checkpoint = args.checkpoint or (opt.get("path", {})
                                         or {}).get("pretrain_network_g")
        if checkpoint:
            params = ckpt.restore_network(checkpoint, params)
        eval_fn = make_eval_step(net)
        forward = lambda x: eval_fn(params, x)
        model_desc = f"{opt['network_g'].get('type')} @ {checkpoint}"

    # physics kernel for the consistency MAE, from the training config
    psf_kernel = None
    physics = ((opt.get("train", {}) or {}).get("hybrid_opt", {})
               or {}).get("physics")
    if physics:
        psf_kernel = normalize_psf_energy(build_psf_kernels(
            physics.get("mode", "mono"),
            physics.get("kernel_spec",
                        "P2" if physics.get("mode", "mono") == "mono"
                        else "B2"),
        ))

    results = compute_metrics(
        forward, loader,
        psf_kernel=psf_kernel,
        use_lpips=not args.no_lpips,
        lpips_net=args.lpips_net,
        max_batches=args.max_batches,
    )
    report = {
        "model": model_desc,
        "split": args.split,
        "dataset": ds_opt.get("name", args.split),
        "num_items": len(ds),
        "metrics": results,
    }
    text = json.dumps(report, indent=1)
    print(text)
    if args.output:
        with open(args.output, "w") as f:
            f.write(text)


if __name__ == "__main__":
    main()
