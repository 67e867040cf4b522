#!/usr/bin/env python
"""Export a trained model to an AOT serving artifact (StableHLO).

Counterpart of the reference's deploy-by-shipping-``.pth`` flow
(``basicsr/demo.py:18-59`` rebuilds the torch graph in-process); here the
artifact is the compiled-shape program itself — see
``lowlight_image_enhancement_tpu/export.py`` for the format.

Usage::

    python tools/export_serving.py -opt configs/sid_newbp_mono.yml \
        --out exported/ --buckets 256,512 [--batch 1] \
        [--platforms tpu,cpu] [--smoke]

``--buckets`` lists square sides (``256,512``) or explicit ``HxW`` pairs
(``256x320,512x512``). ``--smoke`` reloads the artifact and checks one
prediction against the live forward.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _parse_buckets(spec: str):
    out = []
    for tok in spec.split(","):
        tok = tok.strip().lower()
        if not tok:
            continue
        if "x" in tok:
            h, w = tok.split("x")
            out.append((int(h), int(w)))
        else:
            out.append((int(tok), int(tok)))
    if not out:
        raise ValueError(f"no buckets in {spec!r}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-opt", required=True, help="network/eval yaml")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--buckets", default="256,512")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--platforms", default="tpu,cpu")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the export over an N-device data mesh "
                         "(0 = unsharded single-device artifact)")
    ap.add_argument("--smoke", action="store_true",
                    help="reload the artifact and parity-check vs live jit")
    args = ap.parse_args()

    import jax
    import numpy as np

    from lowlight_image_enhancement_tpu.export import (
        ExportedModel,
        export_model,
    )
    from lowlight_image_enhancement_tpu.models import define_network
    from lowlight_image_enhancement_tpu.training import checkpoint as ckpt
    from lowlight_image_enhancement_tpu.training.config import parse

    opt = parse(args.opt, is_train=False)
    network_opt = dict(opt["network_g"])
    net = define_network(dict(network_opt))
    import jax.numpy as jnp

    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = variables["params"]
    pretrain = (opt.get("path", {}) or {}).get("pretrain_network_g")
    if pretrain:
        params = ckpt.restore_network(pretrain, params)

    buckets = _parse_buckets(args.buckets)
    platforms = [p.strip() for p in args.platforms.split(",") if p.strip()]
    mesh = None
    if args.mesh:
        mesh = jax.make_mesh((args.mesh,), ("data",))
        if args.batch % args.mesh:
            raise SystemExit(
                f"--batch {args.batch} must be divisible by --mesh "
                f"{args.mesh}")
    export_model(net, params, args.out, buckets=buckets, batch=args.batch,
                 platforms=platforms, network_opt=network_opt, mesh=mesh)
    sizes = {
        f: os.path.getsize(os.path.join(args.out, f))
        for f in sorted(os.listdir(args.out))
    }
    total_mb = sum(sizes.values()) / 1e6
    print(f"exported {len(buckets)} bucket(s) -> {args.out} "
          f"({total_mb:.1f} MB): "
          + ", ".join(f"{f} {s/1e6:.1f}MB" for f, s in sizes.items()))

    if args.smoke:
        model = ExportedModel(args.out)
        h, w = model.buckets[0]
        rng = np.random.default_rng(0)
        img = rng.uniform(0, 1, (h - 3, w - 5, 3)).astype(np.float32)
        got = model.predict(img)
        x = np.zeros((args.batch, h, w, 3), np.float32)
        x[0, : img.shape[0], : img.shape[1]] = img
        want = np.asarray(
            jnp.clip(net.apply({"params": params}, jnp.asarray(x)), 0, 1)
        )[0, : img.shape[0], : img.shape[1]]
        err = float(np.max(np.abs(got - want)))
        print(f"smoke: max|exported - live| = {err:.3e}")
        if err > 1e-5:
            raise SystemExit("smoke FAILED (tolerance 1e-5)")


if __name__ == "__main__":
    main()
