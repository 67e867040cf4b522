#!/usr/bin/env python
"""One-command pretrained-weights provisioning (run on an egress host).

The runtime image this framework is developed in has no network egress and
no torchvision/lpips checkpoint caches, so the ImageNet VGG19 trunk
(perceptual loss, ``NewBP_model/losses.py:32-69``) and the LPIPS v0.1
heads (``metrics/lpips_metric.py:96-150``) cannot be provisioned there —
the framework falls back to documented deterministic-random features.

On any machine WITH egress (and torch + torchvision [+ lpips, optional]):

    python tools/fetch_pretrained_weights.py --dest lowlight_image_enhancement_tpu/weights

downloads the official checkpoints, runs the repo's converters
(``convert_vgg_weights.py`` / ``convert_lpips_weights.py``), and drops

    vgg19_features.npz   (perceptual loss; auto-discovered by models/vgg.py)
    lpips_alex.npz       (LPIPS metric, default net)
    lpips_vgg.npz        (LPIPS metric, vgg net)

into ``--dest``. Copy that directory to the TPU host and everything that
was "partial: weights not shipped" becomes reference-equivalent — the
loaders already search that path (no flags needed), and the converters'
numerics are pinned by tests/test_perceptual_torch_parity.py and
tests/test_weight_converters.py.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run(args: list) -> bool:
    print("+", " ".join(args), flush=True)
    return subprocess.call(args) == 0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dest",
        default=os.path.join(HERE, "..", "lowlight_image_enhancement_tpu",
                             "weights"),
        help="output directory (default: the package weights/ dir, where "
             "loaders auto-discover the npz files)")
    ap.add_argument("--skip-lpips", action="store_true",
                    help="only fetch VGG19 (lpips package not installed)")
    args = ap.parse_args()
    dest = os.path.abspath(args.dest)
    os.makedirs(dest, exist_ok=True)

    failures = []

    vgg_out = os.path.join(dest, "vgg19_features.npz")
    if not run([sys.executable, os.path.join(HERE, "convert_vgg_weights.py"),
                "--output", vgg_out]):
        failures.append("vgg19 (needs torchvision + egress)")

    if not args.skip_lpips:
        for net in ("alex", "vgg"):
            out = os.path.join(dest, f"lpips_{net}.npz")
            if not run([sys.executable,
                        os.path.join(HERE, "convert_lpips_weights.py"),
                        "--net", net, "--output", out]):
                failures.append(f"lpips_{net} (needs the lpips package)")

    print()
    for name in sorted(os.listdir(dest)):
        if name.endswith(".npz"):
            path = os.path.join(dest, name)
            print(f"  {name}: {os.path.getsize(path) / 1e6:.1f} MB")
    if failures:
        print("\nFAILED:", "; ".join(failures))
        sys.exit(1)
    print(f"\nDone. Copy {dest} into the package's weights/ directory on "
          "the target host (or set $LLIE_VGG19_NPZ / $LLIE_LPIPS_NPZ).")


if __name__ == "__main__":
    main()
