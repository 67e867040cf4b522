#!/usr/bin/env python
"""Convert SID Sony .ARW RAW captures to 16-bit PNGs (reference
``NAFNet_base/tools/convert_sid_raw_to_png.py``).

RAW decoding stays a host-side offline step (as in the reference): rawpy
postprocess with camera white balance, no auto-brightening, 16-bit output.
``rawpy`` is not bundled in the TPU image — this tool gates on its
availability and is intended for the data-prep host.
"""

from __future__ import annotations

import argparse
import os
import sys


def main() -> None:
    try:
        import rawpy
    except ImportError:
        raise SystemExit(
            "rawpy is required for RAW conversion; run this tool on a "
            "data-prep host with `rawpy` installed."
        )
    from lowlight_image_enhancement_tpu.utils import imgio

    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="Sony/ directory containing short/ and long/ .ARW")
    ap.add_argument("--output", required=True, help="PNG output root")
    args = ap.parse_args()

    for split in ("short", "long"):
        in_dir = os.path.join(args.input, split)
        out_dir = os.path.join(args.output, split)
        os.makedirs(out_dir, exist_ok=True)
        names = sorted(n for n in os.listdir(in_dir)
                       if n.lower().endswith(".arw"))
        for i, name in enumerate(names):
            with rawpy.imread(os.path.join(in_dir, name)) as raw:
                rgb = raw.postprocess(
                    use_camera_wb=True,
                    no_auto_bright=True,
                    output_bps=16,
                )
            out_path = os.path.join(out_dir, os.path.splitext(name)[0] + ".png")
            imgio.imwrite(out_path, rgb)  # 16-bit PNG, RGB
            if (i + 1) % 50 == 0:
                print(f"{split}: {i + 1}/{len(names)}")
        print(f"{split}: converted {len(names)} files -> {out_dir}")


if __name__ == "__main__":
    main()
