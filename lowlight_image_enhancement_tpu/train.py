"""Training CLI: ``python -m lowlight_image_enhancement_tpu.train -opt <yaml>``.

Rebuild of reference ``basicsr/train.py:36-98`` arg surface (``-opt``;
``--launcher`` accepted for config compatibility but ignored — the JAX
runtime replaces torch.distributed; multi-host initialization is
``jax.distributed.initialize`` driven by the environment).
"""

from __future__ import annotations

import argparse

from lowlight_image_enhancement_tpu.training.config import parse
from lowlight_image_enhancement_tpu.training.trainer import train_from_config


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True, help="Path to YAML config.")
    parser.add_argument("--launcher", default="none",
                        choices=["none", "pytorch", "slurm"],
                        help="accepted for config compatibility; ignored")
    parser.add_argument("--local_rank", type=int, default=0)
    args = parser.parse_args()
    opt = parse(args.opt, is_train=True)
    train_from_config(opt)


if __name__ == "__main__":
    main()
