"""Evaluation CLI: ``python -m lowlight_image_enhancement_tpu.test -opt <yaml>``.

Rebuild of reference ``basicsr/test.py:19-70``: parse(is_train=False), build
each ``datasets.test_*`` split, load the checkpointed network, run
validation with config-declared metrics, print/log results.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.data import create_dataset, create_loader
from lowlight_image_enhancement_tpu.models import define_network
from lowlight_image_enhancement_tpu.training import checkpoint as ckpt
from lowlight_image_enhancement_tpu.training.config import parse
from lowlight_image_enhancement_tpu.training.logging_utils import (
    get_root_logger,
)
from lowlight_image_enhancement_tpu.training.train_step import make_eval_step
from lowlight_image_enhancement_tpu.training.validation import validate


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    args = parser.parse_args()
    opt = parse(args.opt, is_train=False)
    logger = get_root_logger()

    net = define_network(dict(opt["network_g"]))
    sample = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), sample)
    params = variables["params"]

    pretrain = (opt.get("path", {}) or {}).get("pretrain_network_g")
    if pretrain:
        params = ckpt.restore_network(pretrain, params)
        logger.info("loaded network from %s", pretrain)

    eval_fn = make_eval_step(net)

    def forward(x):
        return eval_fn(params, x)

    val_opt = opt.get("val", {}) or {}
    for phase, ds_opt in (opt.get("datasets") or {}).items():
        if not phase.startswith("test") and not phase.startswith("val"):
            continue
        ds = create_dataset(ds_opt)
        loader = create_loader(ds, ds_opt)
        results = validate(
            forward, loader, val_opt.get("metrics", {}) or {},
            tile_size=val_opt.get("crop_size"),
        )
        logger.info("[%s] %s", ds_opt.get("name", phase), results)


if __name__ == "__main__":
    main()
