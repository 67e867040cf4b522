#!/usr/bin/env python
"""Single-batch overfit harness (reference ``tools/debug_overfit.py``):
the "8x8 first" closed loop — a tiny NAFNet must drive the loss toward
zero on one fixed batch, first with plain L1, then with the full hybrid
escalation. Run before any real training."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run(loss_name: str, steps: int, size: int) -> float:
    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.models import NAFNet
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    rng = np.random.default_rng(0)
    net = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                 enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    if loss_name == "l1":
        loss = HybridLossPlus(use_perc=False, use_deltaE=False,
                              use_ssim=False, use_phys=False)
    else:
        loss = HybridLossPlus(use_perc=False, use_deltaE=True,
                              use_ssim=True,
                              physics_psf_module=create_crosstalk_psf("mono"))
    tx = make_optimizer(2e-3, grad_clip_norm=1.0)
    state = create_train_state(net, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, size, size, 3)), loss=loss)
    step = make_train_step(net, loss, tx, donate=False)

    short_raw = rng.uniform(0, 0.1, (2, size, size, 3)).astype(np.float32)
    ratio = np.full((2,), 10.0, np.float32)
    lq = np.clip(short_raw * ratio[:, None, None, None], 0, 1)
    gt = np.clip(lq + 0.05 * rng.standard_normal(lq.shape), 0, 1
                 ).astype(np.float32)
    batch = {
        "lq": jnp.asarray(lq), "gt": jnp.asarray(gt),
        "short_raw": jnp.asarray(short_raw), "long_raw": jnp.asarray(gt),
        "short_obs": jnp.asarray(short_raw),
        "expo_ratio": jnp.asarray(ratio),
    }

    first = None
    for i in range(steps):
        state, logs = step(state, batch)
        val = float(logs["l_total"])
        if first is None:
            first = val
        if (i + 1) % max(steps // 10, 1) == 0:
            print(f"  step {i + 1:4d}: l_total={val:.5f}")
    print(f"[{loss_name}] {first:.5f} -> {val:.5f} "
          f"({'OK: decreased' if val < first else 'FAIL: no decrease'})")
    return val


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--size", type=int, default=32)
    args = ap.parse_args()
    print("phase 1: L1-only overfit")
    run("l1", args.steps, args.size)
    print("phase 2: hybrid escalation (L1+deltaE+SSIM+phys)")
    run("hybrid", args.steps, args.size)


if __name__ == "__main__":
    main()
