#!/usr/bin/env python
"""A/B the fused-NAFBlock dispatch threshold and tile knobs on the chip.

Round-2 headroom question (PLAN.md): the C=256 stacks (20 of 36 blocks,
64^2 spatial) run unfused under the ``auto`` (C<=128) policy because XLA
fills the 128 lanes there — but fusion still saves HBM round trips.
This sweep measures the full flagship train step (512^2 b2 bf16 full
hybrid loss) for each candidate threshold so the auto policy stays an
evidence-backed constant (`models/nafnet.py:_fused_hw`).

Usage::

    python tools/bench_fused_sweep.py                # thresholds
    python tools/bench_fused_sweep.py --vmem 32 64   # VMEM-limit sweep

Run alone on the host — timings are wall-clock.
"""

from __future__ import annotations

import argparse
import os
import sys
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


def build_step(fused_blocks):
    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.models import create_newbp_net
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    net = create_newbp_net(
        nafnet_params=dict(
            img_channel=3, width=32, enc_blk_nums=(2, 2, 4, 8),
            middle_blk_num=12, dec_blk_nums=(2, 2, 2, 2),
            fused_blocks=fused_blocks,
        ),
        dtype=jnp.bfloat16,
    )
    loss = HybridLossPlus(
        use_perc=False, use_deltaE=True, use_ssim=False,
        physics_psf_module=create_crosstalk_psf("mono", "P2"),
    )
    tx = make_optimizer(5e-4)
    state = create_train_state(net, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), loss=loss)
    return make_train_step(net, loss, tx, donate=True), state


def make_batch(n=2, s=512):
    rng = np.random.default_rng(0)
    short_raw = rng.uniform(0, 0.2, (n, s, s, 3)).astype(np.float32)
    ratio = np.full((n,), 5.0, np.float32)
    lq = np.clip(short_raw * ratio[:, None, None, None], 0, 1
                 ).astype(np.float32)
    gt = np.clip(lq + 0.02, 0, 1).astype(np.float32)
    return {
        "lq": jnp.asarray(lq), "gt": jnp.asarray(gt),
        "short_raw": jnp.asarray(short_raw), "long_raw": jnp.asarray(gt),
        "short_obs": jnp.asarray(short_raw),
        "expo_ratio": jnp.asarray(ratio),
    }


def time_step(fused_blocks, runs=20):
    step, state = build_step(fused_blocks)
    batch = make_batch()
    for _ in range(3):
        state, logs = step(state, batch)
    jax.block_until_ready(logs["l_total"])
    t0 = time.perf_counter()
    for _ in range(runs):
        state, logs = step(state, batch)
    jax.block_until_ready(logs["l_total"])
    return (time.perf_counter() - t0) / runs * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--thresholds", nargs="*", type=str,
                    default=["auto", "256", "512", "0"])
    ap.add_argument("--vmem", nargs="*", type=int, default=None,
                    help="sweep LLIE_NAFBLOCK_VMEM_MB instead (re-exec)")
    ap.add_argument("--runs", type=int, default=20)
    args = ap.parse_args()

    if args.vmem:
        for mb in args.vmem:
            env = dict(os.environ, LLIE_NAFBLOCK_VMEM_MB=str(mb))
            import subprocess

            out = subprocess.run(
                [sys.executable, __file__, "--thresholds", "auto",
                 "--runs", str(args.runs)],
                env=env, capture_output=True, text=True)
            print(f"vmem={mb}MB: {out.stdout.strip().splitlines()[-1:]}",
                  flush=True)
        return

    for th in args.thresholds:
        fused = ("auto" if th == "auto"
                 else False if th == "0" else int(th))
        ms = time_step(fused, runs=args.runs)
        print(f"fused_blocks={th:>5}: {ms:7.2f} ms/step "
              f"({1e3 / ms:5.1f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
