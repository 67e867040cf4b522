"""Trace the flagship train step and print device-time per op family.

The honest per-op breakdown for perf work: wall-clock on the hosted
tunnel drifts (BASELINE.md), but xprof trace durations are ground truth.

Usage: python tools/profile_step_families.py [--perc] [--top N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.losses import HybridLossPlus
from lowlight_image_enhancement_tpu.models import create_newbp_net
from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
from lowlight_image_enhancement_tpu.training import (
    create_train_state, make_optimizer, make_schedule, make_train_step,
)
from lowlight_image_enhancement_tpu.utils.profiling import (
    summarize_trace, trace,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--perc", action="store_true")
    ap.add_argument("--top", type=int, default=28)
    ap.add_argument("--logdir", default="/tmp/step_trace")
    args = ap.parse_args()

    net = create_newbp_net(
        nafnet_params=dict(img_channel=3, width=32,
                           enc_blk_nums=(2, 2, 4, 8), middle_blk_num=12,
                           dec_blk_nums=(2, 2, 2, 2)),
        dtype=jnp.bfloat16)
    loss = HybridLossPlus(
        use_perc=args.perc, use_deltaE=True, use_ssim=False,
        perc_dtype=jnp.bfloat16,
        physics_psf_module=create_crosstalk_psf("mono", "P2"))
    tx = make_optimizer(make_schedule(
        {"type": "TrueCosineAnnealingLR", "T_max": 300000,
         "eta_min": 1e-6}, base_lr=5e-4))
    state = create_train_state(net, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), loss=loss)
    step = make_train_step(net, loss, tx, donate=True)

    rng = np.random.default_rng(0)
    n, s = 2, 512
    short_raw = rng.uniform(0, 0.2, (n, s, s, 3)).astype(np.float32)
    ratio = np.full((n,), 5.0, np.float32)
    lq = np.clip(short_raw * ratio[:, None, None, None], 0,
                 1).astype(np.float32)
    gt = np.clip(lq + 0.02, 0, 1).astype(np.float32)
    batch = {
        "lq": jnp.asarray(lq),
        "gt": jnp.asarray(gt),
        "short_raw": jnp.asarray(short_raw),
        "long_raw": jnp.asarray(gt),
        "short_obs": jnp.asarray(short_raw),
        "expo_ratio": jnp.asarray(ratio),
    }

    for _ in range(3):
        state, logs = step(state, batch)
    jax.block_until_ready(logs["l_total"])

    with trace(args.logdir):
        for _ in range(5):
            state, logs = step(state, batch)
        jax.block_until_ready(logs["l_total"])

    fam = summarize_trace(args.logdir, top=args.top)
    total = sum(fam.values())
    print(f"device total over 5 steps: {total:.2f} ms "
          f"-> {total / 5:.2f} ms/step  (perc={args.perc})")
    for name, ms in fam.items():
        print(f"  {ms / 5:7.3f} ms/step  {name}")


if __name__ == "__main__":
    main()
