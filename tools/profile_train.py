#!/usr/bin/env python
"""Decompose the SID train-step cost on the real chip: forward vs backward
vs loss terms vs optimizer. Guides the Pallas/fusion work."""

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


def timeit(fn, *args, runs=20, warmup=3, **kw):
    """Unchained repeats — independent dispatches OVERLAP on the hosted
    tunnel (farm), so absolute values are inflated; see chained_*."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs * 1e3


def chained_step(step, state, batch, runs=20, warmup=3):
    """True serial ms/step: each step consumes the previous TrainState, so
    the tunnel cannot overlap dispatches (BASELINE.md methodology)."""
    for _ in range(warmup):
        state, logs = step(state, batch)
    jax.block_until_ready(logs["l_total"])
    t0 = time.perf_counter()
    for _ in range(runs):
        state, logs = step(state, batch)
    jax.block_until_ready(logs["l_total"])
    return (time.perf_counter() - t0) / runs * 1e3


def chained_fwd(fn, params, x, runs=20, warmup=3):
    """Serial forward latency: output feeds the next input (shapes must
    match; model output is image-shaped, so this chains)."""
    y = x
    for _ in range(warmup):
        y = fn(params, y)
    jax.block_until_ready(y)
    y = y.astype(x.dtype)
    t0 = time.perf_counter()
    for _ in range(runs):
        y = fn(params, y)
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / runs * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma-separated subset: fwd,gl1,l1_only,l1+phys,"
                         "l1+deltaE,full")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    def want(name):
        return only is None or name in only

    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.models import create_newbp_net
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.training import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    n, s = 2, 512
    nafnet_params = dict(img_channel=3, width=32, enc_blk_nums=(2, 2, 4, 8),
                         middle_blk_num=12, dec_blk_nums=(2, 2, 2, 2))
    net = create_newbp_net(nafnet_params=nafnet_params, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (n, s, s, 3)), dtype=jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (n, s, s, 3)), dtype=jnp.float32)
    short = jnp.asarray(rng.uniform(0, 0.2, (n, s, s, 3)),
                        dtype=jnp.float32)
    ratio = jnp.full((n,), 5.0)
    batch = {"lq": x, "gt": gt, "short_raw": short, "long_raw": gt,
             "short_obs": short, "expo_ratio": ratio}
    variables = net.init(jax.random.PRNGKey(0), x[:1, :64, :64])
    params = variables["params"]

    if want("fwd"):
        fwd = jax.jit(lambda p, xx: net.apply({"params": p}, xx))
        print(f"forward b{n} {s}^2 (chained):  "
              f"{chained_fwd(fwd, params, x):8.2f} ms", flush=True)

    if want("gl1"):
        def l1_loss_fn(p, xx, tt):
            return jnp.mean(jnp.abs(net.apply({"params": p}, xx) - tt))

        g_l1 = jax.jit(jax.grad(l1_loss_fn))
        print(f"grad(L1) fwd+bwd (unchained):"
              f"{timeit(g_l1, params, x, gt):8.2f} ms", flush=True)

    losses = {
        "l1_only": lambda: HybridLossPlus(
            use_perc=False, use_deltaE=False, use_ssim=False,
            use_phys=False),
        "l1+phys": lambda: HybridLossPlus(
            use_perc=False, use_deltaE=False, use_ssim=False,
            physics_psf_module=create_crosstalk_psf("mono")),
        "l1+deltaE": lambda: HybridLossPlus(
            use_perc=False, use_deltaE=True, use_ssim=False,
            use_phys=False),
        "full": lambda: HybridLossPlus(
            use_perc=False, use_deltaE=True, use_ssim=False,
            physics_psf_module=create_crosstalk_psf("mono")),
    }
    tx = make_optimizer(1e-4)
    for name, make_loss in losses.items():
        if not want(name):
            continue
        loss = make_loss()
        state = create_train_state(net, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 64, 64, 3)), loss=loss)
        step = make_train_step(net, loss, tx, donate=False)
        print(f"train_step [{name:12s}] (chained):  "
              f"{chained_step(step, state, batch, runs=10):8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
