"""Microbench the VGG19 perceptual term (the reference objective's
heaviest auxiliary, ``NewBP_model/losses.py:32-69``).

Measures value+grad of ``PerceptualLoss(pred, gt)`` alone at the bench
protocol shape (batch 2, 512^2, bf16 trunk) with data-chained timing, and
reports achieved TFLOP/s against the analytic conv FLOP count — VGG19 at
512^2 costs ~204 GFLOP/image forward (2xMAC), so the full term
(pred fwd+input-grad bwd + gt fwd) is ~1.22 TFLOP/step.

Optionally captures an xprof trace: ``python tools/bench_vgg.py --trace``.
"""

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

from lowlight_image_enhancement_tpu.losses.components import PerceptualLoss


def vgg_flops_per_image(side: int) -> float:
    """Analytic conv FLOPs (2xMAC) of vgg19.features[:36] at side^2."""
    cfg = [(3, 64), (64, 64), None, (64, 128), (128, 128), None,
           (128, 256)] + [(256, 256)] * 3 + [None, (256, 512)] + \
          [(512, 512)] * 3 + [None] + [(512, 512)] * 4
    s = side
    total = 0.0
    for entry in cfg:
        if entry is None:
            s //= 2
            continue
        cin, cout = entry
        total += 2.0 * 9 * cin * cout * s * s
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    dtype = jnp.dtype(args.dtype)
    perc = PerceptualLoss(dtype=dtype)
    rng = np.random.default_rng(0)
    pred = jnp.asarray(
        rng.uniform(0, 1, (args.batch, args.side, args.side, 3)),
        jnp.float32)
    gt = jnp.asarray(
        rng.uniform(0, 1, (args.batch, args.side, args.side, 3)),
        jnp.float32)

    @jax.jit
    def step(p, t):
        val, grad = jax.value_and_grad(lambda pp: perc(pp, t))(p)
        # chain: feed the grad back into the next input so serial timing
        # is honest on backends that run independent dispatches in parallel
        return val, p + 0.0 * grad

    val, pred = step(pred, gt)
    jax.block_until_ready(pred)

    runs = 10
    rounds = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(runs):
            val, pred = step(pred, gt)
        jax.block_until_ready(pred)
        rounds.append((time.perf_counter() - t0) / runs)
    dt = max(rounds)

    if args.trace:
        with jax.profiler.trace("/tmp/vgg_trace"):
            for _ in range(3):
                val, pred = step(pred, gt)
            jax.block_until_ready(pred)
        print("trace written to /tmp/vgg_trace")

    fwd = vgg_flops_per_image(args.side) * args.batch
    # pred fwd + pred input-grad bwd (~1x fwd) + gt fwd
    total_flops = 3.0 * fwd
    print(f"perc value+grad: {dt * 1e3:.2f} ms  "
          f"({total_flops / 1e9:.0f} GFLOP -> "
          f"{total_flops / dt / 1e12:.1f} TFLOP/s achieved)")


if __name__ == "__main__":
    main()
