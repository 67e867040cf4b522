#!/usr/bin/env python
"""On-chip kernel microbenchmarks: XLA-fused vs Pallas implementations.

Validates the SURVEY.md rule that custom kernels must beat XLA's fusion
before being kept as defaults. Prints per-shape timings + correctness
deltas for channel-LayerNorm (fwd and fwd+bwd).

NOTE: uses unchained repeat timing — on hosted TPU tunnels the absolute
numbers are throughput-inflated (see BASELINE.md methodology); both sides
are measured identically, so the XLA-vs-Pallas *ratios* remain valid.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, runs=50, warmup=5):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / runs * 1e3


def main() -> None:
    from lowlight_image_enhancement_tpu.ops.layernorm import (
        _ln_fwd_impl as jnp_ln_impl,
        layer_norm_2d,
    )
    from lowlight_image_enhancement_tpu.ops.pallas.layernorm import (
        layer_norm_2d_pallas,
    )

    rng = np.random.default_rng(0)
    shapes = [
        (2, 512, 512, 32),   # SID scale-0 activations
        (2, 256, 256, 64),   # scale-1
        (2, 128, 128, 128),  # scale-2
        (2, 64, 64, 256),    # scale-3
        (2, 32, 32, 512),    # bottleneck
    ]
    for shape in shapes:
        for dtype in (jnp.float32, jnp.bfloat16):
            x = jnp.asarray(rng.standard_normal(shape)).astype(dtype)
            c = shape[-1]
            w = jnp.ones((c,), jnp.float32)
            b = jnp.zeros((c,), jnp.float32)

            f_xla = jax.jit(lambda a: layer_norm_2d(a, w, b, 1e-6))
            f_pal = jax.jit(lambda a: layer_norm_2d_pallas(a, w, b, 1e-6))

            def g_of(f):
                return jax.jit(jax.grad(
                    lambda a: jnp.sum(f(a).astype(jnp.float32) ** 2)))

            t_xla = timeit(f_xla, x)
            t_pal = timeit(f_pal, x)
            tg_xla = timeit(g_of(f_xla), x)
            tg_pal = timeit(g_of(f_pal), x)
            diff = float(jnp.max(jnp.abs(
                f_xla(x).astype(jnp.float32) - f_pal(x).astype(jnp.float32)
            )))
            name = "x".join(map(str, shape))
            print(f"LN {name:>16s} {dtype.__name__:9s} "
                  f"fwd xla {t_xla:6.3f} pal {t_pal:6.3f} ms | "
                  f"fwd+bwd xla {tg_xla:6.3f} pal {tg_pal:6.3f} ms | "
                  f"maxdiff {diff:.2e}", flush=True)


if __name__ == "__main__":
    main()
