#!/usr/bin/env python
"""HybridLossPlus smoke harness (reference ``tools/debug_losses.py``):
constructs every loss-term combination on synthetic batches and prints the
term values + gradient norms. First step of the debug-first workflow
(debug_losses -> debug_overfit -> pack build -> pytest -> training)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.ops.psf import (
        build_psf_kernels,
        create_crosstalk_psf,
    )

    rng = np.random.default_rng(0)
    n, s = 2, 64
    mk = lambda lo=0, hi=1: jnp.asarray(rng.uniform(lo, hi, (n, s, s, 3)),
                                        dtype=jnp.float32)
    batch = dict(
        Bhat_raw=mk(), B_raw=mk(), A_raw=mk(0, 0.2),
        expo_ratio=jnp.full((n,), 5.0),
        Bhat_srgb01=mk(), B_srgb01=mk(), A_srgb01=mk(0, 0.2),
    )

    configs = {
        "l1_only": dict(use_perc=False, use_deltaE=False, use_ssim=False,
                        use_phys=False),
        "l1+deltaE+ssim": dict(use_perc=False, use_deltaE=True,
                               use_ssim=True, use_phys=False),
        "l1+phys_srgb": dict(use_perc=False, use_deltaE=False,
                             use_ssim=False,
                             physics_psf_module=create_crosstalk_psf("mono")),
        "l1+phys_raw": dict(use_perc=False, use_deltaE=False,
                            use_ssim=False,
                            physics_kernel=build_psf_kernels("mono", "P2")),
        "full_no_perc": dict(use_perc=False, use_deltaE=True, use_ssim=True,
                             physics_psf_module=create_crosstalk_psf(
                                 "rgb", "B2")),
        "perceptual": dict(use_perc=True, use_deltaE=False, use_ssim=False,
                           use_phys=False),
        "uncertainty": dict(use_perc=False, use_deltaE=True, use_ssim=False,
                            use_phys=False, use_uncertainty=True),
    }

    for name, kwargs in configs.items():
        loss = HybridLossPlus(**kwargs)
        sig = (loss.init_uncertainty_params()
               if loss.use_uncertainty else None)

        def f(bhat):
            t, _ = loss(**{**batch, "Bhat_raw": bhat,
                           "Bhat_srgb01": jnp.clip(bhat, 0, 1)},
                        log_sigma=sig)
            return t

        total, logs = loss(**batch, log_sigma=sig)
        g = jax.grad(f)(batch["Bhat_raw"])
        gnorm = float(jnp.linalg.norm(g))
        terms = {k: f"{float(v):.4f}" for k, v in logs.items()}
        status = "OK" if np.isfinite(float(total)) and np.isfinite(gnorm) \
            else "FAIL"
        print(f"[{status}] {name:16s} total={float(total):.4f} "
              f"grad_norm={gnorm:.4f} {terms}")


if __name__ == "__main__":
    main()
