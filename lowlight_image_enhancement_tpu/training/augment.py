"""Batch-level training augmentations.

Mixup (reference hook: ``train.mixup`` in
``image_restoration_model.py:250-252``): convex-combines pairs within the
batch with a Beta-distributed coefficient, applied identically to every
image-valued entry so physics consistency (lq/gt/short_raw/long_raw
relationships) is preserved.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp

Array = jax.Array

_IMAGE_KEYS = ("lq", "gt", "short_raw", "long_raw", "short_obs")


def mixup_batch(
    rng: jax.Array,
    batch: Mapping[str, Array],
    alpha: float = 1.2,
) -> Dict[str, Array]:
    """Mixup over the batch axis, jit-safe.

    ``lam ~ Beta(alpha, alpha)`` (sampled once per batch), partner indices
    are a random permutation; all image entries (and ``expo_ratio``) are
    mixed with the same ``lam``/permutation.
    """
    out = dict(batch)
    n = batch["lq"].shape[0]
    k1, k2 = jax.random.split(rng)
    lam = jax.random.beta(k1, alpha, alpha)
    perm = jax.random.permutation(k2, n)
    for key in _IMAGE_KEYS:
        if key in out:
            v = out[key]
            out[key] = lam * v + (1.0 - lam) * v[perm]
    if "expo_ratio" in out:
        e = out["expo_ratio"]
        out["expo_ratio"] = lam * e + (1.0 - lam) * e[perm]
    return out
