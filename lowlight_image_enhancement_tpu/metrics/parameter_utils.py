"""Parameter counting for JAX/Flax param pytrees.

Rebuild of reference ``metrics/parameter_utils.py:12-35`` —
``count_parameters(params, unit in {raw, K, M})``, trainable params only
(in JAX everything in the ``params`` collection is trainable; buffers live
in separate collections and are excluded by construction).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

_UNITS = {"raw": 1.0, "K": 1e3, "M": 1e6}


def count_parameters(params: Any, unit: str = "raw") -> float:
    """Count leaves' total element count in a param pytree.

    Args:
      params: a pytree of arrays (e.g. flax ``variables['params']``).
      unit: ``'raw'`` (count), ``'K'`` (thousands), ``'M'`` (millions).
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}")
    total = sum(
        int(np.prod(np.shape(leaf))) for leaf in jax.tree_util.tree_leaves(params)
    )
    return total / _UNITS[unit] if unit != "raw" else float(total)
