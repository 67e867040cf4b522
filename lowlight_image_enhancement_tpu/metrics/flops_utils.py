"""FLOPs accounting via XLA HLO cost analysis.

Rebuild of reference ``metrics/flops_utils.py:181-370`` (fvcore-based) on
the TPU-native backend: ``jax.jit(fn).lower(*args).compile().cost_analysis()``.

Conventions preserved from the reference:
- ``fvcore_fma1``: FMA counted as 1 op (fvcore's convention; == MACs).
- ``macs``: alias of the above.
- ``flops_2xmac``: 2 ops per MAC (the "classic" FLOPs convention).

XLA's cost analysis reports ``flops`` in the 2-ops-per-MAC convention for
dot/conv, so ``fvcore_fma1 = xla_flops / 2``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax

_CONVENTIONS = {"fvcore_fma1", "macs", "flops_2xmac"}


@dataclasses.dataclass
class FLOPsResult:
    """Result container (reference ``FLOPsResult`` dataclass).

    ``total`` is in the requested convention; ``metadata`` echoes the
    measurement contract; ``raw_cost`` is the XLA cost-analysis dict.
    """

    total: float
    convention: str
    per_sample: Optional[float]
    metadata: Dict[str, Any]
    raw_cost: Dict[str, float]

    def total_g(self) -> float:
        return self.total / 1e9

    def total_m(self) -> float:
        return self.total / 1e6


class FLOPsCounter:
    """Count FLOPs of a jittable callable at example arguments.

    Example::

        counter = FLOPsCounter(convention="fvcore_fma1")
        res = counter.count(model_apply, params, x, batch_dim=0)
    """

    def __init__(self, convention: str = "fvcore_fma1"):
        if convention not in _CONVENTIONS:
            raise ValueError(
                f"convention must be one of {sorted(_CONVENTIONS)}"
            )
        self.convention = convention

    def count(
        self,
        fn: Callable[..., Any],
        *args,
        per_sample_batch: Optional[int] = None,
        static_argnums=(),
        **kwargs,
    ) -> FLOPsResult:
        lowered = jax.jit(fn, static_argnums=static_argnums).lower(
            *args, **kwargs
        )
        compiled = lowered.compile()
        cost = compiled.cost_analysis() or {}
        if isinstance(cost, (list, tuple)):  # older jax returns [dict]
            cost = cost[0] if cost else {}
        xla_flops = float(cost.get("flops", 0.0))

        if self.convention in ("fvcore_fma1", "macs"):
            total = xla_flops / 2.0
        else:
            total = xla_flops

        per_sample = (
            total / per_sample_batch if per_sample_batch else None
        )
        return FLOPsResult(
            total=total,
            convention=self.convention,
            per_sample=per_sample,
            metadata={
                "backend": "xla_cost_analysis",
                "convention": self.convention,
                "note": "xla reports 2*MAC; fvcore_fma1 = xla/2",
            },
            raw_cost={k: float(v) for k, v in cost.items()
                      if isinstance(v, (int, float))},
        )


def count_flops(
    fn: Callable[..., Any], *args, convention: str = "fvcore_fma1", **kwargs
) -> Dict[str, float]:
    """Legacy convenience API in M/G units (reference ``count_flops``)."""
    res = FLOPsCounter(convention=convention).count(fn, *args, **kwargs)
    return {
        "flops": res.total,
        "flops_M": res.total_m(),
        "flops_G": res.total_g(),
        "convention": convention,
    }
