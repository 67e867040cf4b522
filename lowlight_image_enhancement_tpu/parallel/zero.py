"""ZeRO-1: optimizer-state sharding over the data-parallel mesh.

Beyond-reference TPU capability (the reference's DDP replicates
everything, ``base_model.py:63-81``). Replicating AdamW doubles the
param-tree memory twice over (first/second moments); on a data-parallel
mesh those moments are pure per-parameter state with no cross-replica
coupling, so each device only needs ``1/n``-th of them — the classic
ZeRO stage-1 partitioning, expressed the JAX way:

- params / step / log_sigma stay **replicated** (the forward and the
  gradient all-reduce are unchanged),
- every optimizer-state array leaf is **sharded** along its largest
  mesh-divisible dimension via ``NamedSharding``; leaves with no
  divisible dimension (scalars, odd shapes) stay replicated,
- the jitted train step pins these shardings on its *output* state, so
  XLA partitions the optimizer update across devices (each device
  updates its slice of the moments and its slice of the fresh params)
  and inserts the param all-gather over ICI — no hand-written
  collectives, no optimizer changes.

Per-device optimizer-state memory drops by ~``1/n``; numerics are
IDENTICAL to replicated training (the update math is elementwise), which
the test suite asserts on the 8-device virtual mesh
(``tests/test_zero1.py``).

Usage::

    mesh = create_mesh()
    state = create_train_state(net, tx, rng, sample, loss=loss)
    state, shardings = zero1_device_put(state, mesh)
    step = make_train_step(net, loss, tx, state_shardings=shardings)
    state, logs = step(state, shard_batch(batch, mesh))
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["zero1_shardings", "zero1_device_put"]


def _leaf_spec(leaf: Any, n: int, axis_name: str) -> P:
    """PartitionSpec sharding the largest mesh-divisible dim, else
    replicated."""
    shape = getattr(leaf, "shape", ())
    best_dim, best_size = None, 0
    for d, s in enumerate(shape):
        if s % n == 0 and s > best_size:
            best_dim, best_size = d, s
    if best_dim is None:
        return P()
    spec = [None] * len(shape)
    spec[best_dim] = axis_name
    return P(*spec)


def zero1_shardings(state, mesh: Mesh, axis_name: str = "data"):
    """A ``TrainState``-shaped pytree of ``NamedSharding``s with ZeRO-1
    semantics: ``opt_state`` leaves sharded, everything else replicated.
    """
    n = mesh.shape[axis_name]   # size of the axis we shard over, not
    rep = NamedSharding(mesh, P())  # the whole mesh (multi-axis meshes)

    opt_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n, axis_name)),
        state.opt_state,
    )
    return type(state)(
        step=rep,
        params=jax.tree_util.tree_map(lambda _: rep, state.params),
        opt_state=opt_sh,
        log_sigma=jax.tree_util.tree_map(lambda _: rep, state.log_sigma),
    )


def zero1_device_put(state, mesh: Mesh,
                     axis_name: str = "data") -> Tuple[Any, Any]:
    """Place ``state`` on ``mesh`` with ZeRO-1 shardings.

    Returns ``(sharded_state, shardings)`` — pass ``shardings`` to
    ``make_train_step(..., state_shardings=...)`` so the jitted step
    keeps the partitioning across iterations.
    """
    shardings = zero1_shardings(state, mesh, axis_name)
    return jax.device_put(state, shardings), shardings
