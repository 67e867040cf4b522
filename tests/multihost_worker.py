"""Worker process for the 2-process multihost test (not a test module).

Launched by ``tests/test_multihost_distributed.py`` as
``python tests/multihost_worker.py <process_id> <coordinator>``.
Exercises ``parallel/multihost.py`` (the reference's process-group glue,
``basicsr/utils/dist_util.py:17-65``) end to end on a 2-process x
4-device virtual CPU mesh with gloo cross-process collectives: init,
host_info, local_batch_slice feeding per-host data into a global mesh
array, one jitted data-parallel gradient step (XLA inserts the psum),
and main_process_only gating.  Prints one JSON line on success.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lowlight_image_enhancement_tpu.parallel.multihost import (
    host_info,
    init_multihost,
    local_batch_slice,
    main_process_only,
)


def main() -> None:
    process_id = int(sys.argv[1])
    coordinator = sys.argv[2]

    init_multihost(coordinator_address=coordinator, num_processes=2,
                   process_id=process_id)
    init_multihost(coordinator_address=coordinator, num_processes=2,
                   process_id=process_id)  # idempotent second call

    idx, cnt, is_main = host_info()
    assert idx == process_id and cnt == 2 and is_main == (process_id == 0)
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    global_batch = 8
    per_host, offset = local_batch_slice(global_batch)
    assert per_host == 4 and offset == 4 * process_id

    # Each host feeds ITS slice of a deterministic global batch; the
    # jitted step reduces over the mesh, so both hosts must see the
    # identical global loss/grad.
    rng = np.random.default_rng(0)
    gx = rng.normal(size=(global_batch, 16)).astype(np.float32)
    gy = rng.normal(size=(global_batch, 1)).astype(np.float32)
    w0 = rng.normal(size=(16, 1)).astype(np.float32)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("dp",))
    sh = NamedSharding(mesh, P("dp"))
    x = jax.make_array_from_process_local_data(
        sh, gx[offset:offset + per_host], gx.shape)
    y = jax.make_array_from_process_local_data(
        sh, gy[offset:offset + per_host], gy.shape)
    w = jax.device_put(jnp.asarray(w0), NamedSharding(mesh, P()))

    @jax.jit
    def step(w, x, y):
        def loss(w):
            return jnp.mean((x @ w - y) ** 2)

        l, g = jax.value_and_grad(loss)(w)
        return l, w - 0.1 * g

    loss_val, w1 = step(w, x, y)
    # reference value computed redundantly on every host from the full
    # batch — the mesh result must match it exactly on both hosts
    ref = float(np.mean((gx @ w0 - gy) ** 2))
    got = float(loss_val)
    assert abs(got - ref) < 1e-5, (got, ref)
    w1_local = np.asarray(jax.device_get(w1.addressable_shards[0].data))

    calls = []

    @main_process_only
    def record():
        calls.append(1)
        return "ran"

    result = record()
    if process_id == 0:
        assert result == "ran" and calls == [1]
    else:
        assert result is None and calls == []

    print(json.dumps({
        "process_id": idx, "loss": got, "ref": ref,
        "w1_sum": float(w1_local.sum()),
    }), flush=True)


if __name__ == "__main__":
    main()
