"""Mesh/sharding utility tests (beyond the DP-equivalence training test)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.parallel import (
    batch_sharding,
    create_mesh,
    replicate_sharding,
    shard_batch,
)
from lowlight_image_enhancement_tpu.parallel.multihost import (
    host_info,
    local_batch_slice,
    main_process_only,
)


class TestMesh:
    def test_create_mesh_sizes(self):
        assert create_mesh().devices.size == 8
        assert create_mesh(4).devices.size == 4
        with pytest.raises(ValueError, match="available"):
            create_mesh(64)

    def test_shard_batch_placement(self, rng):
        mesh = create_mesh(8)
        batch = {
            "lq": rng.uniform(0, 1, (8, 4, 4, 3)).astype(np.float32),
            "expo_ratio": rng.uniform(1, 10, (8,)).astype(np.float32),
            "odd": rng.uniform(0, 1, (3, 2)).astype(np.float32),  # 3 % 8
            "scalar": np.float32(2.0),
        }
        out = shard_batch(batch, mesh)
        # divisible leading axes: sharded over 'data'
        assert not out["lq"].sharding.is_fully_replicated
        assert not out["expo_ratio"].sharding.is_fully_replicated
        # non-divisible and scalars: replicated
        assert out["odd"].sharding.is_fully_replicated
        assert out["scalar"].sharding.is_fully_replicated
        # values survive the round trip
        np.testing.assert_array_equal(np.asarray(out["lq"]), batch["lq"])

    def test_psum_over_mesh(self, rng):
        """A jitted global reduction over a sharded batch equals the host
        reduction (XLA inserts the collective)."""
        mesh = create_mesh(8)
        x = rng.standard_normal((8, 16)).astype(np.float32)
        xs = jax.device_put(x, batch_sharding(mesh))
        total = jax.jit(lambda a: jnp.sum(a))(xs)
        np.testing.assert_allclose(float(total), x.sum(), rtol=1e-5)

    def test_replicate_sharding(self):
        mesh = create_mesh(8)
        y = jax.device_put(jnp.ones((4,)), replicate_sharding(mesh))
        assert y.sharding.is_fully_replicated


class TestMultihostHelpers:
    def test_host_info_single_process(self):
        idx, cnt, is_main = host_info()
        assert (idx, cnt, is_main) == (0, 1, True)

    def test_local_batch_slice(self):
        # single-process: the full batch belongs to this host
        per, off = local_batch_slice(16)
        assert (per, off) == (16, 0)

    def test_main_process_only_runs(self):
        calls = []

        @main_process_only
        def record(v):
            calls.append(v)
            return v

        assert record(5) == 5
        assert calls == [5]
