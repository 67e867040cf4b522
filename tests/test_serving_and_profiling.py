"""Serving layer + profiling utility tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.models import NAFNet
from lowlight_image_enhancement_tpu.serving import RestorationServer
from lowlight_image_enhancement_tpu.utils.profiling import chained_timeit


@pytest.fixture(scope="module")
def served():
    net = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                 enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    params = net.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 16, 16, 3)))["params"]
    return net, params


class TestServing:
    def test_mixed_sizes_restored_at_original_shapes(self, served, rng):
        net, params = served
        server = RestorationServer(net, params, bucket_step=16,
                                   min_bucket=16, max_bucket=64,
                                   max_batch=2)
        imgs = [
            rng.uniform(0, 1, (20, 28, 3)).astype(np.float32),
            rng.uniform(0, 1, (16, 16, 3)).astype(np.float32),
            rng.uniform(0, 1, (31, 17, 3)).astype(np.float32),
        ]
        outs = server.predict(imgs)
        for im, out in zip(imgs, outs):
            assert out.shape == im.shape
            assert np.all(np.isfinite(out))

    def test_bucketing_bounds_jit_cache(self, served, rng):
        net, params = served
        server = RestorationServer(net, params, bucket_step=32,
                                   min_bucket=32, max_bucket=64,
                                   max_batch=2)
        # 6 distinct sizes inside one 32x32 bucket -> ONE compiled fn
        imgs = [rng.uniform(0, 1, (h, w, 3)).astype(np.float32)
                for h, w in [(17, 20), (20, 17), (32, 32), (9, 30),
                             (30, 9), (25, 25)]]
        server.predict(imgs)
        assert len(server._fns) == 1

    def test_padding_does_not_leak(self, served, rng):
        """Two images of different sizes in one bucket must restore the
        same as served alone (padding isolation)."""
        net, params = served
        server = RestorationServer(net, params, bucket_step=32,
                                   min_bucket=32, max_batch=2)
        a = rng.uniform(0, 1, (24, 24, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (30, 18, 3)).astype(np.float32)
        joint = server.predict([a, b])
        solo = server.predict([a])
        np.testing.assert_allclose(joint[0], solo[0], atol=1e-5)

    def test_oversize_input_tiles(self, served, rng):
        net, params = served
        server = RestorationServer(net, params, bucket_step=16,
                                   min_bucket=16, max_bucket=32,
                                   max_batch=8)
        big = rng.uniform(0, 1, (48, 40, 3)).astype(np.float32)
        out = server.predict([big])[0]
        assert out.shape == big.shape

    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)

    def test_warmup_precompiles(self, served):
        net, params = served
        server = RestorationServer(net, params, bucket_step=16,
                                   min_bucket=16)
        server.warmup([(16, 16), (32, 32)])
        assert len(server._fns) == 2

    def test_invalid_input_raises(self, served):
        net, params = served
        server = RestorationServer(net, params)
        with pytest.raises(ValueError):
            server.predict([np.zeros((4, 4))])  # not HWC


class TestProfiling:
    def test_chained_timeit_runs(self):
        f = jax.jit(lambda x: x * 1.0001)
        ms = chained_timeit(f, jnp.ones((64, 64)), runs=5, warmup=1)
        assert ms > 0


class TestServingEdges:
    def test_empty_request_list(self, served):
        net, params = served
        server = RestorationServer(net, params)
        assert server.predict([]) == []

    def test_exact_tile_size_direct_path(self, served, rng):
        from lowlight_image_enhancement_tpu.training.validation import (
            tiled_inference,
        )

        x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)),
                        dtype=jnp.float32)
        out = tiled_inference(lambda z: z * 2.0, x, tile_size=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0,
                                   atol=1e-6)

    def test_tiled_batch_gt1_rejected(self, rng):
        from lowlight_image_enhancement_tpu.training.validation import (
            tiled_inference,
        )

        with pytest.raises(ValueError, match="batch size 1"):
            tiled_inference(lambda z: z, jnp.zeros((2, 64, 64, 3)), 32)

    def test_identity_forward_tiling_exact(self, rng):
        """Overlap-averaged stitching of an identity model reconstructs
        the input exactly (weights sum to 1 everywhere)."""
        from lowlight_image_enhancement_tpu.training.validation import (
            tiled_inference,
        )

        x = jnp.asarray(rng.uniform(0, 1, (1, 50, 70, 3)),
                        dtype=jnp.float32)
        out = tiled_inference(lambda z: z, x, tile_size=32,
                              overlap_ratio=0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x),
                                   atol=1e-6)

    def test_mesh_sharded_tiling_matches_single_device(self, rng):
        """Tile batches sharded over the 8-device mesh produce the same
        stitched output as the unsharded path (spatial scale-out:
        independent tiles, no collectives)."""
        from lowlight_image_enhancement_tpu.parallel import create_mesh
        from lowlight_image_enhancement_tpu.training.validation import (
            tiled_inference,
        )

        mesh = create_mesh(8)
        fwd = jax.jit(lambda z: jnp.sqrt(jnp.clip(z, 0, 1)) * 0.9 + 0.01)
        x = jnp.asarray(rng.uniform(0, 1, (1, 100, 140, 3)),
                        dtype=jnp.float32)
        ref = tiled_inference(fwd, x, tile_size=32, overlap_ratio=0.5)
        out = tiled_inference(fwd, x, tile_size=32, overlap_ratio=0.5,
                              batch_tiles=8, mesh=mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-6)
