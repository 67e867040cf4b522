"""Spatial (height-sharded) parallelism: halo exchange + exact NAFNet
forward parity against the single-device graph on the virtual 8-device
mesh. Reference counterpart: none (beyond-parity capability; closest
analog is grids tiling, ``image_restoration_model.py:344-468``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lowlight_image_enhancement_tpu.models.nafnet import NAFNet
from lowlight_image_enhancement_tpu.parallel.spatial import (
    halo_exchange_rows,
    nafnet_apply_spatial,
    spatial_pad_multiple,
)


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), ("sp",))


class TestHaloExchange:
    @pytest.mark.parametrize("n_sh", [2, 4, 8])
    def test_matches_zero_padding(self, n_sh):
        """Gathered halo-extended shards == zero-padded global rows."""
        mesh = _mesh(n_sh)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 8 * n_sh, 6, 3)).astype(np.float32)

        fn = shard_map(
            lambda t: halo_exchange_rows(t, 1, "sp"),
            mesh=mesh,
            in_specs=P(None, "sp", None, None),
            out_specs=P(None, "sp", None, None),
        )
        got = np.asarray(fn(jnp.asarray(x)))
        hs = 8
        padded = np.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        for s in range(n_sh):
            want = padded[:, s * hs : s * hs + hs + 2]
            np.testing.assert_array_equal(
                got[:, s * (hs + 2) : (s + 1) * (hs + 2)], want,
                err_msg=f"shard {s}")

    def test_single_shard_is_pad(self):
        mesh = _mesh(1)
        x = jnp.arange(2 * 4 * 3 * 1, dtype=jnp.float32).reshape(2, 4, 3, 1)
        fn = shard_map(
            lambda t: halo_exchange_rows(t, 2, "sp"),
            mesh=mesh,
            in_specs=P(None, "sp", None, None),
            out_specs=P(None, "sp", None, None),
        )
        np.testing.assert_array_equal(
            np.asarray(fn(x)),
            np.pad(np.asarray(x), ((0, 0), (2, 2), (0, 0), (0, 0))))


@pytest.mark.slow  # compile-heavy shard_map forwards (~40s each on 1-core host)
class TestSpatialNAFNet:
    @pytest.fixture(scope="class")
    def net_and_params(self):
        net = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                     enc_blk_nums=(1, 1), dec_blk_nums=(1, 1),
                     fused_blocks=False, flat_trunk=False)
        rng = jax.random.PRNGKey(0)
        params = net.init(rng, jnp.zeros((1, 32, 16, 3)))["params"]
        return net, params

    @pytest.mark.parametrize("n_sh", [2, 8])
    def test_parity_aligned_height(self, net_and_params, n_sh):
        """Sharded forward == single-device forward (aligned H)."""
        net, params = net_and_params
        mesh = _mesh(n_sh)
        rng = np.random.default_rng(1)
        h = spatial_pad_multiple(net, n_sh) * 2
        x = jnp.asarray(rng.normal(size=(1, h, 20, 3)).astype(np.float32))

        want = net.apply({"params": params}, x)
        got = nafnet_apply_spatial(net, params, x, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_batch_and_unaligned_width(self, net_and_params):
        """Batched input + width needing the model's own pad."""
        net, params = net_and_params
        mesh = _mesh(4)
        rng = np.random.default_rng(2)
        h = spatial_pad_multiple(net, 4)
        x = jnp.asarray(rng.normal(size=(2, h, 18, 3)).astype(np.float32))
        want = net.apply({"params": params}, x)
        got = nafnet_apply_spatial(net, params, x, mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=2e-5)

    def test_output_is_height_sharded_before_crop(self, net_and_params):
        """The sharded forward really distributes rows (placement check)."""
        net, params = net_and_params
        mesh = _mesh(8)
        h = spatial_pad_multiple(net, 8)
        x = jnp.zeros((1, h, 16, 3))
        out = nafnet_apply_spatial(net, params, x, mesh)
        assert out.shape == (1, h, 16, 3)

    def test_rejects_tlc_and_stacked_trees(self, net_and_params):
        net, params = net_and_params
        mesh = _mesh(2)
        x = jnp.zeros((1, 16, 16, 3))
        tlc = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                     enc_blk_nums=(1, 1), dec_blk_nums=(1, 1),
                     fused_blocks=False, flat_trunk=False,
                     tlc_window=(8, 8))
        with pytest.raises(ValueError, match="TLC"):
            nafnet_apply_spatial(tlc, params, x, mesh)
        with pytest.raises(ValueError, match="unrolled"):
            nafnet_apply_spatial(net, {"intro": params["intro"]}, x, mesh)


class TestSpatialGradients:
    @pytest.mark.slow
    def test_param_grads_match_single_device(self):
        """The SP forward is differentiable end-to-end (ppermute/psum have
        exact transposes): parameter grads of a scalar loss through the
        height-sharded forward == single-device grads."""
        net = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                     enc_blk_nums=(1,), dec_blk_nums=(1,),
                     fused_blocks=False, flat_trunk=False)
        params = net.init(jax.random.PRNGKey(3),
                          jnp.zeros((1, 16, 16, 3)))["params"]
        mesh = _mesh(4)
        rng = np.random.default_rng(5)
        h = spatial_pad_multiple(net, 4)
        x = jnp.asarray(rng.normal(size=(1, h, 16, 3)).astype(np.float32))
        tgt = jnp.asarray(rng.normal(size=(1, h, 16, 3)).astype(np.float32))

        def loss_sp(p):
            return jnp.mean((nafnet_apply_spatial(net, p, x, mesh) - tgt)
                            ** 2)

        def loss_ref(p):
            return jnp.mean((net.apply({"params": p}, x) - tgt) ** 2)

        g_sp = jax.grad(loss_sp)(params)
        g_ref = jax.grad(loss_ref)(params)
        for a, b in zip(jax.tree_util.tree_leaves(g_sp),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3e-5, rtol=3e-5)
