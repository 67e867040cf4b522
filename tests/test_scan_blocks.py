"""Scanned-vs-unrolled NAFNet equivalence: the lax.scan block-stack variant
must be numerically identical to the unrolled network given converted
params, in both directions."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.models.nafnet import (
    NAFNet,
    stack_block_params,
    unstack_block_params,
)

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (see pytest.ini)


def _nets():
    kw = dict(img_channel=3, width=8, middle_blk_num=2,
              enc_blk_nums=(2, 1), dec_blk_nums=(1, 2))
    return NAFNet(**kw), NAFNet(scan_blocks=True, **kw)


class TestScanBlocks:
    def test_stacked_params_equivalent_forward(self, rng):
        unrolled, scanned = _nets()
        x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)),
                        dtype=jnp.float32)
        p_unrolled = unrolled.init(jax.random.PRNGKey(0), x)["params"]
        p_stacked = stack_block_params(p_unrolled)
        y1 = unrolled.apply({"params": p_unrolled}, x)
        y2 = scanned.apply({"params": p_stacked}, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=1e-6)

    def test_roundtrip_unstack(self, rng):
        unrolled, _ = _nets()
        x = jnp.zeros((1, 16, 16, 3))
        p = unrolled.init(jax.random.PRNGKey(0), x)["params"]
        back = unstack_block_params(stack_block_params(p))
        for (pa, la), (pb, lb) in zip(
            jax.tree_util.tree_flatten_with_path(p)[0],
            jax.tree_util.tree_flatten_with_path(back)[0],
        ):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_scanned_gradients_match(self, rng):
        unrolled, scanned = _nets()
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)),
                        dtype=jnp.float32)
        t = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)),
                        dtype=jnp.float32)
        p_unrolled = unrolled.init(jax.random.PRNGKey(0), x)["params"]
        p_stacked = stack_block_params(p_unrolled)

        g_u = jax.grad(lambda p: jnp.mean(
            (unrolled.apply({"params": p}, x) - t) ** 2))(p_unrolled)
        g_s = jax.grad(lambda p: jnp.mean(
            (scanned.apply({"params": p}, x) - t) ** 2))(p_stacked)
        # compare a representative stacked leaf against restacked unrolled
        g_u_stacked = stack_block_params(g_u)
        leaf_s = g_s["mid_blks"]["scan"]["blk"]["conv1"]["kernel"]
        leaf_u = g_u_stacked["mid_blks"]["scan"]["blk"]["conv1"]["kernel"]
        np.testing.assert_allclose(np.asarray(leaf_s), np.asarray(leaf_u),
                                   atol=1e-6)
