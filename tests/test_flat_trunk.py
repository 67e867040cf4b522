"""Flat-trunk NAFNet vs the reference NHWC graph.

The flat trunk (``models/nafnet.py:_call_flat``) re-lays the whole U-shape
in ``[N, C, H*W]`` and re-lowers intro/ending 3x3 convs (shift + matmul),
the 2x2/s2 downs (phase-split + matmul) and the 1x1+PixelShuffle ups
(matmul + interleave). Same params, same math — these tests pin exact
agreement with the NHWC path (reference graph ``NAFNet_arch.py:83-162``)
for outputs and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.models.nafnet import (
    NAFNet,
    _FlatConv3x3,
    _FlatDown,
    _FlatUp,
    to_flat,
    to_nhwc,
)

import flax.linen as nn


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _net(**kw):
    kw.setdefault("img_channel", 3)
    kw.setdefault("width", 8)
    kw.setdefault("middle_blk_num", 1)
    kw.setdefault("enc_blk_nums", (1, 1))
    kw.setdefault("dec_blk_nums", (1, 1))
    return NAFNet(**kw)


class TestFlatOps:
    """Each flat lowering against the stock NHWC op it replaces."""

    @pytest.mark.parametrize("cin,cout", [(3, 8), (8, 3), (8, 8)])
    def test_flat_conv3x3_matches_nn_conv(self, rng, cin, cout):
        h, w = 12, 20
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)), jnp.float32)
        ref = nn.Conv(cout, (3, 3), padding="SAME", param_dtype=jnp.float32)
        variables = ref.init(jax.random.PRNGKey(3), x)
        flat = _FlatConv3x3(cout)
        got = flat.apply(variables, to_flat(x), (h, w))
        want = to_flat(ref.apply(variables, x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_flat_down_matches_strided_conv(self, rng):
        h, w, c = 12, 20, 8
        x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
        ref = nn.Conv(2 * c, (2, 2), strides=(2, 2), padding="VALID",
                      param_dtype=jnp.float32)
        variables = ref.init(jax.random.PRNGKey(4), x)
        got = _FlatDown(2 * c).apply(variables, to_flat(x), (h, w))
        want = to_flat(ref.apply(variables, x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_flat_up_matches_conv_pixelshuffle(self, rng):
        from lowlight_image_enhancement_tpu.models.nafnet import (
            pixel_shuffle,
        )

        h, w, c = 6, 10, 8
        x = jnp.asarray(rng.normal(size=(2, h, w, c)), jnp.float32)
        ref = nn.Conv(2 * c, (1, 1), use_bias=False,
                      param_dtype=jnp.float32)
        variables = ref.init(jax.random.PRNGKey(5), x)
        got = _FlatUp(2 * c).apply(variables, to_flat(x), (h, w))
        want = to_flat(pixel_shuffle(ref.apply(variables, x), 2))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)

    def test_to_flat_roundtrip(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 6, 10, 4)), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(to_nhwc(to_flat(x), 6, 10)), np.asarray(x))


class TestFlatTrunk:
    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)
    def test_param_tree_identical(self):
        x = jnp.zeros((1, 16, 16, 3))
        p_ref = _net(flat_trunk=False).init(jax.random.PRNGKey(0), x)
        p_flat = _net(flat_trunk=True, fused_blocks=False).init(
            jax.random.PRNGKey(0), x)
        ref_shapes = jax.tree_util.tree_map(jnp.shape, p_ref)
        flat_shapes = jax.tree_util.tree_map(jnp.shape, p_flat)
        assert ref_shapes == flat_shapes

    @pytest.mark.parametrize("hw", [(16, 16), (20, 28)])
    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)
    def test_forward_parity_unfused(self, rng, hw):
        """flat_trunk=True with unfused stacks (NHWC fallback inside) must
        equal the plain NHWC graph — exercises the flat conv/down/up ops
        and the skip/residual plumbing, incl. non-multiple sizes (pad +
        crop)."""
        h, w = hw
        x = jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)), jnp.float32)
        ref = _net(flat_trunk=False, fused_blocks=False)
        variables = ref.init(jax.random.PRNGKey(0), x)
        y_ref = ref.apply(variables, x)
        y_flat = _net(flat_trunk=True, fused_blocks=False).apply(
            variables, x)
        np.testing.assert_allclose(np.asarray(y_flat), np.asarray(y_ref),
                                   atol=3e-5)

    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)

    def test_grad_parity_unfused(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        t = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        ref = _net(flat_trunk=False, fused_blocks=False)
        flat = _net(flat_trunk=True, fused_blocks=False)
        variables = ref.init(jax.random.PRNGKey(0), x)

        def loss(net):
            def f(p):
                return jnp.mean(
                    (net.apply({"params": p}, x) - t) ** 2)
            return jax.grad(f)(variables["params"])

        g_ref, g_flat = loss(ref), loss(flat)
        flat_leaves = jax.tree_util.tree_leaves_with_path(g_flat)
        ref_tree = g_ref
        for path, leaf in flat_leaves:
            ref_leaf = ref_tree
            for k in path:
                ref_leaf = ref_leaf[k.key]
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(ref_leaf), atol=5e-5,
                err_msg=str(path))

    @pytest.mark.slow
    def test_forward_parity_fused_interpret(self, rng):
        """Full flat pipeline with FusedNAFBlock stacks (interpret mode on
        CPU) vs the NHWC graph."""
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        ref = _net(flat_trunk=False, fused_blocks=False)
        variables = ref.init(jax.random.PRNGKey(0), x)
        y_ref = ref.apply(variables, x)
        y_flat = _net(flat_trunk=True, fused_blocks=True).apply(
            variables, x)
        np.testing.assert_allclose(np.asarray(y_flat), np.asarray(y_ref),
                                   atol=3e-5)
