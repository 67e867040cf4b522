"""UNet / Baseline / SwinIR backbone tests: registry, shapes, gradients,
window-attention invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (see pytest.ini)

from lowlight_image_enhancement_tpu.models import define_network
from lowlight_image_enhancement_tpu.models.swinir import (
    SwinIR,
    window_partition,
    window_reverse,
)
from lowlight_image_enhancement_tpu.models.unet import UNetSID
from lowlight_image_enhancement_tpu.models.baseline import Baseline


class TestWindows:
    def test_partition_reverse_roundtrip(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 4)),
                        dtype=jnp.float32)
        wins = window_partition(x, 8)
        assert wins.shape == (2 * 2 * 3, 8, 8, 4)
        back = window_reverse(wins, 8, 16, 24)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))

    def test_shift_mask_structure(self):
        """The shifted-window attention mask must isolate wrap-around
        regions: diagonal blocks are 0 (self-attention allowed), and every
        window containing wrapped content has -100 entries."""
        from lowlight_image_enhancement_tpu.models.swinir import (
            _shift_attn_mask,
        )

        mask = _shift_attn_mask(16, 16, 8, 4)
        assert mask.shape == (4, 64, 64)
        # values are exactly {0, -100}
        assert set(np.unique(mask)) <= {0.0, -100.0}
        # window 0 (top-left) has no wrapped content: fully 0
        np.testing.assert_array_equal(mask[0], 0.0)
        # the bottom-right window mixes 4 regions: blocked pairs exist
        assert (mask[3] == -100.0).any()
        # diagonal is always 0 (a token attends to itself)
        for wi in range(4):
            np.testing.assert_array_equal(np.diagonal(mask[wi]), 0.0)

    def test_window_isolation_in_attention(self, rng):
        """Tokens in different windows must not influence each other:
        perturbing window B leaves window A's output bit-identical."""
        import jax

        from lowlight_image_enhancement_tpu.models.swinir import SwinBlock

        blk = SwinBlock(dim=8, num_heads=2, window_size=8, shift=0)
        x = jnp.asarray(rng.standard_normal((1, 8, 16, 8)),
                        dtype=jnp.float32)  # two 8x8 windows side by side
        params = blk.init(jax.random.PRNGKey(0), x)
        y1 = blk.apply(params, x)
        x2 = x.at[:, :, 8:, :].add(1.0)  # perturb only the right window
        y2 = blk.apply(params, x2)
        np.testing.assert_array_equal(
            np.asarray(y1[:, :, :8, :]), np.asarray(y2[:, :, :8, :])
        )
        assert not np.allclose(np.asarray(y1[:, :, 8:, :]),
                               np.asarray(y2[:, :, 8:, :]))


@pytest.mark.parametrize(
    "opt,shape",
    [
        ({"type": "UNetSID", "base_channels": 8,
          "depths": (8, 16, 32)}, (1, 32, 32, 3)),
        ({"type": "Baseline", "width": 8, "middle_blk_num": 1,
          "enc_blk_nums": (1, 1), "dec_blk_nums": (1, 1)}, (1, 16, 16, 3)),
        ({"type": "SwinIR", "embed_dim": 16, "depths": (2,),
          "num_heads": (2,), "window_size": 8}, (1, 16, 16, 3)),
        ({"type": "SwinIRRestoration", "embed_dim": 16, "depths": (2,),
          "num_heads": (2,), "window_size": 8}, (1, 16, 16, 3)),
    ],
)
class TestArchs:
    def test_forward_shape(self, rng, opt, shape):
        net = define_network(dict(opt))
        x = jnp.asarray(rng.uniform(0, 1, shape), dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == shape
        assert np.all(np.isfinite(np.asarray(y)))

    def test_grad_flows(self, rng, opt, shape):
        net = define_network(dict(opt))
        x = jnp.asarray(rng.uniform(0, 1, shape), dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.mean(net.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        assert any(float(jnp.linalg.norm(l)) > 0 for l in leaves)


class TestNAFNetTPU:
    def test_s2d_forward_and_grad(self, rng):
        net = define_network({"type": "NAFNetTPU", "width": 16,
                              "enc_blk_nums": (1, 1), "middle_blk_num": 1,
                              "dec_blk_nums": (1, 1),
                              "dtype": jnp.float32})
        x = jnp.asarray(rng.uniform(0, 1, (1, 35, 41, 3)),
                        dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (1, 35, 41, 3)
        assert np.all(np.isfinite(np.asarray(y)))
        g = jax.grad(lambda p: jnp.mean(net.apply(p, x) ** 2))(params)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree_util.tree_leaves(g))

    def test_s2d_d2s_roundtrip_identity(self, rng):
        """pixel_unshuffle then pixel_shuffle must be the exact identity
        (the s2d/d2s pair around the trunk preserves pixels)."""
        from lowlight_image_enhancement_tpu.models.nafnet import (
            pixel_shuffle,
        )
        from lowlight_image_enhancement_tpu.ops.image_ops import (
            pixel_unshuffle,
        )

        x = jnp.asarray(rng.uniform(0, 1, (2, 16, 20, 3)),
                        dtype=jnp.float32)
        back = pixel_shuffle(pixel_unshuffle(x, 2), 2)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


class TestOddSizes:
    def test_swinir_pads_non_multiple(self, rng):
        net = SwinIR(embed_dim=16, depths=(2,), num_heads=(2,),
                     window_size=8)
        x = jnp.asarray(rng.uniform(0, 1, (1, 19, 23, 3)),
                        dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        assert net.apply(params, x).shape == (1, 19, 23, 3)

    def test_baseline_pads_non_multiple(self, rng):
        net = Baseline(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                       dec_blk_nums=(1, 1))
        x = jnp.asarray(rng.uniform(0, 1, (1, 13, 10, 3)),
                        dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        assert net.apply(params, x).shape == (1, 13, 10, 3)

    def test_unet_param_count_scales(self):
        from lowlight_image_enhancement_tpu.metrics.parameter_utils import (
            count_parameters,
        )

        small = UNetSID(depths=(8, 16))
        big = UNetSID(depths=(32, 64, 128, 256))
        x = jnp.zeros((1, 32, 32, 3))
        p_small = count_parameters(
            small.init(jax.random.PRNGKey(0), x)["params"])
        p_big = count_parameters(big.init(jax.random.PRNGKey(0), x)["params"])
        assert p_big > p_small * 10
