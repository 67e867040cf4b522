"""Generic blocks (ResidualBlockNoBN, make_layer, UpsamplePixelShuffle) and
MATLAB imresize tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.models.blocks import (
    ResidualBlockNoBN,
    UpsamplePixelShuffle,
    make_layer,
)
from lowlight_image_enhancement_tpu.utils.matlab_resize import imresize


class TestBlocks:
    def test_residual_block_shapes_and_identity_bias(self, rng):
        blk = ResidualBlockNoBN(features=16)
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 16)),
                        dtype=jnp.float32)
        params = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(params, x)
        assert y.shape == x.shape
        # small-init: output stays close to the identity at init
        assert float(jnp.mean(jnp.abs(y - x))) < 0.5

    def test_make_layer_stacks(self, rng):
        import flax.linen as nn

        class Trunk(nn.Module):
            @nn.compact
            def __call__(self, x):
                return make_layer(ResidualBlockNoBN, 3, features=8)(x)

        trunk = Trunk()
        x = jnp.zeros((1, 4, 4, 8))
        params = trunk.init(jax.random.PRNGKey(0), x)
        names = set(params["params"].keys())
        assert {"block0", "block1", "block2"} <= names

    @pytest.mark.parametrize("scale", [1, 2, 3, 4])
    def test_upsample_scales(self, rng, scale):
        up = UpsamplePixelShuffle(scale=scale, features=8)
        x = jnp.asarray(rng.standard_normal((1, 6, 5, 8)),
                        dtype=jnp.float32)
        params = up.init(jax.random.PRNGKey(0), x)
        y = up.apply(params, x)
        assert y.shape == (1, 6 * scale, 5 * scale, 8)

    def test_upsample_bad_scale(self):
        with pytest.raises(ValueError):
            UpsamplePixelShuffle(scale=5, features=4).init(
                jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 4)))


class TestMatlabResize:
    def test_identity_scale(self, rng):
        img = rng.uniform(0, 1, (16, 16, 3))
        out = imresize(img, scale=1.0)
        np.testing.assert_allclose(out, img, atol=1e-10)

    def test_downsample_constant_preserved(self):
        img = np.full((32, 32), 0.37)
        out = imresize(img, scale=0.5)
        assert out.shape == (16, 16)
        np.testing.assert_allclose(out, 0.37, atol=1e-10)

    def test_upsample_shape_and_range(self, rng):
        img = rng.uniform(0, 1, (8, 12, 3))
        out = imresize(img, scale=2.0)
        assert out.shape == (16, 24, 3)
        # bicubic can ring slightly beyond the range but not wildly
        assert out.min() > -0.2 and out.max() < 1.2

    def test_out_shape_api(self, rng):
        img = rng.uniform(0, 1, (10, 10))
        out = imresize(img, out_shape=(7, 13))
        assert out.shape == (7, 13)

    def test_antialias_beats_naive_subsampling(self, rng):
        """Downsampling a checkerboard: the antialiased result is near the
        mean (0.5) instead of aliasing to one phase."""
        img = np.indices((32, 32)).sum(axis=0) % 2
        out = imresize(img.astype(np.float64), scale=0.25)
        assert abs(out.mean() - 0.5) < 0.05
        assert out.std() < 0.25  # aliased subsampling would give ~0.5

    def test_matches_known_linear_ramp(self):
        """Resizing a linear ramp must stay (nearly) linear — bicubic
        reproduces polynomials up to degree 1 exactly in the interior."""
        ramp = np.linspace(0, 1, 16)[None, :].repeat(16, 0)
        out = imresize(ramp, scale=2.0)
        interior = out[4:-4, 4:-4]
        gx = np.diff(interior, axis=1)
        np.testing.assert_allclose(gx, gx[0, 0], atol=1e-6)
