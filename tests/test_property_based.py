"""Property-based tests (hypothesis) for the mathematical core: invariants
that must hold for arbitrary inputs, not just fixtures."""

import jax.numpy as jnp
import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

from lowlight_image_enhancement_tpu.metrics.linear import (
    psnr_linear,
    ssim_linear,
)
from lowlight_image_enhancement_tpu.ops.psf import (
    build_psf_kernels,
    depthwise_conv,
    newbp_conv,
    normalize_psf_energy,
)

_SETTINGS = settings(max_examples=25, deadline=None)

imgs = hnp.arrays(
    np.float32, (1, 12, 12, 3),
    elements=st.floats(0.0, 1.0, width=32, allow_nan=False),
)


class TestPsnrProperties:
    @_SETTINGS
    @given(imgs, imgs)
    def test_symmetry(self, a, b):
        p1 = float(psnr_linear(jnp.asarray(a), jnp.asarray(b)))
        p2 = float(psnr_linear(jnp.asarray(b), jnp.asarray(a)))
        assert p1 == p2 or (np.isinf(p1) and np.isinf(p2))

    @_SETTINGS
    @given(imgs, st.floats(0.01, 0.2))
    def test_monotone_in_noise_scale(self, a, eps):
        noise = np.random.default_rng(0).standard_normal(a.shape)
        noise = noise.astype(np.float32)
        p_small = float(psnr_linear(jnp.asarray(a),
                                    jnp.asarray(a + eps * noise)))
        p_big = float(psnr_linear(jnp.asarray(a),
                                  jnp.asarray(a + 2 * eps * noise)))
        assert p_small >= p_big

    @_SETTINGS
    @given(imgs, imgs, st.floats(1.5, 255.0))
    def test_data_range_shift_is_additive_constant(self, a, b, scale):
        """PSNR(a*s, b*s, range=s) == PSNR(a, b, range=1)."""
        p1 = float(psnr_linear(jnp.asarray(a), jnp.asarray(b)))
        p2 = float(psnr_linear(jnp.asarray(a * scale),
                               jnp.asarray(b * scale),
                               data_range=float(scale)))
        if np.isfinite(p1):
            np.testing.assert_allclose(p1, p2, atol=1e-3)


class TestSsimProperties:
    @_SETTINGS
    @given(hnp.arrays(np.float32, (1, 16, 16, 1),
                      elements=st.floats(0.0, 1.0, width=32,
                                         allow_nan=False)))
    def test_bounds_and_self_similarity(self, a):
        aj = jnp.asarray(a)
        s_self = float(ssim_linear(aj, aj, kernel_size=7))
        assert s_self > 0.99
        b = jnp.asarray(np.roll(a, 3, axis=1))
        s = float(ssim_linear(aj, b, kernel_size=7))
        assert -1.001 <= s <= 1.001


class TestPsfProperties:
    @_SETTINGS
    @given(imgs, imgs, st.floats(0.1, 5.0))
    def test_linearity(self, a, b, alpha):
        """K(alpha*a + b) == alpha*K(a) + K(b)."""
        k = normalize_psf_energy(build_psf_kernels("rgb", "B2"))
        lhs = newbp_conv(jnp.asarray(alpha * a + b), k)
        rhs = alpha * newbp_conv(jnp.asarray(a), k) + newbp_conv(
            jnp.asarray(b), k)
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                                   atol=1e-4)

    @_SETTINGS
    @given(imgs)
    def test_energy_conservation_interior(self, a):
        """A normalized PSF preserves the local mean away from borders."""
        k = normalize_psf_energy(build_psf_kernels("mono", "P2"))
        y = depthwise_conv(jnp.asarray(a), k)
        interior_in = np.asarray(a)[:, 2:-2, 2:-2, :]
        interior_out = np.asarray(y)[:, 2:-2, 2:-2, :]
        np.testing.assert_allclose(interior_out.mean(), interior_in.mean(),
                                   atol=0.02)

    @_SETTINGS
    @given(imgs, imgs)
    def test_adjoint_identity_random(self, x, y):
        """<K x, y> == <x, K^T y> for arbitrary x, y."""
        k = normalize_psf_energy(build_psf_kernels("mono", "P2"))
        lhs = float(jnp.vdot(newbp_conv(jnp.asarray(x), k), jnp.asarray(y)))
        rhs = float(jnp.vdot(jnp.asarray(x),
                             depthwise_conv(jnp.asarray(y),
                                            k[:, ::-1, ::-1])))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-3, atol=1e-4)


class TestFlatOpProperties:
    """Flat-trunk conv/resample lowerings vs their stock NHWC
    counterparts over randomized shapes and channel widths (the fixture
    tests in test_flat_trunk.py pin a few shapes; these sweep)."""

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(2, 6).map(lambda k: 2 * k),   # h even
        st.integers(2, 8).map(lambda k: 2 * k),   # w even
        st.sampled_from([1, 3, 4, 8]),
        st.sampled_from([3, 4, 8, 16]),
        st.integers(0, 2 ** 31 - 1),
    )
    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)
    def test_flat_conv3x3_any_shape(self, h, w, cin, cout, seed):
        import flax.linen as nn
        import jax

        from lowlight_image_enhancement_tpu.models.nafnet import (
            _FlatConv3x3,
            to_flat,
        )

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(1, h, w, cin)), jnp.float32)
        ref = nn.Conv(cout, (3, 3), padding="SAME",
                      param_dtype=jnp.float32)
        variables = ref.init(jax.random.PRNGKey(seed % 997), x)
        got = _FlatConv3x3(cout).apply(variables, to_flat(x), (h, w))
        want = to_flat(ref.apply(variables, x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5)

    @settings(max_examples=10, deadline=None)
    @given(
        st.integers(2, 6).map(lambda k: 2 * k),
        st.integers(2, 8).map(lambda k: 2 * k),
        st.sampled_from([4, 8, 16]),
        st.integers(0, 2 ** 31 - 1),
    )
    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)
    def test_flat_down_up_any_shape(self, h, w, c, seed):
        import flax.linen as nn
        import jax

        from lowlight_image_enhancement_tpu.models.nafnet import (
            _FlatDown,
            _FlatUp,
            pixel_shuffle,
            to_flat,
        )

        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(1, h, w, c)), jnp.float32)
        down = nn.Conv(2 * c, (2, 2), strides=(2, 2), padding="VALID",
                       param_dtype=jnp.float32)
        dv = down.init(jax.random.PRNGKey(seed % 991), x)
        np.testing.assert_allclose(
            np.asarray(_FlatDown(2 * c).apply(dv, to_flat(x), (h, w))),
            np.asarray(to_flat(down.apply(dv, x))), atol=3e-5)

        up = nn.Conv(2 * c, (1, 1), use_bias=False,
                     param_dtype=jnp.float32)
        uv = up.init(jax.random.PRNGKey(seed % 983), x)
        np.testing.assert_allclose(
            np.asarray(_FlatUp(2 * c).apply(uv, to_flat(x), (h, w))),
            np.asarray(to_flat(pixel_shuffle(up.apply(uv, x), 2))),
            atol=3e-5)
