"""PSF kernel invariants + adjoint-gradient identities.

TPU-native port of the reference test strategy in
``core_tests/test_psf_depthwise_and_kernels.py`` and
``core_tests/test_physics_loss_grad.py``: mathematical-property tests
(adjoint identity, analytic L1 gradient, finite-difference grad check),
not snapshot tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.ops.psf import (
    CrosstalkPSF,
    NewBPLayer,
    build_psf_kernels,
    create_crosstalk_psf,
    depthwise_conv,
    newbp_conv,
    normalize_psf_energy,
)


def _manual_depthwise(x, kernel):
    """Straight-line NumPy depthwise conv (zero pad SAME) as ground truth."""
    x = np.asarray(x)
    k = np.asarray(kernel)
    n, h, w, c = x.shape
    if k.shape[0] == 1:
        k = np.broadcast_to(k, (c,) + k.shape[1:])
    kh, kw = k.shape[1:]
    ph, pw = kh // 2, kw // 2
    xp = np.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    out = np.zeros_like(x)
    for ci in range(c):
        for i in range(h):
            for j in range(w):
                out[:, i, j, ci] = np.sum(
                    xp[:, i : i + kh, j : j + kw, ci] * k[ci], axis=(1, 2)
                )
    return out


class TestKernelConstants:
    def test_p2_shape_and_center(self):
        k = build_psf_kernels("mono", "P2")
        assert k.shape == (1, 3, 3)
        assert np.isclose(float(k[0, 1, 1]), 0.88)

    def test_b2_shape_and_centers(self):
        k = build_psf_kernels("rgb", "B2")
        assert k.shape == (3, 3, 3)
        centers = np.asarray(k[:, 1, 1])
        np.testing.assert_allclose(centers, [0.86, 0.88, 0.90], atol=1e-6)
        # off-center leakage R > G > B
        off = np.asarray(k[:, 0, 1])
        assert off[0] > off[1] > off[2]

    def test_invalid_mode_and_spec(self):
        with pytest.raises(ValueError):
            build_psf_kernels("bayer")
        with pytest.raises(ValueError):
            build_psf_kernels("mono", "B2")
        with pytest.raises(ValueError):
            build_psf_kernels("rgb", "P2")

    def test_energy_normalization(self):
        k = normalize_psf_energy(jnp.ones((3, 3, 3)) * 2.0)
        sums = np.asarray(jnp.sum(k.reshape(3, -1), axis=1))
        np.testing.assert_allclose(sums, 1.0, atol=1e-6)
        assert np.all(np.asarray(k) >= 0)

    def test_psf_factory_normalized(self):
        for mode in ("mono", "rgb"):
            psf = create_crosstalk_psf(mode)
            sums = np.asarray(
                jnp.sum(psf.kernel.reshape(psf.kernel.shape[0], -1), axis=1)
            )
            np.testing.assert_allclose(sums, 1.0, atol=1e-5)


class TestDepthwiseConv:
    def test_mono_broadcast_equals_manual(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), dtype=jnp.float32)
        k = build_psf_kernels("mono", "P2")
        got = depthwise_conv(x, k)
        want = _manual_depthwise(x, k)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_rgb_per_channel_equals_manual(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 6, 7, 3)), dtype=jnp.float32)
        k = build_psf_kernels("rgb", "B2")
        got = depthwise_conv(x, k)
        want = _manual_depthwise(x, k)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_padding_modes_shapes(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 5, 5, 3)), dtype=jnp.float32)
        k = build_psf_kernels("mono", "P2")
        for pad in ("zero", "replicate", "reflect"):
            assert depthwise_conv(x, k, padding=pad).shape == x.shape

    def test_channel_mismatch_raises(self, rng):
        x = jnp.ones((1, 4, 4, 4))
        k = build_psf_kernels("rgb", "B2")  # 3 channels
        with pytest.raises(ValueError):
            depthwise_conv(x, k)


class TestCrosstalkPSF:
    def test_forward_preserves_shape_and_energy(self, rng):
        psf = create_crosstalk_psf("rgb", "B2")
        x = jnp.ones((2, 16, 16, 3))
        y = psf(x)
        assert y.shape == x.shape
        # interior pixels of a constant image stay ~1 (energy preservation)
        np.testing.assert_allclose(np.asarray(y[:, 2:-2, 2:-2]), 1.0, atol=1e-5)

    def test_requires_3_channels(self):
        psf = create_crosstalk_psf("mono")
        with pytest.raises(ValueError):
            psf(jnp.ones((1, 4, 4, 4)))

    def test_kernel_is_pytree_state_not_param(self):
        psf = create_crosstalk_psf("mono")
        leaves, treedef = jax.tree_util.tree_flatten(psf)
        assert len(leaves) == 1 and leaves[0].shape == (1, 3, 3)
        psf2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert psf2.mode == "mono"

    def test_kernel_receives_zero_gradient(self, rng):
        psf = create_crosstalk_psf("mono")
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), dtype=jnp.float32)

        def loss(p, xx):
            return jnp.sum(p(xx) ** 2)

        gpsf = jax.grad(loss)(psf, x)
        np.testing.assert_allclose(np.asarray(gpsf.kernel), 0.0, atol=0)

    def test_deprecated_newbp_layer_raises(self):
        layer = NewBPLayer()
        with pytest.raises(RuntimeError, match="Scenario B"):
            layer(jnp.ones((1, 4, 4, 3)))


class TestAdjointIdentity:
    """grad_x <g, K*x> must equal conv with the flipped kernel (K^T g)."""

    @pytest.mark.parametrize("mode,spec", [("mono", "P2"), ("rgb", "B2")])
    def test_vjp_is_flipped_conv(self, rng, mode, spec):
        k = normalize_psf_energy(build_psf_kernels(mode, spec))
        x = jnp.asarray(rng.standard_normal((2, 10, 10, 3)), dtype=jnp.float32)
        g = jnp.asarray(rng.standard_normal((2, 10, 10, 3)), dtype=jnp.float32)

        _, vjp_fn = jax.vjp(lambda xx: newbp_conv(xx, k), x)
        (dx,) = vjp_fn(g)

        k_flipped = k[:, ::-1, ::-1]
        want = depthwise_conv(g, k_flipped)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(want), atol=1e-5)

    def test_inner_product_adjoint(self, rng):
        """<K x, y> == <x, K^T y> — the defining adjoint identity."""
        k = normalize_psf_energy(build_psf_kernels("rgb", "B2"))
        x = jnp.asarray(rng.standard_normal((1, 9, 9, 3)), dtype=jnp.float32)
        y = jnp.asarray(rng.standard_normal((1, 9, 9, 3)), dtype=jnp.float32)
        lhs = jnp.vdot(newbp_conv(x, k), y)
        rhs = jnp.vdot(x, depthwise_conv(y, k[:, ::-1, ::-1]))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-5)

    def test_analytic_l1_gradient(self, rng):
        """grad of ||K x - t||_1 w.r.t. x is K^T sign(K x - t)."""
        k = normalize_psf_energy(build_psf_kernels("mono", "P2"))
        x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), dtype=jnp.float32)
        t = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), dtype=jnp.float32)

        def l1(xx):
            return jnp.sum(jnp.abs(newbp_conv(xx, k) - t))

        got = jax.grad(l1)(x)
        residual_sign = jnp.sign(newbp_conv(x, k) - t)
        want = depthwise_conv(residual_sign, k[:, ::-1, ::-1])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_finite_difference_check(self, rng):
        """check_grads on a smooth (L2) functional of the PSF conv."""
        from jax.test_util import check_grads

        k = normalize_psf_energy(build_psf_kernels("mono", "P2"))
        x = jnp.asarray(rng.standard_normal((1, 6, 6, 3)), dtype=jnp.float32)

        def f(xx):
            return jnp.sum(newbp_conv(xx, k) ** 2)

        check_grads(f, (x,), order=1, modes=["rev"], atol=1e-2, rtol=1e-2)
