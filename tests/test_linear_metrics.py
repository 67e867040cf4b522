"""Linear PSNR/SSIM regression tests (port of reference
``standard_tests/test_linear_metrics.py`` strategy: known-value checks,
contract validation, error paths)."""

import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.metrics.linear import psnr_linear, ssim_linear
from lowlight_image_enhancement_tpu.metrics.psnr import calculate_psnr


class TestPsnrLinear:
    def test_identical_images_inf(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), dtype=jnp.float32)
        v = psnr_linear(x, x, reduction="none")
        assert np.all(np.isinf(np.asarray(v)))

    def test_known_value(self):
        # constant offset d: MSE = d^2, PSNR = -20 log10(d) for range 1
        d = 0.1
        x = jnp.zeros((1, 8, 8, 3))
        y = jnp.full((1, 8, 8, 3), d)
        v = float(psnr_linear(x, y))
        np.testing.assert_allclose(v, 20.0, atol=1e-4)

    def test_data_range_shift(self):
        # same absolute error, range 255 -> PSNR shifts by 20 log10(255)
        x = jnp.zeros((1, 8, 8, 1))
        y = jnp.full((1, 8, 8, 1), 2.55)
        v = float(psnr_linear(x, y, data_range=255.0))
        np.testing.assert_allclose(v, 40.0, atol=1e-3)

    def test_reductions(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)), dtype=jnp.float32)
        y = jnp.asarray(rng.uniform(0, 1, (4, 8, 8, 3)), dtype=jnp.float32)
        none = np.asarray(psnr_linear(x, y, reduction="none"))
        assert none.shape == (4,)
        np.testing.assert_allclose(
            float(psnr_linear(x, y, reduction="mean")), none.mean(), rtol=1e-5
        )
        np.testing.assert_allclose(
            float(psnr_linear(x, y, reduction="sum")), none.sum(), rtol=1e-5
        )

    def test_clamp_option(self):
        x = jnp.full((1, 4, 4, 1), 1.5)  # out of range
        y = jnp.ones((1, 4, 4, 1))
        assert np.isinf(float(psnr_linear(x, y, clamp=True)))

    def test_errors(self):
        with pytest.raises(ValueError):
            psnr_linear(jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, 4, 5, 3)))
        with pytest.raises(ValueError):
            psnr_linear(jnp.zeros((4, 4, 3)), jnp.zeros((4, 4, 3)))
        with pytest.raises(ValueError):
            psnr_linear(jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, 4, 4, 3)),
                        data_range=0.0)
        with pytest.raises(ValueError):
            psnr_linear(jnp.zeros((1, 4, 4, 3)), jnp.zeros((1, 4, 4, 3)),
                        reduction="median")

    def test_matches_host_calculate_psnr(self, rng):
        x = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        y = rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32)
        # whole-batch host PSNR vs per-image mean differ in general; compare
        # on a single image where they coincide
        v1 = calculate_psnr(x[:1], y[:1])
        v2 = float(psnr_linear(jnp.asarray(x[:1]), jnp.asarray(y[:1])))
        np.testing.assert_allclose(v1, v2, rtol=1e-4)


class TestSsimLinear:
    def test_identical_images_one(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), dtype=jnp.float32)
        np.testing.assert_allclose(float(ssim_linear(x, x)), 1.0, atol=1e-5)

    def test_uncorrelated_noise_low(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), dtype=jnp.float32)
        y = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 1)), dtype=jnp.float32)
        assert float(ssim_linear(x, y)) < 0.2

    def test_monotone_with_noise_level(self, rng):
        x = jnp.asarray(rng.uniform(0.2, 0.8, (1, 64, 64, 3)),
                        dtype=jnp.float32)
        noise = jnp.asarray(rng.standard_normal((1, 64, 64, 3)),
                            dtype=jnp.float32)
        prev = 1.0
        for level in (0.01, 0.05, 0.15):
            s = float(ssim_linear(x, x + level * noise))
            assert s < prev
            prev = s

    def test_luminance_shift_sensitivity(self):
        x = jnp.full((1, 32, 32, 1), 0.5)
        y = jnp.full((1, 32, 32, 1), 0.6)
        s = float(ssim_linear(x, y))
        # constant-patch SSIM = (2 mu_x mu_y + c1)/(mu_x^2+mu_y^2+c1)
        c1 = 0.01**2
        want = (2 * 0.5 * 0.6 + c1) / (0.25 + 0.36 + c1)
        np.testing.assert_allclose(s, want, atol=1e-4)

    def test_per_channel_shape(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), dtype=jnp.float32)
        y = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), dtype=jnp.float32)
        s = ssim_linear(x, y, per_channel=True, reduction="none")
        assert s.shape == (2, 3)

    def test_padding_modes_run(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)), dtype=jnp.float32)
        y = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)), dtype=jnp.float32)
        for pad in ("reflect", "replicate", "zero"):
            v = float(ssim_linear(x, y, padding=pad))
            assert -1.0 <= v <= 1.0

    def test_errors(self):
        x = jnp.zeros((1, 8, 8, 1))
        with pytest.raises(ValueError):
            ssim_linear(x, x, kernel_size=4)
        with pytest.raises(ValueError):
            ssim_linear(x, x)  # window 11 > image 8
        with pytest.raises(ValueError):
            ssim_linear(x, jnp.zeros((1, 8, 9, 1)), kernel_size=5)
