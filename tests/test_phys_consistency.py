"""Physics-consistency metric tests (port of reference
``standard_tests/test_phys_consistency.py``): operator correctness, exposure
broadcast, valid-crop, error paths, direction contract."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.metrics.phys_consistency import (
    phys_cons_raw,
    phys_cons_srgb,
)
from lowlight_image_enhancement_tpu.ops.psf import (
    build_psf_kernels,
    depthwise_conv,
    normalize_psf_energy,
)


@pytest.fixture
def k_mono():
    return build_psf_kernels("mono", "P2")


class TestPhysCons:
    def test_perfect_consistency_zero(self, rng, k_mono):
        """A = rho*(K*Bhat) exactly -> metric ~0."""
        bhat = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)),
                           dtype=jnp.float32)
        rho = 5.0
        kn = normalize_psf_energy(k_mono)
        a = rho * depthwise_conv(bhat, kn, padding="reflect")
        v = float(phys_cons_raw(bhat, a, k_mono, rho))
        assert v < 1e-5

    def test_direction_is_rho_times_kb(self, rng, k_mono):
        """Metric scales K*Bhat by rho (NOT A) — the reference's
        model-faithful contract (phys_consistency.py:229-236)."""
        bhat = jnp.asarray(rng.uniform(0.2, 0.8, (1, 12, 12, 3)),
                           dtype=jnp.float32)
        a = jnp.asarray(rng.uniform(0, 0.1, (1, 12, 12, 3)),
                        dtype=jnp.float32)
        kn = normalize_psf_energy(k_mono)
        rho = 3.0
        got = float(phys_cons_raw(bhat, a, k_mono, rho, padding="reflect"))
        proj = rho * depthwise_conv(bhat, kn, padding="reflect")
        want = float(jnp.mean(jnp.abs(proj - a)[:, 1:-1, 1:-1, :]))
        np.testing.assert_allclose(got, want, rtol=1e-5)

    def test_exposure_broadcast_forms(self, rng, k_mono):
        bhat = jnp.asarray(rng.uniform(0, 1, (2, 10, 10, 3)),
                           dtype=jnp.float32)
        a = jnp.asarray(rng.uniform(0, 1, (2, 10, 10, 3)), dtype=jnp.float32)
        v_scalar = float(phys_cons_raw(bhat, a, k_mono, 2.0))
        v_vec = float(phys_cons_raw(bhat, a, k_mono, jnp.asarray([2.0, 2.0])))
        v_4d = float(
            phys_cons_raw(bhat, a, k_mono, jnp.full((2, 1, 1, 1), 2.0))
        )
        np.testing.assert_allclose(v_scalar, v_vec, rtol=1e-6)
        np.testing.assert_allclose(v_scalar, v_4d, rtol=1e-6)

    def test_valid_crop_excludes_margin(self, rng, k_mono):
        """Corrupting only the 1-px border must not change the metric."""
        bhat = jnp.asarray(rng.uniform(0, 1, (1, 12, 12, 3)),
                           dtype=jnp.float32)
        kn = normalize_psf_energy(k_mono)
        a = depthwise_conv(bhat, kn, padding="zero")
        v_clean = float(phys_cons_raw(bhat, a, k_mono, 1.0, padding="zero"))
        a_dirty = a.at[:, 0, :, :].set(9.0)
        # corrupt A's border: residual changes only in the cropped margin
        v_dirty = float(
            phys_cons_raw(bhat, a_dirty, k_mono, 1.0, padding="zero")
        )
        np.testing.assert_allclose(v_clean, v_dirty, atol=1e-6)

    def test_charbonnier_ge_l1_minus_eps(self, rng, k_mono):
        bhat = jnp.asarray(rng.uniform(0, 1, (1, 10, 10, 3)),
                           dtype=jnp.float32)
        a = jnp.asarray(rng.uniform(0, 1, (1, 10, 10, 3)), dtype=jnp.float32)
        l1 = float(phys_cons_raw(bhat, a, k_mono, 1.0, penalty="l1"))
        ch = float(phys_cons_raw(bhat, a, k_mono, 1.0, penalty="charbonnier"))
        assert ch >= l1

    def test_return_map(self, rng, k_mono):
        bhat = jnp.asarray(rng.uniform(0, 1, (2, 10, 10, 3)),
                           dtype=jnp.float32)
        a = jnp.asarray(rng.uniform(0, 1, (2, 10, 10, 3)), dtype=jnp.float32)
        res = phys_cons_srgb(bhat, a, k_mono, 1.0, return_map=True,
                             reduction="none")
        assert res["per_sample"].shape == (2,)
        assert res["residual_map"].shape == bhat.shape
        assert res["meta"]["direction"] == "rho*(K*Bhat) - A"

    def test_full_coupling_kernel(self, rng):
        """[C_out, C_in, kh, kw] cross-channel kernel path."""
        bhat = jnp.asarray(rng.uniform(0, 1, (1, 10, 10, 3)),
                           dtype=jnp.float32)
        a = jnp.asarray(rng.uniform(0, 1, (1, 10, 10, 3)), dtype=jnp.float32)
        kfull = jnp.asarray(np.random.default_rng(1).uniform(
            0, 1, (3, 3, 3, 3)), dtype=jnp.float32)
        v = float(phys_cons_raw(bhat, a, kfull, 1.0))
        assert np.isfinite(v)

    def test_error_paths(self, rng, k_mono):
        bhat = jnp.zeros((1, 8, 8, 3))
        with pytest.raises(ValueError):  # even kernel
            phys_cons_raw(bhat, bhat, jnp.ones((1, 2, 2)), 1.0)
        with pytest.raises(ValueError):  # channel mismatch
            phys_cons_raw(bhat, bhat, jnp.ones((4, 3, 3)), 1.0)
        with pytest.raises(ValueError):  # shape mismatch
            phys_cons_raw(bhat, jnp.zeros((1, 8, 9, 3)), k_mono, 1.0)
        with pytest.raises(ValueError):  # bad padding
            phys_cons_raw(bhat, bhat, k_mono, 1.0, padding="wrap")

    def test_zero_energy_warns(self, rng):
        bhat = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        k0 = jnp.zeros((1, 3, 3))
        with pytest.warns(UserWarning, match="zero energy"):
            phys_cons_raw(bhat, bhat, k0, 1.0)

    def test_no_gradient_flows(self, rng, k_mono):
        """phys_cons_* are no-grad metrics (reference @torch.no_grad())."""
        bhat = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        a = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        g = jax.grad(lambda b: phys_cons_raw(b, a, k_mono, 1.0))(bhat)
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=0)
