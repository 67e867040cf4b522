"""Loss stack tests (port of reference ``core_tests/test_losses_domain_norm``,
``test_physics_loss_grad`` loss-side checks, HybridLossPlus behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.losses import (
    CharbonnierLoss,
    DeltaE00Loss,
    HybridLossPlus,
    L1Loss,
    MSELoss,
    PSNRLoss,
    PhysicalConsistencyLossSRGB,
    PhysicsConsistencyLoss,
    SSIMLoss,
    align_exposure_srgb,
    assert_finite_logs,
    build_loss,
)
from lowlight_image_enhancement_tpu.ops.psf import (
    build_psf_kernels,
    create_crosstalk_psf,
    depthwise_conv,
    normalize_psf_energy,
)


@pytest.fixture
def imgs(rng):
    a = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), dtype=jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), dtype=jnp.float32)
    return a, b


class TestBasicLosses:
    def test_registry_build(self):
        for name in ("L1Loss", "MSELoss", "CharbonnierLoss", "PSNRLoss"):
            loss = build_loss({"type": name})
            assert callable(loss)

    def test_l1_mse_values(self, imgs):
        a, b = imgs
        np.testing.assert_allclose(
            float(L1Loss()(a, b)), float(jnp.mean(jnp.abs(a - b))), rtol=1e-6
        )
        np.testing.assert_allclose(
            float(MSELoss()(a, b)), float(jnp.mean((a - b) ** 2)), rtol=1e-6
        )

    def test_charbonnier_close_to_l1(self, imgs):
        a, b = imgs
        ch = float(CharbonnierLoss(eps=1e-12)(a, b))
        l1 = float(L1Loss()(a, b))
        np.testing.assert_allclose(ch, l1, rtol=1e-3)

    def test_psnr_loss_negative_psnr(self, imgs):
        a, b = imgs
        v = float(PSNRLoss()(a, b))
        assert v < 0  # negative PSNR in dB

    def test_loss_weight(self, imgs):
        a, b = imgs
        np.testing.assert_allclose(
            float(L1Loss(loss_weight=0.5)(a, b)),
            0.5 * float(L1Loss()(a, b)),
            rtol=1e-6,
        )


class TestComponents:
    def test_ssim_loss_zero_on_identical(self, imgs):
        a, _ = imgs
        x = jnp.asarray(np.tile(np.asarray(a), (1, 2, 2, 1)))  # 32x32 min
        assert float(SSIMLoss()(x, x)) < 1e-5

    def test_deltae_loss_zero_on_identical(self, imgs):
        a, _ = imgs
        assert float(DeltaE00Loss()(a, a)) < 5e-3

    def test_align_exposure_broadcast(self, imgs):
        a, _ = imgs
        out_scalar = align_exposure_srgb(a, 3.0)
        out_vec = align_exposure_srgb(a, jnp.asarray([3.0, 3.0]))
        np.testing.assert_allclose(np.asarray(out_scalar),
                                   np.asarray(out_vec), rtol=1e-6)
        assert float(jnp.max(out_scalar)) <= 1.0

    def test_physics_raw_direction_scales_A(self, rng):
        """Training loss scales A by rho (not K*Bhat) — reference
        losses.py:158-192 contract, opposite of the eval metric."""
        k = build_psf_kernels("mono", "P2")
        bhat = jnp.asarray(rng.uniform(0, 1, (1, 12, 12, 3)),
                           dtype=jnp.float32)
        rho = 4.0
        # construct A = K*Bhat / rho so that clamp(A*rho) == K*Bhat
        proj = depthwise_conv(bhat, k, padding="replicate")
        a = proj / rho
        loss = PhysicsConsistencyLoss(k)
        assert float(loss(bhat, a, rho)) < 1e-6

    def test_physics_srgb_uses_psf_once(self, rng):
        psf = create_crosstalk_psf("rgb", "B2")
        loss = PhysicalConsistencyLossSRGB(psf)
        bhat = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        a = psf(bhat) / 2.0
        v = float(loss(bhat, a, 2.0))
        assert v < 1e-6

    def test_physics_grad_flows_to_bhat_only(self, rng):
        k = build_psf_kernels("mono", "P2")
        loss = PhysicsConsistencyLoss(k)
        bhat = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        a = jnp.asarray(rng.uniform(0, 0.2, (1, 8, 8, 3)), dtype=jnp.float32)
        g_b = jax.grad(lambda x: loss(x, a, 2.0))(bhat)
        g_a = jax.grad(lambda x: loss(bhat, x, 2.0))(a)
        assert float(jnp.linalg.norm(g_b)) > 0
        np.testing.assert_allclose(np.asarray(g_a), 0.0, atol=0)


class TestHybridLossPlus:
    def _batch(self, rng, n=1, s=32):
        mk = lambda: jnp.asarray(rng.uniform(0, 1, (n, s, s, 3)),
                                 dtype=jnp.float32)
        return dict(
            Bhat_raw=mk(), B_raw=mk(), A_raw=mk(),
            expo_ratio=jnp.full((n,), 5.0),
            Bhat_srgb01=mk(), B_srgb01=mk(), A_srgb01=mk(),
        )

    def test_mutually_exclusive_physics(self):
        k = build_psf_kernels("mono", "P2")
        psf = create_crosstalk_psf("mono")
        with pytest.raises(ValueError):
            HybridLossPlus(physics_kernel=k, physics_psf_module=psf,
                           use_perc=False, use_deltaE=False, use_ssim=False)
        with pytest.raises(ValueError):
            HybridLossPlus(use_phys=True, use_perc=False,
                           use_deltaE=False, use_ssim=False)

    def test_logs_and_total(self, rng):
        loss = HybridLossPlus(
            use_perc=False, use_deltaE=True, use_ssim=True,
            physics_psf_module=create_crosstalk_psf("mono"),
        )
        total, logs = loss(**self._batch(rng))
        assert {"l_l1_raw", "l_deltaE", "l_ssim", "l_phys", "l_total"} <= set(logs)
        assert np.isfinite(float(total))
        assert_finite_logs(logs)  # must not raise

    def test_weights_scale_terms(self, rng):
        batch = self._batch(rng)
        base = HybridLossPlus(use_perc=False, use_deltaE=False,
                              use_ssim=False, use_phys=False, w_l1_raw=1.0)
        doubled = HybridLossPlus(use_perc=False, use_deltaE=False,
                                 use_ssim=False, use_phys=False, w_l1_raw=2.0)
        t1, _ = base(**batch)
        t2, _ = doubled(**batch)
        np.testing.assert_allclose(float(t2), 2 * float(t1), rtol=1e-6)

    def test_phys_weight_zero_equals_no_phys(self, rng):
        """With w_phys=0 the wrapped loss equals the no-physics loss
        (reference: wrapped model == plain NAFNet when phys weight 0)."""
        batch = self._batch(rng)
        with_phys = HybridLossPlus(
            use_perc=False, use_deltaE=False, use_ssim=False, w_phys=0.0,
            physics_psf_module=create_crosstalk_psf("mono"),
        )
        without = HybridLossPlus(use_perc=False, use_deltaE=False,
                                 use_ssim=False, use_phys=False)
        t1, _ = with_phys(**batch)
        t2, _ = without(**batch)
        np.testing.assert_allclose(float(t1), float(t2), atol=0)

    def test_uncertainty_weighting(self, rng):
        batch = self._batch(rng)
        loss = HybridLossPlus(
            use_perc=False, use_deltaE=False, use_ssim=False,
            use_phys=False, use_uncertainty=True,
        )
        sig = loss.init_uncertainty_params()
        assert "l1_raw" in sig
        t0, _ = loss(**batch, log_sigma=sig)
        # at s=0: L*e^0 + 0 == L
        t_plain, _ = loss(**batch)
        np.testing.assert_allclose(float(t0), float(t_plain), rtol=1e-6)
        # gradient w.r.t. log_sigma exists
        g = jax.grad(
            lambda s: loss(**batch, log_sigma=s)[0]
        )(sig)
        assert np.isfinite(float(g["l1_raw"]))

    def test_assert_finite_raises(self):
        with pytest.raises(FloatingPointError, match="non-finite"):
            assert_finite_logs({"l_total": jnp.asarray(jnp.nan)})

    @pytest.mark.slow
    def test_perceptual_path_runs(self, rng):
        """Perceptual term with (deterministic random-init) VGG features."""
        loss = HybridLossPlus(
            use_perc=True, use_deltaE=False, use_ssim=False, use_phys=False,
        )
        total, logs = loss(**self._batch(rng, s=64))
        assert "l_perc" in logs and np.isfinite(float(total))

    def test_gradient_through_full_loss(self, rng):
        loss = HybridLossPlus(
            use_perc=False, use_deltaE=True, use_ssim=True,
            physics_psf_module=create_crosstalk_psf("mono"),
        )
        batch = self._batch(rng)

        def f(bhat):
            t, _ = loss(**{**batch, "Bhat_raw": bhat, "Bhat_srgb01": bhat})
            return t

        g = jax.grad(f)(batch["Bhat_raw"])
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.linalg.norm(g)) > 0
