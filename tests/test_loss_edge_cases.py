"""Numerical edge cases for the loss stack: pure black / saturated /
constant images, extreme exposure ratios, zero-residual physics — all must
produce finite values AND finite gradients (production inputs routinely
hit these: black frames, clipped highlights, ratio-300 SID pairs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.losses import (
    DeltaE00Loss,
    HybridLossPlus,
    SSIMLoss,
)
from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf


def _full_loss():
    return HybridLossPlus(
        use_perc=False, use_deltaE=True, use_ssim=True,
        physics_psf_module=create_crosstalk_psf("rgb", "B2"),
    )


def _finite_value_and_grad(loss, batch):
    def f(bhat):
        t, _ = loss(**{**batch, "Bhat_raw": bhat,
                       "Bhat_srgb01": jnp.clip(bhat, 0, 1)})
        return t

    total, logs = loss(**batch)
    g = jax.grad(f)(batch["Bhat_raw"])
    assert np.isfinite(float(total)), logs
    assert np.all(np.isfinite(np.asarray(g)))
    return float(total)


def _batch(pred, target, short, ratio):
    return dict(
        Bhat_raw=pred, B_raw=target, A_raw=short,
        expo_ratio=jnp.full((pred.shape[0],), ratio),
        Bhat_srgb01=jnp.clip(pred, 0, 1),
        B_srgb01=jnp.clip(target, 0, 1),
        A_srgb01=jnp.clip(short, 0, 1),
    )


S = 32


class TestEdgeCases:
    @pytest.mark.slow
    def test_pure_black_everything(self):
        z = jnp.zeros((1, S, S, 3))
        _finite_value_and_grad(_full_loss(), _batch(z, z, z, 100.0))

    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)

    def test_fully_saturated(self):
        o = jnp.ones((1, S, S, 3))
        _finite_value_and_grad(_full_loss(), _batch(o, o, o, 1.0))

    @pytest.mark.slow  # measured 9s on 1-core host (round-3 re-tier)
    def test_black_pred_white_target(self):
        z = jnp.zeros((1, S, S, 3))
        o = jnp.ones((1, S, S, 3))
        v = _finite_value_and_grad(_full_loss(), _batch(z, o, z, 10.0))
        assert v > 0.5  # large but finite error

    def test_extreme_exposure_ratio(self, rng):
        pred = jnp.asarray(rng.uniform(0, 1, (1, S, S, 3)),
                           dtype=jnp.float32)
        short = jnp.asarray(rng.uniform(0, 0.003, (1, S, S, 3)),
                            dtype=jnp.float32)
        _finite_value_and_grad(_full_loss(),
                               _batch(pred, pred, short, 300.0))

    def test_out_of_range_prediction(self, rng):
        """Network outputs before clipping can exceed [0,1] or go
        negative — the raw-domain L1/physics must handle them."""
        pred = jnp.asarray(rng.uniform(-0.5, 1.5, (1, S, S, 3)),
                           dtype=jnp.float32)
        target = jnp.asarray(rng.uniform(0, 1, (1, S, S, 3)),
                             dtype=jnp.float32)
        _finite_value_and_grad(_full_loss(),
                               _batch(pred, target, target / 5, 5.0))

    def test_single_pixel_hotspot(self):
        """A lone saturated pixel in darkness (a star / streetlamp)."""
        z = jnp.zeros((1, S, S, 3)).at[0, 5, 7, :].set(1.0)
        _finite_value_and_grad(_full_loss(), _batch(z, z, z / 10, 10.0))

    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)

    def test_deltae_identical_saturated_channels(self):
        """Max-chroma corners of the RGB cube (hue angle singularities)."""
        corners = jnp.asarray(
            [[[[1, 0, 0], [0, 1, 0]], [[0, 0, 1], [1, 1, 0]]]],
            dtype=jnp.float32)
        loss = DeltaE00Loss()
        v = float(loss(corners, corners))
        g = jax.grad(lambda a: loss(a, corners * 0.99))(corners)
        assert np.isfinite(v)
        assert np.all(np.isfinite(np.asarray(g)))

    def test_ssim_constant_images(self):
        a = jnp.full((1, S, S, 3), 0.5)
        loss = SSIMLoss()
        v = float(loss(a, a))
        assert abs(v) < 1e-5  # identical constants: DSSIM ~ 0
        g = jax.grad(lambda x: loss(x, a))(a)
        assert np.all(np.isfinite(np.asarray(g)))

    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)

    def test_tiny_spatial_size(self, rng):
        """16x16 crops (the debug '8x8-first' ladder uses tiny sizes);
        SSIM window must clip gracefully via the loss's window=11 on >=11
        images — at 16 it fits; verify no NaN."""
        pred = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)),
                           dtype=jnp.float32)
        loss = HybridLossPlus(
            use_perc=False, use_deltaE=True, use_ssim=True,
            physics_psf_module=create_crosstalk_psf("mono"))
        total, logs = loss(**_batch(pred, pred, pred / 2, 2.0))
        assert np.isfinite(float(total))

    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)

    def test_batch_of_mixed_ratios(self, rng):
        pred = jnp.asarray(rng.uniform(0, 1, (3, S, S, 3)),
                           dtype=jnp.float32)
        short = pred / jnp.asarray([1.0, 100.0, 300.0]).reshape(3, 1, 1, 1)
        batch = dict(
            Bhat_raw=pred, B_raw=pred, A_raw=short,
            expo_ratio=jnp.asarray([1.0, 100.0, 300.0]),
            Bhat_srgb01=pred, B_srgb01=pred,
            A_srgb01=jnp.clip(short, 0, 1),
        )
        total, logs = _full_loss()(**batch)
        assert np.isfinite(float(total))
        # aligned shorts == prediction, so the physics residual reduces to
        # the PSF's own smoothing |K*pred - pred| — small but nonzero
        assert 0.0 < float(logs["l_phys"]) < 0.2
