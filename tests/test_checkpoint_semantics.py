"""Checkpoint semantics (port of reference
``core_tests/test_mode_switch_and_state.py``): strict/non-strict load,
PSF-state immutability across optimization, latest-state scanning."""

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.training import checkpoint as ckpt
from lowlight_image_enhancement_tpu.training.checkpoint import merge_params


class TestNonStrictLoad:
    def test_merge_overlapping(self):
        template = {"a": jnp.zeros((2, 2)), "b": jnp.zeros((3,)),
                    "nested": {"c": jnp.zeros((4,))}}
        restored = {"a": jnp.ones((2, 2)),
                    "nested": {"c": jnp.full((4,), 2.0)}}
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            merged = merge_params(template, restored)
        np.testing.assert_allclose(np.asarray(merged["a"]), 1.0)
        np.testing.assert_allclose(np.asarray(merged["b"]), 0.0)  # kept
        np.testing.assert_allclose(np.asarray(merged["nested"]["c"]), 2.0)

    def test_shape_mismatch_skipped_with_warning(self):
        template = {"a": jnp.zeros((2, 2))}
        restored = {"a": jnp.ones((3, 3))}
        with pytest.warns(UserWarning, match="skipped"):
            merged = merge_params(template, restored)
        np.testing.assert_allclose(np.asarray(merged["a"]), 0.0)

    def test_roundtrip_nonstrict_file(self, tmp_path):
        import orbax.checkpoint as ocp

        params = {"w": np.ones((4,), np.float32),
                  "extra": np.ones((2,), np.float32)}
        path = str(tmp_path / "net")
        ocp.PyTreeCheckpointer().save(path, params)
        template = {"w": jnp.zeros((4,)), "new": jnp.zeros((3,))}
        with pytest.warns(UserWarning):
            out = ckpt.restore_network(path, template, strict=False)
        np.testing.assert_allclose(np.asarray(out["w"]), 1.0)
        np.testing.assert_allclose(np.asarray(out["new"]), 0.0)


class TestLatestScan:
    def test_latest_training_state(self, tmp_path):
        for step in (8, 16, 2):
            os.makedirs(tmp_path / f"{step:08d}")
        assert ckpt.latest_training_state(str(tmp_path)).endswith("00000016")
        assert ckpt.latest_training_state(str(tmp_path / "nope")) is None


class TestPSFStateImmutability:
    @pytest.mark.slow
    def test_psf_untouched_by_optimizer(self, rng):
        """The PSF kernel is not a parameter: after optimization steps the
        loss module's kernel is bit-identical (reference
        test_mode_switch_and_state.py:98-122)."""
        from lowlight_image_enhancement_tpu.losses import HybridLossPlus
        from lowlight_image_enhancement_tpu.models import NAFNet
        from lowlight_image_enhancement_tpu.ops.psf import (
            create_crosstalk_psf,
        )
        from lowlight_image_enhancement_tpu.training import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        psf = create_crosstalk_psf("rgb", "B2")
        kernel_before = np.asarray(psf.kernel).copy()
        net = NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1,),
                     dec_blk_nums=(1,))
        loss = HybridLossPlus(use_perc=False, use_deltaE=False,
                              use_ssim=False, physics_psf_module=psf)
        tx = make_optimizer(1e-2)
        state = create_train_state(net, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 8, 8, 3)), loss=loss)
        step = make_train_step(net, loss, tx, donate=False)
        batch = {
            "lq": jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)),
                              dtype=jnp.float32),
            "gt": jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)),
                              dtype=jnp.float32),
            "short_raw": jnp.asarray(rng.uniform(0, 0.2, (2, 8, 8, 3)),
                                     dtype=jnp.float32),
            "expo_ratio": jnp.full((2,), 5.0),
        }
        batch["long_raw"] = batch["gt"]
        batch["short_obs"] = batch["short_raw"]
        for _ in range(3):
            state, _ = step(state, batch)
        np.testing.assert_array_equal(np.asarray(psf.kernel), kernel_before)
        # and the PSF is not part of the trainable state at all
        for path, _ in jax.tree_util.tree_flatten_with_path(
                state.params)[0]:
            assert "psf" not in "/".join(str(p.key) for p in path).lower()


class TestAccumulationStateRoundtrip:
    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)
    def test_multisteps_state_survives_save_restore(self, tmp_path):
        """Gradient-accumulation (optax MultiSteps) optimizer state —
        mini-step counter + gradient accumulator — must roundtrip through
        the orbax training-state scheme so a resumed run continues the
        partial accumulation window rather than silently dropping it."""
        import numpy as np

        from lowlight_image_enhancement_tpu.losses import HybridLossPlus
        from lowlight_image_enhancement_tpu.models import NAFNet
        from lowlight_image_enhancement_tpu.training import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        net = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                     enc_blk_nums=(1,), dec_blk_nums=(1,))
        loss = HybridLossPlus(use_perc=False, use_deltaE=False,
                              use_ssim=False, use_phys=False)
        tx = make_optimizer(1e-3, accum_steps=2)
        state = create_train_state(net, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 16, 16, 3)), loss=loss)
        step = make_train_step(net, loss, tx, donate=False)
        rng = np.random.default_rng(0)
        batch = {
            "lq": jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)),
                              jnp.float32),
            "gt": jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)),
                              jnp.float32),
        }
        state, _ = step(state, batch)  # mid-window: 1 pending micro-grad

        path = ckpt.save_training_state(str(tmp_path), state)
        template = create_train_state(net, tx, jax.random.PRNGKey(1),
                                      jnp.zeros((1, 16, 16, 3)), loss=loss)
        restored = ckpt.restore_training_state(path, template)

        a = jax.tree_util.tree_leaves(state.opt_state)
        b = jax.tree_util.tree_leaves(restored.opt_state)
        assert len(a) == len(b)
        for la, lb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

        # and the restored state continues identically
        s1, _ = step(state, batch)
        s2, _ = step(restored, batch)
        for la, lb in zip(jax.tree_util.tree_leaves(s1.params),
                          jax.tree_util.tree_leaves(s2.params)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
