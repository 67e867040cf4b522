"""Mixup augmentation + validation save_img path tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.training.augment import mixup_batch
from lowlight_image_enhancement_tpu.training.validation import (
    save_result_image,
    validate,
)


class TestMixup:
    def _batch(self, rng, n=4):
        return {
            "lq": jnp.asarray(rng.uniform(0, 1, (n, 8, 8, 3)),
                              dtype=jnp.float32),
            "gt": jnp.asarray(rng.uniform(0, 1, (n, 8, 8, 3)),
                              dtype=jnp.float32),
            "short_raw": jnp.asarray(rng.uniform(0, 1, (n, 8, 8, 3)),
                                     dtype=jnp.float32),
            "expo_ratio": jnp.asarray(rng.uniform(1, 10, (n,)),
                                      dtype=jnp.float32),
        }

    def test_preserves_shapes_and_range(self, rng):
        batch = self._batch(rng)
        mixed = mixup_batch(jax.random.PRNGKey(0), batch)
        for k in batch:
            assert mixed[k].shape == batch[k].shape
        assert float(jnp.min(mixed["lq"])) >= 0.0
        assert float(jnp.max(mixed["lq"])) <= 1.0

    def test_same_lam_across_keys(self, rng):
        """All entries must be mixed with the same lam/permutation so the
        lq == clip(short*ratio) style relationships stay consistent for
        linear quantities."""
        n = 4
        base = jnp.arange(n, dtype=jnp.float32)
        batch = {
            "lq": jnp.broadcast_to(base[:, None, None, None], (n, 4, 4, 3)),
            "gt": jnp.broadcast_to(base[:, None, None, None], (n, 4, 4, 3)),
            "expo_ratio": base,
        }
        mixed = mixup_batch(jax.random.PRNGKey(1), batch)
        np.testing.assert_allclose(
            np.asarray(mixed["lq"][:, 0, 0, 0]),
            np.asarray(mixed["expo_ratio"]), rtol=1e-6,
        )

    def test_deterministic_per_key(self, rng):
        batch = self._batch(rng)
        m1 = mixup_batch(jax.random.PRNGKey(7), batch)
        m2 = mixup_batch(jax.random.PRNGKey(7), batch)
        np.testing.assert_array_equal(np.asarray(m1["lq"]),
                                      np.asarray(m2["lq"]))

    def test_jit_safe(self, rng):
        batch = self._batch(rng)
        f = jax.jit(lambda k, b: mixup_batch(k, b)["lq"])
        out = f(jax.random.PRNGKey(0), batch)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_mixup_in_train_step(self, rng):
        from lowlight_image_enhancement_tpu.losses import HybridLossPlus
        from lowlight_image_enhancement_tpu.models import NAFNet
        from lowlight_image_enhancement_tpu.training import (
            create_train_state,
            make_optimizer,
            make_train_step,
        )

        net = NAFNet(width=8, middle_blk_num=1, enc_blk_nums=(1,),
                     dec_blk_nums=(1,))
        loss = HybridLossPlus(use_perc=False, use_deltaE=False,
                              use_ssim=False, use_phys=False)
        tx = make_optimizer(1e-3)
        state = create_train_state(net, tx, jax.random.PRNGKey(0),
                                   jnp.zeros((1, 8, 8, 3)), loss=loss)
        step = make_train_step(net, loss, tx, donate=False,
                               mixup_alpha=1.2)
        batch = self._batch(rng)
        batch["long_raw"] = batch["gt"]
        state, logs = step(state, batch)
        assert np.isfinite(float(logs["l_total"]))


class TestSaveImg:
    def test_save_result_image(self, tmp_path, rng):
        img = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)),
                          dtype=jnp.float32)
        path = str(tmp_path / "sub" / "out.png")
        save_result_image(path, img)
        assert os.path.exists(path)
        import cv2

        back = cv2.imread(path)
        assert back.shape == (8, 8, 3)

    def test_validate_writes_images(self, tmp_path, rng):
        batch = {
            "lq": rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32),
            "gt": rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32),
            "pair_id": ["a", "b"],
        }
        results = validate(
            lambda x: x,  # identity model
            [batch],
            {"psnr": {"type": "linear_psnr", "data_range": 1.0}},
            save_dir=str(tmp_path / "vis"),
        )
        assert {"a.png", "b.png"} <= set(os.listdir(tmp_path / "vis"))
        assert "psnr" in results
