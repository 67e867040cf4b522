"""SSIM evaluator wrapper tests (port of reference
``standard_tests/test_ssim_wrapper.py``): range inference, window clipping,
luma mode, align policies, streaming accumulator."""

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.metrics.ssim import (
    SSIMEvaluator,
    SSIMMetric,
    calculate_ssim,
    evaluate_pairs_ssim,
)


@pytest.fixture
def pair(rng):
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + 0.03 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    return x, y


class TestEvaluator:
    def test_result_dict_contract(self, pair):
        res = SSIMEvaluator().evaluate(*pair)
        assert {"ssim_mean", "ssim_std", "ssim_p50", "ssim_p95",
                "per_image", "config"} <= set(res)
        cfg = res["config"]
        assert cfg["kernel_size"] == 11 and cfg["sigma"] == 1.5
        assert cfg["data_range"] == 1.0  # inferred

    def test_range_inference(self, rng):
        x = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
        res = SSIMEvaluator().evaluate(x, x)
        assert res["config"]["data_range"] == 2.0
        x255 = rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
        res = SSIMEvaluator().evaluate(x255, x255)
        assert res["config"]["data_range"] == 255.0

    def test_small_image_window_clipping(self, rng):
        x = rng.uniform(0, 1, (1, 7, 7, 1)).astype(np.float32)
        scores = SSIMEvaluator().per_image(x, x)  # window 11 > 7: clipped
        np.testing.assert_allclose(scores, 1.0, atol=1e-5)

    def test_luma_mode(self, pair):
        s_rgb = SSIMEvaluator().per_image(*pair)
        s_luma = SSIMEvaluator(use_luma=True).per_image(*pair)
        assert s_rgb.shape == s_luma.shape
        assert not np.allclose(s_rgb, s_luma)

    def test_align_policies(self, rng):
        x = rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
        y = rng.uniform(0, 1, (1, 36, 40, 3)).astype(np.float32)
        with pytest.raises(ValueError):
            SSIMEvaluator(align_policy="error").per_image(x, y)
        for policy in ("center_crop", "resize"):
            s = SSIMEvaluator(align_policy=policy).per_image(x, y)
            assert s.shape == (1,)

    def test_streaming_matches_batch(self, pair):
        x, y = pair
        m = SSIMMetric(data_range=1.0)
        m.update(x[:1], y[:1])
        m.update(x[1:], y[1:])
        np.testing.assert_allclose(
            m.compute(), calculate_ssim(x, y, data_range=1.0), rtol=1e-6
        )
        with pytest.raises(RuntimeError):
            SSIMMetric().compute()

    def test_evaluate_pairs(self, pair):
        x, y = pair
        res = evaluate_pairs_ssim([(x[:1], y[:1]), (x[1:], y[1:])],
                                  data_range=1.0)
        assert res["count"] == 2
