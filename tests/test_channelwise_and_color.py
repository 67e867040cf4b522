"""Channelwise metrics + DeltaE00 evaluation metrics (port of reference
``standard_tests/test_channelwise.py`` and ``test_color_error.py``)."""

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.metrics.channelwise import (
    cpsnr_rgb,
    rgb_psnr,
    rgb_ssim,
)
from lowlight_image_enhancement_tpu.metrics.color_error import (
    deltaE2000_map,
    deltaE2000_summary,
    edge_deltaE2000,
)


@pytest.fixture
def pair(rng):
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    y = np.clip(x + 0.05 * rng.standard_normal(x.shape).astype(np.float32), 0, 1)
    return x, y


class TestChannelwise:
    def test_rgb_psnr_keys_and_meta(self, pair):
        res = rgb_psnr(*pair, data_range=1.0)
        assert set(res) == {"R", "G", "B", "mean", "meta"}
        assert res["meta"] == {"domain": "linear", "data_range": 1.0}
        np.testing.assert_allclose(
            res["mean"], np.mean([res["R"], res["G"], res["B"]]), rtol=1e-6
        )

    def test_cpsnr_differs_from_mean_psnr(self, rng):
        # unequal channel errors: CPSNR (mse-then-log) < mean of PSNRs
        x = np.zeros((1, 16, 16, 3), np.float32)
        y = x.copy()
        y[..., 0] += 0.2   # big error in R only
        y[..., 1] += 0.01
        y[..., 2] += 0.01
        cp = cpsnr_rgb(x, y)["cpsnr"]
        mp = rgb_psnr(x, y)["mean"]
        assert cp < mp

    def test_rgb_ssim(self, pair):
        res = rgb_ssim(*pair)
        assert set(res) == {"R", "G", "B", "mean", "meta"}
        for c in "RGB":
            assert 0.0 <= res[c] <= 1.0

    def test_nan_raises(self, pair):
        x, y = pair
        x = x.copy()
        x[0, 0, 0, 0] = np.nan
        with pytest.raises(ValueError):
            rgb_psnr(x, y)


class TestDeltaE:
    def test_identical_zero(self, pair):
        x, _ = pair
        m = np.asarray(deltaE2000_map(x, x))
        np.testing.assert_allclose(m, 0.0, atol=2e-3)

    def test_summary_keys(self, pair):
        res = deltaE2000_summary(*pair, percentiles=(50.0, 95.0))
        assert {"mean", "p50", "p95", "meta"} <= set(res)
        assert res["p95"] >= res["p50"] >= 0

    def test_d50_warns(self, pair):
        with pytest.warns(UserWarning, match="D50"):
            deltaE2000_summary(*pair, whitepoint="D50")

    def test_edge_metric(self, rng):
        # image with a strong edge; corrupt colors near the edge only
        x = np.zeros((1, 32, 32, 3), np.float32)
        x[:, :, 16:, :] = 0.8
        y = x.copy()
        y[:, :, 14:18, 0] = np.clip(y[:, :, 14:18, 0] + 0.3, 0, 1)
        edge = edge_deltaE2000(y, x, edge_quantile=0.85)
        full = deltaE2000_summary(y, x)
        assert edge["mean"] > full["mean"]  # error concentrated at edges
        assert edge["meta"]["edge_quantile"] == 0.85

    def test_bad_quantile(self, pair):
        with pytest.raises(ValueError):
            edge_deltaE2000(*pair, edge_quantile=1.5)
