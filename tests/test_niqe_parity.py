"""NIQE value parity against the reference implementation executed in place.

Loads ``/root/reference/NAFNet_base/basicsr/metrics/niqe.py`` by file path
(with its ``metric_util``/``matlab_functions`` deps) and asserts our
:func:`calculate_niqe` — running on the bundled copy of the reference's
MATLAB-official pristine params (``weights/niqe_pris_params.npz``) —
produces the same score. This pins C47's "NIQE value parity" claim to the
actual reference code, not a self-graded fixture (round-3 VERDICT #7).
"""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # reference-import tier (see pytest.ini)

REF_BASE = "/root/reference/NAFNet_base/basicsr"
REF_NIQE = os.path.join(REF_BASE, "metrics/niqe.py")
REF_METRIC_UTIL = os.path.join(REF_BASE, "metrics/metric_util.py")
REF_MATLAB = os.path.join(REF_BASE, "utils/matlab_functions.py")
REF_NPZ = os.path.join(REF_BASE, "metrics/niqe_pris_params.npz")
BUNDLED_NPZ = os.path.join(
    os.path.dirname(__file__), "..", "lowlight_image_enhancement_tpu",
    "weights", "niqe_pris_params.npz")

needs_reference = pytest.mark.skipif(
    not os.path.exists(REF_NIQE), reason="reference checkout not available")
needs_cv2 = pytest.mark.skipif(
    importlib.util.find_spec("cv2") is None,
    reason="reference niqe.py imports cv2")


def _load_reference_niqe():
    """Reference niqe module with stubbed basicsr package context (its
    real parent package drags lpips/lmdb at import time)."""
    for name in ("basicsr", "basicsr.metrics", "basicsr.utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)

    def load(path, name):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load(REF_MATLAB, "basicsr.utils.matlab_functions")
    load(REF_METRIC_UTIL, "basicsr.metrics.metric_util")
    return load(REF_NIQE, "basicsr.metrics.niqe")


@pytest.fixture(scope="module")
def ref_niqe():
    return _load_reference_niqe()


@pytest.fixture(scope="module")
def pris():
    d = np.load(REF_NPZ)
    return (d["mu_pris_param"], d["cov_pris_param"], d["gaussian_window"])


def _natural_gray(seed: int, size: int = 192) -> np.ndarray:
    """Deterministic natural-statistics grayscale test image [0, 255]."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from make_niqe_params import synthetic_pristine_image

    return synthetic_pristine_image(np.random.default_rng(seed), size)


@needs_reference
@needs_cv2
class TestNiqeValueParity:
    def test_bundled_npz_is_the_reference_data(self):
        ours = np.load(BUNDLED_NPZ)
        ref = np.load(REF_NPZ)
        for key in ("mu_pris_param", "cov_pris_param", "gaussian_window"):
            np.testing.assert_array_equal(ours[key], ref[key])

    @pytest.mark.parametrize("seed,size", [(0, 192), (7, 288)])
    def test_grayscale_score_matches_reference(self, ref_niqe, pris,
                                               seed, size):
        img = _natural_gray(seed, size)
        mu, cov, win = pris
        ref_score = float(ref_niqe.niqe(img.astype(np.float32), mu, cov, win))

        from lowlight_image_enhancement_tpu.metrics.niqe import calculate_niqe

        our_score = calculate_niqe(img, pris_params_path=BUNDLED_NPZ)
        # Residual tolerance covers the reference's fp32 /255,*255 resize
        # round-trip vs our exact box mean (niqe.py docstring).
        assert our_score == pytest.approx(ref_score, abs=2e-3), (
            f"NIQE mismatch: ours={our_score} ref={ref_score}")

    def test_distorted_score_matches_reference(self, ref_niqe, pris):
        rng = np.random.default_rng(3)
        img = np.clip(_natural_gray(11, 192)
                      + rng.normal(0, 25, (192, 192)), 0, 255)
        mu, cov, win = pris
        ref_score = float(ref_niqe.niqe(img.astype(np.float32), mu, cov, win))

        from lowlight_image_enhancement_tpu.metrics.niqe import calculate_niqe

        our_score = calculate_niqe(img, pris_params_path=BUNDLED_NPZ)
        assert our_score == pytest.approx(ref_score, abs=2e-3)

    def test_rgb_y_conversion_matches_reference(self, ref_niqe, pris):
        """Full RGB entry: our calculate_niqe (RGB convention) vs the
        reference's calculate_niqe contract (BGR + MATLAB Y channel).
        The reference entry hardcodes a relative npz path, so replicate
        its conversion (reorder -> to_y_channel) and call niqe()."""
        rng = np.random.default_rng(5)
        base = _natural_gray(21, 192)
        rgb = np.stack([
            np.clip(base * s + rng.normal(0, 2, base.shape), 0, 255)
            for s in (1.0, 0.9, 0.8)
        ], axis=-1).astype(np.float32)

        metric_util = sys.modules["basicsr.metrics.metric_util"]
        y_ref = np.squeeze(metric_util.to_y_channel(rgb[..., ::-1]))
        mu, cov, win = pris
        ref_score = float(ref_niqe.niqe(y_ref.astype(np.float32),
                                        mu, cov, win))

        from lowlight_image_enhancement_tpu.metrics.niqe import calculate_niqe

        our_score = calculate_niqe(rgb, pris_params_path=BUNDLED_NPZ,
                                   convert_to="y")
        assert our_score == pytest.approx(ref_score, abs=2e-3)
