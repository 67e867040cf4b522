"""Color science: sRGB transfer, RGB->Lab, CIEDE2000 gold-data regression.

Gold data: the published Sharma/Wu/Dalal 2005 CIEDE2000 test pairs
(``tests/data/ciede2000_pairs.json``) — the same public dataset the
reference validates against (``standard_tests/test_color_error.py``).
"""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.ops.color import (
    ciede2000_lab,
    deltaE2000_rgb,
    linear_to_srgb,
    rgb_to_lab,
    sobel_magnitude,
    srgb_to_linear,
)

DATA = pathlib.Path(__file__).parent / "data"


class TestTransferFunctions:
    def test_roundtrip(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (64,)), dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(linear_to_srgb(srgb_to_linear(x))), np.asarray(x),
            atol=1e-5,
        )

    def test_anchors(self):
        assert float(srgb_to_linear(jnp.float32(0.0))) == 0.0
        np.testing.assert_allclose(float(srgb_to_linear(jnp.float32(1.0))), 1.0, atol=1e-6)
        # mid-gray sRGB 0.5 -> ~0.2140 linear
        np.testing.assert_allclose(
            float(srgb_to_linear(jnp.float32(0.5))), 0.21404, atol=1e-4
        )


class TestRgbToLab:
    def test_white_black_red(self):
        rgb = jnp.asarray(
            [[[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]]
        )  # [1,3,3]
        lab = np.asarray(rgb_to_lab(rgb))[0]
        # Kornia-parity constants leave a ~0.07 a*/b* offset at white
        # (matrix row sums vs the rounded D65 white point) — same as the
        # reference's Lab source.
        np.testing.assert_allclose(lab[0], [100.0, 0.0, 0.0], atol=0.1)
        np.testing.assert_allclose(lab[1], [0.0, 0.0, 0.0], atol=0.05)
        # sRGB red: L~53.24, a~80.09, b~67.20 (textbook values; the
        # 6-decimal matrix used for kornia parity lands within 0.25)
        np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.3)

    def test_gray_is_neutral(self, rng):
        g = rng.uniform(0, 1, (5, 1))
        rgb = jnp.asarray(np.repeat(g, 3, axis=1)[None], dtype=jnp.float32)
        lab = np.asarray(rgb_to_lab(rgb))
        # Up to ~0.07 a*/b* offset from the kornia-parity constants (see
        # test_white_black_red).
        np.testing.assert_allclose(lab[..., 1:], 0.0, atol=0.1)


class TestCiede2000Gold:
    def test_sharma_pairs(self):
        pairs = json.loads((DATA / "ciede2000_pairs.json").read_text())
        lab1 = jnp.asarray([[p["L1"], p["a1"], p["b1"]] for p in pairs])
        lab2 = jnp.asarray([[p["L2"], p["a2"], p["b2"]] for p in pairs])
        want = np.asarray([p["de00"] for p in pairs])
        got = np.asarray(ciede2000_lab(lab1, lab2))
        # The first 16 pairs are canonical Sharma-2005 values: strict 2e-3.
        # The final 2 pairs are synthetic out-of-gamut probes (negative L*)
        # whose stored targets don't follow the standard formula; the
        # reference relaxes its tolerance to 1.5 for the same reason.
        np.testing.assert_allclose(got[:16], want[:16], atol=2e-3)
        np.testing.assert_allclose(got[16:], want[16:], atol=1.5)

    def test_symmetry_and_identity(self, rng):
        lab = jnp.asarray(rng.uniform([0, -60, -60], [100, 60, 60], (32, 3)),
                          dtype=jnp.float32)
        lab2 = jnp.asarray(rng.uniform([0, -60, -60], [100, 60, 60], (32, 3)),
                           dtype=jnp.float32)
        d12 = np.asarray(ciede2000_lab(lab, lab2))
        d21 = np.asarray(ciede2000_lab(lab2, lab))
        np.testing.assert_allclose(d12, d21, atol=1e-4)
        dii = np.asarray(ciede2000_lab(lab, lab))
        np.testing.assert_allclose(dii, 0.0, atol=1e-3)

    @pytest.mark.slow
    def test_gradient_finite_on_neutral_pixels(self, rng):
        """Regression: atan2(0,0) NaN-gradient trap — gray images (zero
        chroma) must still produce finite CIEDE2000 gradients."""
        g = rng.uniform(0, 1, (1, 4, 4, 1)).astype(np.float32)
        gray = jnp.asarray(np.repeat(g, 3, axis=-1))
        grad = jax.grad(
            lambda a: jnp.mean(deltaE2000_rgb(a, gray * 0.9))
        )(gray)
        assert np.all(np.isfinite(np.asarray(grad)))
        grad_same = jax.grad(
            lambda a: jnp.mean(deltaE2000_rgb(a, gray))
        )(gray)
        assert np.all(np.isfinite(np.asarray(grad_same)))

    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)

    def test_differentiable(self, rng):
        rgb1 = jnp.asarray(rng.uniform(0.05, 0.95, (1, 4, 4, 3)),
                           dtype=jnp.float32)
        rgb2 = jnp.asarray(rng.uniform(0.05, 0.95, (1, 4, 4, 3)),
                           dtype=jnp.float32)
        g = jax.grad(lambda a: jnp.mean(deltaE2000_rgb(a, rgb2)))(rgb1)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSobel:
    def test_constant_image_zero_edges(self):
        x = jnp.ones((1, 8, 8)) * 0.3
        m = np.asarray(sobel_magnitude(x))
        np.testing.assert_allclose(m, 0.0, atol=1e-4)

    def test_vertical_edge_detected(self):
        x = jnp.zeros((1, 8, 8)).at[:, :, 4:].set(1.0)
        m = np.asarray(sobel_magnitude(x))
        assert m[0, 4, 4] > 1.0  # strong response at the edge
        assert m[0, 4, 1] < 1e-4  # flat region silent
