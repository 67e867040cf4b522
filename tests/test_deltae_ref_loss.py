"""The reference's training-loss CIEDE2000 variant: exact replication.

The reference ships two DeltaE00 implementations — exact Sharma-2005 in
the metric (``metrics/color_error.py``) and a simplified differentiable
variant inside the training loss (``NewBP_model/losses.py:99-143``).
``ops/color.py:ciede2000_lab_ref_loss`` replicates the latter; these
tests execute the reference's own ``DeltaE00Loss._ciede2000`` (in place,
read-only) and assert value parity, including the hue-wraparound branch
where the variant departs from Sharma.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.ops.color import (
    ciede2000_lab,
    ciede2000_lab_ref_loss,
    deltaE2000_rgb,
)

REFERENCE_LOSSES = "/root/reference/NewBP_model/losses.py"


def _load_reference_ciede2000():
    torch = pytest.importorskip("torch")
    import os

    if not os.path.exists(REFERENCE_LOSSES):
        pytest.skip("reference checkout not available")
    # losses.py imports torchvision at module level; stub it (the
    # _ciede2000 staticmethod itself needs only torch)
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvm.vgg19 = lambda *a, **k: None
    tvm.VGG19_Weights = types.SimpleNamespace(IMAGENET1K_V1=None)
    tv.models = tvm
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.models", tvm)
    spec = importlib.util.spec_from_file_location("ref_newbp_losses",
                                                  REFERENCE_LOSSES)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return torch, mod.DeltaE00Loss._ciede2000


def _lab_batches(rng, n=2, h=6, w=6):
    L = rng.uniform(0, 100, (n, h, w)).astype(np.float32)
    a = rng.uniform(-60, 60, (n, h, w)).astype(np.float32)
    b = rng.uniform(-60, 60, (n, h, w)).astype(np.float32)
    return np.stack([L, a, b], axis=-1)


@pytest.mark.slow
def test_ref_loss_variant_matches_reference_torch():
    torch, ref_ciede = _load_reference_ciede2000()
    rng = np.random.default_rng(0)
    lab1 = _lab_batches(rng)
    lab2 = _lab_batches(rng)
    # force hue-wraparound rows (|h1p - h2p| > pi): opposite a-signs with
    # small |b| puts the two hues near 0 and pi... and near-0 vs near-2pi
    lab1[0, 0, :, 1], lab1[0, 0, :, 2] = 30.0, -1.0   # h ~ 2pi - eps
    lab2[0, 0, :, 1], lab2[0, 0, :, 2] = 30.0, 1.0    # h ~ 0 + eps
    lab1[0, 1, :, 1], lab1[0, 1, :, 2] = -30.0, -5.0  # h ~ pi + eps
    lab2[0, 1, :, 1], lab2[0, 1, :, 2] = 30.0, -5.0   # h ~ 2pi - eps

    ours = np.asarray(ciede2000_lab_ref_loss(jnp.asarray(lab1),
                                             jnp.asarray(lab2)))
    t1 = torch.tensor(lab1.transpose(0, 3, 1, 2))
    t2 = torch.tensor(lab2.transpose(0, 3, 1, 2))
    ref = ref_ciede(t1, t2).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


@pytest.mark.slow
def test_ref_loss_variant_wraparound_departs_from_sharma():
    """Pin WHY the variant exists as a separate function: on the
    hue-wraparound branch its h-bar lands 2*pi away from Sharma's, which
    flips the non-periodic d_ro Gaussian — the two formulas disagree by
    much more than eps there, and the reference's own torch code agrees
    with the VARIANT."""
    torch, ref_ciede = _load_reference_ciede2000()
    # h1 ~ 10deg (C=30), h2 ~ 250deg (C=60): |dh'| > pi, so the variant's
    # h-bar lands at ~-50deg while Sharma's lands at ~310deg — same angle,
    # but the non-periodic d_ro Gaussian (centered 275deg, sigma 25deg)
    # sees 0.0 vs ~4.2, and dC' != 0 keeps the RT cross-term alive.
    lab1 = np.zeros((1, 1, 1, 3), np.float32)
    lab2 = np.zeros((1, 1, 1, 3), np.float32)
    lab1[..., 0], lab1[..., 1], lab1[..., 2] = 50.0, 29.5, 5.2
    lab2[..., 0], lab2[..., 1], lab2[..., 2] = 50.0, -20.5, -56.4
    variant = float(ciede2000_lab_ref_loss(jnp.asarray(lab1),
                                           jnp.asarray(lab2))[0, 0, 0])
    sharma = float(ciede2000_lab(jnp.asarray(lab1),
                                 jnp.asarray(lab2))[0, 0, 0])
    ref = float(ref_ciede(torch.tensor(lab1.transpose(0, 3, 1, 2)),
                          torch.tensor(lab2.transpose(0, 3, 1, 2))))
    assert abs(variant - ref) < 1e-4
    assert abs(variant - sharma) > 1e-3  # genuinely different formulas


def test_identical_inputs_value_is_sqrt_eps():
    # the variant's eps inside the final sqrt makes dE(x,x) == 1e-3
    lab = jnp.asarray(_lab_batches(np.random.default_rng(1)))
    d = np.asarray(ciede2000_lab_ref_loss(lab, lab))
    np.testing.assert_allclose(d, 1e-3, rtol=1e-3)
    # while the exact-Sharma metric gives ~0
    d0 = np.asarray(ciede2000_lab(lab, lab))
    assert float(np.max(d0)) < 1e-5


def test_gray_pixels_have_finite_gradient():
    """The reference's raw atan2 NaNs on exactly-gray pixels (it would
    abort via _ensure_finite); our replica routes gradient 0 there."""
    rgb1 = jnp.full((1, 4, 4, 3), 0.5, jnp.float32)
    rgb2 = jnp.full((1, 4, 4, 3), 0.45, jnp.float32)
    g = jax.grad(lambda a: jnp.mean(
        deltaE2000_rgb(a, rgb2, formula="reference_loss")))(rgb1)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_deltaE2000_rgb_formula_validation():
    x = jnp.zeros((1, 2, 2, 3))
    with pytest.raises(ValueError, match="formula"):
        deltaE2000_rgb(x, x, formula="banana")
