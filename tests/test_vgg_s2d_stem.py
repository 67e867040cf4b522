"""VGG s2d stem: exactness of the space-to-depth conv1_1 lowering.

The stem re-layouts conv1_1 into s2d(2) space purely for TPU lowering
quality (``models/vgg.py:_s2d_stem_kernel``); the math is the same
multiply-adds, so forward activations and input gradients must match the
stock ``nn.Conv`` path to float tolerance, with an identical param tree
(reference objective contract: ``NewBP_model/losses.py:32-69``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.models.vgg import (
    VGG19Features,
    _depth_to_space,
    _s2d_stem_kernel,
    _space_to_depth,
)


@pytest.fixture(scope="module")
def vgg_and_params():
    m = VGG19Features(taps=("relu1_1", "relu2_2", "relu5_4"))
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    return m, v


def _apply(m, v, x, flag, monkeypatch):
    monkeypatch.setenv("LLIE_VGG_S2D_STEM", flag)
    return m.apply(v, x)


def test_s2d_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 10, 5)),
                    jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_depth_to_space(_space_to_depth(x), 5)), np.asarray(x))


def test_s2d_kernel_preserves_flops_mapping():
    k = jnp.asarray(np.random.default_rng(1).normal(size=(3, 3, 3, 4)),
                    jnp.float32)
    ks = np.asarray(_s2d_stem_kernel(k))
    assert ks.shape == (3, 3, 12, 16)
    # every original tap appears exactly 4 times (once per output phase)
    assert np.isclose(np.abs(ks).sum(), 4 * np.abs(np.asarray(k)).sum())


def test_forward_matches_stock(vgg_and_params, monkeypatch):
    m, v = vgg_and_params
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    o_stock = _apply(m, v, x, "0", monkeypatch)
    o_s2d = _apply(m, v, x, "1", monkeypatch)
    for k in o_stock:
        np.testing.assert_allclose(np.asarray(o_stock[k]),
                                   np.asarray(o_s2d[k]), atol=2e-5)


def test_input_grad_matches_stock(vgg_and_params, monkeypatch):
    m, v = vgg_and_params
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 16, 16, 3)),
                    jnp.float32)

    def loss(x_):
        out = m.apply(v, x_)
        return sum(jnp.mean(o * o) for o in out.values())

    monkeypatch.setenv("LLIE_VGG_S2D_STEM", "0")
    g_stock = jax.grad(loss)(x)
    monkeypatch.setenv("LLIE_VGG_S2D_STEM", "1")
    g_s2d = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(g_stock), np.asarray(g_s2d),
                               atol=2e-5)


def test_odd_shape_falls_back(vgg_and_params, monkeypatch):
    m, v = vgg_and_params
    monkeypatch.setenv("LLIE_VGG_S2D_STEM", "1")
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (1, 15, 17, 3)),
                    jnp.float32)
    out = m.apply(v, x)
    assert out["relu1_1"].shape == (1, 15, 17, 64)


def test_param_tree_unchanged(vgg_and_params, monkeypatch):
    # s2d stem must load the same converted npz checkpoints
    m, v = vgg_and_params
    assert set(v["params"]["conv1_1"]) == {"kernel", "bias"}
    assert v["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
