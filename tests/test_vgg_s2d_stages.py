"""Whole-stage space-to-depth VGG lowering: exactness + tie semantics.

``models/vgg.py`` can run VGG stages 1..N entirely in space-to-depth(2)
space (``_S2DConv``), exiting each stage through a max pool computed over
the 4 s2d phases (``_phase_max``) so no depth-to-space boundary copy ever
materializes. The math is an exact re-layout of the same multiply-adds
(reference objective contract: ``NewBP_model/losses.py:32-69``), so:

- forward activations and input gradients must match the stock lowering
  to float tolerance (including tap activations INSIDE an s2d stage);
- ``_phase_max``'s hand-written VJP must reproduce the stock pool's
  first-max tie routing exactly on finite inputs (torch ``MaxPool2d`` /
  ``ops/image_ops.max_pool_2x2`` window scan order);
- NaN-window behavior is pinned: the gradient is DROPPED (documented
  divergence — the two stock lowerings themselves disagree under NaN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.models.vgg import (
    VGG19Features,
    _phase_max,
    _phase_max_pool,
    _s2d_stages_from_env,
    _space_to_depth,
)
from lowlight_image_enhancement_tpu.ops.image_ops import max_pool_2x2


@pytest.fixture(scope="module")
def vgg_and_params():
    m = VGG19Features(taps=("relu1_1", "relu2_2", "relu3_4", "relu5_4"))
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    return m, v


# ---------------------------------------------------------------------------
# _phase_max vs the stock 2x2 max pool
# ---------------------------------------------------------------------------


def _tie_rich_input(rng, n=2, h=8, w=8, c=5):
    """Random tensor with engineered duplicate window maxima so tie
    routing is actually exercised (quantized values collide often)."""
    x = rng.integers(-3, 4, size=(n, h, w, c)).astype(np.float32)
    return jnp.asarray(x)


def _phase_pool_fullres(y: jax.Array, c: int) -> jax.Array:
    """2x2/s2 max pool of full-res ``y`` via the phase-space path."""
    return _phase_max_pool(_space_to_depth(y), c)


def test_phase_max_forward_matches_stock_pool():
    y = _tie_rich_input(np.random.default_rng(0))
    np.testing.assert_array_equal(
        np.asarray(_phase_pool_fullres(y, 5)),
        np.asarray(max_pool_2x2(y)))


def test_phase_max_grad_matches_stock_pool_with_ties():
    rng = np.random.default_rng(1)
    y = _tie_rich_input(rng)
    w = jnp.asarray(rng.normal(size=(2, 4, 4, 5)).astype(np.float32))

    g_phase = jax.grad(
        lambda t: jnp.sum(_phase_pool_fullres(t, 5) * w))(y)
    g_stock = jax.grad(lambda t: jnp.sum(max_pool_2x2(t) * w))(y)
    np.testing.assert_array_equal(np.asarray(g_phase), np.asarray(g_stock))


@pytest.mark.slow
def test_phase_max_grad_matches_torch_maxpool_with_ties():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(2)
    y = _tie_rich_input(rng)
    w = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)

    g_phase = np.asarray(jax.grad(
        lambda t: jnp.sum(_phase_pool_fullres(t, 5) * jnp.asarray(w)))(y))

    yt = torch.tensor(np.asarray(y).transpose(0, 3, 1, 2),
                      requires_grad=True)
    out = torch.nn.functional.max_pool2d(yt, 2)
    (out * torch.tensor(w.transpose(0, 3, 1, 2))).sum().backward()
    g_torch = yt.grad.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_array_equal(g_phase, g_torch)


def test_phase_max_all_equal_window_routes_to_first_phase():
    # all 4 phases equal -> gradient goes to phase 0 = top-left pixel
    y = jnp.ones((1, 2, 2, 1), jnp.float32)
    g = np.asarray(jax.grad(
        lambda t: jnp.sum(_phase_pool_fullres(t, 1)))(y))
    np.testing.assert_array_equal(
        g.ravel(), np.array([1.0, 0.0, 0.0, 0.0], np.float32))


def test_phase_max_nan_window_drops_gradient():
    """Pinned behavior (documented in _phase_max): ANY NaN in a window
    drops that window's gradient entirely; finite windows in the same
    tensor are unaffected."""
    x = np.zeros((1, 1, 2, 4, 1), np.float32)
    x[0, 0, 0, 0, 0] = np.nan  # window 0: one NaN among zeros
    x[0, 0, 1, :, 0] = [1.0, 2.0, 3.0, 0.5]  # window 1: finite
    xj = jnp.asarray(x)

    m = _phase_max(xj)
    assert np.isnan(np.asarray(m)[0, 0, 0, 0])
    g = np.asarray(jax.grad(
        lambda t: jnp.sum(jnp.where(jnp.isnan(_phase_max(t)), 0.0,
                                    _phase_max(t))))(xj))
    np.testing.assert_array_equal(g[0, 0, 0, :, 0], np.zeros(4))
    np.testing.assert_array_equal(g[0, 0, 1, :, 0],
                                  np.array([0, 0, 1, 0], np.float32))

    # all-NaN window also drops
    x2 = jnp.asarray(np.full((1, 1, 1, 4, 1), np.nan, np.float32))
    g2 = np.asarray(jax.grad(lambda t: jnp.nansum(_phase_max(t)))(x2))
    np.testing.assert_array_equal(g2, np.zeros_like(g2))


# ---------------------------------------------------------------------------
# Whole-stage s2d VGG vs stock
# ---------------------------------------------------------------------------


def _apply(m, v, x, stages, monkeypatch):
    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", str(stages))
    return m.apply(v, x)


def test_s2d_stages_forward_matches_stock(vgg_and_params, monkeypatch):
    m, v = vgg_and_params
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    o_stock = _apply(m, v, x, 0, monkeypatch)
    for stages in (1, 2):
        o_s2d = _apply(m, v, x, stages, monkeypatch)
        for k in o_stock:
            np.testing.assert_allclose(
                np.asarray(o_stock[k]), np.asarray(o_s2d[k]), atol=3e-5,
                err_msg=f"tap {k} stages={stages}")


def test_s2d_stages_input_grad_matches_stock(vgg_and_params, monkeypatch):
    m, v = vgg_and_params
    x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (1, 16, 16, 3)),
                    jnp.float32)

    def loss(x_):
        out = m.apply(v, x_)
        return sum(jnp.mean(o * o) for o in out.values())

    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "0")
    g_stock = jax.grad(loss)(x)
    for stages in (1, 2):
        monkeypatch.setenv("LLIE_VGG_S2D_STAGES", str(stages))
        g_s2d = jax.grad(loss)(x)
        np.testing.assert_allclose(np.asarray(g_stock), np.asarray(g_s2d),
                                   atol=3e-5, err_msg=f"stages={stages}")


def test_s2d_stages_perceptual_loss_value_and_grad(monkeypatch):
    """The gradient that actually trains: PerceptualLoss (relu5_4 tap,
    MSE on features) value+grad must match stock to float tolerance."""
    from lowlight_image_enhancement_tpu.losses.components import (
        PerceptualLoss,
    )

    perc = PerceptualLoss()
    rng = np.random.default_rng(5)
    pred = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)), jnp.float32)

    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "0")
    v0, g0 = jax.value_and_grad(lambda p: perc(p, gt))(pred)
    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "2")
    v2, g2 = jax.value_and_grad(lambda p: perc(p, gt))(pred)
    np.testing.assert_allclose(float(v0), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g2), atol=3e-6)


def test_s2d_stages_odd_shape_falls_back(vgg_and_params, monkeypatch):
    m, v = vgg_and_params
    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "2")
    x = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (1, 15, 17, 3)),
                    jnp.float32)
    out = m.apply(v, x)
    assert out["relu1_1"].shape == (1, 15, 17, 64)


def test_s2d_stages_param_tree_unchanged(vgg_and_params, monkeypatch):
    """s2d stages must load the same converted npz checkpoints: identical
    param names and full-res kernel shapes."""
    m, v = vgg_and_params
    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "2")
    x = jnp.zeros((1, 16, 16, 3), jnp.float32)
    v2 = m.init(jax.random.PRNGKey(0), x)
    flat0 = jax.tree_util.tree_map(jnp.shape, v["params"])
    flat2 = jax.tree_util.tree_map(jnp.shape, v2["params"])
    assert jax.tree_util.tree_structure(flat0) == \
        jax.tree_util.tree_structure(flat2)
    assert v2["params"]["conv1_1"]["kernel"].shape == (3, 3, 3, 64)
    assert v2["params"]["conv2_2"]["kernel"].shape == (3, 3, 128, 128)


# ---------------------------------------------------------------------------
# Env validation (ADVICE r4)
# ---------------------------------------------------------------------------


def test_s2d_stages_env_validation(monkeypatch):
    monkeypatch.delenv("LLIE_VGG_S2D_STAGES", raising=False)
    assert _s2d_stages_from_env() == 0
    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "2")
    assert _s2d_stages_from_env() == 2
    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "banana")
    with pytest.raises(ValueError, match="LLIE_VGG_S2D_STAGES"):
        _s2d_stages_from_env()
    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "5")
    with pytest.raises(ValueError, match="LLIE_VGG_S2D_STAGES"):
        _s2d_stages_from_env()
    monkeypatch.setenv("LLIE_VGG_S2D_STAGES", "-1")
    with pytest.raises(ValueError, match="LLIE_VGG_S2D_STAGES"):
        _s2d_stages_from_env()
