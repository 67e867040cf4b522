"""Pallas kernel parity tests (interpret mode on CPU): the fused LN
kernels must match the jnp custom-VJP implementation bit-closely in both
value and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.ops.layernorm import (
    layer_norm_2d,
    layer_norm_2d_auto,
)
from lowlight_image_enhancement_tpu.ops.pallas.layernorm import (
    layer_norm_2d_pallas,
    pallas_ln_supported,
)


@pytest.fixture
def lnp(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 32)), dtype=jnp.float32)
    w = jnp.asarray(rng.uniform(0.5, 1.5, (32,)), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)), dtype=jnp.float32)
    return x, w, b


class TestPallasLayerNorm:
    def test_supported_predicate(self):
        # C >= 128 threshold from the measured XLA-vs-Pallas crossover
        assert pallas_ln_supported(jnp.zeros((1, 16, 16, 128)))
        assert not pallas_ln_supported(jnp.zeros((1, 16, 16, 32)))
        assert not pallas_ln_supported(jnp.zeros((1, 5, 5, 128)))  # 25 rows

    def test_forward_parity(self, lnp):
        x, w, b = lnp
        y1 = layer_norm_2d_pallas(x, w, b, 1e-6)
        y2 = layer_norm_2d(x, w, b, 1e-6)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                   atol=2e-6)

    def test_gradient_parity(self, lnp):
        x, w, b = lnp

        def f(impl):
            return lambda a, ww, bb: jnp.sum(
                jnp.sin(impl(a, ww, bb, 1e-6)))

        g1 = jax.grad(f(layer_norm_2d_pallas), argnums=(0, 1, 2))(x, w, b)
        g2 = jax.grad(f(layer_norm_2d), argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       atol=5e-4)

    def test_bf16_forward(self, lnp):
        x, w, b = lnp
        xb = x.astype(jnp.bfloat16)
        y = layer_norm_2d_pallas(xb, w, b, 1e-6)
        assert y.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(y, dtype=np.float32),
            np.asarray(layer_norm_2d(x, w, b, 1e-6)),
            atol=3e-2,
        )

    def test_auto_dispatch_falls_back_on_cpu(self, lnp):
        x, w, b = lnp
        y = layer_norm_2d_auto(x, w, b, 1e-6)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(layer_norm_2d(x, w, b, 1e-6)),
            atol=1e-6,
        )

    def test_jit_composes(self, lnp):
        x, w, b = lnp
        y = jax.jit(lambda a: layer_norm_2d_pallas(a, w, b, 1e-6))(x)
        assert np.all(np.isfinite(np.asarray(y)))


class TestFusedReluPool:
    """ops/pallas/pool.py — fused relu+maxpool2x2 (interpret mode here).

    The op is NOT wired into VGG (a custom call between convs defeats
    XLA's TPU conv rewrite — see the module docstring); these tests keep
    the kernels correct for non-conv-chain pool sites.
    """

    def _ref(self, x):
        import flax.linen as fnn

        return fnn.max_pool(jax.nn.relu(x), (2, 2), strides=(2, 2))

    @pytest.mark.parametrize("shape", [(2, 16, 16, 64), (1, 8, 32, 128),
                                       (2, 4, 16, 192)])
    def test_fwd_bwd_parity(self, rng, shape):
        from lowlight_image_enhancement_tpu.ops.pallas.pool import (
            relu_max_pool_2x2, supported)

        assert supported(shape)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        y, yr = relu_max_pool_2x2(x), self._ref(x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(yr))
        g = jnp.asarray(
            rng.standard_normal(y.shape).astype(np.float32))
        d = jax.vjp(relu_max_pool_2x2, x)[1](g)[0]
        dr = jax.vjp(self._ref, x)[1](g)[0]
        np.testing.assert_array_equal(np.asarray(d), np.asarray(dr))

    def test_tie_routing_matches_select_and_scatter(self, rng):
        from lowlight_image_enhancement_tpu.ops.pallas.pool import (
            relu_max_pool_2x2)

        base = rng.standard_normal((1, 2, 2, 64)).astype(np.float32)
        x = jnp.asarray(np.tile(base, (1, 8, 8, 1)))  # every window ties
        g = jnp.ones((1, 8, 8, 64), jnp.float32)
        d = jax.vjp(relu_max_pool_2x2, x)[1](g)[0]
        dr = jax.vjp(self._ref, x)[1](g)[0]
        np.testing.assert_array_equal(np.asarray(d), np.asarray(dr))

    def test_unsupported_shapes_rejected(self):
        from lowlight_image_enhancement_tpu.ops.pallas.pool import supported

        assert not supported((1, 15, 16, 64))   # odd H
        assert not supported((1, 16, 16, 48))   # 2C not lane-multiple
        assert not supported((1, 16, 8, 64))    # W too small


class TestPallasPoolBwdRouter:
    """``LLIE_MAXPOOL_IMPL=pallas_bwd``: stock reduce_window forward +
    Pallas recompute router backward must equal the stock
    SelectAndScatter grad exactly, including first-argmax ties."""

    def _stock(self, x):
        import flax.linen as fnn

        return fnn.max_pool(x, (2, 2), strides=(2, 2))

    def test_router_matches_select_and_scatter(self, rng, monkeypatch):
        from lowlight_image_enhancement_tpu.ops.image_ops import (
            max_pool_2x2)

        monkeypatch.setenv("LLIE_MAXPOOL_IMPL", "pallas_bwd")
        x = jnp.asarray(
            rng.standard_normal((2, 16, 16, 64)).astype(np.float32))
        y = max_pool_2x2(x)
        np.testing.assert_array_equal(np.asarray(y),
                                      np.asarray(self._stock(x)))
        g = jnp.asarray(
            rng.standard_normal(y.shape).astype(np.float32))
        d = jax.vjp(max_pool_2x2, x)[1](g)[0]
        dr = jax.vjp(self._stock, x)[1](g)[0]
        np.testing.assert_array_equal(np.asarray(d), np.asarray(dr))

    def test_router_tie_semantics_no_relu(self, rng, monkeypatch):
        # Negative-valued ties: distinguishes the no-relu router from
        # the relu'd kernel (which would zero these windows).
        from lowlight_image_enhancement_tpu.ops.image_ops import (
            max_pool_2x2)

        monkeypatch.setenv("LLIE_MAXPOOL_IMPL", "pallas_bwd")
        base = -np.abs(rng.standard_normal((1, 2, 2, 64))).astype(
            np.float32)
        x = jnp.asarray(np.tile(base, (1, 8, 8, 1)))
        g = jnp.ones((1, 8, 8, 64), jnp.float32)
        d = jax.vjp(max_pool_2x2, x)[1](g)[0]
        dr = jax.vjp(self._stock, x)[1](g)[0]
        np.testing.assert_array_equal(np.asarray(d), np.asarray(dr))

    def test_router_falls_back_on_unsupported(self, rng, monkeypatch):
        from lowlight_image_enhancement_tpu.ops.image_ops import (
            max_pool_2x2)

        monkeypatch.setenv("LLIE_MAXPOOL_IMPL", "pallas_bwd")
        x = jnp.asarray(
            rng.standard_normal((1, 6, 6, 5)).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(max_pool_2x2(x)),
                                      np.asarray(self._stock(x)))


class TestVGGPoolReorder:
    """models/vgg.py pool-first reorder: relu(maxpool(x)) ==
    maxpool(relu(x)) with exactly equal gradients (torch semantics)."""

    def test_trunk_identical_under_reorder(self, rng, monkeypatch):
        from lowlight_image_enhancement_tpu.models.vgg import (
            load_vgg19_features)

        x = jnp.asarray(
            rng.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        outs = {}
        for flag in ("0", "1"):
            monkeypatch.setenv("LLIE_VGG_POOL_FIRST", flag)
            mod, variables, _ = load_vgg19_features(taps=("relu5_4",))
            val, grad = jax.value_and_grad(
                lambda xx: jnp.sum(
                    mod.apply(variables, xx)["relu5_4"] ** 2))(x)
            outs[flag] = (np.asarray(val), np.asarray(grad))
        np.testing.assert_array_equal(outs["0"][0], outs["1"][0])
        np.testing.assert_array_equal(outs["0"][1], outs["1"][1])
