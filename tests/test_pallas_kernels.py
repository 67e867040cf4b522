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
