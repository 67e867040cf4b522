"""NAFNet backbone tests: shapes, padding, gradient flow, Scenario-B
invariants (port of the reference's ``core_tests/test_scenarioB_no_double_k``
behavioral checks adapted to JAX: jaxpr inspection replaces forward hooks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.models import (
    NAFNet,
    create_newbp_net,
    define_network,
    pixel_shuffle,
    simple_gate,
)
from lowlight_image_enhancement_tpu.metrics.parameter_utils import count_parameters
from lowlight_image_enhancement_tpu.ops.layernorm import layer_norm_2d


def tiny_net(**kw):
    defaults = dict(img_channel=3, width=8, middle_blk_num=1,
                    enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    defaults.update(kw)
    return NAFNet(**defaults)


class TestPrimitives:
    def test_simple_gate(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)), dtype=jnp.float32)
        y = simple_gate(x)
        assert y.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x[..., :4] * x[..., 4:]), rtol=1e-6
        )

    def test_pixel_shuffle_torch_ordering(self):
        # input channel layout (c, r1, r2): channel 0 -> output (0,0) of c=0
        x = jnp.arange(1 * 1 * 1 * 8, dtype=jnp.float32).reshape(1, 1, 1, 8)
        y = pixel_shuffle(x, 2)  # -> [1, 2, 2, 2]
        assert y.shape == (1, 2, 2, 2)
        # c=0 plane should be [[0,1],[2,3]]; c=1 plane [[4,5],[6,7]]
        np.testing.assert_allclose(
            np.asarray(y[0, :, :, 0]), [[0, 1], [2, 3]]
        )
        np.testing.assert_allclose(
            np.asarray(y[0, :, :, 1]), [[4, 5], [6, 7]]
        )

    def test_layer_norm_2d_matches_reference_math(self, rng):
        x = jnp.asarray(rng.standard_normal((2, 4, 4, 16)), dtype=jnp.float32)
        w = jnp.asarray(rng.uniform(0.5, 1.5, (16,)), dtype=jnp.float32)
        b = jnp.asarray(rng.standard_normal((16,)), dtype=jnp.float32)
        y = layer_norm_2d(x, w, b, 1e-6)
        xn = np.asarray(x)
        mu = xn.mean(-1, keepdims=True)
        var = xn.var(-1, keepdims=True)
        want = (xn - mu) / np.sqrt(var + 1e-6) * np.asarray(w) + np.asarray(b)
        np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)

    def test_layer_norm_2d_gradients_match_autodiff(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 3, 3, 8)), dtype=jnp.float32)
        w = jnp.ones((8,))
        b = jnp.zeros((8,))

        def f_custom(x, w, b):
            return jnp.sum(jnp.sin(layer_norm_2d(x, w, b, 1e-6)))

        def f_plain(x, w, b):
            mu = jnp.mean(x, -1, keepdims=True)
            var = jnp.mean((x - mu) ** 2, -1, keepdims=True)
            y = (x - mu) * jax.lax.rsqrt(var + 1e-6) * w + b
            return jnp.sum(jnp.sin(y))

        g1 = jax.grad(f_custom, argnums=(0, 1, 2))(x, w, b)
        g2 = jax.grad(f_plain, argnums=(0, 1, 2))(x, w, b)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-5)


@pytest.mark.slow
class TestNAFNet:
    def test_forward_shape_and_residual_init(self, rng):
        """beta/gamma zero-init => initial output ~ input + conv paths only
        through intro/ending; at least shape must be preserved."""
        net = tiny_net()
        x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))

    def test_non_multiple_size_padding(self, rng):
        """Arbitrary H,W padded to multiple of 2^depth then cropped back."""
        net = tiny_net()  # depth 2 -> multiple of 4
        x = jnp.asarray(rng.uniform(0, 1, (1, 13, 17, 3)), dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (1, 13, 17, 3)

    def test_gradients_flow_everywhere(self, rng):
        net = tiny_net()
        x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        t = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)

        def loss(p):
            return jnp.mean((net.apply(p, x) - t) ** 2)

        g = jax.grad(loss)(params)
        norms = {
            "/".join(map(str, path)): float(jnp.linalg.norm(leaf))
            for path, leaf in jax.tree_util.tree_flatten_with_path(g)[0]
        }
        assert all(np.isfinite(v) for v in norms.values())
        # With beta/gamma zero-init, block conv weights legitimately get
        # zero grads at init; but the trunk (intro/ending/down/up) and the
        # residual scales themselves must see gradient.
        nonzero = [k for k, v in norms.items() if v > 0]
        assert any("intro" in k for k in nonzero)
        assert any("ending" in k for k in nonzero)
        assert any("beta" in k or "gamma" in k for k in nonzero)

    def test_bf16_forward(self, rng):
        net = tiny_net(dtype=jnp.bfloat16)
        x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.dtype == jnp.float32  # output cast back
        assert np.all(np.isfinite(np.asarray(y)))

    def test_sid_config_param_count(self):
        """SID config (w32, [2,2,4,8]/12/[2,2,2,2]) must be ~29M params,
        matching the reference NAFNet at the same hyperparameters."""
        net = NAFNet(img_channel=3, width=32, middle_blk_num=12,
                     enc_blk_nums=(2, 2, 4, 8), dec_blk_nums=(2, 2, 2, 2))
        x = jnp.zeros((1, 32, 32, 3))
        params = net.init(jax.random.PRNGKey(0), x)
        m = count_parameters(params["params"], unit="M")
        assert 25.0 < m < 35.0, f"unexpected param count {m}M"


class TestScenarioB:
    def test_create_newbp_net_is_plain_nafnet(self):
        net = create_newbp_net(nafnet_params=dict(
            img_channel=3, width=8, enc_blk_nums=[1, 1], middle_blk_num=1,
            dec_blk_nums=[1, 1]))
        assert isinstance(net, NAFNet)
        assert net.width == 8

    def test_define_network_yaml_path(self):
        net = define_network({
            "type": "NewBPNAFNet",
            "in_channels": 3,
            "kernel_type": "panchromatic",  # ignored by the backbone
            "kernel_spec": "P2",
            "nafnet_params": {
                "img_channel": 3, "width": 8, "enc_blk_nums": [1, 1],
                "middle_blk_num": 1, "dec_blk_nums": [1, 1]},
        })
        assert isinstance(net, NAFNet)

    def test_no_psf_in_forward_jaxpr(self, rng):
        """Scenario-B invariant (reference test_scenarioB_no_double_k):
        the backbone forward contains NO 3x3 depthwise conv with the PSF's
        feature_group_count=3 signature on the 3-channel input — i.e. the
        PSF op never appears in the forward jaxpr. Since the backbone's own
        depthwise convs run at width*2 channels (>=16), a conv with
        feature_group_count==3 would indicate PSF application."""
        net = tiny_net()
        x = jnp.zeros((1, 8, 8, 3))
        params = net.init(jax.random.PRNGKey(0), x)
        jaxpr = jax.make_jaxpr(lambda p, xx: net.apply(p, xx))(params, x)
        for eqn in jaxpr.jaxpr.eqns:
            if eqn.primitive.name == "conv_general_dilated":
                assert eqn.params["feature_group_count"] != 3, (
                    "found a groups=3 conv in the backbone forward — "
                    "PSF must only appear in the loss branch"
                )

    def test_psf_applied_exactly_once_in_loss_graph(self, rng):
        """The loss-side counterpart of the reference's forward-hook count:
        the full train-loss jaxpr contains EXACTLY ONE groups=3 depthwise
        PSF application (shift-add lowering => count the custom-vjp
        newbp_conv call sites by name)."""
        from lowlight_image_enhancement_tpu.losses import HybridLossPlus
        from lowlight_image_enhancement_tpu.ops.psf import (
            create_crosstalk_psf,
        )

        net = tiny_net()
        psf = create_crosstalk_psf("mono")
        loss = HybridLossPlus(use_perc=False, use_deltaE=False,
                              use_ssim=False, physics_psf_module=psf)
        x = jnp.zeros((1, 8, 8, 3))
        params = net.init(jax.random.PRNGKey(0), x)["params"]

        def total_loss(p, batch_x):
            out = net.apply({"params": p}, batch_x)
            t, _ = loss(
                Bhat_raw=out, B_raw=batch_x, A_raw=batch_x,
                expo_ratio=jnp.ones((1,)),
                Bhat_srgb01=jnp.clip(out, 0, 1),
                B_srgb01=batch_x,
                A_srgb01=batch_x,
            )
            return t

        jaxpr = jax.make_jaxpr(total_loss)(params, x)
        text = str(jaxpr)
        # one custom-vjp PSF call site => its fwd rule name appears once
        count = text.count("_newbp_conv_fwd")
        assert count == 1, (
            f"expected exactly one PSF application in the loss graph, "
            f"found {count}"
        )

    def test_wrapped_equals_plain_nafnet(self, rng):
        """NewBP wrapper output must be bit-identical to plain NAFNet with
        the same params (reference asserts atol=0)."""
        plain = tiny_net()
        wrapped = create_newbp_net(nafnet_params=dict(
            img_channel=3, width=8, enc_blk_nums=(1, 1), middle_blk_num=1,
            dec_blk_nums=(1, 1)))
        x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), dtype=jnp.float32)
        params = plain.init(jax.random.PRNGKey(0), x)
        y1 = plain.apply(params, x)
        y2 = wrapped.apply(params, x)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
