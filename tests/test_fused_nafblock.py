"""Fused NAFBlock Pallas kernels vs the reference Flax block.

Parity contract: the fused op (``ops/pallas/nafblock.py``) must reproduce
``NAFBlock`` (reference ``NAFNet_arch.py:27-80``) forward AND all
gradients, in every tiling variant: whole-image, halo-DMA multi-tile, and
under ``lax.scan``. Runs hermetically on CPU in interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (see pytest.ini)

from lowlight_image_enhancement_tpu.models.nafnet import NAFBlock, NAFNet
from lowlight_image_enhancement_tpu.ops.pallas.nafblock import (
    BlockConfig,
    fused_nafblock,
    make_block_config,
    pack_params,
)


def _random_block_params(net, c, x, seed=1):
    params = dict(net.init(jax.random.PRNGKey(0), x)["params"])
    rng = np.random.default_rng(seed)
    # zero-init beta/gamma would hide residual-path bugs
    params["beta"] = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    params["gamma"] = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    params["norm1"] = {
        "weight": jnp.asarray(rng.normal(size=(c,)) + 1.0, jnp.float32),
        "bias": jnp.asarray(rng.normal(size=(c,)), jnp.float32),
    }
    return params


def _pack(params):
    return pack_params(
        params["norm1"]["weight"], params["norm1"]["bias"],
        params["conv1"]["kernel"], params["conv1"]["bias"],
        params["conv2"]["kernel"], params["conv2"]["bias"],
        params["sca_conv"]["kernel"], params["sca_conv"]["bias"],
        params["conv3"]["kernel"], params["conv3"]["bias"],
        params["norm2"]["weight"], params["norm2"]["bias"],
        params["conv4"]["kernel"], params["conv4"]["bias"],
        params["conv5"]["kernel"], params["conv5"]["bias"],
        params["beta"], params["gamma"])


class TestFusedBlockParity:
    @pytest.mark.parametrize("th", [None, 4])  # None => whole-image variant
    def test_forward_and_grads_match_reference_block(self, th):
        c, h, w, n = 8, 16, 24, 2
        net = NAFBlock(c)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(n, h, w, c)),
                        jnp.float32)
        params = _random_block_params(net, c, x)
        cfg = (make_block_config(h, w, c, 2, 2) if th is None
               else BlockConfig(h, w, th, c, 2 * c, 2 * c, 1, 2, 1,
                                1e-6, True))
        assert cfg is not None

        def loss_ref(params, x):
            return jnp.sum(jnp.sin(net.apply({"params": params}, x)))

        def loss_fused(params, x):
            p = _pack(params)
            xf = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)
            out = fused_nafblock(xf, p, cfg)
            y = out.reshape(n, c, h, w).transpose(0, 2, 3, 1)
            return jnp.sum(jnp.sin(y))

        ref = net.apply({"params": params}, x)
        # forward
        xf = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)
        out = fused_nafblock(xf, _pack(params), cfg)
        out_nhwc = out.reshape(n, c, h, w).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out_nhwc), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)
        # grads (params + input)
        g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
        g_fus = jax.grad(loss_fused, argnums=(0, 1))(params, x)
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g_ref),
                jax.tree_util.tree_leaves_with_path(g_fus)):
            sc = max(1.0, float(jnp.max(jnp.abs(a))))
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-3 * sc, rtol=2e-3,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")

    def test_sca_global_mean_spans_tiles(self):
        """The SCA mean must be a whole-image statistic even when the grid
        splits the image into row tiles (accumulated partials)."""
        c, h, w, n = 8, 16, 8, 1
        net = NAFBlock(c)
        rng = np.random.default_rng(3)
        # top half bright, bottom half dark — a per-tile mean would differ
        x = np.zeros((n, h, w, c), np.float32)
        x[:, : h // 2] = rng.uniform(1, 2, (n, h // 2, w, c))
        x[:, h // 2 :] = rng.uniform(-0.1, 0.1, (n, h // 2, w, c))
        x = jnp.asarray(x)
        params = _random_block_params(net, c, x)
        ref = net.apply({"params": params}, x)
        cfg = BlockConfig(h, w, 4, c, 2 * c, 2 * c, 1, 2, 1, 1e-6, True)
        xf = jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)
        out = fused_nafblock(xf, _pack(params), cfg)
        out_nhwc = out.reshape(n, c, h, w).transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(out_nhwc), np.asarray(ref),
                                   atol=2e-4, rtol=1e-4)


class TestFusedNAFNet:
    KW = dict(img_channel=3, width=8, enc_blk_nums=(1, 2), middle_blk_num=1,
              dec_blk_nums=(1, 1))

    def test_param_tree_identical(self):
        x = jnp.zeros((1, 16, 16, 3))
        p0 = NAFNet(fused_blocks=False, **self.KW).init(
            jax.random.PRNGKey(0), x)["params"]
        p1 = NAFNet(fused_blocks=True, **self.KW).init(
            jax.random.PRNGKey(0), x)["params"]
        assert (jax.tree_util.tree_structure(p0)
                == jax.tree_util.tree_structure(p1))
        for a, b in zip(jax.tree_util.tree_leaves(p0),
                        jax.tree_util.tree_leaves(p1)):
            assert a.shape == b.shape and a.dtype == b.dtype

    def test_forward_and_grad_parity_full_net(self):
        net0 = NAFNet(fused_blocks=False, **self.KW)
        net1 = NAFNet(fused_blocks=True, **self.KW)
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 24, 16, 3)),
            jnp.float32)
        params = net0.init(jax.random.PRNGKey(0), x)["params"]
        y0 = net0.apply({"params": params}, x)
        y1 = net1.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   atol=1e-4, rtol=1e-4)
        g0 = jax.grad(lambda p: jnp.sum(
            jnp.sin(net0.apply({"params": p}, x))))(params)
        g1 = jax.grad(lambda p: jnp.sum(
            jnp.sin(net1.apply({"params": p}, x))))(params)
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g0),
                jax.tree_util.tree_leaves_with_path(g1)):
            sc = max(1.0, float(jnp.max(jnp.abs(a))))
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=3e-3 * sc, rtol=2e-3,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}")

    def test_scan_blocks_composes_with_fused(self):
        from lowlight_image_enhancement_tpu.models.nafnet import (
            stack_block_params,
        )

        net0 = NAFNet(fused_blocks=False, **self.KW)
        net2 = NAFNet(fused_blocks=True, scan_blocks=True, **self.KW)
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 16, 16, 3)),
            jnp.float32)
        params = net0.init(jax.random.PRNGKey(0), x)["params"]
        y0 = net0.apply({"params": params}, x)
        y2 = net2.apply({"params": stack_block_params(params)}, x)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y0),
                                   atol=1e-4, rtol=1e-4)

    def test_auto_mode_off_tpu_uses_unfused_path(self):
        net = NAFNet(**self.KW)  # fused_blocks="auto"
        assert net._fused_hw(8, 16, 16) is None  # CPU backend in tests

    def test_untileable_shape_falls_back(self):
        net = NAFNet(fused_blocks=True, **self.KW)
        # prime H has no divisor tile once too large for whole-image mode
        assert net._fused_hw(2048, 1031, 1024) is None

    def test_sharded_dp_fused_matches_single_device(self):
        """Fused pallas under a sharded jit (8-device CPU mesh) must equal
        the single-device unfused result — the multi-chip DP contract."""
        from lowlight_image_enhancement_tpu.parallel import (
            batch_sharding,
            create_mesh,
            replicate_sharding,
        )

        mesh = create_mesh(8)
        kw = dict(img_channel=3, width=8, enc_blk_nums=(1,),
                  middle_blk_num=1, dec_blk_nums=(1,))
        net = NAFNet(fused_blocks=True, **kw)
        net0 = NAFNet(fused_blocks=False, **kw)
        x = np.random.default_rng(0).normal(size=(8, 16, 16, 3)).astype(
            np.float32)
        params = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:1]))["params"]
        pr = jax.device_put(params, replicate_sharding(mesh))
        xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        val = jax.jit(lambda p, xx: jnp.sum(
            net.apply({"params": p}, xx) ** 2))(pr, xs)
        val0 = jnp.sum(net0.apply({"params": params}, jnp.asarray(x)) ** 2)
        np.testing.assert_allclose(float(val), float(val0), rtol=1e-5)
