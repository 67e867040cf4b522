"""Misc component tests: image ops (flow warp, pixel unshuffle), NAFSSR,
stock paired datasets, uint8-image PSNR/SSIM, TLC windowed mean."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.metrics.psnr_ssim_img import (
    calculate_psnr_img,
    calculate_ssim_img,
    rgb2ycbcr,
)
from lowlight_image_enhancement_tpu.ops.image_ops import (
    flow_warp,
    max_pool_2x2,
    pixel_unshuffle,
    resize_flow,
)
from lowlight_image_enhancement_tpu.ops.tlc import windowed_mean
from lowlight_image_enhancement_tpu.models.nafnet import pixel_shuffle


class TestImageOps:
    def test_pixel_unshuffle_inverts_shuffle(self, rng):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 8)),
                        dtype=jnp.float32)
        y = pixel_unshuffle(pixel_shuffle(x, 2), 2)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)

    @pytest.mark.parametrize("impl", ["reduce_window", "cmp", "slice"])
    def test_max_pool_2x2_impls_agree(self, rng, impl, monkeypatch):
        """All selectable lowerings == nn.max_pool forward, incl. the
        odd-size floor (torch MaxPool2d semantics); grads route to a
        single argmax per window (sum of |grad| == count of windows,
        exact for distinct float values)."""
        import flax.linen as nn

        monkeypatch.setenv("LLIE_MAXPOOL_IMPL", impl)
        for h, w in [(8, 8), (13, 17), (2, 3)]:
            x = jnp.asarray(rng.standard_normal((2, h, w, 5)),
                            dtype=jnp.float32)
            got = max_pool_2x2(x)
            want = nn.max_pool(x[:, : h // 2 * 2, : w // 2 * 2, :],
                               (2, 2), strides=(2, 2))
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

        x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)), jnp.float32)
        g = jax.grad(lambda xx: jnp.sum(max_pool_2x2(xx)))(x)
        assert float(jnp.sum(jnp.abs(g))) == 9 * 4  # one 1.0 per window

    def test_flow_warp_zero_flow_identity(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)), dtype=jnp.float32)
        flow = jnp.zeros((2, 8, 8, 2))
        np.testing.assert_allclose(
            np.asarray(flow_warp(x, flow)), np.asarray(x), atol=1e-6
        )

    def test_flow_warp_integer_shift(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 1)), dtype=jnp.float32)
        flow = jnp.ones((1, 8, 8, 2)) * jnp.asarray([1.0, 0.0])  # dx=1
        out = np.asarray(flow_warp(x, flow))
        # out[i, j] = x[i, j+1] in the interior
        np.testing.assert_allclose(out[0, :, :-1, 0],
                                   np.asarray(x)[0, :, 1:, 0], atol=1e-5)

    def test_flow_warp_border_mode(self, rng):
        x = jnp.asarray(rng.uniform(0.5, 1, (1, 4, 4, 1)),
                        dtype=jnp.float32)
        flow = jnp.ones((1, 4, 4, 2)) * 10.0  # fully out of bounds
        zeros = np.asarray(flow_warp(x, flow, padding_mode="zeros"))
        border = np.asarray(flow_warp(x, flow, padding_mode="border"))
        np.testing.assert_allclose(zeros, 0.0, atol=1e-6)
        assert border.min() > 0.4  # clamped to edge values

    def test_resize_flow_scales_displacements(self):
        flow = jnp.ones((1, 4, 4, 2))
        out = resize_flow(flow, "ratio", (2.0, 2.0))
        assert out.shape == (1, 8, 8, 2)
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


class TestTLC:
    def test_windowed_mean_full_window_equals_global(self, rng):
        x = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 4)), dtype=jnp.float32)
        wm = windowed_mean(x, (16, 16))  # window covers whole image
        gm = jnp.mean(x, axis=(1, 2), keepdims=True)
        np.testing.assert_allclose(np.asarray(wm),
                                   np.broadcast_to(np.asarray(gm), wm.shape),
                                   atol=1e-5)

    def test_windowed_mean_matches_naive(self, rng):
        x = np.asarray(rng.uniform(0, 1, (1, 6, 6, 1)), dtype=np.float32)
        wm = np.asarray(windowed_mean(jnp.asarray(x), (3, 3)))
        # naive check at a few positions
        for (i, j) in [(0, 0), (2, 3), (5, 5)]:
            r0, r1 = max(i - 1, 0), min(i + 2, 6)
            c0, c1 = max(j - 1, 0), min(j + 2, 6)
            want = x[0, r0:r1, c0:c1, 0].mean()
            np.testing.assert_allclose(wm[0, i, j, 0], want, atol=1e-5)

    @pytest.mark.slow  # measured 13s on 1-core host (round-3 re-tier)
    def test_tlc_nafnet_params_compatible(self, rng):
        """NAFNetLocal must accept plain NAFNet params unchanged."""
        from lowlight_image_enhancement_tpu.models import define_network

        plain = define_network({"type": "NAFNet", "width": 8,
                                "middle_blk_num": 1,
                                "enc_blk_nums": (1, 1),
                                "dec_blk_nums": (1, 1)})
        local = define_network({"type": "NAFNetLocal", "width": 8,
                                "middle_blk_num": 1,
                                "enc_blk_nums": (1, 1),
                                "dec_blk_nums": (1, 1),
                                "train_size": (16, 16)})
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)),
                        dtype=jnp.float32)
        params = plain.init(jax.random.PRNGKey(0), x)
        y = local.apply(params, x)  # same tree works
        assert y.shape == x.shape


@pytest.mark.slow
class TestNAFSSR:
    def test_stereo_forward_and_grad(self, rng):
        from lowlight_image_enhancement_tpu.models.nafssr import NAFSSR

        net = NAFSSR(up_scale=2, width=8, num_blks=2, fusion_from=0)
        x = jnp.asarray(rng.uniform(0, 1, (1, 8, 12, 6)),
                        dtype=jnp.float32)
        params = net.init(jax.random.PRNGKey(0), x)
        y = net.apply(params, x)
        assert y.shape == (1, 16, 24, 6)

        g = jax.grad(lambda p: jnp.mean(net.apply(p, x) ** 2))(params)
        assert all(np.all(np.isfinite(np.asarray(l)))
                   for l in jax.tree_util.tree_leaves(g))


class TestPairedDataset:
    def test_paired_folder_roundtrip(self, tmp_path, rng):
        from lowlight_image_enhancement_tpu.data import (
            PairedImageDataset,
            SingleImageDataset,
            create_dataset,
        )
        from lowlight_image_enhancement_tpu.utils import imgio

        for sub in ("gt", "lq"):
            os.makedirs(tmp_path / sub)
        for i in range(3):
            img = (rng.uniform(0, 255, (24, 24, 3))).astype(np.uint8)
            imgio.imwrite(str(tmp_path / "gt" / f"im{i}.png"), img)
            imgio.imwrite(str(tmp_path / "lq" / f"im{i}.png"), img // 2)

        ds = create_dataset({
            "type": "PairedImageDataset",
            "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"),
            "phase": "train", "gt_size": 16,
        })
        item = ds[0]
        assert item["gt"].shape == (16, 16, 3)
        assert item["lq"].shape == (16, 16, 3)
        assert len(ds) == 3

        single = SingleImageDataset(dataroot_lq=str(tmp_path / "lq"))
        assert len(single) == 3
        assert single[0]["lq"].shape == (24, 24, 3)


class TestUint8Metrics:
    def test_psnr_img_identical_inf(self, rng):
        img = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        assert calculate_psnr_img(img, img) == float("inf")

    def test_psnr_img_known_value(self):
        a = np.zeros((16, 16, 3), np.uint8)
        b = np.full((16, 16, 3), 25, np.uint8)  # uniform error 25/255
        want = 20 * np.log10(255 / 25)
        np.testing.assert_allclose(calculate_psnr_img(a, b), want,
                                   atol=1e-6)

    def test_ssim_img_bounds_and_crop(self, rng):
        a = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
        noise = rng.integers(-20, 20, a.shape)
        b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
        s = calculate_ssim_img(a, b)
        assert 0 <= s <= 1
        s_crop = calculate_ssim_img(a, b, crop_border=4)
        assert 0 <= s_crop <= 1

    def test_y_channel_mode(self, rng):
        a = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
        b = np.clip(a + 0.05, 0, 1)
        y_rgb = calculate_psnr_img(a, b)
        y_only = calculate_psnr_img(a, b, test_y_channel=True)
        assert y_rgb != y_only

    def test_rgb2ycbcr_anchors(self):
        # black -> Y=16/255; white -> Y=235/255 (studio swing)
        black = rgb2ycbcr(np.zeros((1, 1, 3)), y_only=True)
        white = rgb2ycbcr(np.ones((1, 1, 3)), y_only=True)
        np.testing.assert_allclose(black[0, 0, 0], 16 / 255, atol=1e-6)
        np.testing.assert_allclose(white[0, 0, 0], 235 / 255, atol=1e-3)


class TestNAFNetLocalBehavior:
    def test_large_window_equals_global_sca(self, rng):
        """With a TLC window >= 2x the image, every pixel's windowed mean
        covers the full image, so NAFNetLocal must equal plain NAFNet
        exactly on the same params."""
        import jax
        import jax.numpy as jnp

        from lowlight_image_enhancement_tpu.models import define_network

        kw = dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                  dec_blk_nums=(1, 1))
        plain = define_network({"type": "NAFNet", **kw})
        local = define_network({"type": "NAFNetLocal",
                                "train_size": (22, 22),  # 1.5x -> 33 >= 2*16
                                **kw})
        x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)),
                        dtype=jnp.float32)
        params = plain.init(jax.random.PRNGKey(0), x)
        y_plain = plain.apply(params, x)
        y_local = local.apply(params, x)
        np.testing.assert_allclose(np.asarray(y_local),
                                   np.asarray(y_plain), atol=1e-5)

    @pytest.mark.slow
    def test_small_window_differs_from_global(self, rng):
        import jax
        import jax.numpy as jnp

        from lowlight_image_enhancement_tpu.models import define_network

        kw = dict(width=8, middle_blk_num=1, enc_blk_nums=(1, 1),
                  dec_blk_nums=(1, 1))
        plain = define_network({"type": "NAFNet", **kw})
        local = define_network({"type": "NAFNetLocal",
                                "train_size": (4, 4), **kw})
        x = jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)),
                        dtype=jnp.float32)
        params = plain.init(jax.random.PRNGKey(1), x)
        # beta/gamma are zero-initialized (blocks act as identity), which
        # would mask the SCA pooling difference — perturb all params
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * jnp.ones_like(p), params
        )
        y_plain = np.asarray(plain.apply(params, x))
        y_local = np.asarray(local.apply(params, x))
        assert not np.allclose(y_plain, y_local, atol=1e-5)
