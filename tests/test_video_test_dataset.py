"""Video test datasets + data_util leftovers (VERDICT r3 items 2/5).

Contracts pinned against the reference:
``basicsr/data/video_test_dataset.py:17-331`` (folder enumeration,
border flags, cache_data, meta_info_file, DUF/recurrent variants) and
``basicsr/data/data_util.py:41-95`` (``generate_frame_indices`` 4-mode
table), ``:290-341`` (``generate_gaussian_kernel``/``duf_downsample``).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.data.video_test_dataset import (
    VideoRecurrentTestDataset,
    VideoTestDataset,
    VideoTestDUFDataset,
    VideoTestVimeo90KDataset,
    duf_downsample,
    generate_frame_indices,
    generate_gaussian_kernel,
    read_img_seq,
)
from lowlight_image_enhancement_tpu.utils import imgio


def _write_png(path, seed, shape=(12, 16, 3)):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=shape, dtype=np.int64).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(imgio.encode_png(arr))
    return arr


def make_clip_tree(root, clips=("clipA", "clipB"), frames=5,
                   shape=(12, 16, 3)):
    for ci, clip in enumerate(clips):
        for i in range(frames):
            _write_png(str(root / "lq" / clip / f"{i:08d}.png"),
                       seed=1000 * ci + i, shape=shape)
            _write_png(str(root / "gt" / clip / f"{i:08d}.png"),
                       seed=9000 + 1000 * ci + i, shape=shape)
    return str(root / "lq"), str(root / "gt")


class TestGenerateFrameIndices:
    """The reference docstring's own example table (data_util.py:52-59)."""

    @pytest.mark.parametrize("padding,expected", [
        ("replicate", [0, 0, 0, 1, 2]),
        ("reflection", [2, 1, 0, 1, 2]),
        ("reflection_circle", [4, 3, 0, 1, 2]),
        ("circle", [3, 4, 0, 1, 2]),
    ])
    def test_left_edge(self, padding, expected):
        assert generate_frame_indices(0, 100, 5, padding) == expected

    def test_right_edge_reflection(self):
        assert generate_frame_indices(99, 100, 5, "reflection") == \
            [97, 98, 99, 98, 97]

    def test_interior_identity(self):
        assert generate_frame_indices(50, 100, 5, "replicate") == \
            [48, 49, 50, 51, 52]

    def test_rejects_even_and_bad_mode(self):
        with pytest.raises(AssertionError):
            generate_frame_indices(0, 10, 4)
        with pytest.raises(AssertionError):
            generate_frame_indices(0, 10, 5, "zero")


class TestReadImgSeq:
    def test_folder_and_list_nhwc(self, tmp_path):
        arrs = [_write_png(str(tmp_path / "c" / f"{i}.png"), seed=i)
                for i in range(3)]
        seq = read_img_seq(str(tmp_path / "c"))
        assert seq.shape == (3, 12, 16, 3) and seq.dtype == np.float32
        np.testing.assert_allclose(seq[1], arrs[1] / 255.0, atol=1e-6)
        seq2 = read_img_seq([str(tmp_path / "c" / "2.png")])
        np.testing.assert_allclose(seq2[0], arrs[2] / 255.0, atol=1e-6)

    def test_mod_crop(self, tmp_path):
        _write_png(str(tmp_path / "c" / "0.png"), seed=0, shape=(13, 17, 3))
        seq = read_img_seq(str(tmp_path / "c"), require_mod_crop=True,
                           scale=4)
        assert seq.shape == (1, 12, 16, 3)


class TestDufDownsample:
    def test_kernel_is_normalized_gaussian(self):
        k = generate_gaussian_kernel(13, 1.6)
        assert k.shape == (13, 13)
        assert k[6, 6] == k.max()
        assert np.isclose(k.sum(), 1.0, atol=1e-6)

    @pytest.mark.parametrize("scale", [2, 4])
    def test_shapes_and_rank(self, scale):
        x = np.random.default_rng(0).uniform(
            0, 1, (2, 3, 16, 16, 3)).astype(np.float32)
        y = np.asarray(duf_downsample(x, kernel_size=13, scale=scale))
        assert y.shape == (2, 3, 16 // scale, 16 // scale, 3)
        y4 = np.asarray(duf_downsample(x[0], kernel_size=13, scale=scale))
        assert y4.shape == (3, 16 // scale, 16 // scale, 3)
        np.testing.assert_allclose(y[0], y4, atol=1e-6)

    def test_constant_image_preserved(self):
        # Gaussian smoothing + stride of a constant stays constant
        # (interior pixels; reflect pad keeps edges exact too)
        x = np.full((1, 1, 16, 16, 1), 0.5, np.float32)
        y = np.asarray(duf_downsample(x, scale=2))
        np.testing.assert_allclose(y, 0.5, atol=1e-5)

    def test_bad_scale_rejected(self):
        with pytest.raises(AssertionError):
            duf_downsample(np.zeros((1, 1, 8, 8, 1), np.float32), scale=5)


class TestVideoTestDataset:
    def _opt(self, lq, gt, **kw):
        opt = {"name": "Vid4", "dataroot_gt": gt, "dataroot_lq": lq,
               "io_backend": {"type": "disk"}, "cache_data": False,
               "num_frame": 3, "padding": "reflection"}
        opt.update(kw)
        return opt

    def test_enumeration_borders_and_item(self, tmp_path):
        lq, gt = make_clip_tree(tmp_path, frames=5)
        ds = VideoTestDataset(self._opt(lq, gt))
        assert len(ds) == 10  # 2 clips x 5 frames
        assert ds.data_info["folder"][:5] == ["clipA"] * 5
        # num_frame//2 = 1 edge frame flagged per clip end
        assert ds.data_info["border"][:5] == [1, 0, 0, 0, 1]
        item = ds[0]
        assert item["lq"].shape == (3, 12, 16, 3)
        assert item["gt"].shape == (12, 16, 3)
        assert item["folder"] == "clipA" and item["idx"] == "0/5"
        assert item["border"] == 1
        # reflection at left edge: frames [1, 0, 1]
        np.testing.assert_array_equal(item["lq"][0], item["lq"][2])

    def test_cache_data_equivalence(self, tmp_path):
        lq, gt = make_clip_tree(tmp_path, frames=4)
        cold = VideoTestDataset(self._opt(lq, gt, cache_data=False))
        hot = VideoTestDataset(self._opt(lq, gt, cache_data=True))
        assert isinstance(hot.imgs_lq["clipA"], np.ndarray)
        for i in (0, 3, 5):
            np.testing.assert_allclose(cold[i]["lq"], hot[i]["lq"],
                                       atol=1e-6)
            np.testing.assert_allclose(cold[i]["gt"], hot[i]["gt"],
                                       atol=1e-6)

    def test_meta_info_file_subsets(self, tmp_path):
        lq, gt = make_clip_tree(tmp_path, frames=3)
        meta = tmp_path / "meta.txt"
        meta.write_text("clipB 3\n")
        ds = VideoTestDataset(self._opt(lq, gt,
                                        meta_info_file=str(meta)))
        assert len(ds) == 3
        assert set(ds.data_info["folder"]) == {"clipB"}

    def test_unknown_name_and_lmdb_rejected(self, tmp_path):
        lq, gt = make_clip_tree(tmp_path, frames=2)
        with pytest.raises(ValueError, match="Non-supported"):
            VideoTestDataset(self._opt(lq, gt, name="mystery"))
        with pytest.raises(AssertionError, match="lmdb"):
            VideoTestDataset(self._opt(lq, gt,
                                       io_backend={"type": "lmdb"}))

    def test_mismatched_counts_rejected(self, tmp_path):
        lq, gt = make_clip_tree(tmp_path, clips=("clipA",), frames=3)
        _write_png(str(tmp_path / "lq" / "clipA" / "00000099.png"), seed=5)
        with pytest.raises(AssertionError, match="Different number"):
            VideoTestDataset(self._opt(lq, gt))


class TestVimeo90K:
    def test_septuplet_protocol(self, tmp_path):
        for i in range(1, 8):
            _write_png(str(tmp_path / "lq" / "00001" / "0266" /
                           f"im{i}.png"), seed=i)
        _write_png(str(tmp_path / "gt" / "00001" / "0266" / "im4.png"),
                   seed=40)
        meta = tmp_path / "meta.txt"
        meta.write_text("00001/0266 7 (256,448,3)\n")
        ds = VideoTestVimeo90KDataset({
            "name": "Vimeo90K", "dataroot_gt": str(tmp_path / "gt"),
            "dataroot_lq": str(tmp_path / "lq"),
            "io_backend": {"type": "disk"}, "cache_data": False,
            "num_frame": 5, "meta_info_file": str(meta)})
        assert len(ds) == 1
        item = ds[0]
        assert item["lq"].shape == (5, 12, 16, 3)
        # neighbor_list for num_frame=5: im2..im6, center im4
        assert item["lq_path"].endswith("im4.png")
        assert item["folder"] == "vimeo90k" and item["border"] == 0

    def test_cache_not_implemented(self, tmp_path):
        with pytest.raises(NotImplementedError):
            VideoTestVimeo90KDataset({
                "name": "v", "dataroot_gt": "g", "dataroot_lq": "l",
                "cache_data": True, "num_frame": 5})


class TestDUFAndRecurrent:
    def test_duf_synthesizes_lq_from_gt(self, tmp_path):
        lq, gt = make_clip_tree(tmp_path, clips=("clipA",), frames=3,
                                shape=(16, 16, 3))
        ds = VideoTestDUFDataset({
            "name": "Vid4", "dataroot_gt": gt, "dataroot_lq": lq,
            "io_backend": {"type": "disk"}, "cache_data": False,
            "num_frame": 3, "padding": "reflection",
            "use_duf_downsampling": True, "scale": 2})
        item = ds[1]
        assert item["lq"].shape == (3, 8, 8, 3)   # downsampled from GT
        assert item["gt"].shape == (16, 16, 3)

    def test_duf_cached_matches_uncached(self, tmp_path):
        lq, gt = make_clip_tree(tmp_path, clips=("clipA",), frames=3,
                                shape=(16, 16, 3))
        base = {"name": "Vid4", "dataroot_gt": gt, "dataroot_lq": lq,
                "io_backend": {"type": "disk"}, "num_frame": 3,
                "padding": "reflection", "use_duf_downsampling": True,
                "scale": 2}
        a = VideoTestDUFDataset({**base, "cache_data": False})[1]
        b = VideoTestDUFDataset({**base, "cache_data": True})[1]
        np.testing.assert_allclose(a["lq"], b["lq"], atol=1e-5)

    def test_recurrent_whole_clips(self, tmp_path):
        lq, gt = make_clip_tree(tmp_path, frames=4)
        ds = VideoRecurrentTestDataset({
            "name": "REDS4", "dataroot_gt": gt, "dataroot_lq": lq,
            "io_backend": {"type": "disk"}, "cache_data": True,
            "num_frame": 3})
        assert len(ds) == 2
        item = ds[0]
        assert item["folder"] == "clipA"
        assert item["lq"].shape == (4, 12, 16, 3)
        assert item["gt"].shape == (4, 12, 16, 3)
        with pytest.raises(NotImplementedError):
            VideoRecurrentTestDataset({
                "name": "REDS4", "dataroot_gt": gt, "dataroot_lq": lq,
                "io_backend": {"type": "disk"}, "cache_data": False,
                "num_frame": 3})[0]
