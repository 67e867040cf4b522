"""Native SIDPack decoder tests: single + batch decode parity with the
pure-Python path, thread safety, fallback behavior."""

import concurrent.futures
import os

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.data.native_loader import (
    NativeSidPack,
    native_available,
)
from lowlight_image_enhancement_tpu.data.records import SidPackWriter


@pytest.fixture(scope="module")
def pack(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    path = str(d / "t.pack")
    rng = np.random.default_rng(0)
    imgs = {
        f"k{i}": rng.integers(0, 65535, (64, 80, 3)).astype(np.uint16)
        for i in range(6)
    }
    with SidPackWriter(path) as w:
        for k, v in imgs.items():
            w.add(k, v, comp="zlib" if int(k[1]) % 2 else "none")
    return path, imgs


class TestNativeDecode:
    def test_single_crop_matches_numpy(self, pack):
        path, imgs = pack
        with NativeSidPack(path) as r:
            for k, src in imgs.items():
                crop = r.decode_crop(k, 3, 5, 32, 40)
                want = src[3:35, 5:45].astype(np.float32) / 65535.0
                np.testing.assert_allclose(crop, want, atol=1e-6)

    def test_exposure_align_fused(self, pack):
        path, imgs = pack
        with NativeSidPack(path) as r:
            crop = r.decode_crop("k0", 0, 0, 16, 16, expo=3.0)
            want = np.clip(
                imgs["k0"][:16, :16].astype(np.float32) / 65535.0 * 3.0,
                0, 1,
            )
            np.testing.assert_allclose(crop, want, atol=1e-6)

    def test_batch_decode_matches_serial(self, pack):
        path, imgs = pack
        keys = list(imgs)
        with NativeSidPack(path) as r:
            batch = r.decode_crop_batch(keys, [2] * 6, [4] * 6, 16, 16,
                                        expos=[2.0] * 6)
            for i, k in enumerate(keys):
                solo = r.decode_crop(k, 2, 4, 16, 16, expo=2.0)
                np.testing.assert_allclose(batch[i], solo, atol=1e-6)

    def test_out_of_bounds_crop_raises(self, pack):
        path, _ = pack
        with NativeSidPack(path) as r:
            if not r.uses_native:
                pytest.skip("native lib unavailable")
            with pytest.raises(RuntimeError):
                r.decode_crop("k0", 60, 0, 32, 32)  # 60+32 > 64

    def test_thread_safety(self, pack):
        """Concurrent decode_crop from many threads (grain-style) must not
        corrupt (thread-local scratch regression test)."""
        path, imgs = pack
        with NativeSidPack(path) as r:
            def work(i):
                k = f"k{i % 6}"
                crop = r.decode_crop(k, 1, 1, 32, 32)
                want = imgs[k][1:33, 1:33].astype(np.float32) / 65535.0
                return np.allclose(crop, want, atol=1e-6)

            with concurrent.futures.ThreadPoolExecutor(8) as ex:
                results = list(ex.map(work, range(64)))
            assert all(results)

    def test_meta_helpers(self, pack):
        path, imgs = pack
        with NativeSidPack(path) as r:
            assert r.meta_shape("k0") == (64, 80, 3)
            assert r.meta_dtype("k0") == "uint16"
            assert len(r) == 6 and "k3" in r


class TestBandedCompression:
    def test_banded_roundtrip_and_row_pruning(self, tmp_path, rng):
        from lowlight_image_enhancement_tpu.data.records import (
            SidPackReader,
        )

        path = str(tmp_path / "b.pack")
        img = rng.integers(0, 65535, (200, 96, 3)).astype(np.uint16)
        with SidPackWriter(path, band_rows=32) as w:
            w.add("img", img, comp="zlib_band")
        with SidPackReader(path) as r:
            assert r.meta("img")["comp"] == "zlib_band"
            assert r.meta("img")["band_rows"] == 32
            np.testing.assert_array_equal(r.get("img"), img)
            np.testing.assert_array_equal(
                r.get_rows("img", 50, 60), img[50:110]
            )
            # edge band (non-multiple height)
            np.testing.assert_array_equal(
                r.get_rows("img", 190, 10), img[190:200]
            )

    def test_native_banded_crop_parity(self, tmp_path, rng):
        path = str(tmp_path / "b2.pack")
        img = rng.integers(0, 65535, (128, 64, 3)).astype(np.uint16)
        with SidPackWriter(path, band_rows=16) as w:
            w.add("img", img, comp="zlib_band")
        with NativeSidPack(path) as r:
            for top, left in [(0, 0), (17, 5), (96, 32), (100, 36)]:
                crop = r.decode_crop("img", top, left, 28, 28, expo=2.0)
                want = np.clip(
                    img[top:top + 28, left:left + 28].astype(np.float32)
                    / 65535.0 * 2.0, 0, 1)
                np.testing.assert_allclose(crop, want, atol=1e-6)

    def test_banded_batch_falls_back_correctly(self, tmp_path, rng):
        path = str(tmp_path / "b3.pack")
        img = rng.integers(0, 65535, (64, 48, 3)).astype(np.uint16)
        with SidPackWriter(path, band_rows=16) as w:
            w.add("a", img, comp="zlib_band")
            w.add("b", img, comp="zlib_band")
        with NativeSidPack(path) as r:
            batch = r.decode_crop_batch(["a", "b"], [4, 8], [2, 6], 16, 16)
            np.testing.assert_allclose(
                batch[0],
                img[4:20, 2:18].astype(np.float32) / 65535.0, atol=1e-6)
            np.testing.assert_allclose(
                batch[1],
                img[8:24, 6:22].astype(np.float32) / 65535.0, atol=1e-6)
