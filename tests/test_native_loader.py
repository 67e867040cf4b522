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
