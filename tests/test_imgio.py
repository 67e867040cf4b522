"""imgio: native PNG codec + imgproc cv2-replacement ops.

The framework must read/write images — including 16-bit-per-channel RGB
PNGs (SID ground truths) — without OpenCV. Reference counterpart:
``basicsr/utils/img_util.py`` (cv2-based) and ``sony_sid_lmdb_dataset.py:
38-56`` (16-bit PNG decode). The codec here is chunk-parse + zlib in
Python with C scanline defiltering (``native/pngcodec.cpp``).
"""

import io

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.utils import imgio, imgproc
from lowlight_image_enhancement_tpu.utils.imgio import (
    _defilter_py,
    _native_defilter,
    decode_png,
    encode_png,
)


class TestPngRoundTrip:
    @pytest.mark.parametrize(
        "shape,dtype",
        [
            ((37, 53, 3), np.uint8),
            ((21, 33, 3), np.uint16),
            ((20, 30), np.uint8),
            ((20, 30), np.uint16),
            ((15, 17, 4), np.uint8),
            ((15, 17, 4), np.uint16),
        ],
    )
    def test_roundtrip(self, shape, dtype):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, np.iinfo(dtype).max + 1, shape, dtype=dtype)
        out = decode_png(encode_png(arr))
        np.testing.assert_array_equal(out, arr)
        assert out.dtype == dtype

    def test_rejects_bad_signature(self):
        with pytest.raises(ValueError, match="PNG"):
            decode_png(b"JFIF" + b"\x00" * 64)

    def test_rejects_float(self):
        with pytest.raises(ValueError, match="dtype"):
            encode_png(np.zeros((4, 4, 3), np.float32))


class TestPilCrossCheck:
    """PIL is an independent PNG implementation: it must read our files
    and we must read its — including its adaptively-filtered scanlines
    (covering filter types the filter-0 round trip does not)."""

    def _pil_bytes(self, arr):
        from PIL import Image

        bio = io.BytesIO()
        Image.fromarray(arr).save(bio, format="PNG")
        return bio.getvalue()

    def test_decode_pil_written_rgb(self):
        # gradients trigger Sub/Up/Average/Paeth filters in PIL's encoder
        rng = np.random.default_rng(1)
        x = np.linspace(0, 255, 64).astype(np.uint8)
        img = np.stack(
            [np.tile(x, (64, 1)), np.tile(x[:, None], (1, 64)),
             rng.integers(0, 256, (64, 64), dtype=np.uint8)], -1)
        np.testing.assert_array_equal(
            imgio.imdecode(self._pil_bytes(img)), img)

    def test_pil_reads_ours(self):
        from PIL import Image

        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
        back = np.asarray(Image.open(io.BytesIO(encode_png(img))))
        np.testing.assert_array_equal(back, img)

    def test_16bit_gray_pil_crosscheck(self):
        from PIL import Image

        g16 = (np.arange(300, dtype=np.uint16) * 199).reshape(15, 20)
        bio = io.BytesIO()
        Image.fromarray(g16).save(bio, format="PNG")
        np.testing.assert_array_equal(imgio.imdecode(bio.getvalue()), g16)

    def test_palette_png_expands_to_rgb(self):
        from PIL import Image

        rng = np.random.default_rng(6)
        img = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
        pal = Image.fromarray(img).quantize(colors=16)  # mode P + PLTE
        bio = io.BytesIO()
        pal.save(bio, format="PNG")
        got = decode_png(bio.getvalue())
        want = np.asarray(pal.convert("RGB"))
        np.testing.assert_array_equal(got, want)

    def test_interlaced_png_dispatches_to_pil(self, monkeypatch):
        """PIL cannot WRITE Adam7 files, so craft an interlaced IHDR by
        hand and assert the native parser routes it to the PIL decoder
        rather than misreading the non-sequential scanlines."""
        import struct
        import zlib

        sentinel = np.zeros((1, 1, 3), np.uint8)
        monkeypatch.setattr(imgio, "_decode_via_pil", lambda b: sentinel)

        def chunk(ctype, data):
            crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", crc))

        ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)  # interlace=1
        buf = (imgio._PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", b"\x00") + chunk(b"IEND", b""))
        assert decode_png(buf) is sentinel


class TestDefilterParity:
    """The pure-Python defilter must agree with the C one on every
    filter type (synthesised streams, since encoders choose adaptively)."""

    @pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("bpp", [1, 3, 6])
    def test_python_matches_native(self, ft, bpp):
        lib = _native_defilter()
        if lib is None:
            pytest.skip("native library unavailable")
        import ctypes

        rng = np.random.default_rng(ft * 10 + bpp)
        h, w = 7, 11
        stride = w * bpp
        rows = rng.integers(0, 256, (h, stride + 1), dtype=np.uint8)
        rows[:, 0] = ft
        raw = rows.tobytes()
        out_c = np.empty(h * stride, np.uint8)
        rc = lib.png_defilter(raw, h, stride, bpp,
                              out_c.ctypes.data_as(ctypes.c_char_p))
        assert rc == 0
        out_py = _defilter_py(raw, h, stride, bpp)
        np.testing.assert_array_equal(out_py.reshape(-1), out_c)

    def test_invalid_filter_type(self):
        raw = bytes([9]) + bytes(6)
        with pytest.raises(ValueError, match="filter"):
            _defilter_py(raw, 1, 6, 3)


class TestIoHelpers:
    def test_imread_imwrite_16bit(self, tmp_path):
        rng = np.random.default_rng(3)
        arr = rng.integers(0, 65536, (12, 14, 3), dtype=np.uint16)
        p = str(tmp_path / "x.png")
        imgio.imwrite(p, arr)
        back = imgio.imread(p)
        np.testing.assert_array_equal(back, arr)
        assert back.dtype == np.uint16

    def test_to_uint8_rounding(self):
        np.testing.assert_array_equal(
            imgio.to_uint8(np.array([0.0, 0.5, 1.0, 2.0])),
            [0, 128, 255, 255])

    def test_to_float01_scales_by_dtype(self):
        assert imgio.to_float01(np.array([255], np.uint8))[0] == 1.0
        assert imgio.to_float01(np.array([65535], np.uint16))[0] == 1.0

    @pytest.mark.parametrize("ext", [".jpg", ".jpeg", ".bmp", ".tif"])
    def test_imencode_pil_extension_mapping(self, ext, monkeypatch):
        # PIL format names differ from extensions (JPG is NOT a
        # registered PIL format); imencode must map through PIL's
        # extension registry rather than uppercasing the suffix.
        monkeypatch.setenv("LLIE_NO_CV2", "1")
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
        buf = imgio.imencode(arr, ext)
        back = imgio.imdecode(buf)
        assert back.shape == arr.shape and back.dtype == np.uint8
        if ext == ".bmp":  # lossless
            np.testing.assert_array_equal(back, arr)

    def test_imencode_unknown_extension_raises(self):
        with pytest.raises(ValueError, match="extension"):
            imgio.imencode(np.zeros((4, 4, 3), np.uint8), ".nope")

    def test_palette_png_without_plte_raises_valueerror(self):
        # colortype-3 PNG whose PLTE chunk is stripped must fail with the
        # module's ValueError contract, not a TypeError on palette[idx].
        from PIL import Image

        idx = np.zeros((6, 6), np.uint8)
        im = Image.fromarray(idx, mode="P")
        im.putpalette([i for i in range(256) for _ in range(3)])
        bio = io.BytesIO()
        im.save(bio, format="PNG")
        buf = bio.getvalue()
        # strip the PLTE chunk (length[4] type[4] data[n] crc[4])
        pos = buf.index(b"PLTE")
        ln = int.from_bytes(buf[pos - 4:pos], "big")
        stripped = buf[:pos - 4] + buf[pos + 4 + ln + 4:]
        with pytest.raises(ValueError, match="PLTE|malformed"):
            imgio.decode_png(stripped)


class TestImgproc:
    def test_warp_identity_and_translation(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
        eye = np.array([[1.0, 0, 0], [0, 1.0, 0]])
        np.testing.assert_array_equal(
            imgproc.warp_affine(img, eye, (50, 40)), img)
        shift = np.array([[1.0, 0, 3], [0, 1.0, 5]])
        out = imgproc.warp_affine(img, shift, (50, 40))
        np.testing.assert_array_equal(out[5:, 3:], img[:-5, :-3])
        assert (out[:5] == 0).all() and (out[:, :3] == 0).all()

    def test_resize_identity_and_shape(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
        np.testing.assert_array_equal(
            imgproc.resize_bilinear(img, (50, 40)), img)
        assert imgproc.resize_bilinear(img, (100, 80)).shape == (80, 100, 3)

    def test_erode_radius(self):
        m = np.ones((20, 20, 3), np.float32)
        m[10, 10] = 0
        e = imgproc.erode(m, 3)
        assert e[10, 10, 0] == 0 and e[9, 9, 0] == 0 and e[11, 11, 0] == 0
        assert e[8, 8, 0] == 1 and e[12, 12, 0] == 1 and e[0, 0, 0] == 1

    def test_gaussian_kernel_matches_cv2_table(self):
        # cv2.getGaussianKernel(k, 0) fixed taps for small k
        np.testing.assert_allclose(
            imgproc._cv2_gaussian_kernel(3), [0.25, 0.5, 0.25], atol=1e-12)
        np.testing.assert_allclose(
            imgproc._cv2_gaussian_kernel(5),
            [0.0625, 0.25, 0.375, 0.25, 0.0625], atol=1e-12)
        assert abs(imgproc._cv2_gaussian_kernel(9).sum() - 1.0) < 1e-12

    def test_gaussian_preserves_dc(self):
        c = np.full((16, 16), 7.0)
        np.testing.assert_allclose(imgproc.gaussian_blur(c, 5), c, atol=1e-9)
