"""Image I/O without a hard OpenCV dependency.

The reference stack reads and writes images exclusively through
``cv2.imread``/``cv2.imdecode``/``cv2.imwrite`` (e.g.
``NAFNet_base/basicsr/utils/img_util.py``, ``sony_sid_lmdb_dataset.py:38-56``).
OpenCV is not part of this framework's baked-in dependency set, so this
module provides the same capabilities with a three-tier backend:

1. **cv2** when importable — fastest (SIMD libpng/libjpeg);
2. a **native PNG codec**: chunk parsing + zlib in Python (zlib already
   runs at C speed), scanline defiltering in C
   (``native/pngcodec.cpp:png_defilter``) via the ctypes-loaded
   ``libsidpack.so`` — with a pure-numpy defilter fallback;
3. **PIL** for non-PNG formats (JPEG/BMP/...).

PIL alone is not sufficient: it silently truncates 16-bit-per-channel RGB
PNGs to 8 bits, and SID ground truths are 16-bit RGB — hence the native
codec.

Conventions (unlike cv2, which is BGR): every function here takes and
returns **RGB** channel order, HWC uint8/uint16 (or HW for grayscale).
"""

from __future__ import annotations

import ctypes
import os
import struct
import zlib
from typing import Optional

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# colortype -> number of channels
_CT_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

_DEFILTER = None
_DEFILTER_TRIED = False


def _native_defilter() -> Optional[ctypes.CDLL]:
    """Load ``png_defilter`` from the shared native library (built on
    demand by the sidpack loader's make step)."""
    global _DEFILTER, _DEFILTER_TRIED
    if _DEFILTER_TRIED:
        return _DEFILTER
    _DEFILTER_TRIED = True
    try:
        from lowlight_image_enhancement_tpu.data.native_loader import (
            _load_library,
        )

        lib = _load_library()
    except Exception:
        lib = None
    if lib is None or not hasattr(lib, "png_defilter"):
        return None
    lib.png_defilter.restype = ctypes.c_int
    lib.png_defilter.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.c_char_p,
    ]
    _DEFILTER = lib
    return _DEFILTER


def _defilter_py(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Pure-numpy defilter fallback (PNG spec 4.5.4). Sub is a per-lane
    cumulative sum; Average/Paeth need a sequential column scan."""
    rows = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    fts = rows[:, 0]
    data = rows[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    for r in range(h):
        ft = int(fts[r])
        cur_in = data[r].astype(np.int64)
        up = out[r - 1].astype(np.int64) if r > 0 else np.zeros(
            stride, np.int64)
        if ft == 0:
            out[r] = data[r]
        elif ft == 1:  # Sub: cumsum along each bpp lane
            lanes = cur_in.reshape(-1, bpp)
            out[r] = (np.cumsum(lanes, axis=0) % 256).astype(
                np.uint8).reshape(-1)
        elif ft == 2:  # Up
            out[r] = ((cur_in + up) % 256).astype(np.uint8)
        elif ft == 3:  # Average — sequential in the left neighbour
            cur = np.zeros(stride, np.int64)
            cur[:bpp] = (cur_in[:bpp] + (up[:bpp] >> 1)) % 256
            for i in range(bpp, stride, bpp):
                j = i + bpp
                cur[i:j] = (cur_in[i:j]
                            + ((cur[i - bpp:i] + up[i:j]) >> 1)) % 256
            out[r] = cur.astype(np.uint8)
        elif ft == 4:  # Paeth — sequential in the left neighbour
            upl = np.zeros(stride, np.int64)
            if r > 0:
                upl[bpp:] = out[r - 1][:-bpp]
            cur = np.zeros(stride, np.int64)
            cur[:bpp] = (cur_in[:bpp] + _paeth(0, up[:bpp], 0)) % 256
            for i in range(bpp, stride, bpp):
                j = i + bpp
                cur[i:j] = (cur_in[i:j]
                            + _paeth(cur[i - bpp:i], up[i:j], upl[i:j])) % 256
            out[r] = cur.astype(np.uint8)
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
    return out


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG byte buffer to an RGB(A)/gray array, preserving
    16-bit depth. Supports bit depths 8/16, color types 0/2/3/4/6,
    non-interlaced (Adam7 falls back to PIL, 8-bit only)."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = bitdepth = colortype = interlace = None
    palette = None
    trns = None
    idat = []
    n = len(buf)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", buf[pos:pos + 4])
        ctype = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bitdepth, colortype, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body))
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    if interlace:
        return _decode_via_pil(buf)
    if bitdepth not in (8, 16) or colortype not in _CT_CHANNELS:
        return _decode_via_pil(buf)
    if colortype == 3 and bitdepth != 8:
        return _decode_via_pil(buf)

    channels = _CT_CHANNELS[colortype]
    bpp = max(1, channels * bitdepth // 8)
    stride = width * channels * (bitdepth // 8)
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")

    lib = _native_defilter()
    if lib is not None:
        out = np.empty(height * stride, np.uint8)
        rc = lib.png_defilter(
            raw, height, stride, bpp,
            out.ctypes.data_as(ctypes.c_char_p))
        if rc != 0:
            raise ValueError("invalid PNG filter type")
    else:
        out = _defilter_py(raw, height, stride, bpp)

    if bitdepth == 16:
        img = out.reshape(height, stride).view(">u2").astype(np.uint16)
        img = img.reshape(height, width, channels)
    else:
        img = out.reshape(height, width, channels)

    if colortype == 3:  # palette expand
        if palette is None:
            raise ValueError("malformed PNG: palette image without PLTE")
        idx = img[..., 0]
        img = palette[idx]
        if trns is not None:
            alpha = np.full(256, 255, np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, np.uint8)
            img = np.concatenate([img, alpha[idx][..., None]], axis=-1)
    if img.shape[-1] == 1:
        img = img[..., 0]
    return np.ascontiguousarray(img)


def _decode_via_pil(buf: bytes) -> np.ndarray:
    import io

    from PIL import Image

    with Image.open(io.BytesIO(buf)) as im:
        if im.mode in ("I;16", "I"):
            return np.asarray(im, np.uint16).copy()
        if im.mode == "P":
            im = im.convert("RGBA" if "transparency" in im.info else "RGB")
        return np.asarray(im).copy()


def encode_png(arr: np.ndarray, compress_level: int = 6) -> bytes:
    """Encode a gray/gray+alpha/RGB/RGBA uint8 or uint16 array as PNG
    (filter type 0 on every scanline)."""
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.ndim != 3 or arr.shape[-1] not in (1, 2, 3, 4):
        raise ValueError(f"unsupported image shape {arr.shape}")
    if arr.dtype == np.uint8:
        bitdepth = 8
        body = arr
    elif arr.dtype == np.uint16:
        bitdepth = 16
        body = arr.astype(">u2")
    else:
        raise ValueError(f"unsupported dtype {arr.dtype} (uint8/uint16)")
    h, w, c = arr.shape
    colortype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(
            ">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, colortype, 0, 0, 0)
    rows = body.reshape(h, -1).view(np.uint8).reshape(h, -1)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rows], axis=1).tobytes()
    idat = zlib.compress(raw, compress_level)
    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


_CV2_IMPORTABLE: "bool | None" = None


def _has_cv2() -> bool:
    # The env var is re-read every call (tests toggle it at runtime), but
    # the import probe is cached: a FAILED import is not cached by Python,
    # so retrying it on every decode would re-scan sys.path per frame on
    # the cv2-less hot path this module exists for.
    if os.environ.get("LLIE_NO_CV2"):
        return False
    global _CV2_IMPORTABLE
    if _CV2_IMPORTABLE is None:
        try:
            import cv2  # noqa: F401

            _CV2_IMPORTABLE = True
        except ImportError:
            _CV2_IMPORTABLE = False
    return _CV2_IMPORTABLE


def imdecode(buf: bytes) -> np.ndarray:
    """Decode an encoded image buffer -> RGB (or gray) uint8/uint16 HWC."""
    if _has_cv2():
        import cv2

        arr = np.frombuffer(bytes(buf), np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_UNCHANGED)
        if img is None:
            raise ValueError("image decode failed")
        if img.ndim == 3 and img.shape[-1] >= 3:
            img[..., :3] = img[..., 2::-1]  # BGR(A) -> RGB(A)
        return img
    if bytes(buf[:8]) == _PNG_SIG:
        return decode_png(bytes(buf))
    return _decode_via_pil(bytes(buf))


def imread(path: str) -> np.ndarray:
    """Read an image file -> RGB (or gray) uint8/uint16 HWC."""
    with open(path, "rb") as f:
        return imdecode(f.read())


def imencode(arr: np.ndarray, ext: str = ".png") -> bytes:
    """Encode an RGB (or gray) uint8/uint16 array. PNG natively; other
    formats via PIL (8-bit)."""
    ext = ext.lower()
    if ext in (".png",):
        return encode_png(np.asarray(arr))
    import io

    from PIL import Image

    arr = np.asarray(arr)
    if arr.dtype != np.uint8:
        raise ValueError(f"{ext} encode requires uint8")
    # PIL format names differ from extensions (.jpg -> JPEG, .tif ->
    # TIFF); resolve through PIL's own extension registry.
    fmt = Image.registered_extensions().get(ext)
    if fmt is None:
        raise ValueError(f"unsupported image extension: {ext}")
    bio = io.BytesIO()
    Image.fromarray(arr).save(bio, format=fmt)
    return bio.getvalue()


def imwrite(path: str, arr: np.ndarray) -> None:
    """Write an RGB (or gray) uint8/uint16 array; format from extension.

    Counterpart of the reference's ``imwrite`` (``basicsr/utils/img_util.py``)
    minus the BGR convention: pass RGB here.
    """
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    ext = os.path.splitext(path)[1] or ".png"
    with open(path, "wb") as f:
        f.write(imencode(np.asarray(arr), ext))


def to_uint8(img01: np.ndarray) -> np.ndarray:
    """float [0,1] -> rounded uint8 (reference tensor2img rounding)."""
    return (np.clip(np.asarray(img01), 0.0, 1.0) * 255.0 + 0.5).astype(
        np.uint8)


def to_float01(img: np.ndarray) -> np.ndarray:
    """uint8/uint16 -> float32 [0,1] (divides by the dtype max)."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32)
