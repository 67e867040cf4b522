"""ctypes binding for the native SIDPack decoder (``native/sidpack.cpp``).

Auto-builds/loads ``libsidpack.so``; every API degrades to the pure-Python
:class:`..data.records.SidPackReader` when the library or toolchain is
missing, so the framework never hard-depends on the native build.

Hot-path API: :class:`NativeSidPack` — ``decode_crop(key, top, left, ph,
pw, expo=None)`` returns a float32 crop, fusing inflate + crop + uint16 ->
float conversion (and optional exposure-align) in C.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

from lowlight_image_enhancement_tpu.data.records import SidPackReader

logger = logging.getLogger(__name__)

_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load_library() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    so_path = os.path.abspath(os.path.join(_NATIVE_DIR, "libsidpack.so"))
    if not os.path.exists(so_path):
        src = os.path.join(_NATIVE_DIR, "sidpack.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                    check=True, capture_output=True, timeout=120,
                )
            except (subprocess.SubprocessError, OSError) as e:
                logger.info("native sidpack build unavailable: %s", e)
                return None
    if not os.path.exists(so_path):
        return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        logger.info("failed to load %s: %s", so_path, e)
        return None

    lib.sp_open.restype = ctypes.c_void_p
    lib.sp_open.argtypes = [ctypes.c_char_p]
    lib.sp_close.argtypes = [ctypes.c_void_p]
    lib.sp_read.restype = ctypes.c_int64
    lib.sp_read.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_uint64,
    ]
    lib.sp_decode_crop_f32.restype = ctypes.c_int
    lib.sp_decode_crop_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.sp_decode_crop_banded_f32.restype = ctypes.c_int
    lib.sp_decode_crop_banded_f32.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.sp_decode_crop_batch_f32.restype = ctypes.c_int
    lib.sp_decode_crop_batch_f32.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # offsets/nbytes/comps
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,  # h/w/c
        ctypes.c_void_p, ctypes.c_void_p,                   # tops/lefts
        ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_int,                      # expos, flag
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
    ]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load_library() is not None


class NativeSidPack:
    """SIDPack reader with a C fast path (falls back to Python).

    ``get(key)`` matches :class:`SidPackReader.get`; ``decode_crop`` fuses
    decode + crop + float conversion (+ optional exposure-align producing
    ``lq`` directly).
    """

    def __init__(self, path: str):
        self._py = SidPackReader(path)  # index + fallback
        self.index = self._py.index
        self._lib = _load_library()
        self._handle = None
        if self._lib is not None:
            handle = self._lib.sp_open(path.encode())
            if handle:
                self._handle = ctypes.c_void_p(handle)
        # scratch is thread-local: data loaders (grain, thread pools)
        # decode concurrently, and a shared inflate target corrupts
        self._tls = threading.local()

    @property
    def uses_native(self) -> bool:
        return self._handle is not None

    def keys(self):
        return self.index.keys()

    def __contains__(self, key):
        return key in self.index

    def __len__(self):
        return len(self.index)

    def get(self, key: str) -> np.ndarray:
        return self._py.get(key)

    def meta_shape(self, key: str) -> tuple:
        return tuple(self.index[key]["shape"])

    def meta_dtype(self, key: str) -> str:
        return self.index[key]["dtype"]

    def decode_crop(
        self,
        key: str,
        top: int,
        left: int,
        ph: int,
        pw: int,
        *,
        scale: float = 1.0 / 65535.0,
        expo: Optional[float] = None,
    ) -> np.ndarray:
        """-> float32 ``[ph, pw, C]`` crop; when ``expo`` is given the
        output is ``clip(crop * scale * expo, 0, 1)`` (the aligned lq)."""
        ent = self.index[key]
        h, w, *rest = ent["shape"]
        c = rest[0] if rest else 1
        if self._handle is None or ent["dtype"] != "uint16":
            if ent["comp"] == "zlib_band" and ent["dtype"] == "uint16":
                rows = self._py.get_rows(key, top, ph)
                arr = rows[:, left : left + pw].astype(np.float32) * scale
            else:
                arr = self._py.get(key).astype(np.float32)
                if ent["dtype"] == "uint16":
                    arr = arr * scale
                arr = arr[top : top + ph, left : left + pw]
            if expo is not None:
                arr = np.clip(arr * expo, 0.0, 1.0)
            return np.ascontiguousarray(arr, dtype=np.float32)

        out = np.empty((ph, pw, c), np.float32)

        def get_scratch(need):
            scratch = getattr(self._tls, "scratch", None)
            if scratch is None or scratch.size < need:
                scratch = np.empty(need, np.uint16)
                self._tls.scratch = scratch
            return scratch

        if ent["comp"] == "zlib_band":
            band_rows = ent["band_rows"]
            b0 = top // band_rows
            b1 = (top + ph - 1) // band_rows
            rows_span = min((b1 + 1) * band_rows, h) - b0 * band_rows
            scratch = get_scratch(rows_span * w * c)
            rc = self._lib.sp_decode_crop_banded_f32(
                self._handle, ent["offset"], ent["nbytes"],
                h, w, c, top, left, ph, pw,
                ctypes.c_float(scale),
                ctypes.c_float(expo if expo is not None else 1.0),
                1 if expo is not None else 0,
                scratch.ctypes.data_as(ctypes.c_void_p),
                out.ctypes.data_as(ctypes.c_void_p),
            )
        else:
            comp = 1 if ent["comp"] == "zlib" else 0
            scratch_ptr = None
            if comp:
                scratch_ptr = get_scratch(h * w * c).ctypes.data_as(
                    ctypes.c_void_p)
            rc = self._lib.sp_decode_crop_f32(
                self._handle, ent["offset"], ent["nbytes"], comp,
                h, w, c, top, left, ph, pw,
                ctypes.c_float(scale),
                ctypes.c_float(expo if expo is not None else 1.0),
                1 if expo is not None else 0,
                scratch_ptr,
                out.ctypes.data_as(ctypes.c_void_p),
            )
        if rc != 0:
            raise RuntimeError(f"native decode failed for {key!r}")
        return out

    def decode_crop_batch(
        self,
        keys,
        tops,
        lefts,
        ph: int,
        pw: int,
        *,
        scale: float = 1.0 / 65535.0,
        expos=None,
    ) -> np.ndarray:
        """Decode N crops in parallel (one pthread per record) via the C
        batch API. All records must be uint16 with the same channel count.

        Returns ``[N, ph, pw, C]`` float32. Falls back to a Python loop
        over :meth:`decode_crop` when the native library is unavailable.

        Thread spawn/join costs ~0.1 ms/record: the parallel path pays off
        for full-resolution SID records (tens of ms of inflate each); for
        tiny records the serial :meth:`decode_crop` loop is faster.
        """
        n = len(keys)
        ents = [self.index[k] for k in keys]
        if (self._handle is None
                or any(e["dtype"] != "uint16" for e in ents)
                or any(e["comp"] == "zlib_band" for e in ents)):
            # banded records take the per-record path (still band-pruned)
            return np.stack([
                self.decode_crop(k, t, l, ph, pw, scale=scale,
                                 expo=(expos[i] if expos is not None
                                       else None))
                for i, (k, t, l) in enumerate(zip(keys, tops, lefts))
            ])
        c = ents[0]["shape"][2] if len(ents[0]["shape"]) > 2 else 1
        handles = (ctypes.c_void_p * n)(*([self._handle.value] * n))
        offsets = np.asarray([e["offset"] for e in ents], np.uint64)
        nbytes = np.asarray([e["nbytes"] for e in ents], np.uint64)
        comps = np.asarray(
            [1 if e["comp"] == "zlib" else 0 for e in ents], np.int32)
        hs = np.asarray([e["shape"][0] for e in ents], np.int64)
        ws = np.asarray([e["shape"][1] for e in ents], np.int64)
        cs = np.asarray([c] * n, np.int64)
        tops_a = np.asarray(tops, np.int64)
        lefts_a = np.asarray(lefts, np.int64)
        expos_a = (np.asarray(expos, np.float32)
                   if expos is not None else None)
        max_elems = int((hs * ws * cs).max())
        scratch = np.empty(n * max_elems, np.uint16)
        out = np.empty((n, ph, pw, c), np.float32)
        rc = self._lib.sp_decode_crop_batch_f32(
            handles, n,
            offsets.ctypes.data_as(ctypes.c_void_p),
            nbytes.ctypes.data_as(ctypes.c_void_p),
            comps.ctypes.data_as(ctypes.c_void_p),
            hs.ctypes.data_as(ctypes.c_void_p),
            ws.ctypes.data_as(ctypes.c_void_p),
            cs.ctypes.data_as(ctypes.c_void_p),
            tops_a.ctypes.data_as(ctypes.c_void_p),
            lefts_a.ctypes.data_as(ctypes.c_void_p),
            ph, pw, ctypes.c_float(scale),
            (expos_a.ctypes.data_as(ctypes.c_void_p)
             if expos_a is not None else None),
            1 if expos is not None else 0,
            scratch.ctypes.data_as(ctypes.c_void_p), max_elems,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            raise RuntimeError("native batch decode failed")
        return out

    def close(self) -> None:
        if self._handle is not None and self._lib is not None:
            self._lib.sp_close(self._handle)
            self._handle = None
        self._py.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
