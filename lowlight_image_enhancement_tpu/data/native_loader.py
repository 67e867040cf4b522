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
            arr = self._py.get(key).astype(np.float32)
            if ent["dtype"] == "uint16":
                arr = arr * scale
            arr = arr[top : top + ph, left : left + pw]
            if expo is not None:
                arr = np.clip(arr * expo, 0.0, 1.0)
            return np.ascontiguousarray(arr, dtype=np.float32)

        out = np.empty((ph, pw, c), np.float32)
        comp = 1 if ent["comp"] == "zlib" else 0
        scratch_ptr = None
        if comp:
            need = h * w * c
            scratch = getattr(self._tls, "scratch", None)
            if scratch is None or scratch.size < need:
                scratch = np.empty(need, np.uint16)
                self._tls.scratch = scratch
            scratch_ptr = scratch.ctypes.data_as(ctypes.c_void_p)
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

    def close(self) -> None:
        if self._handle is not None and self._lib is not None:
            self._lib.sp_close(self._handle)
            self._handle = None
        self._py.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
