"""Compile-on-demand ctypes wrapper around the system libjpeg, used by
tests as a CONFORMANCE ORACLE for the pure-Python JPEG decoder.  The
product code never imports this; tests `pytest.skip` when gcc or
libjpeg are absent (the import-try contract for optional tooling).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

import numpy as np

_lib = None
_err: str | None = None


def _build():
    global _lib, _err
    if _lib is not None or _err is not None:
        return
    src = os.path.join(os.path.dirname(os.path.abspath(__file__)), "libjpeg_shim.c")
    so = os.path.join(tempfile.gettempdir(), "tsdb_libjpeg_shim.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["gcc", "-O2", "-shared", "-fPIC", src, "-ljpeg", "-o", so],
                check=True, capture_output=True, timeout=60,
            )
        lib = ctypes.CDLL(so)
    except (OSError, subprocess.SubprocessError) as exc:
        _err = f"libjpeg shim unavailable: {exc}"
        return
    lib.shim_encode.restype = ctypes.c_int
    lib.shim_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_ulong),
    ]
    lib.shim_decode.restype = ctypes.c_int
    lib.shim_decode.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.shim_decode_opts.restype = ctypes.c_int
    lib.shim_decode_opts.argtypes = [
        ctypes.c_char_p, ctypes.c_ulong, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.shim_free.argtypes = [ctypes.c_void_p]
    _lib = lib


def available() -> bool:
    _build()
    return _lib is not None


def skip_reason() -> str:
    return _err or "libjpeg shim unavailable"


def encode(img: np.ndarray, *, quality: int = 90, progressive: bool = False,
           arith: bool = False, restart_rows: int = 0) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB -> JPEG bytes via libjpeg."""
    _build()
    assert _lib is not None
    ch = 1 if img.ndim == 2 else img.shape[2]
    h, w = img.shape[0], img.shape[1]
    buf = ctypes.POINTER(ctypes.c_ubyte)()
    length = ctypes.c_ulong(0)
    rc = _lib.shim_encode(
        np.ascontiguousarray(img, dtype=np.uint8).tobytes(), w, h, ch,
        quality, int(progressive), int(arith), restart_rows,
        ctypes.byref(buf), ctypes.byref(length),
    )
    if rc != 0:
        raise RuntimeError(f"libjpeg encode failed rc={rc}")
    out = bytes(ctypes.string_at(buf, length.value))
    _lib.shim_free(buf)
    return out


def decode(payload: bytes, *, fancy: bool = True) -> np.ndarray:
    """JPEG bytes -> uint8 (h, w) or (h, w, 3) via libjpeg (islow IDCT).
    ``fancy=False`` selects replication chroma upsampling (what the
    pure-Python decoder does) instead of libjpeg's triangular filter."""
    _build()
    assert _lib is not None
    pix = ctypes.POINTER(ctypes.c_ubyte)()
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    rc = _lib.shim_decode_opts(
        payload, len(payload), int(fancy), ctypes.byref(pix),
        ctypes.byref(w), ctypes.byref(h), ctypes.byref(ch),
    )
    if rc != 0:
        raise RuntimeError(f"libjpeg decode failed rc={rc}")
    n = w.value * h.value * ch.value
    arr = np.frombuffer(ctypes.string_at(pix, n), dtype=np.uint8).copy()
    _lib.shim_free(pix)
    if ch.value == 1:
        return arr.reshape(h.value, w.value)
    return arr.reshape(h.value, w.value, ch.value)


def decode_plain(payload: bytes) -> np.ndarray:
    """Decode with replication (non-fancy) chroma upsampling."""
    return decode(payload, fancy=False)
