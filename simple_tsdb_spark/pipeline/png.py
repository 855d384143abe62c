"""Pure-Python PNG (RFC 2083 / ISO 15948) decoder — stdlib zlib + numpy.

Supports the common still-image subset: 8-bit greyscale (color type 0),
truecolor RGB (2), indexed-color with PLTE (3), greyscale+alpha (4) and
RGBA (6), non-interlaced, with all five scanline filters (None, Sub,
Up, Average, Paeth).  16-bit channels and Adam7 interlace raise
:class:`DecoderNotAvailable` — the same honest capability boundary as
:mod:`pipeline.jpeg`.

The inflate and the per-scanline unfilter are the intrinsic sequential
parts (row t depends on row t-1); everything else is numpy.  Used by
``pipeline.multimodal.decode_media`` for ``image/png`` inside
``mapInPandas`` batches.
"""

from __future__ import annotations

import struct
import zlib

from simple_tsdb_spark.pipeline.jpeg import DecoderNotAvailable

__all__ = ["decode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes):
    """Decode a PNG → uint8 ndarray (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, or (h, w, 4) RGBA.  Indexed images resolve through
    their palette to RGB (or RGBA with a tRNS chunk)."""
    import numpy as np

    if len(payload) < 8 or payload[:8] != _SIG:
        raise DecoderNotAvailable("not a PNG stream (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC (CRC unchecked)
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise DecoderNotAvailable(f"{depth}-bit PNG unsupported (8 only)")
            if color not in _CHANNELS:
                raise DecoderNotAvailable(f"PNG color type {color} unsupported")
            if comp != 0 or filt != 0:
                raise DecoderNotAvailable("nonstandard compression/filter method")
            if interlace != 0:
                raise DecoderNotAvailable("Adam7 interlace unsupported")
            ihdr = (w, h, color)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(data, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise DecoderNotAvailable("missing IHDR")
    w, h, color = ihdr
    nch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise DecoderNotAvailable(f"corrupt IDAT stream: {e}") from e
    stride = w * nch
    if len(raw) < h * (stride + 1):
        raise DecoderNotAvailable("truncated PNG raster")

    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - nch] if i >= nch else 0
                b = prev[i]
                if ftype == 1:  # Sub
                    v = line[i] + a
                elif ftype == 3:  # Average
                    v = line[i] + ((a + b) >> 1)
                else:  # Paeth
                    c = prev[i - nch] if i >= nch else 0
                    v = line[i] + _paeth(int(a), int(b), int(c))
                cur[i] = v & 0xFF
        else:
            raise DecoderNotAvailable(f"unknown scanline filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    img = out.reshape(h, w, nch) if nch > 1 else out.reshape(h, w)
    if color == 3:  # indexed → palette lookup
        if plte is None:
            raise DecoderNotAvailable("indexed PNG without PLTE")
        idx = img.reshape(h, w)
        if idx.max(initial=0) >= len(plte):
            raise DecoderNotAvailable("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return img
