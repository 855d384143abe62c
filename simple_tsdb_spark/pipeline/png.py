"""Pure-Python PNG (RFC 2083 / ISO 15948) decoder — stdlib zlib + numpy.

Supports the full still-image core: color types greyscale (0), truecolor
RGB (2), indexed-color with PLTE (3), greyscale+alpha (4) and RGBA (6);
bit depths 1/2/4/8/16 where the spec allows them; all five scanline
filters (None, Sub, Up, Average, Paeth); and both interlace methods
(none and Adam7, decoded pass-by-pass and re-woven).  8-bit-or-less
images return uint8 (sub-byte greyscale scaled to full range, palette
indices resolved through PLTE/tRNS), 16-bit images return uint16.

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
#: bit depths the spec allows per color type (ISO 15948 table 11.1)
_DEPTHS = {0: {1, 2, 4, 8, 16}, 2: {8, 16}, 3: {1, 2, 4, 8}, 4: {8, 16}, 6: {8, 16}}
#: Adam7 pass grid: (x0, y0, dx, dy)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _unfilter(np, raw, offset: int, h: int, stride: int, bpp: int):
    """Undo the per-scanline filters over one (sub-)image of ``h`` rows of
    ``stride`` filtered bytes each; ``bpp`` is the filter byte distance
    (bytes per pixel, min 1).  Returns (uint8 array (h, stride), bytes
    consumed)."""
    need = h * (stride + 1)
    if len(raw) - offset < need:
        raise DecoderNotAvailable("truncated PNG raster")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        off = offset + y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):
            # intra-row serial filters: plain-list arithmetic — numpy
            # element access in a per-byte loop is ~5x slower
            ln = line.tolist()
            pv = prev.tolist()
            out_l = [0] * stride
            if ftype == 1:  # Sub
                for i in range(stride):
                    a = out_l[i - bpp] if i >= bpp else 0
                    out_l[i] = (ln[i] + a) & 0xFF
            elif ftype == 3:  # Average
                for i in range(stride):
                    a = out_l[i - bpp] if i >= bpp else 0
                    out_l[i] = (ln[i] + ((a + pv[i]) >> 1)) & 0xFF
            else:  # Paeth
                for i in range(stride):
                    if i >= bpp:
                        a = out_l[i - bpp]
                        c = pv[i - bpp]
                    else:
                        a = c = 0
                    b = pv[i]
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    out_l[i] = (ln[i] + pred) & 0xFF
            cur = np.array(out_l, dtype=np.int32)
        else:
            raise DecoderNotAvailable(f"unknown scanline filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, need


def _samples(np, rows, pw: int, nch: int, depth: int):
    """Unfiltered byte rows (ph, stride) → sample array (ph, pw, nch) of
    uint8 (depth <= 8) or uint16 (depth 16, big-endian words)."""
    ph = rows.shape[0]
    if depth == 8:
        return rows[:, : pw * nch].reshape(ph, pw, nch)
    if depth == 16:
        flat = rows[:, : pw * nch * 2].reshape(ph, -1).astype(np.uint16)
        return ((flat[:, 0::2] << 8) | flat[:, 1::2]).reshape(ph, pw, nch)
    # sub-byte: MSB-first packed samples, rows padded to byte boundaries
    bits = np.unpackbits(rows, axis=1)[:, : pw * nch * depth]
    weights = 1 << np.arange(depth - 1, -1, -1, dtype=np.uint8)
    vals = bits.reshape(ph, pw * nch, depth) @ weights
    return vals.astype(np.uint8).reshape(ph, pw, nch)


def decode_png(payload: bytes):
    """Decode a PNG → ndarray (h, w) gray, (h, w, 2) gray+alpha,
    (h, w, 3) RGB, or (h, w, 4) RGBA; uint8 for depths <= 8 (sub-byte
    greyscale scaled to 0..255), uint16 for depth 16.  Indexed images
    resolve through their palette to RGB (or RGBA with a tRNS chunk)."""
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
            if color not in _CHANNELS:
                raise DecoderNotAvailable(f"PNG color type {color} unsupported")
            if depth not in _DEPTHS[color]:
                raise DecoderNotAvailable(
                    f"{depth}-bit depth invalid for color type {color}"
                )
            if comp != 0 or filt != 0:
                raise DecoderNotAvailable("nonstandard compression/filter method")
            if interlace not in (0, 1):
                raise DecoderNotAvailable(f"unknown interlace method {interlace}")
            if w * h > (1 << 26) or w == 0 or h == 0:
                raise DecoderNotAvailable(f"implausible PNG dimensions {w}x{h}")
            ihdr = (w, h, depth, color, interlace)
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
    w, h, depth, color, interlace = ihdr
    nch = _CHANNELS[color]
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise DecoderNotAvailable(f"corrupt IDAT stream: {e}") from e

    bpp = max(1, (nch * depth) // 8)
    sdtype = np.uint16 if depth == 16 else np.uint8
    img = np.zeros((h, w, nch), dtype=sdtype)
    passes = _ADAM7 if interlace == 1 else [(0, 0, 1, 1)]
    offset = 0
    for x0, y0, dx, dy in passes:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue  # empty Adam7 pass: nothing in the stream
        stride = (pw * nch * depth + 7) // 8
        rows, used = _unfilter(np, raw, offset, ph, stride, bpp)
        offset += used
        img[y0::dy, x0::dx] = _samples(np, rows, pw, nch, depth)

    if color == 3:  # indexed → palette lookup (indices never scaled)
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
    if depth < 8:  # greyscale sub-byte: scale to full 8-bit range
        img = (img.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return img.reshape(h, w) if nch == 1 else img
