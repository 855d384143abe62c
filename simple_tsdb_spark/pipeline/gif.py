"""Pure-Python GIF (87a/89a) still-image decoder — stdlib + numpy.

Decodes the FIRST image frame: header + logical screen descriptor,
global/local color tables, interlaced row order, GIF89a graphic-control
transparency (→ RGBA), and the variable-width LSB-first LZW code stream
(clear/EOI codes, dictionary growth to 4096).  Animated GIFs decode as
their first frame — the honest still-image contract; a malformed or
truncated stream raises :class:`DecoderNotAvailable` like the JPEG/PNG
decoders.

Used by ``pipeline.multimodal.decode_media`` for ``image/gif``.
"""

from __future__ import annotations

import struct

from simple_tsdb_spark.pipeline.jpeg import DecoderNotAvailable

__all__ = ["decode_gif"]


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    clear = 1 << min_code_size
    eoi = clear + 1
    out: list[int] = []
    # bit reader: LSB-first across the concatenated sub-block bytes
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return eoi  # truncated stream: treat as end
        byte0 = bitpos >> 3
        v = int.from_bytes(data[byte0 : byte0 + 4], "little")
        v = (v >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return v

    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    prev: list[int] | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]
        elif code < clear:
            entry = [code]
        else:
            raise DecoderNotAvailable("corrupt LZW code stream")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise DecoderNotAvailable("LZW stream ended before raster complete")
    return out[:n_pixels]


def decode_gif(payload: bytes):
    """Decode a GIF's first frame → uint8 (h, w, 3) RGB, or (h, w, 4)
    RGBA when the frame declares a transparent index."""
    import numpy as np

    if len(payload) < 13 or payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise DecoderNotAvailable("not a GIF stream")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    transparent = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                gflags = payload[pos + 1]
                if gflags & 1:
                    transparent = payload[pos + 4]
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            _ix, _iy, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            ct = gct
            if iflags & 0x80:
                n = 2 << (iflags & 7)
                ct = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise DecoderNotAvailable("GIF frame without a color table")
            min_code = payload[pos]
            pos += 1
            chunks = []
            while pos < len(payload) and payload[pos]:
                ln = payload[pos]
                chunks.append(payload[pos + 1 : pos + 1 + ln])
                pos += ln + 1
            pos += 1
            idx = np.array(
                _lzw_decode(min_code, b"".join(chunks), w * h), dtype=np.int32
            ).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows in 4 passes
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                de = np.empty_like(idx)
                de[order] = idx
                idx = de
            if idx.max(initial=0) >= len(ct):
                raise DecoderNotAvailable("GIF palette index out of range")
            rgb = ct[idx]
            if transparent is not None:
                alpha = np.where(idx == transparent, 0, 255).astype(np.uint8)
                return np.dstack([rgb, alpha])
            return rgb
        elif b == 0x3B:  # trailer
            break
        else:
            raise DecoderNotAvailable(f"unknown GIF block 0x{b:02X}")
    raise DecoderNotAvailable("no image frame in GIF stream")
