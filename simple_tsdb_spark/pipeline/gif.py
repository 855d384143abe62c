"""Pure-Python GIF (87a/89a) decoder — stdlib + numpy.

Header + logical screen descriptor, global/local color tables,
interlaced row order, GIF89a graphic-control transparency (→ RGBA),
and the variable-width LSB-first LZW code stream (clear/EOI codes,
dictionary growth to 4096).  :func:`decode_gif` returns the first
frame (the still-image contract used by ``decode_media``);
:func:`decode_gif_frames` decodes a full ANIMATION — every frame
composited onto the logical screen honoring the GIF89a disposal
methods (none/keep, restore-to-background, restore-to-previous) with
per-frame delays — the frame-sample surface for video-ish pipelines.
A malformed or truncated stream raises :class:`DecoderNotAvailable`
like the JPEG/PNG decoders.

Used by ``pipeline.multimodal.decode_media`` / ``sample_frames`` for
``image/gif``.
"""

from __future__ import annotations

import struct

from simple_tsdb_spark.pipeline.jpeg import DecoderNotAvailable

__all__ = ["decode_gif", "decode_gif_frames", "gif_frame_spans"]


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> list[int]:
    if not 2 <= min_code_size <= 11:
        # GIF codes are at most 12 bits; a stomped size byte would make
        # the initial table 2^255 entries
        raise DecoderNotAvailable(f"invalid LZW min code size {min_code_size}")
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


def _parse_frames(payload: bytes, np, want_pixels: bool = True):
    """Parse the stream → ((sw, sh), [frame records]).  Each record:
    ``{ix, iy, w, h, idx, transparent, disposal, delay_cs, span}`` where
    ``idx`` is the de-interlaced palette-index raster (None when
    ``want_pixels`` is False), ``ct`` the frame's color table, and
    ``span`` the (start, end) byte range of the image-descriptor +
    entropy segment in the payload."""
    try:
        return _parse_frames_checked(payload, np, want_pixels)
    except (IndexError, struct.error, ValueError) as exc:
        # blocks shorter than their declared fields (truncated uploads;
        # ValueError = np.frombuffer over a color table the payload
        # cannot hold): the typed-boundary contract shared by every
        # decoder here
        raise DecoderNotAvailable(f"truncated/corrupt GIF block: {exc}") from exc


def _parse_frames_checked(payload: bytes, np, want_pixels: bool = True):
    if len(payload) < 13 or payload[:3] != b"GIF" or payload[3:6] not in (b"87a", b"89a"):
        raise DecoderNotAvailable("not a GIF stream")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    if sw * sh > (1 << 26):
        raise DecoderNotAvailable(f"implausible GIF screen {sw}x{sh}")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    # pending graphic-control state (applies to the NEXT frame only)
    transparent = None
    disposal = 0
    delay_cs = 0
    frames = []
    while pos < len(payload):
        b = payload[pos]
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:  # graphic control
                gflags = payload[pos + 1]
                (delay_cs,) = struct.unpack_from("<H", payload, pos + 2)
                disposal = (gflags >> 2) & 7
                transparent = payload[pos + 4] if gflags & 1 else None
            while pos < len(payload) and payload[pos]:
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            start = pos
            ix, iy, w, h, iflags = struct.unpack_from("<HHHHB", payload, pos + 1)
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
            idx = None
            if want_pixels:
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
            frames.append(
                {
                    "ix": ix, "iy": iy, "w": w, "h": h, "idx": idx, "ct": ct,
                    "transparent": transparent, "disposal": disposal,
                    "delay_cs": delay_cs, "span": (start, pos),
                }
            )
            transparent = None
            disposal = 0
            delay_cs = 0
        elif b == 0x3B:  # trailer
            break
        else:
            raise DecoderNotAvailable(f"unknown GIF block 0x{b:02X}")
    if not frames:
        raise DecoderNotAvailable("no image frame in GIF stream")
    return (sw, sh), frames


def decode_gif(payload: bytes):
    """Decode a GIF's first frame → uint8 (h, w, 3) RGB, or (h, w, 4)
    RGBA when the frame declares a transparent index."""
    import numpy as np

    _screen, frames = _parse_frames(payload, np)
    f = frames[0]
    rgb = f["ct"][f["idx"]]
    if f["transparent"] is not None:
        alpha = np.where(f["idx"] == f["transparent"], 0, 255).astype(np.uint8)
        return np.dstack([rgb, alpha])
    return rgb


def decode_gif_frames(payload: bytes):
    """Decode an animated GIF → (frames, delays_ms): frames is a uint8
    array (n, screen_h, screen_w, 4) of fully composited RGBA canvases
    honoring the GIF89a disposal methods (0/1 keep, 2 restore to
    background — rendered transparent, as browsers do — 3 restore to
    previous); delays_ms is the per-frame delay list."""
    import numpy as np

    (sw, sh), frames = _parse_frames(payload, np)
    canvas = np.zeros((sh, sw, 4), dtype=np.uint8)
    out = []
    delays = []
    for f in frames:
        y0, x0 = f["iy"], f["ix"]
        y1, x1 = min(y0 + f["h"], sh), min(x0 + f["w"], sw)
        if y1 <= y0 or x1 <= x0:
            region = None
        else:
            region = canvas[y0:y1, x0:x1].copy() if f["disposal"] == 3 else None
            idx = f["idx"][: y1 - y0, : x1 - x0]
            rgba = np.dstack(
                [f["ct"][idx], np.full(idx.shape, 255, dtype=np.uint8)]
            )
            if f["transparent"] is not None:
                keep = idx == f["transparent"]
                rgba[keep] = canvas[y0:y1, x0:x1][keep]
            canvas[y0:y1, x0:x1] = rgba
        out.append(canvas.copy())
        delays.append(f["delay_cs"] * 10)
        if f["disposal"] == 2 and y1 > y0 and x1 > x0:
            canvas[y0:y1, x0:x1] = 0
        elif f["disposal"] == 3 and region is not None:
            canvas[y0:y1, x0:x1] = region
    return np.stack(out), delays


def gif_frame_spans(payload: bytes):
    """(offset, size) byte span of each frame's image-descriptor +
    entropy segment — the GIF analogue of the MP4 sample table, used by
    ``multimodal.sample_frames`` to md5 REAL frame bytes without
    decoding pixels."""
    import numpy as np

    _screen, frames = _parse_frames(payload, np, want_pixels=False)
    return [(f["span"][0], f["span"][1] - f["span"][0]) for f in frames]
