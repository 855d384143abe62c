"""Real media decode: PPM/PGM, uncompressed 24-bit BMP, PCM WAV — the
formats stdlib+numpy can decode without external codec libraries.
Codec-requiring formats still raise DecoderNotAvailable (honest stub).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave

import numpy as np
import pytest

from simple_tsdb_spark.pipeline.multimodal import (
    DecoderNotAvailable,
    _resize_nearest,
    decode_media,
    extract_blob_features,
    resize_images,
)


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + img.tobytes()


def _pgm_bytes(img: np.ndarray) -> bytes:
    h, w = img.shape
    return b"P5\n%d %d\n255\n" % (w, h) + img.tobytes()


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Hand-rolled uncompressed 24-bit BMP (bottom-up, BGR, 4-byte rows)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = bytearray()
    for r in range(h - 1, -1, -1):  # bottom-up
        row = img[r][:, ::-1].tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    pix_off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", pix_off + len(rows), 0, 0, pix_off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + bytes(rows)


def _wav_bytes(samples: np.ndarray, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def _img(h, w, seed=0):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip():
    img = _img(5, 7)
    out = decode_media(_ppm_bytes(img), "image/x-portable-pixmap")
    np.testing.assert_array_equal(out, img)


def test_pgm_roundtrip():
    img = np.random.default_rng(1).integers(0, 256, size=(4, 6), dtype=np.uint8)
    out = decode_media(_pgm_bytes(img), "image/x-portable-graymap")
    np.testing.assert_array_equal(out, img)


def test_bmp_roundtrip_including_row_padding():
    img = _img(3, 5)  # width 5 → 15-byte rows padded to 16
    out = decode_media(_bmp_bytes(img), "image/bmp")
    np.testing.assert_array_equal(out, img)


def test_wav_roundtrip_stereo():
    t = np.arange(400)
    samples = np.stack(
        [(1000 * np.sin(t / 10)).astype(np.int16), (500 * np.cos(t / 7)).astype(np.int16)],
        axis=1,
    )
    data, rate = decode_media(_wav_bytes(samples, rate=16000), "audio/wav")
    assert rate == 16000
    np.testing.assert_array_equal(data, samples)


def test_codec_formats_still_raise():
    for mime in ("image/jpeg", "image/png", "video/mp4", "text/plain"):
        with pytest.raises(DecoderNotAvailable):
            decode_media(b"\xff\xd8\xff", mime)


def _media_df(spark, rows):
    """rows: list of (doc_id, payload_bytes, mime)."""
    from pyspark.sql import Row

    data = [
        Row(
            doc_id=i,
            payload=bytearray(p),
            media_meta=Row(mime=m, n_bytes=len(p), encoding="binary"),
        )
        for i, p, m in rows
    ]
    return spark.createDataFrame(data)


def test_extract_features_real_decoder_images_and_audio(spark):
    img = _img(6, 9, seed=2)
    samples = np.stack([np.arange(-200, 200, dtype=np.int16)], axis=1)
    df = _media_df(
        spark,
        [
            (1, _ppm_bytes(img), "image/x-portable-pixmap"),
            (2, _wav_bytes(samples), "audio/x-wav"),
        ],
    )
    out = {r.doc_id: r for r in extract_blob_features(df, use_real_decoder=True).collect()}
    assert (out[1].width, out[1].height) == (9, 6)
    assert out[1].mean_sample == pytest.approx(img.astype(np.float64).mean() / 255.0)
    assert (out[2].width, out[2].height) == (400, 1)  # n_frames, channels
    want = np.abs(np.arange(-200, 200, dtype=np.float64)).mean() / 32768.0
    assert out[2].mean_sample == pytest.approx(want)


def test_resize_real_decoder_nearest_neighbor(spark):
    img = _img(8, 8, seed=3)
    df = _media_df(spark, [(1, _ppm_bytes(img), "image/x-portable-pixmap")])
    row = resize_images(df, width=4, height=4, use_real_decoder=True).collect()[0]
    want = hashlib.md5(_resize_nearest(img, 4, 4).tobytes()).hexdigest()
    assert (row.out_width, row.out_height, row.resized_md5) == (4, 4, want)
    # nearest-neighbor semantics: picks every other pixel of an 8x8
    np.testing.assert_array_equal(_resize_nearest(img, 4, 4), img[::2][:, ::2])


def test_resize_real_decoder_rejects_audio(spark):
    samples = np.zeros((10, 1), dtype=np.int16)
    df = _media_df(spark, [(1, _wav_bytes(samples), "audio/wav")])
    with pytest.raises(Exception) as exc:
        resize_images(df, width=2, height=2, use_real_decoder=True).collect()
    assert "image" in str(exc.value)


def test_truncated_payloads_raise_decoder_not_available():
    """Malformed/truncated media must signal DecoderNotAvailable, not
    escape as raw ValueError/struct.error (one bad blob would otherwise
    kill the whole mapInPandas task)."""
    img = _img(4, 4, seed=7)
    full_ppm = _ppm_bytes(img)
    full_bmp = _bmp_bytes(img)
    samples = np.arange(-8, 8, dtype=np.int16).reshape(-1, 2)
    full_wav = _wav_bytes(samples)
    cases = [
        (b"P6", "image/x-portable-pixmap"),            # header cut mid-token
        (b"P6\n4 4\n255\n" + b"\x00" * 5, "image/x-portable-pixmap"),  # short raster
        (b"P6\n4 x\n255\n", "image/x-portable-pixmap"),  # non-numeric dim
        (full_ppm[:10], "image/x-portable-pixmap"),
        (full_bmp[:20], "image/bmp"),                  # header truncated
        (full_bmp[:-30], "image/bmp"),                 # raster truncated
        (full_wav[:-3], "audio/wav"),                  # frame data truncated
        (b"", "image/bmp"),
    ]
    for payload, mime in cases:
        with pytest.raises(DecoderNotAvailable):
            decode_media(payload, mime)


# -- baseline JPEG (pure-Python decoder, pipeline/jpeg.py) ------------------
#
# The tests hand-roll a minimal baseline ENCODER (forward DCT + flat
# canonical Huffman tables emitted in DHT) so the decoder faces real
# entropy-coded streams without any codec library in the container.

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dctmat():
    D = np.zeros((8, 8))
    for u in range(8):
        c = (0.5 / np.sqrt(2.0)) if u == 0 else 0.5
        for x in range(8):
            D[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return D


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((bits >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _flat_huff(symbols):
    """Canonical table giving every symbol the same code length."""
    syms = sorted(set(symbols))
    L = 1
    while (1 << L) <= len(syms):  # leave the last slot unused
        L += 1
    counts = [0] * 16
    counts[L - 1] = len(syms)
    codes = {s: i for i, s in enumerate(syms)}
    return counts, syms, codes, L


def _mag(v):
    t = 0
    a = abs(v)
    while a:
        t += 1
        a >>= 1
    bits = v if v >= 0 else v + (1 << t) - 1
    return t, bits


def _encode_blocks(planes_blocks, ri=0, shift=128.0):
    """planes_blocks: per-MCU list of (comp_idx, coef_block) in scan
    order.  Returns (dc_syms, ac_syms, emit) where emit(bw, dcc, acc)
    writes the entropy stream."""
    D = _dctmat()
    events = []  # (comp, dc_sym, dc_bits, [(ac_sym, bits, len)...])
    preds = {}
    mcu_events = []
    for mcu in planes_blocks:
        ev_mcu = []
        for ci, block in mcu:
            F = D @ (block - shift) @ D.T
            q = np.rint(F).astype(int)
            zz = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
            diff = zz[0] - preds.get(ci, 0)
            preds[ci] = zz[0]
            t, bits = _mag(diff)
            acs = []
            run = 0
            last = 63
            while last > 0 and zz[last] == 0:
                last -= 1
            for k in range(1, last + 1):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    acs.append((0xF0, 0, 0))
                    run -= 16
                s, b = _mag(zz[k])
                acs.append(((run << 4) | s, b, s))
                run = 0
            if last < 63:
                acs.append((0x00, 0, 0))
            ev_mcu.append((ci, t, bits, acs))
        mcu_events.append(ev_mcu)
    dc_syms = [e[1] for mcu in mcu_events for e in mcu]
    ac_syms = [a[0] for mcu in mcu_events for e in mcu for a in e[3]]

    def emit(bw, dc_codes, dc_len, ac_codes, ac_len, out):
        n = 0
        rst = 0
        nonlocal_preds = {}
        for mcu in mcu_events:
            if ri and n and n % ri == 0:
                bw.align()
                out += bw.out
                bw.out = bytearray()
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                # re-encode DC as absolute after restart: the events
                # already hold diffs, so rebuild them per restart chunk
            for ci, t, bits, acs in mcu:
                bw.put(dc_codes[t], dc_len)
                if t:
                    bw.put(bits, t)
                for sym, b, s in acs:
                    bw.put(ac_codes[sym], ac_len)
                    if s:
                        bw.put(b, s)
            n += 1
        bw.align()
        out += bw.out
        return out

    return dc_syms, ac_syms, emit


def _jpeg_bytes(img, subsample=False, prec=8, q16=False):
    """Baseline JFIF encoder: quant tables all-ones (16-bit DQT when
    q16), flat Huffman tables, 4:4:4 (or 4:2:0 luma-subsampled when
    subsample=True); grayscale when img.ndim == 2.  prec=12 emits an
    extended-sequential SOF1 with 2048 level shift (grayscale only)."""
    assert prec == 8 or img.ndim == 2, "12-bit test encoder is grayscale-only"
    gray = img.ndim == 2
    h, w = img.shape[:2]

    def pad8(p, mult=8):
        H = (p.shape[0] + mult - 1) // mult * mult
        W = (p.shape[1] + mult - 1) // mult * mult
        out = np.empty((H, W))
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1]:] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    if gray:
        planes = [pad8(img.astype(float))]
        samp = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(float) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def ds(p):
                H, W = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
                q = pad8(p, 2)[:H, :W]
                return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0
            planes = [pad8(y, 16), pad8(ds(cb)), pad8(ds(cr))]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [pad8(y), pad8(cb), pad8(cr)]
            samp = [(1, 1), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            blocks = []
            for ci, ((sh, sv), p) in enumerate(zip(samp, planes)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blocks.append((ci, p[y0 : y0 + 8, x0 : x0 + 8]))
            mcus.append(blocks)

    dc_syms, ac_syms, emit = _encode_blocks(mcus, shift=float(1 << (prec - 1)))
    dc_counts, dc_s, dc_codes, dc_len = _flat_huff(dc_syms + [0])
    ac_counts, ac_s, ac_codes, ac_len = _flat_huff(ac_syms + [0x00])

    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all ones (pq=1 16-bit entries when q16)
    if q16:
        out += b"\xff\xdb" + struct.pack(">H", 131) + b"\x10" + struct.pack(">64H", *([1] * 64))
    else:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", prec, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    sof_marker = b"\xff\xc0" if prec == 8 else b"\xff\xc1"
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    for tc, (counts, syms) in ((0, (dc_counts, dc_s)), (1, (ac_counts, ac_s))):
        body = bytes([tc << 4]) + bytes(counts) + bytes(syms)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out = emit(_BitWriter(), dc_codes, dc_len, ac_codes, ac_len, out)
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_gray_roundtrip():
    rng = np.random.default_rng(9)
    base = rng.integers(60, 200, size=(3, 4))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)[:20, :27]
    out = decode_media(_jpeg_bytes(img), "image/jpeg")
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_color_444_roundtrip():
    rng = np.random.default_rng(10)
    # smooth image: blockwise-constant color
    base = rng.integers(40, 215, size=(2, 3, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)
    out = decode_media(_jpeg_bytes(img), "image/jpeg")
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_color_420_subsampled():
    img = np.full((24, 24, 3), 0, dtype=np.uint8)
    img[..., 0] = 180
    img[..., 1] = 90
    img[..., 2] = 40
    out = decode_media(_jpeg_bytes(img, subsample=True), "image/jpeg")
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_jpeg_gradient_natural_content():
    yy, xx = np.mgrid[0:17, 0:23]
    img = ((yy * 3 + xx * 5) % 256).astype(np.uint8)
    out = decode_media(_jpeg_bytes(img), "image/jpeg")
    # all-ones quant tables: error is DCT float rounding only
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


# -- progressive JPEG test encoder (spectral selection + successive
# approximation, the T.81 §G.1.2 / libjpeg jcphuff.c control flow) -----------


def _fdct_zz(img, subsample=False, prec=8):
    """img → (per-component zigzag coefficient grids, samp, shape info).
    Same forward DCT + padding as _jpeg_bytes so a progressive encode of
    the same image reconstructs bit-identical coefficients."""
    gray = img.ndim == 2
    h, w = img.shape[:2]

    def pad8(p, mult=8):
        H = (p.shape[0] + mult - 1) // mult * mult
        W = (p.shape[1] + mult - 1) // mult * mult
        out = np.empty((H, W))
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1]:] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    if gray:
        planes = [pad8(img.astype(float))]
        samp = [(1, 1)]
    else:
        r, g, b = (img[..., i].astype(float) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def ds(p):
                H, W = (p.shape[0] + 1) // 2 * 2, (p.shape[1] + 1) // 2 * 2
                q = pad8(p, 2)[:H, :W]
                return (q[0::2, 0::2] + q[0::2, 1::2] + q[1::2, 0::2] + q[1::2, 1::2]) / 4.0
            planes = [pad8(y, 16), pad8(ds(cb)), pad8(ds(cr))]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [pad8(y), pad8(cb), pad8(cr)]
            samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    D = _dctmat()
    grids = []
    for (sh, sv), p in zip(samp, planes):
        # pad the plane out to the full MCU block grid (edge replicate)
        H, W = mcuy * sv * 8, mcux * sh * 8
        full = np.empty((H, W))
        full[: p.shape[0], : p.shape[1]] = p
        full[p.shape[0]:, : p.shape[1]] = p[-1:, :]
        full[:, p.shape[1]:] = full[:, p.shape[1] - 1 : p.shape[1]]
        grid = []
        for by in range(H // 8):
            row = []
            for bx in range(W // 8):
                blk = full[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                q = np.rint(D @ (blk - float(1 << (prec - 1))) @ D.T).astype(int)
                row.append([int(q.flat[ZIGZAG[i]]) for i in range(64)])
            grid.append(row)
        grids.append(grid)
    return grids, samp, (w, h, hmax, vmax, mcux, mcuy)


def _enc_dc_first(blocks_seq, Al, ri=0):
    """blocks_seq: interleaved [(comp_idx, zz)] per MCU (list of MCUs)."""
    tokens = []
    preds = {}
    for n, mcu in enumerate(blocks_seq):
        if ri and n and n % ri == 0:
            tokens.append(("rst", (n // ri - 1) & 7))
            preds = {}
        for ci, zz in mcu:
            v = zz[0] >> Al
            diff = v - preds.get(ci, 0)
            preds[ci] = v
            t, bits = _mag(diff)
            tokens.append(("sym", t))
            if t:
                tokens.append(("bits", bits, t))
    return tokens


def _enc_dc_refine(blocks_seq, Al):
    return [("bits", (zz[0] >> Al) & 1, 1) for mcu in blocks_seq for _ci, zz in mcu]


def _enc_ac_first(blocks, Ss, Se, Al, ri=0):
    """blocks: non-interleaved zigzag lists in block order."""
    tokens = []
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            tokens.append(("sym", nb << 4))
            if nb:
                tokens.append(("bits", eobrun - (1 << nb), nb))
            eobrun = 0

    for n, zz in enumerate(blocks):
        if ri and n and n % ri == 0:
            flush_eob()
            tokens.append(("rst", (n // ri - 1) & 7))
        r = 0
        for k in range(Ss, Se + 1):
            v = zz[k]
            t = -((-v) >> Al) if v < 0 else (v >> Al)
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                tokens.append(("sym", 0xF0))
                r -= 16
            s, bits = _mag(t)
            tokens.append(("sym", (r << 4) | s))
            tokens.append(("bits", bits, s))
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return tokens


def _enc_ac_refine(blocks, Ss, Se, Al):
    """libjpeg encode_mcu_AC_refine: newly-significant coefs emit
    (run,1)+sign, already-significant coefs queue correction bits that
    ride after the next symbol (or with the pending EOB run)."""
    tokens = []
    eobrun = 0
    BE = []  # correction bits tied to the pending EOB run

    def emit_eobrun():
        nonlocal eobrun, BE
        if eobrun:
            nb = eobrun.bit_length() - 1
            tokens.append(("sym", nb << 4))
            if nb:
                tokens.append(("bits", eobrun - (1 << nb), nb))
            tokens.extend(("bits", b, 1) for b in BE)
            eobrun = 0
            BE = []

    for zz in blocks:
        absv = {}
        EOB = Ss - 1  # last newly-significant index
        for k in range(Ss, Se + 1):
            t = (-zz[k] if zz[k] < 0 else zz[k]) >> Al
            absv[k] = t
            if t == 1:
                EOB = k
        r = 0
        BR = []  # correction bits awaiting the next emitted symbol
        for k in range(Ss, Se + 1):
            t = absv[k]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= EOB:
                emit_eobrun()
                tokens.append(("sym", 0xF0))
                r -= 16
                tokens.extend(("bits", b, 1) for b in BR)
                BR = []
            if t > 1:
                BR.append(t & 1)
                continue
            emit_eobrun()
            tokens.append(("sym", (r << 4) | 1))
            tokens.append(("bits", 1 if zz[k] >= 0 else 0, 1))
            tokens.extend(("bits", b, 1) for b in BR)
            BR = []
            r = 0
        if r > 0 or BR:
            eobrun += 1
            BE.extend(BR)
            if eobrun == 0x7FFF:
                emit_eobrun()
    emit_eobrun()
    return tokens


def _emit_scan(tokens):
    """Tokens → (DHT segment bytes or b'', entropy bytes)."""
    syms = [t[1] for t in tokens if t[0] == "sym"]
    dht = b""
    codes = lens = None
    if syms:
        counts, s_list, codes, lens = _flat_huff(syms + [0])
    bw = _BitWriter()
    out = bytearray()
    for t in tokens:
        if t[0] == "sym":
            bw.put(codes[t[1]], lens)
        elif t[0] == "bits":
            bw.put(t[1], t[2])
        else:  # rst
            bw.align()
            out += bw.out
            bw.out = bytearray()
            out += bytes([0xFF, 0xD0 + t[1]])
    bw.align()
    out += bw.out
    if syms:
        body = bytes(counts) + bytes(s_list)
        dht = body  # caller prefixes table class/id
    return dht, bytes(out)


def _jpeg_progressive_bytes(img, subsample=False, Al=1, ri_dc=0, ri_ac=0, prec=8):
    """Progressive JFIF encoder (quant all-ones): DC first at bit Al →
    per-component AC bands (1-5, 6-63) at bit Al → DC/AC refinement
    scans walking Al down to 0."""
    assert prec == 8 or img.ndim == 2
    grids, samp, (w, h, hmax, vmax, mcux, mcuy) = _fdct_zz(img, subsample, prec)
    nc = len(grids)
    # interleaved MCU order for DC scans
    mcus = []
    for my in range(mcuy):
        for mx in range(mcux):
            mcu = []
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        mcu.append((ci, grids[ci][my * sv + by][mx * sh + bx]))
            mcus.append(mcu)
    # non-interleaved per-component block order (non-padded grid)
    comp_blocks = []
    for ci, (sh, sv) in enumerate(samp):
        cw = (w * sh + hmax - 1) // hmax
        ch = (h * sv + vmax - 1) // vmax
        bw_, bh_ = (cw + 7) // 8, (ch + 7) // 8
        comp_blocks.append(
            [grids[ci][by][bx] for by in range(bh_) for bx in range(bw_)]
        )

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", prec, h, w, nc)
    for ci in range(nc):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    def add_scan(tokens, comp_ids, Ss, Se, Ah, Al_, tclass, ri):
        nonlocal out
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)  # DRI (0 disables)
        dht, entropy = _emit_scan(tokens)
        if dht:
            out += b"\xff\xc4" + struct.pack(">H", 3 + len(dht)) + bytes([tclass << 4]) + dht
        sos = bytes([len(comp_ids)])
        for cid in comp_ids:
            sos += bytes([cid, 0x00])
        sos += bytes([Ss, Se, (Ah << 4) | Al_])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += entropy

    all_ids = list(range(1, nc + 1))
    add_scan(_enc_dc_first(mcus, Al, ri_dc), all_ids, 0, 0, 0, Al, 0, ri_dc)
    for ci in range(nc):
        add_scan(_enc_ac_first(comp_blocks[ci], 1, 5, Al, ri_ac), [ci + 1], 1, 5, 0, Al, 1, ri_ac)
        add_scan(_enc_ac_first(comp_blocks[ci], 6, 63, Al, ri_ac), [ci + 1], 6, 63, 0, Al, 1, ri_ac)
    for al in range(Al - 1, -1, -1):
        add_scan(_enc_dc_refine(mcus, al), all_ids, 0, 0, al + 1, al, 0, 0)
        for ci in range(nc):
            add_scan(_enc_ac_refine(comp_blocks[ci], 1, 5, al), [ci + 1], 1, 5, al + 1, al, 1, 0)
            add_scan(_enc_ac_refine(comp_blocks[ci], 6, 63, al), [ci + 1], 6, 63, al + 1, al, 1, 0)
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_gray_roundtrip():
    yy, xx = np.mgrid[0:17, 0:23]
    img = ((yy * 7 + xx * 11) % 256).astype(np.uint8)
    out = decode_media(_jpeg_progressive_bytes(img), "image/jpeg")
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    # progressive reconstructs the SAME coefficients as a baseline encode
    base = decode_media(_jpeg_bytes(img), "image/jpeg")
    np.testing.assert_array_equal(out, base)


def test_jpeg_progressive_color_roundtrip():
    rng = np.random.default_rng(31)
    base = rng.integers(30, 225, size=(3, 2, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)[:20, :13]
    out = decode_media(_jpeg_progressive_bytes(img), "image/jpeg")
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, decode_media(_jpeg_bytes(img), "image/jpeg"))


def test_jpeg_progressive_subsampled_deep_approx():
    # 4:2:0 + successive approximation from bit 2 (two refinement rounds)
    rng = np.random.default_rng(32)
    img = rng.integers(0, 256, size=(24, 19, 3), dtype=np.uint8)
    out = decode_media(_jpeg_progressive_bytes(img, subsample=True, Al=2), "image/jpeg")
    np.testing.assert_array_equal(
        out, decode_media(_jpeg_bytes(img, subsample=True), "image/jpeg")
    )


def test_jpeg_progressive_restart_markers():
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, size=(25, 26), dtype=np.uint8)
    out = decode_media(
        _jpeg_progressive_bytes(img, ri_dc=3, ri_ac=5), "image/jpeg"
    )
    np.testing.assert_array_equal(out, decode_media(_jpeg_bytes(img), "image/jpeg"))


def test_jpeg_hierarchical_still_raises():
    # SOF5 (differential sequential, hierarchical mode) must keep raising;
    # arithmetic SOF9/SOF10 decode for real since r14 (see the
    # test_jpeg_arith_* suite below)
    payload = b"\xff\xd8\xff\xc5" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    with pytest.raises(DecoderNotAvailable, match="hierarchical"):
        decode_media(payload, "image/jpeg")
    # a bare SOF9 with no scan is corrupt, not "unsupported"
    payload = b"\xff\xd8\xff\xc9" + struct.pack(">H", 11) + bytes(
        [8, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    with pytest.raises(DecoderNotAvailable):
        decode_media(payload, "image/jpeg")


def test_jpeg_garbage_raises():
    with pytest.raises(DecoderNotAvailable):
        decode_media(b"\x00\x01\x02", "image/jpeg")


def test_jpeg_through_resize_pipeline(spark):
    """The real-decoder Spark path (mapInPandas) over planted JPEGs:
    dims come from the SOF header via the real decode, and the resized
    digest is of real pixels."""
    import pandas as pd

    base = np.repeat(np.repeat(np.arange(64, 190, 42, dtype=np.uint8).reshape(1, 3), 16, axis=0), 8, axis=1)
    img = np.stack([base, base, base], axis=-1)  # 16x24 gray-ish RGB
    payload = _jpeg_bytes(img)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [payload]})
    ).selectExpr(
        "doc_id",
        "payload",
        "named_struct('mime', 'image/jpeg', 'n_bytes', CAST(length(payload) AS BIGINT), 'encoding', CAST(NULL AS STRING)) AS media_meta",
    )
    out = resize_images(df, width=8, height=8, use_real_decoder=True).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.out_width, r.out_height) == (8, 8)
    decoded = decode_media(payload, "image/jpeg")
    expect = _resize_nearest(decoded, 8, 8)
    assert r.resized_md5 == hashlib.md5(expect.tobytes()).hexdigest()


# -- PNG (stdlib-zlib decoder, pipeline/png.py) -----------------------------

import zlib as _zlib


def _png_chunk(ctype, data):
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", _zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _png_pack_rows(img, depth, nch):
    """Sample array (h, w[, nch]) → per-row filtered-input byte rows."""
    h, w = img.shape[0], img.shape[1]
    flat = img.reshape(h, w * nch).astype(np.int64)
    if depth == 8:
        return (flat & 0xFF).astype(np.uint8)
    if depth == 16:
        out = np.empty((h, w * nch * 2), dtype=np.uint8)
        out[:, 0::2] = (flat >> 8) & 0xFF
        out[:, 1::2] = flat & 0xFF
        return out
    # sub-byte: MSB-first bit packing, rows padded to byte boundary
    nbits = w * nch * depth
    bits = np.zeros((h, (nbits + 7) // 8 * 8), dtype=np.uint8)
    for j in range(depth):
        bits[:, j:nbits:depth] = (flat >> (depth - 1 - j)) & 1
    return np.packbits(bits, axis=1)


def _png_filter_rows(rows, bpp, filters=None):
    """Apply per-row filters (default all 0/None) over byte rows."""
    h, stride = rows.shape
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    fts = filters or [0] * h
    for y in range(h):
        cur = rows[y].astype(np.int32)
        ft = fts[y % len(fts)]
        line = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = int(cur[i - bpp]) if i >= bpp else 0
            b = int(prev[i])
            c = int(prev[i - bpp]) if i >= bpp else 0
            v = int(cur[i])
            if ft == 0:
                line[i] = v
            elif ft == 1:
                line[i] = v - a
            elif ft == 2:
                line[i] = v - b
            elif ft == 3:
                line[i] = v - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = v - pred
        raw.append(ft)
        raw += bytes((line & 0xFF).astype(np.uint8))
        prev = cur
    return raw


_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_bytes(img, color=None, filters=None, palette=None, trns=None,
               interlace=0, depth=8):
    """Minimal PNG encoder: per-row filters (default all 0/None) applied
    properly so the decoder's unfilter path is exercised; supports bit
    depths 1/2/4/8/16 and Adam7 interlacing (each pass filtered
    independently, like the spec requires)."""
    if img.ndim == 2:
        h, w = img.shape
        nch = 1
        color = 0 if color is None else color
    else:
        h, w, nch = img.shape
        color = {3: 2, 4: 6, 2: 4}[nch] if color is None else color
    bpp = max(1, nch * depth // 8)
    raw = bytearray()
    passes = _ADAM7 if interlace == 1 else [(0, 0, 1, 1)]
    for x0, y0, dx, dy in passes:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        raw += _png_filter_rows(_png_pack_rows(sub, depth, nch), bpp, filters)
    out = b"\x89PNG\r\n\x1a\n"
    out += _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    )
    if palette is not None:
        out += _png_chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if trns is not None:
        out += _png_chunk(b"tRNS", bytes(trns))
    out += _png_chunk(b"IDAT", _zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


def test_png_rgb_roundtrip_all_filters():
    img = _img(5, 4, seed=21)
    payload = _png_bytes(img, filters=[0, 1, 2, 3, 4])
    out = decode_media(payload, "image/png")
    np.testing.assert_array_equal(out, img)


def test_png_gray_and_alpha():
    g = np.random.default_rng(22).integers(0, 256, size=(6, 5), dtype=np.uint8)
    np.testing.assert_array_equal(decode_media(_png_bytes(g), "image/png"), g)
    rgba = np.random.default_rng(23).integers(0, 256, size=(4, 3, 4), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_media(_png_bytes(rgba, filters=[4, 3, 2, 1]), "image/png"), rgba
    )


def test_png_indexed_with_palette():
    palette = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    idx = np.array([[0, 1, 2], [2, 1, 0]], dtype=np.uint8)
    out = decode_media(
        _png_bytes(idx, color=3, palette=palette), "image/png"
    )
    np.testing.assert_array_equal(out, palette[idx])
    # tRNS → RGBA
    out4 = decode_media(
        _png_bytes(idx, color=3, palette=palette, trns=[10, 200]), "image/png"
    )
    assert out4.shape == (2, 3, 4)
    assert out4[0, 0, 3] == 10 and out4[0, 1, 3] == 200 and out4[0, 2, 3] == 255


def test_png_16bit_roundtrip():
    rng = np.random.default_rng(24)
    g16 = rng.integers(0, 65536, size=(5, 7), dtype=np.uint16)
    out = decode_media(_png_bytes(g16, depth=16), "image/png")
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, g16)
    rgb16 = rng.integers(0, 65536, size=(4, 3, 3), dtype=np.uint16)
    out = decode_media(
        _png_bytes(rgb16, depth=16, filters=[0, 1, 2, 3, 4]), "image/png"
    )
    np.testing.assert_array_equal(out, rgb16)


def test_png_subbyte_gray_scaled():
    # 1/2/4-bit greyscale scale to full 8-bit range (odd width exercises
    # the row bit padding)
    for depth in (1, 2, 4):
        mx = (1 << depth) - 1
        rng = np.random.default_rng(100 + depth)
        g = rng.integers(0, mx + 1, size=(5, 9), dtype=np.uint8)
        out = decode_media(_png_bytes(g, depth=depth), "image/png")
        np.testing.assert_array_equal(out, (g.astype(int) * 255 // mx).astype(np.uint8))


def test_png_subbyte_indexed():
    palette = np.array([[9, 8, 7], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 2], [1, 1, 3, 0, 2]], np.uint8)
    out = decode_media(_png_bytes(idx, color=3, palette=palette, depth=2), "image/png")
    np.testing.assert_array_equal(out, palette[idx])


def test_png_adam7_interlaced():
    # > 8x8 so every pass is non-empty; non-multiple dims hit partial passes
    rng = np.random.default_rng(25)
    img = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    out = decode_media(_png_bytes(img, interlace=1, filters=[0, 1, 2, 3, 4]), "image/png")
    np.testing.assert_array_equal(out, img)
    # tiny image: some Adam7 passes are empty
    small = rng.integers(0, 256, size=(2, 3), dtype=np.uint8)
    np.testing.assert_array_equal(
        decode_media(_png_bytes(small, interlace=1), "image/png"), small
    )
    # Adam7 + 16-bit together
    g16 = rng.integers(0, 65536, size=(9, 10), dtype=np.uint16)
    np.testing.assert_array_equal(
        decode_media(_png_bytes(g16, interlace=1, depth=16), "image/png"), g16
    )


def test_png_rejects_unsupported_variants():
    img = _img(3, 3, seed=24)
    with pytest.raises(DecoderNotAvailable, match="interlace"):
        decode_media(_png_bytes(img, interlace=2), "image/png")
    with pytest.raises(DecoderNotAvailable, match="invalid for color type"):
        # 16-bit indexed is not a legal combination
        idx = np.zeros((2, 2), dtype=np.uint8)
        pal = np.zeros((2, 3), dtype=np.uint8)
        decode_media(_png_bytes(idx, color=3, palette=pal, depth=16), "image/png")
    with pytest.raises(DecoderNotAvailable):
        decode_media(b"\x89PNG\r\n\x1a\njunk", "image/png")


# -- GIF (LZW decoder, pipeline/gif.py) -------------------------------------


class _LZWWriter:
    """Minimal GIF-LZW encoder: literal codes only, with a CLEAR before
    the table would force a width change — valid, never grows width."""

    def __init__(self, min_code_size):
        self.mcs = min_code_size
        self.width = min_code_size + 1
        self.clear = 1 << min_code_size
        self.eoi = self.clear + 1
        self.table_size = self.eoi + 1
        self.bits = []

    def _put(self, code):
        for i in range(self.width):
            self.bits.append((code >> i) & 1)

    def encode(self, indices):
        self._put(self.clear)
        for ix in indices:
            if self.table_size >= (1 << self.width) - 1:
                self._put(self.clear)
                self.table_size = self.eoi + 1
            self._put(int(ix))
            self.table_size += 1
        self._put(self.eoi)
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def _gif_bytes(idx, palette, transparent=None, interlace=False):
    h, w = idx.shape
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    gct_n = 1 << bits
    pal = np.zeros((gct_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = 0x40 if interlace else 0
    out += bytes([0x2C]) + struct.pack("<HHHHB", 0, 0, w, h, iflags)
    rows = idx
    if interlace:
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        rows = idx[order]
    mcs = max(2, bits)
    data = _LZWWriter(mcs).encode(rows.flatten())
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def test_gif_roundtrip():
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = np.random.default_rng(33).integers(0, 4, size=(9, 7), dtype=np.uint8)
    out = decode_media(_gif_bytes(idx, palette), "image/gif")
    np.testing.assert_array_equal(out, palette[idx])


def test_gif_interlaced_and_transparent():
    palette = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    idx = np.random.default_rng(34).integers(0, 2, size=(13, 5), dtype=np.uint8)
    out = decode_media(_gif_bytes(idx, palette, interlace=True), "image/gif")
    np.testing.assert_array_equal(out, palette[idx])
    out4 = decode_media(_gif_bytes(idx, palette, transparent=1), "image/gif")
    assert out4.shape == (13, 5, 4)
    np.testing.assert_array_equal(out4[..., :3], palette[idx])
    np.testing.assert_array_equal(out4[..., 3], np.where(idx == 1, 0, 255))


def test_gif_rejects_garbage():
    with pytest.raises(DecoderNotAvailable):
        decode_media(b"GIF89a\x00", "image/gif")
    with pytest.raises(DecoderNotAvailable):
        decode_media(b"NOTGIF" + b"\x00" * 20, "image/gif")


def test_sniff_mime_routes_every_decoder():
    from simple_tsdb_spark.pipeline.multimodal import sniff_mime

    img = _img(3, 3, seed=40)
    gray = np.random.default_rng(41).integers(0, 256, size=(3, 3), dtype=np.uint8)
    palette = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    idx = np.zeros((2, 2), dtype=np.uint8)
    samples = {
        _ppm_bytes(img): "image/x-portable-pixmap",
        _pgm_bytes(gray): "image/x-portable-graymap",
        _bmp_bytes(img): "image/bmp",
        _wav_bytes(np.zeros((4, 1))): "audio/wav",
        _jpeg_bytes(gray): "image/jpeg",
        _png_bytes(img): "image/png",
        _gif_bytes(idx, palette): "image/gif",
    }
    for payload, want in samples.items():
        got = sniff_mime(payload)
        assert got == want
        decode_media(payload, got)  # the sniffed mime decodes for real
    assert sniff_mime(b"\x00\x01garbage") is None
    assert sniff_mime(b"RIFF1234AVI LIST") is None  # RIFF but not WAVE


# -- ISO-BMFF (mp4) structural decode ----------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I4s", 8 + len(payload), btype) + payload


def _fullbox(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3x", version) + payload)


def _mp4_bytes(sample_data, *, samples_per_chunk=(2, 1), width=320, height=240,
               timescale=600, duration=1200, wide_offsets=False):
    """Hand-rolled minimal ISO-BMFF file: ftyp + mdat(samples) + moov.
    ``samples_per_chunk`` drives a 2-run stsc so chunk expansion is
    really exercised."""
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mdat_payload = b"".join(sample_data)
    mdat_start = len(ftyp) + 8  # offset of first sample byte in file
    mdat = _box(b"mdat", mdat_payload)

    # chunk layout: run 1 covers chunk 1 (samples_per_chunk[0] samples),
    # run 2 covers the remaining chunks (samples_per_chunk[1] each)
    n = len(sample_data)
    sizes = [len(s) for s in sample_data]
    per1, per2 = samples_per_chunk
    chunks = []
    i = 0
    if i < n:
        chunks.append(list(range(i, min(i + per1, n)))); i += per1
    while i < n:
        chunks.append(list(range(i, min(i + per2, n)))); i += per2
    offsets, off = [], mdat_start
    for ch in chunks:
        offsets.append(off)
        off += sum(sizes[k] for k in ch)

    mvhd = _fullbox(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, duration)
                    + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)
                    + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                    + b"\x00" * 24 + struct.pack(">I", 2))
    tkhd = _fullbox(b"tkhd", 0, struct.pack(">III4xI8x", 0, 0, 1, duration)
                    + struct.pack(">HHHH", 0, 0, 0, 0)
                    + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                    + struct.pack(">II", width << 16, height << 16))
    mdhd = _fullbox(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0))
    hdlr = _fullbox(b"hdlr", 0, struct.pack(">I4s12x", 0, b"vide") + b"vh\x00")
    entry = struct.pack(">I4s6xH", 16 + 70, b"avc1", 1) + b"\x00" * 70
    stsd = _fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = _fullbox(b"stts", 0, struct.pack(">III", 1, n, duration // max(1, n)))
    runs = [(1, per1, 1)] + ([(2, per2, 1)] if len(chunks) > 1 else [])
    stsc = _fullbox(b"stsc", 0, struct.pack(">I", len(runs))
                    + b"".join(struct.pack(">III", *r) for r in runs))
    stsz = _fullbox(b"stsz", 0, struct.pack(">II", 0, n)
                    + b"".join(struct.pack(">I", s) for s in sizes))
    if wide_offsets:
        stco = _fullbox(b"co64", 0, struct.pack(">I", len(offsets))
                        + b"".join(struct.pack(">Q", o) for o in offsets))
    else:
        stco = _fullbox(b"stco", 0, struct.pack(">I", len(offsets))
                        + b"".join(struct.pack(">I", o) for o in offsets))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def test_mp4_probe_structural():
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4, probe_mp4

    frames = [b"frameAAAA", b"frameBB", b"fcc", b"dddddd", b"e"]
    payload = _mp4_bytes(frames)
    got = parse_mp4(payload)
    assert got["brand"] == "isom"
    assert got["timescale"] == 600 and got["duration"] == 1200
    assert got["duration_ms"] == 2000
    (trk,) = got["tracks"]
    assert trk["handler"] == "vide" and trk["codec"] == "avc1"
    assert (trk["width"], trk["height"]) == (320, 240)
    assert trk["n_samples"] == 5
    assert trk["total_sample_bytes"] == sum(len(f) for f in frames)
    # the sample table points at the REAL frame bytes inside mdat
    for (off, sz), want in zip(trk["samples"], frames):
        assert payload[off : off + sz] == want
    # probe drops the table but keeps the metadata
    p = probe_mp4(payload)
    assert "samples" not in p["tracks"][0]
    assert p["tracks"][0]["n_samples"] == 5


def test_mp4_co64_and_single_chunk():
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4

    frames = [b"xx", b"yyy", b"zzzz"]
    payload = _mp4_bytes(frames, samples_per_chunk=(3, 1), wide_offsets=True)
    trk = parse_mp4(payload)["tracks"][0]
    for (off, sz), want in zip(trk["samples"], frames):
        assert payload[off : off + sz] == want


def test_mp4_rejects_garbage_and_truncation():
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4

    with pytest.raises(DecoderNotAvailable):
        parse_mp4(b"not a movie at all........")
    good = _mp4_bytes([b"frame"])
    with pytest.raises(DecoderNotAvailable):
        parse_mp4(good[: len(good) // 2])  # moov truncated away
    # valid ftyp magic + a box whose declared size exceeds its payload:
    # struct.error/IndexError inside the box walk must surface as
    # DecoderNotAvailable, never crash a mapInPandas batch (ADVICE r9)
    import struct as _struct

    ftyp = _struct.pack(">I", 16) + b"ftypisom" + b"\x00\x00\x02\x00"
    short_moov = _struct.pack(">I", 24) + b"moov" + _struct.pack(">I", 16) + b"mvhd" + b"\x00" * 8
    with pytest.raises(DecoderNotAvailable):
        parse_mp4(ftyp + short_moov)  # mvhd payload shorter than v0 fields
    # tiny tkhd (width/height fields missing) inside an otherwise-valid trak
    tkhd = _struct.pack(">I", 12) + b"tkhd" + b"\x00" * 4
    trak = _struct.pack(">I", 8 + len(tkhd)) + b"trak" + tkhd
    mvhd = _struct.pack(">I", 8 + 4 + 16) + b"mvhd" + b"\x00" * 4 + _struct.pack(">IIII", 0, 0, 1000, 0)
    moov = _struct.pack(">I", 8 + len(mvhd) + len(trak)) + b"moov" + mvhd + trak
    with pytest.raises(DecoderNotAvailable):
        parse_mp4(ftyp + moov)


def test_mp4_decode_media_and_sniff():
    from simple_tsdb_spark.pipeline.multimodal import sniff_mime

    payload = _mp4_bytes([b"frameAAAA", b"frameBB"])
    assert sniff_mime(payload) == "video/mp4"
    probe = decode_media(payload, "video/mp4")
    assert probe["tracks"][0]["codec"] == "avc1"
    # feature surface: (width, height, duration_s)
    from simple_tsdb_spark.pipeline.multimodal import _real_decode_features

    w, h, dur = _real_decode_features(payload, "video/mp4")
    assert (w, h, dur) == (320, 240, 2.0)


def test_sample_frames_real_mp4(spark):
    """sample_frames on an ISO-BMFF payload emits REAL frame offsets,
    sizes and md5s of the mdat bytes; text payloads keep the
    byte-window contract."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import sample_frames

    frames = [b"frameAAAA", b"frameBB", b"fcc", b"dddddd", b"e"]
    payload = _mp4_bytes(frames)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "payload": [payload, b"t" * 100]})
    )
    got = sample_frames(df, every_n_bytes=64, max_frames=8).toPandas()
    vid = got[got.doc_id == 1].sort_values("frame_idx")
    assert list(vid.frame_size) == [len(f) for f in frames]
    assert list(vid.frame_md5) == [hashlib.md5(f).hexdigest() for f in frames]
    txt = got[got.doc_id == 2].sort_values("frame_idx")
    assert list(txt.frame_offset) == [0, 64]  # byte-window fallback


def test_mp4_stsz_fixed_count_bound():
    """A malformed fixed-size stsz count (larger than the file could
    hold) must raise instead of allocating a huge sample table."""
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4

    payload = bytearray(_mp4_bytes([b"frame"]))
    # rewrite the stsz box: fixed size 1000, count 2^31
    i = bytes(payload).find(b"stsz")
    # box payload: version/flags(4) fixed(4) count(4)
    payload[i + 4 + 4 : i + 4 + 12] = struct.pack(">II", 1000, 1 << 31)
    with pytest.raises(DecoderNotAvailable):
        parse_mp4(bytes(payload))


def test_mp4_two_tracks():
    """A video + audio file: per-track handlers/codecs/sample tables
    stay separate; the frame sampler picks the vide track."""
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4

    vid_frames = [b"VFRAME1", b"VF2"]
    aud_frames = [b"audio-a", b"audio-b", b"audio-c"]

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
    mdat_payload = b"".join(vid_frames) + b"".join(aud_frames)
    mdat_start = len(ftyp) + 8
    mdat = _box(b"mdat", mdat_payload)

    def track(frames, handler, codec, base_off, tid):
        n = len(frames)
        sizes = [len(f) for f in frames]
        tkhd = _fullbox(b"tkhd", 0, struct.pack(">III4xI8x", 0, 0, tid, 600)
                        + struct.pack(">HHHH", 0, 0, 0, 0)
                        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                        + struct.pack(">II", 64 << 16, 48 << 16))
        mdhd = _fullbox(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, 600, 600, 0x55C4, 0))
        hdlr = _fullbox(b"hdlr", 0, struct.pack(">I4s12x", 0, handler) + b"h\x00")
        entry = struct.pack(">I4s6xH", 16 + 70, codec, 1) + b"\x00" * 70
        stsd = _fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)
        stts = _fullbox(b"stts", 0, struct.pack(">III", 1, n, 1))
        stsc = _fullbox(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = _fullbox(b"stsz", 0, struct.pack(">II", 0, n)
                        + b"".join(struct.pack(">I", s_) for s_ in sizes))
        stco = _fullbox(b"stco", 0, struct.pack(">II", 1, base_off))
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
        return _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl)))

    mvhd = _fullbox(b"mvhd", 0, struct.pack(">IIII", 0, 0, 600, 600)
                    + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)
                    + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                    + b"\x00" * 24 + struct.pack(">I", 3))
    vt = track(vid_frames, b"vide", b"avc1", mdat_start, 1)
    at = track(aud_frames, b"soun", b"mp4a", mdat_start + sum(len(f) for f in vid_frames), 2)
    payload = ftyp + mdat + _box(b"moov", mvhd + vt + at)

    got = parse_mp4(payload)
    assert len(got["tracks"]) == 2
    v, a = got["tracks"]
    assert (v["handler"], v["codec"], v["n_samples"]) == ("vide", "avc1", 2)
    assert (a["handler"], a["codec"], a["n_samples"]) == ("soun", "mp4a", 3)
    for (off, sz), want in zip(v["samples"], vid_frames):
        assert payload[off : off + sz] == want
    for (off, sz), want in zip(a["samples"], aud_frames):
        assert payload[off : off + sz] == want


def test_extract_features_real_decoder_nan_mean_goes_null(spark):
    """A degenerate decode (0-frame WAV -> NaN mean) yields NULL
    mean_sample_ppm instead of int(NaN) killing the mapInPandas task;
    the float mean_sample lands NULL/NaN (Arrow maps the NaN batch
    value to SQL NULL), never a crash."""
    empty_wav = _wav_bytes(np.zeros((0, 1), dtype=np.int16))
    df = _media_df(spark, [(1, empty_wav, "audio/x-wav")])
    row = extract_blob_features(df, use_real_decoder=True).collect()[0]
    assert row.mean_sample_ppm is None
    assert row.mean_sample is None or np.isnan(row.mean_sample)


# -- fragmented MP4 (mvex/moof/traf/trun, 14496-12 §8.8) ---------------------


def _fullbox_f(btype, version, flags, payload):
    return _box(btype, struct.pack(">B", version) + flags.to_bytes(3, "big") + payload)


def _fmp4_bytes(fragments, *, with_moov=True, explicit_base=False,
                use_trex_defaults=False, timescale=600):
    """fragments: list of [(sample_bytes, duration)].  Layout:
    ftyp|styp + [moov] + per-fragment moof+mdat."""
    lead = _box(b"ftyp" if with_moov else b"styp",
                b"isom" + struct.pack(">I", 512) + b"iso6")
    out = bytearray(lead)
    total_dur = sum(d for frag in fragments for _s, d in frag)
    if with_moov:
        mvhd = _fullbox(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, 0)
                        + struct.pack(">IHH8x", 0x00010000, 0x0100, 0)
                        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                        + b"\x00" * 24 + struct.pack(">I", 2))
        mehd = _fullbox(b"mehd", 0, struct.pack(">I", total_dur))
        if use_trex_defaults:
            f0 = fragments[0][0]
            trex = _fullbox(b"trex", 0, struct.pack(">5I", 1, 1, f0[1], len(f0[0]), 0))
        else:
            trex = _fullbox(b"trex", 0, struct.pack(">5I", 1, 1, 0, 0, 0))
        mvex = _box(b"mvex", mehd + trex)
        tkhd = _fullbox(b"tkhd", 0, struct.pack(">III4xI8x", 0, 0, 1, 0)
                        + struct.pack(">HHHH", 0, 0, 0, 0)
                        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                        + struct.pack(">II", 160 << 16, 90 << 16))
        mdhd = _fullbox(b"mdhd", 0, struct.pack(">IIIIHH", 0, 0, timescale, 0, 0x55C4, 0))
        hdlr = _fullbox(b"hdlr", 0, struct.pack(">I4s12x", 0, b"vide") + b"vh\x00")
        entry = struct.pack(">I4s6xH", 16 + 70, b"avc1", 1) + b"\x00" * 70
        stsd = _fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)
        stsz = _fullbox(b"stsz", 0, struct.pack(">II", 0, 0))
        stsc = _fullbox(b"stsc", 0, struct.pack(">I", 0))
        stco = _fullbox(b"stco", 0, struct.pack(">I", 0))
        stbl = _box(b"stbl", stsd + stsz + stsc + stco)
        trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + _box(b"minf", stbl)))
        out += _box(b"moov", mvhd + mvex + trak)
    for seq, frag in enumerate(fragments, 1):
        mfhd = _fullbox(b"mfhd", 0, struct.pack(">I", seq))
        if use_trex_defaults:
            tfhd = _fullbox_f(b"tfhd", 0, 0x20000, struct.pack(">I", 1))
            trun_flags = 0x1  # data-offset only; sizes/durs from trex
            rows = b""
        else:
            trun_flags = 0x1 | 0x100 | 0x200
            rows = b"".join(
                struct.pack(">II", dur, len(s)) for s, dur in frag
            )
            tfhd = _fullbox_f(b"tfhd", 0, 0x20000, struct.pack(">I", 1))
        trun_payload = struct.pack(">Ii", len(frag), 0) + rows  # offset patched below
        trun = _fullbox_f(b"trun", 0, trun_flags, trun_payload)
        traf = _box(b"traf", tfhd + trun)
        moof = _box(b"moof", mfhd + traf)
        if explicit_base:
            # rebuild tfhd with an absolute base_data_offset instead;
            # build once with base=0 to learn the (fixed) moof length
            def mk(base):
                tf = _fullbox_f(b"tfhd", 0, 0x1, struct.pack(">IQ", 1, base))
                tr = _fullbox_f(b"trun", 0, trun_flags,
                                struct.pack(">Ii", len(frag), 0) + rows)
                return _box(b"moof", mfhd + _box(b"traf", tf + tr))

            moof = mk(len(out) + len(mk(0)) + 8)
            data_off = 0
        else:
            data_off = len(moof) + 8  # relative to moof start → into mdat
        # patch the trun data_offset (second i32 of the trun payload)
        moof = bytearray(moof)
        idx = moof.rfind(b"trun") + 4 + 4 + 4  # type + ver/flags + count
        moof[idx:idx + 4] = struct.pack(">i", data_off)
        out += bytes(moof)
        out += _box(b"mdat", b"".join(s for s, _d in frag))
    return bytes(out)


_FRAGS = [
    [(b"frameAAAA", 100), (b"frBB", 150)],
    [(b"frameCCCCCC", 200)],
]


def _assert_fmp4_samples(payload, probe):
    trk = probe["tracks"][0]
    want = [s for frag in _FRAGS for s, _d in frag]
    assert trk["n_samples"] == 3
    assert trk["total_sample_bytes"] == sum(len(s) for s in want)
    for (off, size), raw in zip(trk["samples"], want):
        assert payload[off : off + size] == raw  # byte-exact frame ranges


def test_fmp4_moof_relative_offsets():
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4

    payload = _fmp4_bytes(_FRAGS)
    got = parse_mp4(payload)
    _assert_fmp4_samples(payload, got)
    # mvhd duration 0 → mehd fragment_duration drives duration_ms
    assert got["duration"] == 450 and got["duration_ms"] == 750
    trk = got["tracks"][0]
    assert trk["handler"] == "vide" and trk["codec"] == "avc1"
    assert trk["duration"] == 450  # accumulated from trun sample durations


def test_fmp4_explicit_base_offset_and_trex_defaults():
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4

    payload = _fmp4_bytes(_FRAGS, explicit_base=True)
    _assert_fmp4_samples(payload, parse_mp4(payload))
    # trex-supplied default size/duration, truns carry no per-sample rows
    uniform = [[(b"xxxxxxxx", 100), (b"xxxxxxxx", 100)], [(b"xxxxxxxx", 100)]]
    payload = _fmp4_bytes(uniform, use_trex_defaults=True)
    trk = parse_mp4(payload)["tracks"][0]
    assert trk["n_samples"] == 3 and trk["total_sample_bytes"] == 24
    assert trk["duration"] == 300


def test_fmp4_styp_segment_without_moov():
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4, probe_mp4

    payload = _fmp4_bytes(_FRAGS, with_moov=False)
    got = parse_mp4(payload)
    assert got["brand"] == "isom"
    trk = got["tracks"][0]
    assert trk["track_id"] == 1 and trk["handler"] is None
    want = [s for frag in _FRAGS for s, _d in frag]
    for (off, size), raw in zip(trk["samples"], want):
        assert payload[off : off + size] == raw
    assert "samples" not in probe_mp4(payload)["tracks"][0]


def test_jpeg_12bit_extended_sequential():
    rng = np.random.default_rng(40)
    base = rng.integers(200, 3900, size=(3, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint16)[:20, :21]
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    out = decode_jpeg(_jpeg_bytes(img, prec=12))
    assert out.dtype == np.uint16 and out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_12bit_progressive():
    yy, xx = np.mgrid[0:18, 0:15]
    img = ((yy * 113 + xx * 211) % 4096).astype(np.uint16)
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    out = decode_jpeg(_jpeg_progressive_bytes(img, Al=2, prec=12))
    # identical coefficients → identical pixels vs the sequential encode
    np.testing.assert_array_equal(out, decode_jpeg(_jpeg_bytes(img, prec=12)))


def test_jpeg_16bit_quant_table():
    rng = np.random.default_rng(41)
    base = rng.integers(60, 200, size=(2, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)
    out = decode_media(_jpeg_bytes(img, q16=True), "image/jpeg")
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_jpeg_sof0_12bit_rejected():
    # hand-build an illegal 12-bit SOF0 header: must raise, not decode
    payload = b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + bytes(
        [12, 0, 8, 0, 8, 1, 1, 0x11, 0]
    )
    with pytest.raises(DecoderNotAvailable, match="baseline SOF0 must be 8-bit"):
        decode_media(payload, "image/jpeg")


# -- animated GIF (decode_gif_frames / gif_frame_spans) ----------------------


def _gif_anim_bytes(screen_wh, frames, palette):
    """frames: [(idx_array, (ix, iy), disposal, delay_cs, transparent)]."""
    sw, sh = screen_wh
    n = len(palette)
    bits = max(2, (n - 1).bit_length())
    gct_n = 1 << bits
    pal = np.zeros((gct_n, 3), dtype=np.uint8)
    pal[:n] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (bits - 1), 0, 0)
    out += pal.tobytes()
    mcs = max(2, bits)
    for idx, (ix, iy), disposal, delay_cs, transparent in frames:
        h, w = idx.shape
        gflags = (disposal << 2) | (1 if transparent is not None else 0)
        out += bytes([0x21, 0xF9, 4, gflags]) + struct.pack("<H", delay_cs)
        out += bytes([transparent or 0, 0])
        out += bytes([0x2C]) + struct.pack("<HHHHB", ix, iy, w, h, 0)
        data = _LZWWriter(mcs).encode(idx.flatten())
        out += bytes([mcs])
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += bytes([0])
    out += bytes([0x3B])
    return bytes(out)


def test_gif_animation_compositing():
    from simple_tsdb_spark.pipeline.gif import decode_gif_frames

    pal = np.array(
        [[10, 10, 10], [200, 0, 0], [0, 200, 0], [0, 0, 200]], dtype=np.uint8
    )
    full = np.zeros((6, 8), dtype=np.uint8)  # frame 1: whole screen color 0
    patch = np.full((2, 3), 1, dtype=np.uint8)  # frame 2: red patch @ (2,1)
    # frame 3: green patch with a transparent hole, disposal 2 on frame 2
    holed = np.array([[2, 3, 2], [2, 2, 2]], dtype=np.uint8)
    payload = _gif_anim_bytes(
        (8, 6),
        [
            (full, (0, 0), 1, 5, None),
            (patch, (1, 2), 2, 7, None),   # disposal 2: clear region after
            (holed, (4, 3), 1, 9, 3),      # index 3 transparent
        ],
        pal,
    )
    frames, delays = decode_gif_frames(payload)
    assert frames.shape == (3, 6, 8, 4)
    assert delays == [50, 70, 90]
    # frame 1: all color 0, opaque
    assert (frames[0][..., :3] == pal[0]).all() and (frames[0][..., 3] == 255).all()
    # frame 2: red patch over the base
    np.testing.assert_array_equal(frames[1][2:4, 1:4, :3], np.broadcast_to(pal[1], (2, 3, 3)))
    np.testing.assert_array_equal(frames[1][0, 0, :3], pal[0])
    # frame 3: frame 2's region was disposed to background (transparent)
    assert (frames[2][2:4, 1:4, 3] == 0).all()
    # green patch drawn at (4,3); the transparent hole shows the base color
    np.testing.assert_array_equal(frames[2][3, 4, :3], pal[2])
    np.testing.assert_array_equal(frames[2][3, 5, :3], pal[0])  # hole → base
    assert frames[2][3, 5, 3] == 255


def test_gif_disposal_restore_previous():
    from simple_tsdb_spark.pipeline.gif import decode_gif_frames

    pal = np.array([[5, 5, 5], [250, 250, 250]], dtype=np.uint8)
    base = np.zeros((4, 4), dtype=np.uint8)
    blink = np.ones((2, 2), dtype=np.uint8)
    payload = _gif_anim_bytes(
        (4, 4),
        [
            (base, (0, 0), 1, 1, None),
            (blink, (1, 1), 3, 1, None),  # disposal 3: restore previous
            (np.ones((1, 1), dtype=np.uint8), (0, 0), 1, 1, None),
        ],
        pal,
    )
    frames, _ = decode_gif_frames(payload)
    np.testing.assert_array_equal(frames[1][1:3, 1:3, 0], np.full((2, 2), 250))
    # frame 3 canvas: blink region restored to base before the new draw
    np.testing.assert_array_equal(frames[2][1:3, 1:3, 0], np.full((2, 2), 5))
    np.testing.assert_array_equal(frames[2][0, 0, :3], pal[1])


def test_gif_frame_spans_and_sample_frames(spark):
    import hashlib

    import pandas as pd

    from simple_tsdb_spark.pipeline import sample_frames
    from simple_tsdb_spark.pipeline.gif import gif_frame_spans

    pal = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
    fr = [
        (np.random.default_rng(s).integers(0, 2, size=(5, 7), dtype=np.uint8),
         (0, 0), 1, 2, None)
        for s in range(5)
    ]
    payload = _gif_anim_bytes((7, 5), fr, pal)
    spans = gif_frame_spans(payload)
    assert len(spans) == 5
    for off, size in spans:
        assert payload[off] == 0x2C  # each span starts at its descriptor
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "payload": [bytearray(payload)]})
    )
    got = sample_frames(df, max_frames=3).toPandas().sort_values("frame_idx")
    assert len(got) == 3  # 5 frames, stride-2 sample under the cap
    for r in got.itertuples():
        off, sz = int(r.frame_offset), int(r.frame_size)
        assert (off, sz) in spans
        assert r.frame_md5 == hashlib.md5(payload[off : off + sz]).hexdigest()


# -- WAV beyond 16-bit PCM: float, 24-bit, WAVE_FORMAT_EXTENSIBLE ------------


def _wav_raw(data: bytes, *, tag, nch, rate, bits, extensible=False, balign=None):
    width = bits // 8
    if extensible:
        # cbSize=22, valid bits, channel mask, SubFormat GUID (tag-led)
        guid = struct.pack("<H", tag) + b"\x00\x00" + bytes(
            [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA, 0x00, 0x38, 0x9B, 0x71]
        )
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, nch, rate, rate * nch * width,
                          nch * width, bits, 22, bits, 0) + guid
    else:
        fmt = struct.pack("<HHIIHH", tag, nch, rate, rate * nch * width,
                          balign if balign is not None else nch * width, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"  # RIFF word alignment
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_float32_and_float64():
    t = np.arange(64)
    f32 = np.stack([np.sin(t / 5), np.cos(t / 3)], axis=1).astype("<f4")
    data, rate = decode_media(
        _wav_raw(f32.tobytes(), tag=3, nch=2, rate=44100, bits=32), "audio/wav"
    )
    assert rate == 44100 and data.dtype == np.float32
    np.testing.assert_array_equal(data, f32)
    f64 = (np.sin(t / 9)).reshape(-1, 1).astype("<f8")
    data, _ = decode_media(
        _wav_raw(f64.tobytes(), tag=3, nch=1, rate=8000, bits=64), "audio/wav"
    )
    np.testing.assert_array_equal(data, f64)
    # feature surface normalizes float audio by 1.0
    from simple_tsdb_spark.pipeline.multimodal import _real_decode_features

    n, ch, mean = _real_decode_features(
        _wav_raw(f32.tobytes(), tag=3, nch=2, rate=44100, bits=32), "audio/wav"
    )
    assert (n, ch) == (64, 2)
    assert abs(mean - np.abs(f32.astype(np.float64)).mean()) < 1e-9


def test_wav_24bit_pcm():
    vals = np.array([0, 1, -1, 8388607, -8388608, 123456, -654321], dtype=np.int64)
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    data, rate = decode_media(
        _wav_raw(raw + b"\x00" * 3, tag=1, nch=2, rate=48000, bits=24), "audio/wav"
    )
    assert rate == 48000 and data.dtype == np.int32
    got = data.flatten()[: len(vals)]
    np.testing.assert_array_equal(got, (vals << 8).astype(np.int32))


def test_wav_extensible_resolves_subformat():
    pcm = np.arange(-10, 10, dtype="<i2").reshape(-1, 2)
    data, _ = decode_media(
        _wav_raw(pcm.tobytes(), tag=1, nch=2, rate=8000, bits=16, extensible=True),
        "audio/wav",
    )
    np.testing.assert_array_equal(data, pcm)


def test_wav_compressed_rejected():
    with pytest.raises(DecoderNotAvailable, match="format tag"):
        decode_media(
            _wav_raw(b"\x00" * 32, tag=2, nch=1, rate=8000, bits=4), "audio/wav"
        )  # ADPCM


def test_jpeg_progressive_sparse_band_zrl_and_eobrun():
    """Sparse high-frequency content: zero runs > 15 inside the 6-63
    band force ZRL (0xF0) symbols in the first AC scan and the
    skip-16-zero-history path in refinement; flat regions across blocks
    force EOB runs with attached correction bits.  Assert the token
    streams actually contain those constructs, then that the decode is
    bit-equal to baseline."""
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    # 8x32 grayscale: [constant | checkerboard | constant | pixel delta]
    img = np.full((8, 32), 120, dtype=np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    img[:, 8:16] = 120 + 8 * ((yy + xx) % 2)  # highest-frequency energy
    img[3, 27] = 200  # sparse delta: wide spectrum, small values

    grids, _samp, (w, h, *_rest) = _fdct_zz(img)
    blocks = [grids[0][0][bx] for bx in range(4)]
    first = _enc_ac_first(blocks, 6, 63, 1)
    syms = [t[1] for t in first if t[0] == "sym"]
    assert 0xF0 in syms, "no ZRL emitted — test image not sparse enough"
    assert any(s & 15 == 0 and s != 0xF0 for s in syms), "no EOB run"
    refine = _enc_ac_refine(blocks, 6, 63, 0)
    rsyms = [t[1] for t in refine if t[0] == "sym"]
    assert any(s & 15 == 1 for s in rsyms), "no newly-significant refine"

    for al in (0, 1, 2):
        prog = decode_jpeg(_jpeg_progressive_bytes(img, Al=al))
        base = decode_jpeg(_jpeg_bytes(img))
        np.testing.assert_array_equal(prog, base)
    # restart markers through the sparse scans too
    prog = decode_jpeg(_jpeg_progressive_bytes(img, Al=2, ri_dc=2, ri_ac=3))
    np.testing.assert_array_equal(prog, decode_jpeg(_jpeg_bytes(img)))


# -- resize methods: area (anti-aliased box) and bilinear ---------------------


def test_resize_area_integer_factor_is_block_mean():
    from simple_tsdb_spark.pipeline.multimodal import _resize_area

    rng = np.random.default_rng(50)
    img = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    out = _resize_area(img, 4, 3)  # exact 4x4 blocks
    want = np.rint(
        img.astype(float).reshape(3, 4, 4, 4, 3).mean(axis=(1, 3))
    ).astype(np.uint8)
    np.testing.assert_array_equal(out, want)


def test_resize_area_fractional_coverage_model():
    from simple_tsdb_spark.pipeline.multimodal import _resize_area

    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, size=(5, 7), dtype=np.uint8)
    H, W = 3, 4

    def naive(img, W, H):
        h, w = img.shape
        sy, sx = h / H, w / W
        out = np.zeros((H, W))
        for j in range(H):
            for i in range(W):
                acc = tot = 0.0
                for y in range(h):
                    wy = max(0.0, min((j + 1) * sy, y + 1) - max(j * sy, y))
                    if wy == 0:
                        continue
                    for x in range(w):
                        wx = max(0.0, min((i + 1) * sx, x + 1) - max(i * sx, x))
                        if wx:
                            acc += wy * wx * img[y, x]
                            tot += wy * wx
                out[j, i] = acc / tot
        return np.rint(out).astype(np.uint8)

    np.testing.assert_array_equal(_resize_area(img, W, H), naive(img, W, H))


def test_resize_bilinear_identity_and_constant():
    from simple_tsdb_spark.pipeline.multimodal import _resize_bilinear

    rng = np.random.default_rng(52)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    np.testing.assert_array_equal(_resize_bilinear(img, 9, 6), img)
    const = np.full((5, 5), 77, dtype=np.uint8)
    assert (_resize_bilinear(const, 13, 3) == 77).all()
    # 16-bit input keeps its dtype and full range
    g16 = rng.integers(0, 65536, size=(4, 4), dtype=np.uint16)
    out = _resize_bilinear(g16, 8, 8)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(_resize_bilinear(g16, 4, 4), g16)


def test_resize_images_methods_through_spark(spark):
    import hashlib

    import pandas as pd

    from simple_tsdb_spark.pipeline.multimodal import (
        _resize_area,
        resize_images,
    )

    img = _img(12, 16, seed=53)
    payload = _png_bytes(img)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [bytearray(payload)]})
    ).selectExpr(
        "doc_id",
        "payload",
        "named_struct('mime', 'image/png', 'n_bytes', CAST(length(payload) AS BIGINT), "
        "'encoding', CAST(NULL AS STRING)) AS media_meta",
        "'image/png' AS mime",
    )
    got = resize_images(
        df, width=4, height=3, use_real_decoder=True, method="area"
    ).toPandas()
    want = hashlib.md5(_resize_area(img, 4, 3).tobytes()).hexdigest()
    assert got.resized_md5[0] == want
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown resize method"):
        resize_images(df, width=4, height=3, method="cubic")


# -- round-14 ADVICE regressions (corrupt-input contract) --------------------


def test_jpeg_kraft_violating_dht_raises_typed():
    """A DHT whose counts violate the Kraft inequality (three 1-bit
    codes) must raise DecoderNotAvailable at parse time, not IndexError
    from the fast-LUT build (ADVICE r13, jpeg.py _Huff)."""
    counts = bytes([3] + [0] * 15)
    dht = b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 3) + b"\x00" + counts + b"\x01\x02\x03"
    payload = b"\xff\xd8" + dht + b"\xff\xd9"
    with pytest.raises(DecoderNotAvailable, match="Huffman code overflow"):
        decode_media(payload, "image/jpeg")


def test_jpeg_ac_refine_run_past_band_end_raises_typed():
    """_block_ac_refine: a corrupt refinement code whose zero-run skips
    past Se must raise DecoderNotAvailable, not write outside the band
    or IndexError at k == 64 (ADVICE r13 medium)."""
    from simple_tsdb_spark.pipeline import jpeg as J

    sd = object.__new__(J._ScanDecoder)
    sd.Ss, sd.Se, sd.Al, sd.eobrun = 1, 5, 0, 0
    # single-symbol AC table: 1-bit code '0' → rs = (5 << 4) | 1
    ac = J._Huff(bytes([1] + [0] * 15), [0x51])
    sd._ac_table = lambda tac: ac
    # bits: '0' (huff code) then '1' (sign bit for the +1 coefficient);
    # zero-history run of 5 over an all-zero band of width 5 exits with
    # k == 6 > Se and a pending ±1 with no in-band slot.
    sd.r = J._BitReader(b"\x40", 0)
    coef = np.zeros(64, dtype=np.int32)
    with pytest.raises(DecoderNotAvailable, match="band end"):
        sd._block_ac_refine(0, coef)
    assert not coef.any()  # nothing written outside the band


def test_jpeg_12bit_mean_normalized_by_4095():
    """_real_decode_features must normalize 12-bit JPEG means by the
    4095 full scale, not the uint16 carrier's 65535 (ADVICE r13)."""
    from simple_tsdb_spark.pipeline.multimodal import _real_decode_features

    base = np.full((2, 2), 2048)
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint16)
    payload = _jpeg_bytes(img, prec=12)
    w, h, mean = _real_decode_features(payload, "image/jpeg")
    assert (w, h) == (16, 16)
    decoded = decode_media(payload, "image/jpeg")
    assert decoded.dtype == np.uint16
    want = decoded.astype(np.float64).mean() / 4095.0
    assert mean == pytest.approx(want)
    assert 0.45 < mean < 0.55  # mid-gray, not ~16x darker


def test_fmp4_offsetless_first_trun_starts_at_mdat_payload():
    """A first trun with no data_offset under a tfhd with no
    base_data_offset must synthesize offsets into the following mdat
    payload, not into the moof header bytes (ADVICE r13, mp4.py
    _apply_moof §8.8.7 default)."""
    from simple_tsdb_spark.pipeline.mp4 import parse_mp4

    frames = [b"frameAAAA", b"frBB"]
    lead = _box(b"styp", b"isom" + struct.pack(">I", 512) + b"iso6")
    mfhd = _fullbox(b"mfhd", 0, struct.pack(">I", 1))
    tfhd = _fullbox_f(b"tfhd", 0, 0x20000, struct.pack(">I", 1))  # no base offset
    rows = b"".join(struct.pack(">II", 100, len(f)) for f in frames)
    trun = _fullbox_f(b"trun", 0, 0x100 | 0x200, struct.pack(">I", len(frames)) + rows)
    moof = _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
    payload = lead + moof + _box(b"mdat", b"".join(frames))
    trk = parse_mp4(payload)["tracks"][0]
    assert trk["n_samples"] == 2
    for (off, size), raw in zip(trk["samples"], frames):
        assert payload[off : off + size] == raw  # lands in mdat, not moof


# -- arithmetic-coded JPEG (SOF9/SOF10, T.81 Annex D QM-coder) ---------------
#
# Conformance is proven against the SYSTEM libjpeg (which carries the
# reference QM implementation) via the compile-on-demand ctypes shim in
# tests/jpeg_oracle.py; those tests skip when gcc/libjpeg are absent.
# The two embedded fixtures below were generated by that libjpeg and
# keep the decoder pinned even without the shim.

_ARITH_SEQ_HEX = (
    "ffd8ffe000104a46494600010100000100010000ffdb00430003020203020203"
    "03030304030304050805050404050a070706080c0a0c0c0b0a0b0b0d0e12100d"
    "0e110e0b0b1016101113141515150c0f171816141812141514ffc9000b080010"
    "001001011100ffcc000600101005ffda0008010100003f00ff0064991b1d63c0"
    "3257be440d10d233da16bb1edcf54539c3aaad0513d10c87e8924a4b87c8b202"
    "e0e87c9537ddee59a66f7b3406af65eb125172279fbf09af6f9e72d33790d15d"
    "7119916f135ae2297bce30818885513cc1812ec6cfb003aa1a565209cc72b00e"
    "2ac538e424ac8f2973971b80f4cfb733820ea9c39723aeebd328cd3ed4021242"
    "20fc99efed0043f80dd8adfa1f19fb46f6e53f83203051bf7e2fc8915396b2f9"
    "e8c8ad7f457ff33c82e242e63f61e0da5f0dd786893d8c25d83172659160f14f"
    "4498b69a06288c56799bb967c2ffd9"
)
_ARITH_PROG_HEX = (
    "ffd8ffe000104a46494600010100000100010000ffdb00430003020203020203"
    "03030304030304050805050404050a070706080c0a0c0c0b0a0b0b0d0e12100d"
    "0e110e0b0b1016101113141515150c0f171816141812141514ffca000b080010"
    "001001011100ffcc00040010ffda0008010100000001fec84441a0ffcc000410"
    "05ffda000801010001050215f2ecbd6177c363386f29e3089447aab180ffcc00"
    "041005ffda0008010100063f02154e75063d61cb2909767fe9a801d5d1c1b165"
    "edc333e2380b509b0aa6e8fb34d485eb78d894189b0e9f70bd097766897d748e"
    "30e967d58c6c800c9fddd39952161974d62beedaf23e2a111258781512543308"
    "d260d889673e6974d80f1880ffcc00041005ffda0008010100013f21c941f5a8"
    "af9837ca32dc8fb92b512a1b33d8aaa56f1783174695bf7c293c6ce54c76d5b1"
    "246957993b77c0ffda0008010100000010f8ffcc00041005ffda000801010001"
    "3f10875b3af845fbaa2550b255be88927579948f7788e3427bd0bf940d0dc8ae"
    "3af027cada3a0ca4e293ffd9"
)
_ARITH_PIX_HEX = (
    "8a21db1bc5ff20c4c1ff91a3685457701d21d36ac70fcee18c84011504b986b8"
    "ee808e3ab60115158f51c988f468bbf673405bbb2d0fdbc33c9ca7b3a37942c7"
    "15ce67861111ce2172bbfadd247d4f70270d197c91a1e65ab090bb2c667642f0"
    "09cf10c73457daa5b69f046b4983a5cd1f439e8ec79780743b4f5171214f2c3b"
    "28319718c347f38fb2bc4be5e254560f68fcbbdbe9a1e8d327c1d44710c1b6a3"
    "f3764e27ce0012bf1c7c57b0c035ba5e8f315d1664ae83f842911875f297a9df"
    "ae198fac11263fc50fc28bc0a3d5d23718f7295c1c06797a3a496a8643bb2f09"
    "9df6e88c1d877d2729df51bac850dfb1d9c32cf08bbda4c00f4ad963c8b3adf7"
)


def test_jpeg_arith_embedded_fixtures_decode():
    """Sequential (SOF9) and progressive (SOF10) arithmetic fixtures
    (generated by the system libjpeg) decode to the pinned pixels; the
    two scan shapes carry identical coefficients so outputs agree."""
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    want = np.frombuffer(bytes.fromhex(_ARITH_PIX_HEX), dtype=np.uint8).reshape(16, 16)
    seq = decode_jpeg(bytes.fromhex(_ARITH_SEQ_HEX))
    prog = decode_jpeg(bytes.fromhex(_ARITH_PROG_HEX))
    np.testing.assert_array_equal(seq, want)
    np.testing.assert_array_equal(prog, want)
    # and through the decode_media dispatch
    np.testing.assert_array_equal(
        decode_media(bytes.fromhex(_ARITH_SEQ_HEX), "image/jpeg"), want
    )


def _jpeg_shim():
    import jpeg_oracle

    if not jpeg_oracle.available():
        pytest.skip(jpeg_oracle.skip_reason())
    return jpeg_oracle


def test_jpeg_arith_sequential_gray_vs_libjpeg():
    jo = _jpeg_shim()
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    for seed, q in [(0, 50), (1, 90), (2, 98)]:
        img = np.random.default_rng(seed).integers(
            0, 256, size=(48, 56), dtype=np.uint8
        )
        p = jo.encode(img, arith=True, quality=q)
        mine = decode_jpeg(p)
        ref = jo.decode(p)
        # entropy decode must be exact; <=1 is IDCT rounding (float vs
        # libjpeg's fixed-point islow), same bound as the Huffman tests
        assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_arith_color_progressive_restarts_vs_libjpeg():
    jo = _jpeg_shim()
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    rng = np.random.default_rng(99)
    for shape in [(40, 44, 3), (17, 23, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for kw in (
            {"arith": True},
            {"arith": True, "progressive": True},
            {"arith": True, "restart_rows": 1},
            {"arith": True, "progressive": True, "restart_rows": 2},
        ):
            p = jo.encode(img, quality=85, **kw)
            mine = decode_jpeg(p)
            ref = jo.decode_plain(p)  # replication upsampling, like ours
            assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 2, kw


def test_jpeg_arith_corrupt_streams_raise_typed():
    """Bit-flipped / truncated arithmetic streams must decode-or-raise
    DecoderNotAvailable — never hang, crash, or return a wrong shape."""
    from simple_tsdb_spark.pipeline.jpeg import DecoderNotAvailable, decode_jpeg

    base = bytes.fromhex(_ARITH_SEQ_HEX)
    rng = np.random.default_rng(7)
    ent0 = base.find(b"\xff\xda") + 10  # inside the entropy segment
    for _ in range(40):
        b = bytearray(base)
        i = int(rng.integers(ent0, len(b) - 2))
        b[i] ^= 1 << int(rng.integers(0, 8))
        try:
            out = decode_jpeg(bytes(b))
            assert out.shape == (16, 16)  # survived: shape contract holds
        except DecoderNotAvailable:
            pass
    for cut in (ent0, ent0 + 5, len(base) - 3):
        try:
            out = decode_jpeg(base[:cut])
            assert out.shape == (16, 16)
        except DecoderNotAvailable:
            pass


def test_jpeg_huffman_modes_vs_libjpeg():
    """Bonus conformance: the existing Huffman paths (baseline and
    progressive, gray and 4:2:0 color) against the system libjpeg."""
    jo = _jpeg_shim()
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    c = rng.integers(0, 256, size=(32, 40, 3), dtype=np.uint8)
    for img, tol in ((g, 1), (c, 2)):
        for kw in ({}, {"progressive": True}):
            p = jo.encode(img, quality=88, **kw)
            mine = decode_jpeg(p)
            ref = jo.decode_plain(p) if img.ndim == 3 else jo.decode(p)
            assert np.abs(mine.astype(int) - ref.astype(int)).max() <= tol, kw


def test_qm_encoder_decoder_roundtrip_property():
    """tests/jpeg_arith_ref.py's exact-interval QM encoder and the
    product _ArithDecoder are exact inverses: random decision streams
    over shared adaptive bins roundtrip bit-for-bit, with identical
    final probability-state tables."""
    from jpeg_arith_ref import QMEncoder
    from simple_tsdb_spark.pipeline.jpeg import _ArithDecoder

    rng = np.random.default_rng(5)
    for trial in range(20):
        n = int(rng.integers(1, 400))
        bins = rng.integers(0, 50, size=n)
        bits = rng.integers(0, 2, size=n)
        enc = QMEncoder()
        est = bytearray(64)
        for i, d in zip(bins, bits):
            enc.encode(est, int(i), int(d))
        data = enc.flush() + b"\xff\xd9"
        dec = _ArithDecoder(data, 0)
        dst = bytearray(64)
        got = [dec.decode(dst, int(i)) for i in bins]
        assert got == list(map(int, bits)), f"trial {trial}"
        assert bytes(dst) == bytes(est), f"trial {trial} state drift"


def test_jpeg_arith_ref_encoder_vs_libjpeg_decoder():
    """The reference encoder's 8-bit output is a valid arithmetic JPEG
    by the REAL libjpeg's judgment (skips without the shim)."""
    jo = _jpeg_shim()
    from jpeg_arith_ref import encode_arith_gray
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    img = np.random.default_rng(11).integers(0, 256, size=(24, 17), dtype=np.uint8)
    for progressive in (False, True):
        p = encode_arith_gray(img, prec=8, progressive=progressive)
        mine = decode_jpeg(p)
        ref = jo.decode(p)
        assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 1


def test_jpeg_arith_12bit_sequential_and_progressive():
    """The decoder's 12-bit SOF9/SOF10 branch (unreachable through the
    8-bit-only libjpeg shim): an arithmetic encode of the same
    coefficients must decode bit-identically to the Huffman 12-bit
    twin from _jpeg_bytes."""
    from jpeg_arith_ref import encode_arith_gray
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    rng = np.random.default_rng(11)
    img12 = rng.integers(0, 4096, size=(20, 13)).astype(np.uint16)
    want = decode_jpeg(_jpeg_bytes(img12, prec=12))
    assert want.dtype == np.uint16
    np.testing.assert_array_equal(decode_jpeg(encode_arith_gray(img12, prec=12)), want)
    np.testing.assert_array_equal(
        decode_jpeg(encode_arith_gray(img12, prec=12, progressive=True)), want
    )


# -- lossless JPEG (SOF3, T.81 Annex H) --------------------------------------


def _jpeg_lossless_bytes(img, prec, predictor=4, pt=0, ri=0):
    """Spec-forward lossless encoder: per-sample prediction (Annex H
    rules incl. first-line / restart-interval resets), differences
    modulo 65536 as DC-style Huffman categories (SSSS 16 = +32768, no
    extra bits), point transform pt, interleaved 1x1 components."""
    arr = img[..., None] if img.ndim == 2 else img
    h, w, nc = arr.shape
    samples = (arr.astype(int) >> pt)
    default_p = 1 << (prec - pt - 1)

    def predict(pl, y, x, seg_y, seg_x):
        if y == seg_y:
            return default_p if x == seg_x else int(pl[y, x - 1])
        if x == 0:
            return int(pl[y - 1, x])
        a, b, c = int(pl[y, x - 1]), int(pl[y - 1, x]), int(pl[y - 1, x - 1])
        p = [None, a, b, c, a + b - c, a + ((b - c) >> 1),
             b + ((a - c) >> 1), (a + b) >> 1][predictor]
        return p & 0xFFFF

    # one pass to collect (category, bits) tokens with restart markers
    tokens = []
    syms = []
    seg_y = seg_x = 0
    n = 0
    for y in range(h):
        for x in range(w):
            if ri and n and n % ri == 0:
                tokens.append(("rst", (n // ri - 1) & 7))
                seg_y, seg_x = y, x
            for ci in range(nc):
                pl = samples[..., ci]
                p = predict(pl, y, x, seg_y, seg_x)
                d = (int(pl[y, x]) - p) & 0xFFFF
                if d == 32768:
                    tokens.append(("sym", 16))
                    syms.append(16)
                else:
                    sd = d - 65536 if d > 32767 else d
                    t, bits = _mag(sd)
                    tokens.append(("sym", t))
                    syms.append(t)
                    if t:
                        tokens.append(("bits", bits, t))
            n += 1

    counts, s_list, codes, clen = _flat_huff(syms + [0])
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", prec, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])
    out += b"\xff\xc3" + struct.pack(">H", 2 + len(sof)) + sof
    body = bytes([0x00]) + bytes(counts) + bytes(s_list)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if ri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, ri)
    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, pt])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    bw = _BitWriter()
    for tok in tokens:
        if tok[0] == "sym":
            bw.put(codes[tok[1]], clen)
        elif tok[0] == "bits":
            bw.put(tok[1], tok[2])
        else:  # restart marker: byte-align, emit RSTn
            bw.align()
            bw.out += bytes([0xFF, 0xD0 + tok[1]])
    bw.align()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_lossless_all_predictors_exact():
    """SOF3 decode must reproduce the source EXACTLY for every
    predictor (1-7) — the whole point of the lossless process."""
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, size=(19, 23), dtype=np.uint8)
    for pred in range(1, 8):
        out = decode_jpeg(_jpeg_lossless_bytes(img, prec=8, predictor=pred))
        assert out.dtype == np.uint8
        np.testing.assert_array_equal(out, img, err_msg=f"predictor {pred}")


def test_jpeg_lossless_high_precision_and_color():
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    rng = np.random.default_rng(22)
    img16 = rng.integers(0, 1 << 16, size=(12, 9)).astype(np.uint16)
    out = decode_jpeg(_jpeg_lossless_bytes(img16, prec=16, predictor=7))
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out, img16)
    img12 = rng.integers(0, 4096, size=(10, 11)).astype(np.uint16)
    np.testing.assert_array_equal(
        decode_jpeg(_jpeg_lossless_bytes(img12, prec=12, predictor=1)), img12
    )
    rgb = rng.integers(0, 256, size=(9, 14, 3), dtype=np.uint8)
    out = decode_jpeg(_jpeg_lossless_bytes(rgb, prec=8, predictor=4))
    assert out.shape == rgb.shape  # raw component stack, no color convert
    np.testing.assert_array_equal(out, rgb)


def test_jpeg_lossless_point_transform_and_restarts():
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, size=(14, 10), dtype=np.uint8)
    # point transform: decode returns (sample >> pt) << pt
    out = decode_jpeg(_jpeg_lossless_bytes(img, prec=8, predictor=5, pt=2))
    np.testing.assert_array_equal(out, (img >> 2) << 2)
    # restart interval mid-line: prediction resets per Annex H
    out = decode_jpeg(_jpeg_lossless_bytes(img, prec=8, predictor=6, ri=23))
    np.testing.assert_array_equal(out, img)


def test_jpeg_lossless_bad_headers_raise_typed():
    from simple_tsdb_spark.pipeline.jpeg import decode_jpeg

    img = np.zeros((4, 4), dtype=np.uint8)
    good = _jpeg_lossless_bytes(img, prec=8, predictor=1)
    bad = bytearray(good)
    i = bad.find(b"\xff\xda")
    bad[i + 2 + 3 + 2] = 0  # predictor 0: invalid
    with pytest.raises(DecoderNotAvailable, match="predictor"):
        decode_jpeg(bytes(bad))


# -- compressed WAV: G.711 mu-law/A-law + IMA ADPCM (audioop oracle) ---------


def _audioop():
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        try:
            import audioop
        except ImportError:
            pytest.skip("stdlib audioop removed (3.13+): oracle unavailable")
    return audioop


def test_wav_g711_ulaw_alaw_byte_exact_vs_audioop():
    audioop = _audioop()
    allb = bytes(range(256))
    for tag, expand in ((7, audioop.ulaw2lin), (6, audioop.alaw2lin)):
        want = np.frombuffer(expand(allb, 2), dtype="<i2")
        data, rate = decode_media(
            _wav_raw(allb, tag=tag, nch=1, rate=8000, bits=8), "audio/wav"
        )
        assert rate == 8000 and data.dtype == np.int16
        np.testing.assert_array_equal(data[:, 0], want)
    # stereo framing: alternating bytes split into channels
    data, _ = decode_media(
        _wav_raw(allb, tag=7, nch=2, rate=8000, bits=8), "audio/wav"
    )
    want = np.frombuffer(audioop.ulaw2lin(allb, 2), dtype="<i2").reshape(-1, 2)
    np.testing.assert_array_equal(data, want)


def _ima_block(pred0, idx0, nibbles: bytes) -> bytes:
    return struct.pack("<hBB", pred0, idx0, 0) + nibbles


def _swap_nibbles(b: bytes) -> bytes:
    return bytes(((x >> 4) | ((x & 0x0F) << 4)) for x in b)


def test_wav_ima_adpcm_mono_byte_exact_vs_audioop():
    audioop = _audioop()
    rng = np.random.default_rng(31)
    blocks = []
    want = []
    for pred0, idx0 in ((0, 0), (-1234, 17), (30000, 88)):
        nib = rng.integers(0, 256, size=32, dtype=np.uint8).tobytes()
        blocks.append(_ima_block(pred0, idx0, nib))
        dec, _ = audioop.adpcm2lin(_swap_nibbles(nib), 2, (pred0, idx0))
        want.append([pred0] + list(np.frombuffer(dec, dtype="<i2")))
    balign = 4 + 32
    payload = _wav_raw(b"".join(blocks), tag=0x11, nch=1, rate=8000, bits=4,
                       balign=balign)
    data, rate = decode_media(payload, "audio/wav")
    flat = [v for blk in want for v in blk]
    np.testing.assert_array_equal(data[:, 0], np.array(flat, dtype=np.int16))


def test_wav_ima_adpcm_stereo_channel_framing():
    audioop = _audioop()
    rng = np.random.default_rng(32)
    # two 8-byte groups per channel: interleave 4-byte chunks ch0,ch1
    ch_nib = [rng.integers(0, 256, size=8, dtype=np.uint8).tobytes() for _ in range(2)]
    body = b"".join(
        ch_nib[ch][g : g + 4] for g in range(0, 8, 4) for ch in (0, 1)
    )
    hdr = _ima_block(100, 5, b"")[:4] + _ima_block(-200, 9, b"")[:4]
    balign = 8 + len(body)
    payload = _wav_raw(hdr + body, tag=0x11, nch=2, rate=16000, bits=4,
                       balign=balign)
    data, rate = decode_media(payload, "audio/wav")
    assert rate == 16000 and data.shape[1] == 2
    for ch, (p0, i0) in enumerate(((100, 5), (-200, 9))):
        dec, _ = audioop.adpcm2lin(_swap_nibbles(ch_nib[ch]), 2, (p0, i0))
        want = np.array([p0] + list(np.frombuffer(dec, dtype="<i2")), dtype=np.int16)
        np.testing.assert_array_equal(data[:, ch], want)


def test_wav_ima_adpcm_corrupt_raises_typed():
    with pytest.raises(DecoderNotAvailable, match="step index"):
        decode_media(
            _wav_raw(_ima_block(0, 99, bytes(8)), tag=0x11, nch=1, rate=8000,
                     bits=4, balign=12),
            "audio/wav",
        )
    with pytest.raises(DecoderNotAvailable, match="block align"):
        decode_media(
            _wav_raw(bytes(16), tag=0x11, nch=1, rate=8000, bits=4, balign=3),
            "audio/wav",
        )
    # MS ADPCM (tag 2) still raises the honest boundary
    with pytest.raises(DecoderNotAvailable, match="format tag"):
        decode_media(
            _wav_raw(bytes(16), tag=2, nch=1, rate=8000, bits=4), "audio/wav"
        )
