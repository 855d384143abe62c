"""Pure-Python JPEG (ITU-T T.81) decoder — baseline and progressive.

Public-knowledge algorithm, no codec libraries: marker parse → Huffman
entropy decode (per scan) → coefficient accumulation → dequantize →
batched 8×8 IDCT (orthonormal DCT-III via one numpy matmul pair over
ALL blocks of a component) → chroma upsample → JFIF YCbCr→RGB.

Supported: baseline sequential DCT (SOF0, interleaved or one scan per
component), extended sequential (SOF1), and progressive DCT (SOF2)
with both spectral selection and successive approximation — DC
first/refine scans (interleaved or not) and per-component AC band
scans with EOB-run coding and correction-bit refinement (T.81 §G.1.2,
the same control flow as the public libjpeg ``jdphuff.c``) — plus the
ARITHMETIC-coded variants SOF9/SOF10 (T.81 Annex D QM-coder,
:class:`_ArithDecoder` / :class:`_ArithScanDecoder`, conformance
proven against the system libjpeg in tests).  8- and 12-bit samples
(12-bit returns uint16 with raw 0..4095 values; SOF1/SOF2/SOF10 only,
per spec), 8- and 16-bit quantization tables, 1- or 3-component
frames, sampling factors 1–2 (4:4:4 / 4:2:2 / 4:2:0), restart
intervals, 0xFF00 byte stuffing, DAC conditioning — and the LOSSLESS
process (SOF3, T.81 Annex H: predictors 1-7, point transform, 2-16 bit,
:class:`_LosslessScanDecoder`).  Arithmetic-lossless (SOF11) and
hierarchical modes raise :class:`DecoderNotAvailable` — the honest
capability boundary, same as multimodal.decode_media's other formats.

Used by ``pipeline.multimodal.decode_media`` for ``image/jpeg`` so
``blob_features`` / ``resize_images`` exercise a REAL codec path inside
``mapInPandas`` (VERDICT r8 #7; progressive added per VERDICT r12 —
~10% of real crawl JPEGs).  The per-image work is numpy-vectorized
across blocks; the bit-serial Huffman scan is the intrinsic sequential
part and is bounded by payload size.
"""

from __future__ import annotations

import struct

__all__ = ["decode_jpeg"]


class DecoderNotAvailable(NotImplementedError):
    """Raised by the real decode path for formats (or format variants)
    that need external codec libraries not bundled in this container.
    Defined here and re-exported by ``pipeline.multimodal`` (which
    imports this module) so there is exactly one exception type."""


#: zig-zag index of each coefficient in natural (row-major) order
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    import numpy as np

    D = np.zeros((8, 8))
    for u in range(8):
        c = (0.5 / (2.0 ** 0.5)) if u == 0 else 0.5
        for x in range(8):
            D[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return D


class _Huff:
    """Canonical Huffman table: (code_length, code) → symbol, plus a
    256-entry first-8-bits LUT so the common short codes decode with a
    single peek instead of a bit-by-bit walk."""

    def __init__(self, counts, symbols):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if code >= (1 << length):
                    # DHT counts violate the Kraft inequality (e.g. three
                    # 1-bit codes): the canonical code overflows its length.
                    raise DecoderNotAvailable("invalid DHT (Huffman code overflow)")
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        self.fast: list[tuple[int, int] | None] = [None] * 256
        for (length, c), sym in self.lut.items():
            if length <= 8:
                base = c << (8 - length)
                for i in range(1 << (8 - length)):
                    self.fast[base + i] = (sym, length)


class _BitReader:
    """MSB-first entropy-segment reader with 0xFF00 stuffing; stops at
    any non-RST marker (left for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.bits = (self.bits << 8) | 0
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller consumes via sync()
                    self.marker = nxt
                    self.bits = (self.bits << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    self.marker = nxt
                    self.bits = (self.bits << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8
        # keep only the unconsumed low bits: without this mask the
        # accumulator grows by 8 bits per stream byte and every
        # shift/mask turns into big-int arithmetic — decode time goes
        # quadratic in payload size
        self.bits &= (1 << self.nbits) - 1

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.bits >> self.nbits) & ((1 << n) - 1)

    def decode_huff(self, table: _Huff) -> int:
        if self.nbits < 16:
            self._fill()  # tops up to >= 25 bits
        peek16 = (self.bits >> (self.nbits - 16)) & 0xFFFF
        hit = table.fast[peek16 >> 8]
        if hit is not None:
            self.nbits -= hit[1]
            return hit[0]
        lut = table.lut
        for length in range(9, 17):
            sym = lut.get((length, peek16 >> (16 - length)))
            if sym is not None:
                self.nbits -= length
                return sym
        raise DecoderNotAvailable("corrupt entropy stream (no Huffman code)")

    def sync_restart(self, n: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.bits = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and d[self.pos + 1] == 0xD0 + (n & 7):
                self.pos += 2
                self.marker = None
                return
            self.pos += 1
        raise DecoderNotAvailable("missing restart marker")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# -- arithmetic (QM-coder) entropy decoding, T.81 Annex D ---------------------
#
# Probability estimation state machine, T.81 Table D.3 (also printed in
# the public-domain IJG jaricom.c): (Qe, NMPS, NLPS, switch).  Index 113
# is the nonadaptive "fixed" 0.5-probability bin used for AC signs and
# DC refinement bits.
_ARITH_TAB = (
    (0X5A1D, 1, 1, 1), (0X2586, 2, 14, 0), (0X1114, 3, 16, 0),
    (0X080B, 4, 18, 0), (0X03D8, 5, 20, 0), (0X01DA, 6, 23, 0),
    (0X00E5, 7, 25, 0), (0X006F, 8, 28, 0), (0X0036, 9, 30, 0),
    (0X001A, 10, 33, 0), (0X000D, 11, 35, 0), (0X0006, 12, 9, 0),
    (0X0003, 13, 10, 0), (0X0001, 13, 12, 0), (0X5A7F, 15, 15, 1),
    (0X3F25, 16, 36, 0), (0X2CF2, 17, 38, 0), (0X207C, 18, 39, 0),
    (0X17B9, 19, 40, 0), (0X1182, 20, 42, 0), (0X0CEF, 21, 43, 0),
    (0X09A1, 22, 45, 0), (0X072F, 23, 46, 0), (0X055C, 24, 48, 0),
    (0X0406, 25, 49, 0), (0X0303, 26, 51, 0), (0X0240, 27, 52, 0),
    (0X01B1, 28, 54, 0), (0X0144, 29, 56, 0), (0X00F5, 30, 57, 0),
    (0X00B7, 31, 59, 0), (0X008A, 32, 60, 0), (0X0068, 33, 62, 0),
    (0X004E, 34, 63, 0), (0X003B, 35, 32, 0), (0X002C, 9, 33, 0),
    (0X5AE1, 37, 37, 1), (0X484C, 38, 64, 0), (0X3A0D, 39, 65, 0),
    (0X2EF1, 40, 67, 0), (0X261F, 41, 68, 0), (0X1F33, 42, 69, 0),
    (0X19A8, 43, 70, 0), (0X1518, 44, 72, 0), (0X1177, 45, 73, 0),
    (0X0E74, 46, 74, 0), (0X0BFB, 47, 75, 0), (0X09F8, 48, 77, 0),
    (0X0861, 49, 78, 0), (0X0706, 50, 79, 0), (0X05CD, 51, 48, 0),
    (0X04DE, 52, 50, 0), (0X040F, 53, 50, 0), (0X0363, 54, 51, 0),
    (0X02D4, 55, 52, 0), (0X025C, 56, 53, 0), (0X01F8, 57, 54, 0),
    (0X01A4, 58, 55, 0), (0X0160, 59, 56, 0), (0X0125, 60, 57, 0),
    (0X00F6, 61, 58, 0), (0X00CB, 62, 59, 0), (0X00AB, 63, 61, 0),
    (0X008F, 32, 61, 0), (0X5B12, 65, 65, 1), (0X4D04, 66, 80, 0),
    (0X412C, 67, 81, 0), (0X37D8, 68, 82, 0), (0X2FE8, 69, 83, 0),
    (0X293C, 70, 84, 0), (0X2379, 71, 86, 0), (0X1EDF, 72, 87, 0),
    (0X1AA9, 73, 87, 0), (0X174E, 74, 72, 0), (0X1424, 75, 72, 0),
    (0X119C, 76, 74, 0), (0X0F6B, 77, 74, 0), (0X0D51, 78, 75, 0),
    (0X0BB6, 79, 77, 0), (0X0A40, 48, 77, 0), (0X5832, 81, 80, 1),
    (0X4D1C, 82, 88, 0), (0X438E, 83, 89, 0), (0X3BDD, 84, 90, 0),
    (0X34EE, 85, 91, 0), (0X2EAE, 86, 92, 0), (0X299A, 87, 93, 0),
    (0X2516, 71, 86, 0), (0X5570, 89, 88, 1), (0X4CA9, 90, 95, 0),
    (0X44D9, 91, 96, 0), (0X3E22, 92, 97, 0), (0X3824, 93, 99, 0),
    (0X32B4, 94, 99, 0), (0X2E17, 86, 93, 0), (0X56A8, 96, 95, 1),
    (0X4F46, 97, 101, 0), (0X47E5, 98, 102, 0), (0X41CF, 99, 103, 0),
    (0X3C3D, 100, 104, 0), (0X375E, 93, 99, 0), (0X5231, 102, 105, 0),
    (0X4C0F, 103, 106, 0), (0X4639, 104, 107, 0), (0X415E, 99, 103, 0),
    (0X5627, 106, 105, 1), (0X50E7, 107, 108, 0), (0X4B85, 103, 109, 0),
    (0X5597, 109, 110, 0), (0X504F, 107, 111, 0), (0X5A10, 111, 110, 1),
    (0X5522, 109, 112, 0), (0X59EB, 111, 112, 1), (0X5A1D, 113, 113, 0),
)


class _ArithDecoder:
    """QM-coder decoder derived as EXACT interval arithmetic rather than
    a transcription of T.81's register flowcharts: the entropy bytes
    (0xFF00-unstuffed, zero-filled past any trailing marker) are the
    binary fraction X the encoder emitted, and we track
    ``C = floor((X - L) * 2^s)`` where L is the interval base and the
    scale s grows by one per renormalization — so every MPS/LPS decision
    ``X - L >= (A - Qe) * 2^-s`` is an exact integer comparison with no
    carry or byte-boundary conventions to get wrong.  Subinterval
    assignment is the standard QM layout (MPS low, LPS high, conditional
    exchange when A - Qe < Qe); conformance is pinned by the
    libjpeg-oracle roundtrips in tests/test_media_decode.py."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.marker = None  # first non-RST marker byte seen (stream end)
        self.a = 0x10000  # full [0, 1) interval
        self.c = (self._byte() << 8) | self._byte()  # first 16 bits of X

    def _byte(self) -> int:
        """Next unstuffed entropy byte; zero-fill once a marker is hit
        (the T.81 convention: decoding may legally outrun the data)."""
        if self.marker is not None:
            return 0
        d = self.data
        if self.pos >= len(d):
            self.marker = 0xD9
            return 0
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
        if nxt == 0x00:
            self.pos += 2
            return 0xFF
        self.marker = nxt  # RST or terminal marker: stop consuming
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        """Decode one binary decision against statistics bin stats[i]
        (low 7 bits: Table D.3 state index; bit 7: current MPS)."""
        sv = stats[i]
        qe, nmps, nlps, switch = _ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        a = self.a - qe
        if self.c < a:
            # lower subinterval (width a): MPS unless exchange
            if a >= 0x8000:
                self.a = a
                return mps
            if a < qe:  # conditional exchange: lower is LPS
                d = 1 - mps
                stats[i] = ((mps ^ switch) << 7) | nlps
            else:
                d = mps
                stats[i] = (mps << 7) | nmps
        else:
            # upper subinterval (width qe): LPS unless exchange
            self.c -= a
            if a < qe:
                d = mps
                stats[i] = (mps << 7) | nmps
            else:
                d = 1 - mps
                stats[i] = ((mps ^ switch) << 7) | nlps
            a = qe
        # renormalize: double the interval, pull in the next bits of X
        nbits = 0
        while a < 0x8000:
            a <<= 1
            nbits += 1
        if nbits:
            self.c = (self.c << nbits) | self._take_bits(nbits)
        self.a = a
        return d

    # bit reservoir over _byte()
    _resv = 0
    _resn = 0

    def _take_bits(self, n: int) -> int:
        while self._resn < n:
            self._resv = (self._resv << 8) | self._byte()
            self._resn += 8
        self._resn -= n
        out = (self._resv >> self._resn) & ((1 << n) - 1)
        self._resv &= (1 << self._resn) - 1
        return out


def _next_marker_pos(d: bytes, pos: int) -> int:
    """First position >= pos of a non-stuffing marker (skips 0xFF00
    stuffing and any stray entropy padding)."""
    while pos + 1 < len(d):
        if d[pos] == 0xFF and d[pos + 1] != 0x00:
            return pos
        pos += 1
    return len(d)


class _ScanDecoder:
    """Entropy decode of one scan into the frame's coefficient store.

    Block procedures follow T.81 §F.2 (baseline) and §G.1.2
    (progressive), with the EOB-run and correction-bit control flow of
    the public libjpeg ``jdphuff.c``."""

    def __init__(self, d, pos, frame, scomp, hts, ri, Ss, Se, Ah, Al):
        self.r = _BitReader(d, pos)
        self.frame = frame
        self.scomp = scomp  # [(comp, dc_table_id, ac_table_id)]
        self.hts = hts
        self.ri = ri
        self.Ss, self.Se, self.Ah, self.Al = Ss, Se, Ah, Al
        self.eobrun = 0
        for comp, _t, _a in scomp:
            comp["pred"] = 0

    # -- per-block procedures ---------------------------------------------
    def _dc_table(self, tdc):
        t = self.hts.get((0, tdc))
        if t is None:
            raise DecoderNotAvailable("missing DC Huffman table")
        return t

    def _ac_table(self, tac):
        t = self.hts.get((1, tac))
        if t is None:
            raise DecoderNotAvailable("missing AC Huffman table")
        return t

    def _block_baseline(self, comp, tdc, tac, coef):
        r = self.r
        t = r.decode_huff(self._dc_table(tdc))
        comp["pred"] += _extend(r.receive(t), t) if t else 0
        coef[0] = comp["pred"]
        ac = self._ac_table(tac)
        k = 1
        while k < 64:
            rs = r.decode_huff(ac)
            rr, ss = rs >> 4, rs & 15
            if ss == 0:
                if rr == 15:
                    k += 16
                    continue
                break  # EOB
            k += rr
            if k > 63:
                raise DecoderNotAvailable("AC index overflow")
            coef[ZIGZAG[k]] = _extend(r.receive(ss), ss)
            k += 1

    def _block_dc_first(self, comp, tdc, coef):
        r = self.r
        t = r.decode_huff(self._dc_table(tdc))
        comp["pred"] += _extend(r.receive(t), t) if t else 0
        coef[0] = comp["pred"] << self.Al

    def _block_dc_refine(self, coef):
        if self.r.read_bit():
            coef[0] = int(coef[0]) | (1 << self.Al)

    def _block_ac_first(self, tac, coef):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        r = self.r
        ac = self._ac_table(tac)
        k = self.Ss
        while k <= self.Se:
            rs = r.decode_huff(ac)
            rr, ss = rs >> 4, rs & 15
            if ss == 0:
                if rr != 15:
                    self.eobrun = (1 << rr) - 1
                    if rr:
                        self.eobrun += r.receive(rr)
                    break
                k += 16
                continue
            k += rr
            if k > self.Se:
                raise DecoderNotAvailable("AC index overflow")
            coef[ZIGZAG[k]] = _extend(r.receive(ss), ss) << self.Al
            k += 1

    def _block_ac_refine(self, tac, coef):
        r = self.r
        p1 = 1 << self.Al
        m1 = -(1 << self.Al)
        k = self.Ss
        if self.eobrun == 0:
            ac = self._ac_table(tac)
            while k <= self.Se:
                rs = r.decode_huff(ac)
                rr, ss = rs >> 4, rs & 15
                val = 0
                if ss:
                    if ss != 1:
                        raise DecoderNotAvailable("bad AC refinement code")
                    val = p1 if r.read_bit() else m1
                else:
                    if rr != 15:
                        self.eobrun = 1 << rr
                        if rr:
                            self.eobrun += r.receive(rr)
                        break
                    # rr == 15: skip 16 zero-history coefficients
                while k <= self.Se:
                    z = ZIGZAG[k]
                    c = int(coef[z])
                    if c != 0:
                        if r.read_bit() and (c & p1) == 0:
                            coef[z] = c + (p1 if c >= 0 else m1)
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if val:
                    if k > self.Se:
                        # Corrupt stream: the ZRL/zero-run history skipped past
                        # the end of the spectral band, so there is no slot for
                        # the pending ±1 coefficient (libjpeg survives via a
                        # padded natural_order table; we reject instead).
                        raise DecoderNotAvailable("AC refine run past band end")
                    coef[ZIGZAG[k]] = val
                k += 1
        if self.eobrun > 0:
            while k <= self.Se:
                z = ZIGZAG[k]
                c = int(coef[z])
                if c != 0:
                    if r.read_bit() and (c & p1) == 0:
                        coef[z] = c + (p1 if c >= 0 else m1)
                k += 1
            self.eobrun -= 1

    def _decode_block(self, comp, tdc, tac, by, bx):
        coef = comp["coef"][by, bx]
        if self.Ss == 0 and self.Se == 63:
            self._block_baseline(comp, tdc, tac, coef)
        elif self.Se == 0:
            if self.Ah == 0:
                self._block_dc_first(comp, tdc, coef)
            else:
                self._block_dc_refine(coef)
        elif self.Ah == 0:
            self._block_ac_first(tac, coef)
        else:
            self._block_ac_refine(tac, coef)

    # -- scan loops ---------------------------------------------------------
    def _restart(self, n, rst):
        self.r.sync_restart(rst)
        self.eobrun = 0
        for comp, _t, _a in self.scomp:
            comp["pred"] = 0

    def run(self) -> int:
        """Decode every MCU of the scan; returns the stream position of
        the following marker."""
        frame = self.frame
        n = 0
        rst = 0
        if len(self.scomp) > 1:
            # interleaved: MCU = one h×v block cluster per component
            for my in range(frame["mcuy"]):
                for mx in range(frame["mcux"]):
                    if self.ri and n and n % self.ri == 0:
                        self._restart(n, rst)
                        rst = (rst + 1) & 7
                    for comp, tdc, tac in self.scomp:
                        for by in range(comp["v"]):
                            for bx in range(comp["h"]):
                                self._decode_block(
                                    comp, tdc, tac,
                                    my * comp["v"] + by, mx * comp["h"] + bx,
                                )
                    n += 1
        else:
            # non-interleaved: MCU = one block over the component's own
            # (non-padded) grid — T.81 A.2
            comp, tdc, tac = self.scomp[0]
            for i in range(comp["bh"] * comp["bw"]):
                if self.ri and n and n % self.ri == 0:
                    self._restart(n, rst)
                    rst = (rst + 1) & 7
                by, bx = divmod(i, comp["bw"])
                self._decode_block(comp, tdc, tac, by, bx)
                n += 1
        return _next_marker_pos(self.r.data, self.r.pos)


class _ArithScanDecoder(_ScanDecoder):
    """Arithmetic-coded scan decode (SOF9 sequential / SOF10
    progressive), per T.81 §F.2 with the statistics-bin layout of
    Tables F.4/F.5 (DC: 64 bins — 20 context + category/bit chains;
    AC: 256 bins — 3 per index + the two Kx-split magnitude chains).
    Control flow mirrors the public IJG ``jdarith.c``; the per-decision
    core is :class:`_ArithDecoder`.  Statistics reset per scan and at
    every restart marker (T.81 §F.1.4.1)."""

    def __init__(self, d, pos, frame, scomp, cond, ri, Ss, Se, Ah, Al):
        self.arith = _ArithDecoder(d, pos)
        self.r = self.arith  # base run() uses .data/.pos for scan end
        self.frame = frame
        self.scomp = scomp
        self.cond = cond
        self.ri = ri
        self.Ss, self.Se, self.Ah, self.Al = Ss, Se, Ah, Al
        self.eobrun = 0
        self._reset_stats()
        for comp, _t, _a in scomp:
            comp["pred"] = 0
            comp["dcctx"] = 0

    def _reset_stats(self):
        self.dc_stats: dict[int, bytearray] = {}
        self.ac_stats: dict[int, bytearray] = {}
        self.fixed = bytearray([113])  # nonadaptive 0.5-probability bin

    def _dc_bins(self, tdc):
        st = self.dc_stats.get(tdc)
        if st is None:
            st = self.dc_stats[tdc] = bytearray(64)
        return st

    def _ac_bins(self, tac):
        st = self.ac_stats.get(tac)
        if st is None:
            st = self.ac_stats[tac] = bytearray(256)
        return st

    # -- per-block procedures (T.81 §F.2.4, bins per Tables F.4/F.5) -------
    def _a_dc(self, comp, tdc, coef):
        ar = self.arith
        st = self._dc_bins(tdc)
        ctx = comp["dcctx"]
        if ar.decode(st, ctx) == 0:
            comp["dcctx"] = 0
        else:
            sign = ar.decode(st, ctx + 1)
            i = ctx + 2 + sign
            m = ar.decode(st, i)
            if m:
                i = 20  # X1: shared magnitude-category chain
                while ar.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise DecoderNotAvailable("arith DC magnitude overflow")
                    i += 1
            dl, du = self.cond["dc"].get(tdc, (0, 1))
            if m < (1 << dl) >> 1:
                comp["dcctx"] = 0
            elif m > (1 << du) >> 1:
                comp["dcctx"] = 12 + 4 * sign
            else:
                comp["dcctx"] = 4 + 4 * sign
            v = m
            i += 14  # magnitude-bit bin for this category
            m >>= 1
            while m:
                if ar.decode(st, i):
                    v |= m
                m >>= 1
            v += 1
            comp["pred"] += -v if sign else v
        coef[0] = comp["pred"] << self.Al

    def _a_dc_refine(self, coef):
        if self.arith.decode(self.fixed, 0):
            coef[0] = int(coef[0]) | (1 << self.Al)

    def _a_ac(self, tac, coef, kstart, kend):
        ar = self.arith
        st = self._ac_bins(tac)
        kx = self.cond["ac"].get(tac, 5)
        al = self.Al
        k = kstart
        while k <= kend:
            base = 3 * (k - 1)
            if ar.decode(st, base):
                break  # EOB
            while ar.decode(st, base + 1) == 0:
                base += 3
                k += 1
                if k > kend:
                    raise DecoderNotAvailable("arith AC index overflow")
            sign = ar.decode(self.fixed, 0)
            i = base + 2
            m = ar.decode(st, i)
            if m and ar.decode(st, i):
                m = 2
                i = 189 if k <= kx else 217  # X2.. chains, Kx-split
                while ar.decode(st, i):
                    m <<= 1
                    if m == 0x8000:
                        raise DecoderNotAvailable("arith AC magnitude overflow")
                    i += 1
            v = m
            i += 14
            m >>= 1
            while m:
                if ar.decode(st, i):
                    v |= m
                m >>= 1
            v += 1
            coef[ZIGZAG[k]] = (-v if sign else v) << al
            k += 1

    def _a_ac_refine(self, tac, coef):
        ar = self.arith
        st = self._ac_bins(tac)
        p1 = 1 << self.Al
        m1 = -1 << self.Al
        kex = self.Se  # previous-stage end-of-block index
        while kex >= 1 and not coef[ZIGZAG[kex]]:
            kex -= 1
        k = self.Ss
        while k <= self.Se:
            base = 3 * (k - 1)
            if k > kex and ar.decode(st, base):
                break  # EOB
            while True:
                z = ZIGZAG[k]
                c = int(coef[z])
                if c:
                    if ar.decode(st, base + 2):
                        coef[z] = c + (m1 if c < 0 else p1)
                    break
                if ar.decode(st, base + 1):
                    coef[z] = m1 if ar.decode(self.fixed, 0) else p1
                    break
                base += 3
                k += 1
                if k > self.Se:
                    raise DecoderNotAvailable("arith AC refine overflow")
            k += 1

    def _decode_block(self, comp, tdc, tac, by, bx):
        coef = comp["coef"][by, bx]
        if self.Ss == 0 and self.Se == 63:
            self._a_dc(comp, tdc, coef)
            self._a_ac(tac, coef, 1, 63)
        elif self.Se == 0:
            if self.Ah == 0:
                self._a_dc(comp, tdc, coef)
            else:
                self._a_dc_refine(coef)
        elif self.Ah == 0:
            self._a_ac(tac, coef, self.Ss, self.Se)
        else:
            self._a_ac_refine(tac, coef)

    def _restart(self, n, rst):
        d = self.arith.data
        pos = self.arith.pos
        want = 0xD0 + (rst & 7)
        while pos + 1 < len(d):
            if d[pos] == 0xFF and d[pos + 1] == want:
                pos += 2
                break
            pos += 1
        else:
            raise DecoderNotAvailable("missing restart marker")
        self.arith = _ArithDecoder(d, pos)
        self.r = self.arith
        self._reset_stats()
        for comp, _t, _a in self.scomp:
            comp["pred"] = 0
            comp["dcctx"] = 0


def _parse_sof_lossless(np, seg):
    """SOF3 frame header: 2–16-bit precision, no block grid — each
    component is a bare (h, w) sample plane (sampling 1×1 only; the
    subsampled-lossless case is vanishingly rare in real data)."""
    prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
    if w * h > (1 << 26) or w == 0 or h == 0:
        raise DecoderNotAvailable(f"implausible JPEG dimensions {w}x{h}")
    if not 2 <= prec <= 16:
        raise DecoderNotAvailable(f"{prec}-bit precision invalid for lossless")
    if nc not in (1, 3):
        raise DecoderNotAvailable(f"{nc}-component images unsupported")
    comps = []
    for c in range(nc):
        cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
        if hv != 0x11:
            raise DecoderNotAvailable("subsampled lossless JPEG unsupported")
        comps.append({"id": cid, "h": 1, "v": 1, "tq": tq,
                      "plane": np.zeros((h, w), dtype=np.int32)})
    return {
        "w": w, "h": h, "comps": comps, "hmax": 1, "vmax": 1,
        "mcux": w, "mcuy": h, "progressive": False, "prec": prec,
        "lossless": True,
    }


class _LosslessScanDecoder:
    """Lossless-process scan (T.81 Annex H): per-sample prediction from
    the left/above/above-left neighbors with the scan-selected predictor
    (Ss = 1..7), differences coded with DC-style Huffman categories
    (SSSS 0..16, 16 = +32768 with no extra bits), all arithmetic modulo
    65536, point transform Al = Pt.  First-line rules: the scan's (and
    each restart interval's) first sample predicts 2^(P−Pt−1), the rest
    of that line uses Ra; later lines start on Rb."""

    def __init__(self, d, pos, frame, scomp, hts, ri, predictor, pt):
        self.r = _BitReader(d, pos)
        self.frame = frame
        self.scomp = scomp  # [(comp, dc_table_id, _)]
        self.hts = hts
        self.ri = ri
        if not 1 <= predictor <= 7:
            raise DecoderNotAvailable(f"invalid lossless predictor {predictor}")
        self.sel = predictor
        self.pt = pt
        self.default_p = 1 << (frame["prec"] - pt - 1)

    def _table(self, tdc):
        t = self.hts.get((0, tdc))
        if t is None:
            raise DecoderNotAvailable("missing lossless Huffman table")
        return t

    def _diff(self, table) -> int:
        t = self.r.decode_huff(table)
        if t == 16:
            return 32768  # special category: no additional bits
        if t > 16:
            raise DecoderNotAvailable("invalid lossless difference category")
        return _extend(self.r.receive(t), t)

    def _predict(self, plane, y, x, seg_y, seg_x) -> int:
        if y == seg_y:  # (restart-)first line
            if x == seg_x:
                return self.default_p
            return int(plane[y, x - 1])
        if x == 0:
            return int(plane[y - 1, x])
        a = int(plane[y, x - 1])
        b = int(plane[y - 1, x])
        c = int(plane[y - 1, x - 1])
        sel = self.sel
        if sel == 1:
            p = a
        elif sel == 2:
            p = b
        elif sel == 3:
            p = c
        elif sel == 4:
            p = a + b - c
        elif sel == 5:
            p = a + ((b - c) >> 1)
        elif sel == 6:
            p = b + ((a - c) >> 1)
        else:
            p = (a + b) >> 1
        return p & 0xFFFF

    def run(self) -> int:
        frame = self.frame
        w, h = frame["w"], frame["h"]
        tables = [self._table(tdc) for _c, tdc, _a in self.scomp]
        planes = [c["plane"] for c, _t, _a in self.scomp]
        seg_y = seg_x = 0  # start of the current restart interval
        n = 0
        rst = 0
        for y in range(h):
            for x in range(w):
                if self.ri and n and n % self.ri == 0:
                    self.r.sync_restart(rst)
                    rst = (rst + 1) & 7
                    seg_y, seg_x = y, x
                for plane, table in zip(planes, tables):
                    p = self._predict(plane, y, x, seg_y, seg_x)
                    plane[y, x] = (p + self._diff(table)) & 0xFFFF
                n += 1
        return _next_marker_pos(self.r.data, self.r.pos)


def _render_lossless(np, frame):
    pt = frame["pt"]
    full = (1 << frame["prec"]) - 1
    dtype = np.uint8 if frame["prec"] <= 8 else np.uint16
    planes = [
        np.clip(np.left_shift(c["plane"], pt), 0, full).astype(dtype)
        for c in frame["comps"]
    ]
    if len(planes) == 1:
        return planes[0]
    # lossless color carries raw components (no JFIF YCbCr contract);
    # stack as-is — for the common RGB case that IS the image
    return np.stack(planes, axis=-1)


def _parse_sof(np, seg, progressive):
    prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
    if w * h > (1 << 26) or w == 0 or h == 0:
        raise DecoderNotAvailable(f"implausible JPEG dimensions {w}x{h}")
    if prec not in (8, 12):
        raise DecoderNotAvailable(f"{prec}-bit precision unsupported")
    if nc not in (1, 3):
        raise DecoderNotAvailable(f"{nc}-component images unsupported")
    comps = []
    for c in range(nc):
        cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
        comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
    if any(not 1 <= c["h"] <= 2 or not 1 <= c["v"] <= 2 for c in comps):
        raise DecoderNotAvailable("sampling factors beyond 2 unsupported")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        # component's own block grid (non-interleaved scans) and the
        # MCU-padded coefficient store (interleaved scans write pad blocks)
        cw = (w * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        c["bw"], c["bh"] = (cw + 7) // 8, (ch + 7) // 8
        c["coef"] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), dtype=np.int32)
    return {
        "w": w, "h": h, "comps": comps, "hmax": hmax, "vmax": vmax,
        "mcux": mcux, "mcuy": mcuy, "progressive": progressive, "prec": prec,
    }


def decode_jpeg(payload: bytes):
    """Decode a baseline, extended-sequential, progressive,
    arithmetic-coded, or lossless JPEG → ndarray (h, w) grayscale or
    (h, w, 3) RGB (lossless color = raw component stack); uint8 for
    8-bit frames, uint16 for higher precisions (raw sample values).
    Raises :class:`DecoderNotAvailable` for arithmetic-lossless/
    hierarchical variants or corrupt streams."""
    try:
        return _decode_jpeg_checked(payload)
    except (IndexError, struct.error) as exc:
        # Segment bodies shorter than their declared fields (truncated
        # or bit-flipped uploads): same typed-boundary contract as the
        # BMFF walker, so one bad crawl payload degrades to the
        # metadata row instead of failing the whole Spark task.
        raise DecoderNotAvailable(f"truncated/corrupt JPEG segment: {exc}") from exc


def _decode_jpeg_checked(payload: bytes):
    import numpy as np

    d = payload
    if len(d) < 4 or d[0:2] != b"\xff\xd8":
        raise DecoderNotAvailable("not a JPEG stream (no SOI)")
    pos = 2
    qt: dict[int, list[int]] = {}
    hts: dict[tuple[int, int], _Huff] = {}
    arith_cond: dict[str, dict] = {"dc": {}, "ac": {}}
    restart_interval = 0
    frame = None
    nscans = 0

    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", d, pos)
        seg = d[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (pq=1 → 16-bit entries, used by 12-bit)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    qt[tq] = list(struct.unpack_from(">64H", seg, i))
                    i += 128
                else:
                    qt[tq] = list(seg[i : i + 64])
                    i += 64
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = list(seg[i + 17 : i + 17 + nsym])
                hts[(tc, th)] = _Huff(counts, symbols)
                i += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):
            # SOF0 baseline / SOF1 extended sequential (12-bit) / SOF2
            # progressive (Huffman), SOF9 sequential / SOF10 progressive
            # (arithmetic) — all DCT frames with the same scan grammar
            if frame is not None:
                raise DecoderNotAvailable("multiple frames unsupported")
            frame = _parse_sof(np, seg, progressive=marker in (0xC2, 0xCA))
            frame["arith"] = marker in (0xC9, 0xCA)
            if marker == 0xC0 and frame["prec"] != 8:
                raise DecoderNotAvailable("baseline SOF0 must be 8-bit")
        elif marker == 0xC3:  # SOF3 — lossless (Huffman), T.81 Annex H
            if frame is not None:
                raise DecoderNotAvailable("multiple frames unsupported")
            frame = _parse_sof_lossless(np, seg)
            frame["arith"] = False
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise DecoderNotAvailable(
                f"unsupported SOF marker 0xFF{marker:02X} "
                "(arithmetic-lossless/hierarchical)"
            )
        elif marker == 0xCC:  # DAC — arithmetic conditioning (T.81 B.2.4.3)
            i = 0
            while i + 1 < len(seg):
                tc, tb = seg[i] >> 4, seg[i] & 15
                v = seg[i + 1]
                if tc == 0:
                    arith_cond["dc"][tb] = (v & 15, v >> 4)  # (L, U)
                else:
                    arith_cond["ac"][tb] = v  # Kx
                i += 2
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise DecoderNotAvailable("SOS before SOF")
            ns = seg[0]
            scomp = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:
                    raise DecoderNotAvailable("scan references unknown component")
                scomp.append((comp, tt >> 4, tt & 15))
            Ss, Se, aa = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            Ah, Al = aa >> 4, aa & 15
            if frame.get("lossless"):
                # Ss = predictor selector, Al = point transform
                if Se != 0 or Ah != 0 or not 0 <= Al < frame["prec"]:
                    raise DecoderNotAvailable("bad lossless scan header")
                frame["pt"] = Al
                sd = _LosslessScanDecoder(
                    d, pos + seglen, frame, scomp, hts, restart_interval,
                    Ss, Al,
                )
                pos = sd.run()
                nscans += 1
                continue
            if frame["progressive"]:
                if Ss == 0 and Se != 0:
                    raise DecoderNotAvailable("progressive scan mixes DC and AC")
                if Ss > 0 and ns != 1:
                    raise DecoderNotAvailable("interleaved AC scan invalid")
                if Se > 63 or Ss > Se:
                    raise DecoderNotAvailable("bad spectral selection")
            else:
                if Ss != 0 or Se != 63 or Ah != 0 or Al != 0:
                    raise DecoderNotAvailable("bad baseline scan header")
            if frame["arith"]:
                sd = _ArithScanDecoder(
                    d, pos + seglen, frame, scomp, arith_cond,
                    restart_interval, Ss, Se, Ah, Al,
                )
            else:
                sd = _ScanDecoder(
                    d, pos + seglen, frame, scomp, hts, restart_interval,
                    Ss, Se, Ah, Al,
                )
            pos = sd.run()
            nscans += 1
            continue
        pos += seglen
    if frame is None or nscans == 0:
        raise DecoderNotAvailable("no frame/scan decoded")
    if frame.get("lossless"):
        return _render_lossless(np, frame)
    return _render(np, frame, qt)


def _render(np, frame, qt):
    """Dequantize + batched IDCT + upsample + color convert.  8-bit
    frames return uint8; 12-bit frames return uint16 with raw 0..4095
    sample values (the usual convention — no rescale)."""
    w, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    mid = float(1 << (frame["prec"] - 1))  # level shift: 128 / 2048
    full = (1 << frame["prec"]) - 1
    dtype = np.uint8 if frame["prec"] == 8 else np.uint16
    D = _dct_matrix()
    planes = []
    for c in comps:
        if c["tq"] not in qt:
            raise DecoderNotAvailable("missing quant table")
        # DQT stores zigzag order; q[i] = step for natural index i
        q = np.array([qt[c["tq"]][ZIGZAG.index(i)] for i in range(64)], dtype=np.float64)
        nby, nbx = c["coef"].shape[:2]
        blocks = (c["coef"].astype(np.float64) * q).reshape(-1, 8, 8)
        spatial = D.T @ blocks @ D + mid  # batched over all blocks
        p = spatial.reshape(nby, nbx, 8, 8).transpose(0, 2, 1, 3).reshape(
            nby * 8, nbx * 8
        )
        if c["h"] < hmax or c["v"] < vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        return np.clip(np.rint(planes[0]), 0, full).astype(dtype)
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - mid)
    g_ = y - 0.344136 * (cb - mid) - 0.714136 * (cr - mid)
    b_ = y + 1.772 * (cb - mid)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return np.clip(np.rint(rgb), 0, full).astype(dtype)
