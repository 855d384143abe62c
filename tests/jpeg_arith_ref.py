"""Reference arithmetic-JPEG ENCODER for tests.

The product decoder (simple_tsdb_spark/pipeline/jpeg.py) proves its
conformance against the system libjpeg, but libjpeg's ABI here is
8-bit-only — the decoder's 12-bit SOF9/SOF10 branch would go untested.
This module is an exact-interval QM encoder (the mirror of the
decoder's ``C = floor((X - L) * 2^s)`` derivation): it tracks the exact
interval base as a big integer, picks the fewest-bit dyadic X inside
the final interval, and emits its bytes with 0xFF00 stuffing.  No
carry/register conventions at all — the decoder's own probability
table and bin layout drive the symbol stream, so encoder and decoder
are exact inverses by construction, and the 8-bit output is
additionally cross-checked against libjpeg's decoder in
test_media_decode.py.
"""

from __future__ import annotations

import struct

from simple_tsdb_spark.pipeline.jpeg import _ARITH_TAB, ZIGZAG  # noqa: F401


class QMEncoder:
    """QM-coder encoder over exact interval arithmetic.

    ``low`` is the exact interval base as an integer at scale
    ``2^-(s + 16)``; ``a`` the width at the same scale.  Symbol coding,
    conditional exchange, and the no-renorm fast path (which skips the
    probability-state update) mirror _ArithDecoder.decode exactly."""

    def __init__(self):
        self.a = 0x10000  # the full [0, 1) interval
        self.low = 0
        self.s = 0

    def encode(self, stats: bytearray, i: int, d: int) -> None:
        sv = stats[i]
        qe, nmps, nlps, switch = _ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        t = self.a - qe
        lower_is_mps = t >= qe  # conditional exchange when t < qe
        if (d == mps) == lower_is_mps:
            # coded in the lower subinterval (width t)
            self.a = t
            if t >= 0x8000:
                return  # no renorm -> no state update (decoder parity)
        else:
            # upper subinterval: base moves past the lower part
            self.low += t
            self.a = qe
        if d == mps:
            stats[i] = (mps << 7) | nmps
        else:
            stats[i] = ((mps ^ switch) << 7) | nlps
        while self.a < 0x8000:
            self.a <<= 1
            self.low <<= 1
            self.s += 1

    def flush(self) -> bytes:
        """Fewest-significant-bits dyadic X in [low, low + a), emitted
        MSB-first with trailing zero bytes stripped (the decoder
        zero-fills past the marker) and 0xFF00 byte stuffing."""
        lo, hi = self.low, self.low + self.a
        if lo == 0:
            return b""  # X = 0.000... : nothing to emit
        t = 0
        while True:
            g = 1 << (t + 1)
            if (lo + g - 1) // g * g < hi:
                t += 1
            else:
                break
        g = 1 << t
        x = (lo + g - 1) // g * g
        total_bits = self.s + 16
        pad = (8 - total_bits % 8) % 8
        x <<= pad
        nbytes = (total_bits + pad) // 8
        raw = x.to_bytes(nbytes, "big").rstrip(b"\x00")
        return raw.replace(b"\xff", b"\xff\x00")


class _ArithScanEncoder:
    """Symbol stream for one scan — the inverse of _ArithScanDecoder's
    block procedures (same Table F.4/F.5 bins, same DC conditioning)."""

    def __init__(self, dc_l: int = 0, dc_u: int = 1, kx: int = 5):
        self.enc = QMEncoder()
        self.dc_stats = bytearray(64)
        self.ac_stats = bytearray(256)
        self.fixed = bytearray([113])
        self.pred = 0
        self.dcctx = 0
        self.dc_l, self.dc_u, self.kx = dc_l, dc_u, kx

    def dc(self, dc_val: int, al: int = 0) -> None:
        e, st = self.enc, self.dc_stats
        v = dc_val >> al
        diff = v - self.pred
        self.pred = v
        ctx = self.dcctx
        if diff == 0:
            e.encode(st, ctx, 0)
            self.dcctx = 0
            return
        e.encode(st, ctx, 1)
        sign = 1 if diff < 0 else 0
        e.encode(st, ctx + 1, sign)
        u = abs(diff) - 1
        i = ctx + 2 + sign
        if u == 0:
            e.encode(st, i, 0)
            m = 0
        else:
            e.encode(st, i, 1)
            j = u.bit_length() - 1
            i = 20
            for _ in range(j):
                e.encode(st, i, 1)
                i += 1
            e.encode(st, i, 0)
            m = 1 << j
        if m < (1 << self.dc_l) >> 1:
            self.dcctx = 0
        elif m > (1 << self.dc_u) >> 1:
            self.dcctx = 12 + 4 * sign
        else:
            self.dcctx = 4 + 4 * sign
        i += 14
        mm = m >> 1
        while mm:
            e.encode(st, i, 1 if (u & mm) else 0)
            mm >>= 1

    def ac(self, zz, kstart: int = 1, kend: int = 63, al: int = 0) -> None:
        """zz: the block's 64 coefficients in ZIGZAG order."""
        e, st = self.enc, self.ac_stats
        k = kstart
        while k <= kend:
            r = next((i for i in range(k, kend + 1) if zz[i] >> al), None)
            base = 3 * (k - 1)
            if r is None:
                e.encode(st, base, 1)  # EOB
                return
            e.encode(st, base, 0)
            while k < r:
                e.encode(st, base + 1, 0)
                base += 3
                k += 1
            e.encode(st, base + 1, 1)
            v = zz[k] >> al if zz[k] >= 0 else -((-zz[k]) >> al)
            sign = 1 if v < 0 else 0
            e.encode(self.fixed, 0, sign)
            u = abs(v) - 1
            i = base + 2
            if u == 0:
                e.encode(st, i, 0)
                m = 0
            else:
                e.encode(st, i, 1)
                if u == 1:
                    e.encode(st, i, 0)
                    m = 1
                else:
                    e.encode(st, i, 1)
                    j = u.bit_length() - 1
                    i = 189 if k <= self.kx else 217
                    for _ in range(j - 1):
                        e.encode(st, i, 1)
                        i += 1
                    e.encode(st, i, 0)
                    m = 1 << j
            i += 14
            mm = m >> 1
            while mm:
                e.encode(st, i, 1 if (u & mm) else 0)
                mm >>= 1
            k += 1


def encode_arith_gray(img, prec: int = 8, progressive: bool = False) -> bytes:
    """Grayscale arithmetic JPEG (SOF9, or SOF10 with a DC scan + one
    full-band AC scan when ``progressive``), all-ones quant table —
    the same fixture conventions as _jpeg_bytes so coefficient streams
    are comparable."""
    import test_media_decode as t

    grids, _samp, (w, h, _hm, _vm, _mx, _my) = t._fdct_zz(img, prec=prec)
    grid = grids[0]

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof = struct.pack(">BHHB", prec, h, w, 1) + bytes([1, 0x11, 0])
    out += (b"\xff\xca" if progressive else b"\xff\xc9")
    out += struct.pack(">H", 2 + len(sof)) + sof

    def sos(ss, se):
        return (
            b"\xff\xda"
            + struct.pack(">H", 8)
            + bytes([1, 1, 0x00, ss, se, 0])
        )

    blocks = [zz for row in grid for zz in row]
    if progressive:
        se = _ArithScanEncoder()
        for zz in blocks:
            se.dc(zz[0])
        out += sos(0, 0) + se.enc.flush()
        se = _ArithScanEncoder()
        for zz in blocks:
            se.ac(zz, 1, 63)
        out += sos(1, 63) + se.enc.flush()
    else:
        se = _ArithScanEncoder()
        for zz in blocks:
            se.dc(zz[0])
            se.ac(zz, 1, 63)
        out += sos(0, 63) + se.enc.flush()
    out += b"\xff\xd9"
    return bytes(out)
