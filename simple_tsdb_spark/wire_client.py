"""WireClient — a native Python client for the TsdbServer wire protocol.

The reference ships its own Python client
(``/root/reference/python/simple_tsdb/simple_tsdb/client.py``) and our
server is proven byte-compatible with it (tests/test_server.py drives
the reference client unchanged).  This module is the OTHER half of that
story: a client of our own speaking the same frames, so deployments
that only need the management/catalog surface (health probes, schema
tooling, the Flask app-context extension) carry zero reference code.

Scope: the full command surface.  Catalog + scalar commands —
CREATE/LIST databases and measurements, GET_SCHEMA, LIST/ACTIVE series,
COUNT, DELETE, NOP, AUTHENTICATE (TLS AUTHENTICATE-first handshake
included) — plus the chunked data paths: SELECT (LIMIT and LAST N)
decoding ``DT_CHUNK`` validity-bitmap frames to pandas, WRITE_POINTS
under the ``DT_READY_FOR_CHUNK`` credit handshake, and SUM_POINTS
decoding ``DT_SUMS_CHUNK`` wal-field words.  Together with the server
this closes the loop: a reference deployment can run BOTH ends of the
wire on this repo alone.

Wire grammar: ``server.py`` module docstring (tokens from the
reference's ``src/tsdbserver/tokens.h:13-60``); every command ends with
``DT_STATUS_CODE + i32``, 0 on success, which maps back through
:func:`simple_tsdb_spark.errors.error_for_code`.
"""

from __future__ import annotations

import socket
import ssl as ssl_mod
import struct

import numpy as np

from simple_tsdb_spark.errors import NotAuthenticated, error_for_code
from simple_tsdb_spark.server import (
    CT_ACTIVE_SERIES,
    CT_AUTHENTICATE,
    CT_COUNT_POINTS,
    CT_CREATE_DATABASE,
    CT_CREATE_MEASUREMENT,
    CT_DELETE_POINTS,
    CT_GET_SCHEMA,
    CT_INTEGRATE_POINTS,
    CT_LIST_DATABASES,
    CT_LIST_MEASUREMENTS,
    CT_LIST_SERIES,
    CT_NOP,
    CT_SELECT_POINTS_LAST,
    CT_SELECT_POINTS_LIMIT,
    CT_SUM_POINTS,
    CT_WRITE_POINTS,
    DT_CHUNK,
    DT_DATABASE,
    DT_END,
    DT_FIELD_LIST,
    DT_FIELD_NAME,
    DT_FIELD_TYPE,
    DT_INTEGRAL_BITMAP,
    DT_INTEGRALS,
    DT_MEASUREMENT,
    DT_NLAST,
    DT_NLIMIT,
    DT_NPOINTS,
    DT_PASSWORD,
    DT_READY_FOR_CHUNK,
    DT_SERIES,
    DT_STATUS_CODE,
    DT_SUMS_CHUNK,
    DT_TIME_FIRST,
    DT_TIME_LAST,
    DT_TYPED_FIELDS,
    DT_USERNAME,
    DT_WINDOW_NS,
    ProtocolError,
    _pack_bitmap,
    _pad8,
    _unpack_bitmap,
    _WIRE_TYPES,
)

#: wire type id -> engine type name (u64f rides the u64 wire id, so the
#: reverse map reports "u64" — full-range u64 is a write-side contract)
_TYPE_NAMES = {wid: name for name, (wid, _, _) in _WIRE_TYPES.items() if name != "u64f"}

_STRING_REPLY = {DT_DATABASE, DT_MEASUREMENT, DT_SERIES, DT_FIELD_NAME}
_U64_REPLY = {DT_TIME_FIRST, DT_TIME_LAST, DT_NPOINTS}


class WireClient:
    """Blocking TCP/TLS client; one socket, commands issued serially.

    ``credentials=(user, password)`` sends AUTHENTICATE as the first
    command — required by a TLS listener (``require_auth``), accepted by
    a plain one.  The server closes an auth-required connection WITHOUT
    a status frame on bad credentials (server.cc:1046-1066), which
    surfaces here as :class:`NotAuthenticated`.
    """

    def __init__(
        self,
        host: str = "localhost",
        port: int = 4000,
        *,
        credentials: tuple[str, str] | None = None,
        ssl_context: ssl_mod.SSLContext | None = None,
        timeout: float | None = 30.0,
    ):
        sock = socket.create_connection((host, port), timeout=timeout)
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, True)
        if ssl_context is not None:
            sock = ssl_context.wrap_socket(sock, server_hostname=host)
        self._sock: socket.socket | None = sock
        if credentials is not None and credentials[0] is not None:
            try:
                self.authenticate(*credentials)
            except BaseException:
                # Don't leak the connected socket when construction fails
                # (bad credentials / NotAuthenticated / timeout).
                self.close()
                raise

    # -- framing ----------------------------------------------------------
    def _recvall(self, size: int) -> bytes:
        buf = bytearray()
        while len(buf) < size:
            part = self._sock.recv(size - len(buf))
            if not part:
                raise ConnectionError("connection closed")
            buf.extend(part)
        return bytes(buf)

    @staticmethod
    def _s(dt: int, value: str) -> bytes:
        raw = value.encode()
        if len(raw) >= 1024:
            raise ValueError("string token too long (>= 1024 bytes)")
        return struct.pack("<IH", dt, len(raw)) + raw

    @staticmethod
    def _u64(dt: int, value: int) -> bytes:
        return struct.pack("<IQ", dt, value)

    def _cmd(self, ct: int, *frames: bytes) -> list[tuple[int, object]]:
        """Send one command, collect reply frames until the status frame;
        raise the mapped TsdbError on a nonzero status."""
        if self._sock is None:
            raise ConnectionError("client is closed")
        self._sock.sendall(
            struct.pack("<I", ct) + b"".join(frames) + struct.pack("<I", DT_END)
        )
        out: list[tuple[int, object]] = []
        while True:
            try:
                dt = struct.unpack("<I", self._recvall(4))[0]
            except ConnectionError:
                # auth-required listener: bad credentials close the
                # socket with no status frame
                if ct == CT_AUTHENTICATE:
                    raise NotAuthenticated("server closed the connection")
                raise
            if dt == DT_STATUS_CODE:
                code = struct.unpack("<i", self._recvall(4))[0]
                if code != 0:
                    raise error_for_code(code)
                return out
            if dt in _STRING_REPLY:
                ln = struct.unpack("<H", self._recvall(2))[0]
                if ln >= 1024:
                    raise ProtocolError("string reply too long")
                out.append((dt, self._recvall(ln).decode()))
            elif dt in _U64_REPLY:
                out.append((dt, struct.unpack("<Q", self._recvall(8))[0]))
            elif dt == DT_FIELD_TYPE:
                out.append((dt, struct.unpack("<I", self._recvall(4))[0]))
            else:
                raise ProtocolError(f"unexpected reply token {dt:#x}")

    # -- commands ---------------------------------------------------------
    def authenticate(self, username: str, password: str) -> None:
        self._cmd(
            CT_AUTHENTICATE,
            self._s(DT_USERNAME, username),
            self._s(DT_PASSWORD, password),
        )

    def nop(self) -> bool:
        self._cmd(CT_NOP)
        return True

    def create_database(self, database: str) -> None:
        self._cmd(CT_CREATE_DATABASE, self._s(DT_DATABASE, database))

    def create_measurement(
        self, database: str, measurement: str, fields: dict[str, str]
    ) -> None:
        typed = ",".join(f"{name}/{ftype}" for name, ftype in fields.items())
        self._cmd(
            CT_CREATE_MEASUREMENT,
            self._s(DT_DATABASE, database),
            self._s(DT_MEASUREMENT, measurement),
            self._s(DT_TYPED_FIELDS, typed),
        )

    def list_databases(self) -> list[str]:
        return [v for _, v in self._cmd(CT_LIST_DATABASES)]

    def list_measurements(self, database: str) -> list[str]:
        return [
            v for _, v in self._cmd(CT_LIST_MEASUREMENTS, self._s(DT_DATABASE, database))
        ]

    def list_series(self, database: str, measurement: str) -> list[str]:
        return [
            v
            for _, v in self._cmd(
                CT_LIST_SERIES,
                self._s(DT_DATABASE, database),
                self._s(DT_MEASUREMENT, measurement),
            )
        ]

    def active_series(
        self, database: str, measurement: str, t0: int, t1: int
    ) -> list[str]:
        return [
            v
            for _, v in self._cmd(
                CT_ACTIVE_SERIES,
                self._s(DT_DATABASE, database),
                self._s(DT_MEASUREMENT, measurement),
                self._u64(DT_TIME_FIRST, t0),
                self._u64(DT_TIME_LAST, t1),
            )
        ]

    def get_schema(self, database: str, measurement: str) -> list[tuple[str, str]]:
        frames = self._cmd(
            CT_GET_SCHEMA,
            self._s(DT_DATABASE, database),
            self._s(DT_MEASUREMENT, measurement),
        )
        # replies arrive as (FIELD_TYPE, wire_id), (FIELD_NAME, name) pairs
        out: list[tuple[str, str]] = []
        for (tdt, wid), (ndt, name) in zip(frames[::2], frames[1::2]):
            if tdt != DT_FIELD_TYPE or ndt != DT_FIELD_NAME:
                raise ProtocolError("malformed GET_SCHEMA reply")
            out.append((name, _TYPE_NAMES[wid]))
        return out

    def count_points(
        self, database: str, measurement: str, series: str, t0: int, t1: int
    ) -> dict[str, int]:
        frames = dict(
            self._cmd(
                CT_COUNT_POINTS,
                self._s(DT_DATABASE, database),
                self._s(DT_MEASUREMENT, measurement),
                self._s(DT_SERIES, series),
                self._u64(DT_TIME_FIRST, t0),
                self._u64(DT_TIME_LAST, t1),
            )
        )
        return {
            "time_first": frames[DT_TIME_FIRST],
            "time_last": frames[DT_TIME_LAST],
            "npoints": frames[DT_NPOINTS],
        }

    def delete_points(
        self, database: str, measurement: str, series: str, t: int
    ) -> None:
        self._cmd(
            CT_DELETE_POINTS,
            self._s(DT_DATABASE, database),
            self._s(DT_MEASUREMENT, measurement),
            self._s(DT_SERIES, series),
            self._u64(DT_TIME_LAST, t),
        )

    def integrate_points(
        self,
        database: str,
        measurement: str,
        series: str,
        fields,
        t0: int = 0,
        t1: int = 2**64 - 1,
    ) -> dict:
        """Trapezoid integral per field over [t0, t1]: reply is
        ``DT_TIME_FIRST/DT_TIME_LAST`` (u64 bounds actually integrated),
        ``DT_INTEGRAL_BITMAP`` (bit i set = field i NULL-poisoned) and
        ``DT_INTEGRALS`` carrying len(fields) f64s.  Returns
        {"t0_ns", "t1_ns", "<field>_integral": float | None}."""
        names = list(fields)
        self._sock.sendall(
            struct.pack("<I", CT_INTEGRATE_POINTS)
            + self._s(DT_DATABASE, database)
            + self._s(DT_MEASUREMENT, measurement)
            + self._s(DT_SERIES, series)
            + self._s(DT_FIELD_LIST, ",".join(names))
            + self._u64(DT_TIME_FIRST, t0)
            + self._u64(DT_TIME_LAST, t1)
            + struct.pack("<I", DT_END)
        )
        tf = tl = bitmap = 0
        vals: list[float] = []
        while True:
            dt = struct.unpack("<I", self._recvall(4))[0]
            if dt == DT_STATUS_CODE:
                code = struct.unpack("<i", self._recvall(4))[0]
                if code != 0:
                    raise error_for_code(code)
                break
            if dt == DT_TIME_FIRST:
                tf = struct.unpack("<Q", self._recvall(8))[0]
            elif dt == DT_TIME_LAST:
                tl = struct.unpack("<Q", self._recvall(8))[0]
            elif dt == DT_INTEGRAL_BITMAP:
                bitmap = struct.unpack("<Q", self._recvall(8))[0]
            elif dt == DT_INTEGRALS:
                vals = list(
                    struct.unpack(f"<{len(names)}d", self._recvall(8 * len(names)))
                )
            else:
                raise ProtocolError(f"unexpected INTEGRATE reply token {dt:#x}")
        out: dict = {"t0_ns": tf, "t1_ns": tl}
        for i, f in enumerate(names):
            out[f + "_integral"] = None if bitmap & (1 << i) else vals[i]
        return out

    # -- chunked data paths -------------------------------------------------
    def _select(
        self,
        ct: int,
        nt: int,
        database: str,
        measurement: str,
        series: str,
        fields,
        t0: int,
        t1: int,
        n: int,
    ):
        """Shared SELECT_LIMIT / SELECT_LAST body: stream DT_CHUNK frames
        (``u64 ts[n]`` then per-field validity bitmap + values + pad8 —
        the server's ``_send_select_chunks`` layout) into one pandas
        frame.  NULLs come back as pandas NA via nullable dtypes."""
        import pandas as pd

        schema = self.get_schema(database, measurement)
        names = list(fields) if fields else [f for f, _ in schema]
        types = dict(schema)
        self._sock.sendall(
            struct.pack("<I", ct)
            + self._s(DT_DATABASE, database)
            + self._s(DT_MEASUREMENT, measurement)
            + self._s(DT_SERIES, series)
            + self._s(DT_FIELD_LIST, ",".join(names))
            + self._u64(DT_TIME_FIRST, t0)
            + self._u64(DT_TIME_LAST, t1)
            + self._u64(nt, n)
            + struct.pack("<I", DT_END)
        )
        parts: list = []
        while True:
            dt = struct.unpack("<I", self._recvall(4))[0]
            if dt == DT_END:
                continue  # end of chunk stream; status frame follows
            if dt == DT_STATUS_CODE:
                code = struct.unpack("<i", self._recvall(4))[0]
                if code != 0:
                    raise error_for_code(code)
                break
            if dt != DT_CHUNK:
                raise ProtocolError(f"unexpected SELECT reply token {dt:#x}")
            npoints, bitmap_offset, data_len = struct.unpack(
                "<III", self._recvall(12)
            )
            data = self._recvall(data_len)
            off = 0
            ts = np.frombuffer(data, dtype="<u8", count=npoints, offset=off)
            off += 8 * npoints
            cols: dict[str, object] = {"time_ns": ts.astype("int64")}
            for f in names:
                _wid, size, np_dtype = _WIRE_TYPES[types[f]]
                bm_words = -(-(bitmap_offset + npoints) // 64)
                valid = _unpack_bitmap(
                    data[off:off + bm_words * 8], bitmap_offset, npoints
                )
                off += bm_words * 8
                vals = np.frombuffer(data, dtype=np_dtype, count=npoints, offset=off)
                vlen = size * npoints
                off += vlen + _pad8(vlen)
                if types[f] in ("f32", "f64"):
                    out = vals.astype("float64" if types[f] == "f64" else "float32")
                    out = pd.array(out, dtype="Float64" if types[f] == "f64" else "Float32")
                elif types[f] == "bool":
                    out = pd.array(vals.astype(bool), dtype="boolean")
                else:
                    pd_dtype = {"u32": "UInt32", "u64": "UInt64", "u64f": "UInt64",
                                "i32": "Int32", "i64": "Int64"}[types[f]]
                    out = pd.array(vals, dtype=pd_dtype)
                out[~valid] = None
                cols[f] = out
            parts.append(pd.DataFrame(cols))
        if not parts:
            # empty result still carries every requested column (typed),
            # so callers can index fields without special-casing
            empty = {"time_ns": pd.array([], dtype="int64")}
            pd_dtypes = {"f32": "Float32", "f64": "Float64", "bool": "boolean",
                         "u32": "UInt32", "u64": "UInt64", "u64f": "UInt64",
                         "i32": "Int32", "i64": "Int64"}
            for f in names:
                empty[f] = pd.array([], dtype=pd_dtypes[types[f]])
            return pd.DataFrame(empty)
        return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)

    def select_points_limit(
        self,
        database: str,
        measurement: str,
        series: str,
        fields=None,
        t0: int = 0,
        t1: int = 2**64 - 1,
        n: int = 2**64 - 1,
    ):
        return self._select(
            CT_SELECT_POINTS_LIMIT, DT_NLIMIT,
            database, measurement, series, fields, t0, t1, n,
        )

    def select_points_last(
        self,
        database: str,
        measurement: str,
        series: str,
        fields=None,
        t0: int = 0,
        t1: int = 2**64 - 1,
        n: int = 100,
    ):
        return self._select(
            CT_SELECT_POINTS_LAST, DT_NLAST,
            database, measurement, series, fields, t0, t1, n,
        )

    def write_points(self, database: str, measurement: str, series: str, pdf) -> None:
        """Append a pandas batch under the DT_READY_FOR_CHUNK credit
        handshake (one chunk per credit, DT_END closes).  ``pdf`` needs
        ``time_ns`` plus the measurement's fields; missing/NA values
        write as NULL (validity bitmap).  Chunks split so the data
        section stays within the server's advertised credit."""
        schema = self.get_schema(database, measurement)
        n_total = len(pdf)
        ts_all = np.asarray(pdf["time_ns"], dtype="<u8")
        cols = []
        row_bytes = 8
        for name, ftype in schema:
            _wid, size, np_dtype = _WIRE_TYPES[ftype]
            if name in pdf.columns:
                s = pdf[name]
                valid = ~np.asarray(s.isna())
                if ftype in ("u64", "u64f"):
                    # Decimal (u64f) / full-range ints: numpy can't cast
                    # object Decimals — go through int() with the
                    # two's-complement mask, exactly like the server's
                    # _pack_walfields u64 lane
                    vals = np.fromiter(
                        (
                            0 if not ok else int(v) & 0xFFFFFFFFFFFFFFFF
                            for v, ok in zip(s, valid)
                        ),
                        dtype="<u8",
                        count=n_total,
                    )
                else:
                    filled = s.fillna(0 if ftype != "bool" else False)
                    vals = np.asarray(filled, dtype=np_dtype)
            else:
                valid = np.zeros(n_total, dtype=bool)
                vals = np.zeros(n_total, dtype=np_dtype)
            cols.append((vals, valid, size))
            row_bytes += size + 1  # + bitmap amortized
        self._sock.sendall(
            struct.pack("<I", CT_WRITE_POINTS)
            + self._s(DT_DATABASE, database)
            + self._s(DT_MEASUREMENT, measurement)
            + self._s(DT_SERIES, series)
        )
        sizes = [size for _vals, _valid, size in cols]

        def _chunk_bytes(n: int) -> int:
            # Actual encoded size: ts u64[n] + per field bitmap (u64
            # words) + values + pad8.
            total = 8 * n
            for size in sizes:
                vb = size * n
                total += 8 * ((n + 63) // 64) + vb + _pad8(vb)
            return total

        sent = 0
        while True:
            dt = struct.unpack("<I", self._recvall(4))[0]
            if dt == DT_STATUS_CODE:
                # Server aborted mid-stream (e.g. OutOfOrderTimestamps
                # after a flushed chunk group — server.cc write path).
                # Surface the real status like the reference client's
                # _write_points_chunk does, instead of a generic
                # protocol error that leaves the i32 unread.
                code = struct.unpack("<i", self._recvall(4))[0]
                if code != 0:
                    raise error_for_code(code)
                raise ProtocolError("unexpected OK status mid-write")
            if dt != DT_READY_FOR_CHUNK:
                raise ProtocolError(f"expected READY_FOR_CHUNK, got {dt:#x}")
            credit = struct.unpack("<I", self._recvall(4))[0]
            if sent >= n_total:
                self._sock.sendall(struct.pack("<I", DT_END))
                break
            n = min(n_total - sent, max(1, credit // max(row_bytes, 1)))
            # row_bytes amortizes the bitmap at 1 byte/row, which
            # underestimates for tiny credits (bitmap words + pad8 cost
            # 8-15 bytes per field regardless of n) — shrink n until the
            # exact encoded size fits rather than overrunning the credit.
            while n > 1 and _chunk_bytes(n) > credit:
                n = max(1, (n * credit) // _chunk_bytes(n))
            body = ts_all[sent:sent + n].tobytes()
            for vals, valid, size in cols:
                body += _pack_bitmap(valid[sent:sent + n])
                vb = vals[sent:sent + n].tobytes()
                body += vb + b"\x00" * _pad8(len(vb))
            if len(body) > credit:
                # Only reachable when even a single row exceeds the
                # advertised credit — nothing smaller exists to send.
                raise ProtocolError("single-row chunk exceeds server credit")
            self._sock.sendall(
                struct.pack("<IIII", DT_CHUNK, n, 0, len(body)) + body
            )
            sent += n
        dt = struct.unpack("<I", self._recvall(4))[0]
        if dt != DT_STATUS_CODE:
            raise ProtocolError(f"expected status frame, got {dt:#x}")
        code = struct.unpack("<i", self._recvall(4))[0]
        if code != 0:
            raise error_for_code(code)

    def sum_points(
        self,
        database: str,
        measurement: str,
        series: str,
        window_ns: int,
        fields=None,
        t0: int = 0,
        t1: int = 2**64 - 1,
    ):
        """Windowed sum/min/max/count per field: decode DT_SUMS_CHUNK
        frames (``ts[n]`` + per-field sums f64 + mins + maxs as
        wal-field words + counts u64).  Empty windows (count 0) report
        None min/max — the wire carries the reference's untouched
        accumulator sentinels there."""
        import pandas as pd

        schema = self.get_schema(database, measurement)
        names = list(fields) if fields else [f for f, _ in schema]
        types = dict(schema)
        self._sock.sendall(
            struct.pack("<I", CT_SUM_POINTS)
            + self._s(DT_DATABASE, database)
            + self._s(DT_MEASUREMENT, measurement)
            + self._s(DT_SERIES, series)
            + self._s(DT_FIELD_LIST, ",".join(names))
            + self._u64(DT_TIME_FIRST, t0)
            + self._u64(DT_TIME_LAST, t1)
            + self._u64(DT_WINDOW_NS, window_ns)
            + struct.pack("<I", DT_END)
        )
        rows: dict[str, list] = {"wstart": []}
        for f in names:
            for suffix in ("_sum", "_min", "_max", "_count"):
                rows[f + suffix] = []
        while True:
            dt = struct.unpack("<I", self._recvall(4))[0]
            if dt == DT_END:
                continue
            if dt == DT_STATUS_CODE:
                code = struct.unpack("<i", self._recvall(4))[0]
                if code != 0:
                    raise error_for_code(code)
                break
            if dt != DT_SUMS_CHUNK:
                raise ProtocolError(f"unexpected SUM reply token {dt:#x}")
            n = struct.unpack("<H", self._recvall(2))[0]
            # body: ts u64[n] + per field (sums f64[n] + min words[n] +
            # max words[n] + counts u64[n]) — all 8-byte lanes
            body = self._recvall(8 * n * (1 + 4 * len(names)))
            off = 0
            ts = np.frombuffer(body, dtype="<u8", count=n, offset=off)
            rows["wstart"].extend(int(x) for x in ts)
            off += 8 * n
            sums = {}
            for f in names:
                sums[f] = np.frombuffer(body, dtype="<f8", count=n, offset=off)
                off += 8 * n
            wal: dict[tuple, np.ndarray] = {}
            for kind in (0, 1):
                for f in names:
                    words = np.frombuffer(body, dtype="<u8", count=n, offset=off)
                    off += 8 * n
                    _wid, size, np_dtype = _WIRE_TYPES[types[f]]
                    step = 8 // size
                    wal[(f, kind)] = words.view(np_dtype)[::step]
            for f in names:
                counts = np.frombuffer(body, dtype="<u8", count=n, offset=off)
                off += 8 * n
                for i in range(n):
                    c = int(counts[i])
                    rows[f + "_count"].append(c)
                    rows[f + "_sum"].append(float(sums[f][i]) if c else None)
                    rows[f + "_min"].append(
                        wal[(f, 0)][i].item() if c else None
                    )
                    rows[f + "_max"].append(
                        wal[(f, 1)][i].item() if c else None
                    )
        return pd.DataFrame(rows)

    # -- lifecycle ----------------------------------------------------------
    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def __enter__(self) -> "WireClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
