"""TsdbServer — the reference's TCP wire protocol served by the Spark engine.

Closes the one deployment gap the in-process ``TsdbClient`` left open: a
network listener byte-compatible with the reference's own Python client
(``/root/reference/python/simple_tsdb/simple_tsdb/client.py``), so the
reference's tooling (Grafana bridge, push_queue, CLI scripts) can point at
this engine unchanged.

Wire contract (all little-endian, framed by 32-bit tokens):

* command/data token values — ``/root/reference/src/tsdbserver/tokens.h:13-60``
* command grammars (fixed token sequences per command) —
  ``server.cc:245-327``; string payloads are ``u16 len + bytes`` with
  ``len < 1024``, times/limits are ``u64`` (``tokens.h:parse_cmd``)
* every command ends with ``DT_STATUS_CODE + i32`` — 0 on success, the
  tsdb status code on engine errors (``tokens.h:parse_and_exec``)
* SELECT streams ``DT_CHUNK (npoints, bitmap_offset, data_len)`` frames:
  ``u64 ts[n]``, then per field ``u64 bitmap[] + values + pad8``
  (``server.cc:628-733``, client ``RXChunk``)
* WRITE_POINTS: server offers ``DT_READY_FOR_CHUNK + 10 MiB`` before each
  chunk; client ends with ``DT_END`` (``server.cc:556-607``)
* SUM streams ``DT_SUMS_CHUNK (u16 n)``: ``ts[n]`` + per-field sums f64 +
  mins + maxs + npoints u64, 1024 windows per frame (``server.cc:794-931``)
* the authenticated listener wraps the socket in TLS and requires
  ``CT_AUTHENTICATE`` as the first command; on auth failure the connection
  is closed without a status frame (``server.cc:963-1069``)

The engine behind the socket is the same ``TsdbClient`` used in-process;
the server is purely a codec + dispatch layer, so wire results inherit the
oracle-checked operator semantics.  Per-point Python cost lives only at
this network edge (bounded by the 10 MiB chunk contract), never in a Spark
job — cluster-side plans are untouched.
"""

from __future__ import annotations

import socket
import socketserver
import ssl
import struct
import threading
from decimal import Decimal

import numpy as np

from simple_tsdb_spark.client import TsdbClient
from simple_tsdb_spark.errors import TsdbError

# -- wire constants (tokens.h:13-60; public protocol identifiers) --------
CT_CREATE_DATABASE = 0x60545A42
CT_CREATE_MEASUREMENT = 0xBB632CE1
CT_WRITE_POINTS = 0xEAF5E003
CT_SELECT_POINTS_LIMIT = 0x7446C560
CT_SELECT_POINTS_LAST = 0x76CF2220
CT_DELETE_POINTS = 0xD9082F2C
CT_GET_SCHEMA = 0x87E5A959
CT_LIST_DATABASES = 0x29200D6D
CT_LIST_MEASUREMENTS = 0x0FEB1399
CT_LIST_SERIES = 0x7B8238D6
CT_ACTIVE_SERIES = 0xF3B5093D
CT_COUNT_POINTS = 0x0E329B19
CT_SUM_POINTS = 0x90305A39
CT_INTEGRATE_POINTS = 0x75120AD9
CT_NOP = 0x22CF1296
CT_AUTHENTICATE = 0x0995EBDA

DT_DATABASE = 0x39385A4F
DT_MEASUREMENT = 0xDC1F48F3
DT_SERIES = 0x4E873749
DT_TYPED_FIELDS = 0x02AC7330
DT_FIELD_LIST = 0xBB62ACC3
DT_CHUNK = 0xE4E8518F
DT_TIME_FIRST = 0x55BA37B4
DT_TIME_LAST = 0xC4EE45BA
DT_NLIMIT = 0xEEF2BB02
DT_NLAST = 0xD74F10A3
DT_END = 0x4E29ADCC
DT_STATUS_CODE = 0x8C8C07D9
DT_FIELD_TYPE = 0x7DB40C2A
DT_FIELD_NAME = 0x5C0D45C1
DT_READY_FOR_CHUNK = 0x6000531C
DT_NPOINTS = 0x5F469D08
DT_WINDOW_NS = 0x76F0C374
DT_SUMS_CHUNK = 0x53FC76FC
DT_INTEGRALS = 0x78760A3D
DT_INTEGRAL_BITMAP = 0xD3760722
DT_USERNAME = 0x6E39D1DE
DT_PASSWORD = 0x602E5B01

_STRING_TOKENS = {
    DT_DATABASE, DT_MEASUREMENT, DT_SERIES, DT_TYPED_FIELDS,
    DT_FIELD_LIST, DT_USERNAME, DT_PASSWORD,
}
_U64_TOKENS = {DT_TIME_FIRST, DT_TIME_LAST, DT_NLIMIT, DT_NLAST, DT_WINDOW_NS}

MAX_CHUNK_DATA_LEN = 10 * 1024 * 1024  # server.cc:582,595
SELECT_CHUNK_POINTS = 16384
SUMS_CHUNK_WINDOWS = 1024  # server.cc:817
SELECT_SEGMENT_POINTS = 1 << 20  # driver-memory bound per SELECT page

# engine type name -> (wire id, byte size, numpy dtype); identifiers and
# sizes from the reference's FIELD_TYPES table (client.py:110-118).
# u64f (engine extension, full-range u64) rides the u64 wire type.
_WIRE_TYPES: dict[str, tuple[int, int, str]] = {
    "bool": (1, 1, "u1"),
    "u32": (2, 4, "<u4"),
    "u64": (3, 8, "<u8"),
    "u64f": (3, 8, "<u8"),
    "f32": (4, 4, "<f4"),
    "f64": (5, 8, "<f8"),
    "i32": (6, 4, "<i4"),
    "i64": (7, 8, "<i8"),
}


# Empty-window min/max sentinels, matching the reference's accumulator
# init values that reach the wire untouched when a bucket has no points
# (sum_op.cc:40-71): (min_sentinel, max_sentinel) per field type.
_SUM_SENTINELS: dict[str, tuple] = {
    "bool": (1, 0),
    "u32": (2**32 - 1, 0),
    "u64": (2**64 - 1, 0),
    "u64f": (2**64 - 1, 0),
    "f32": (float("inf"), float("-inf")),
    "f64": (float("inf"), float("-inf")),
    "i32": (2**31 - 1, -(2**31)),
    "i64": (2**63 - 1, -(2**63)),
}


def _pack_walfields(vals: list, ftype: str, kind: int) -> bytes:
    """Encode one field's min (kind=0) or max (kind=1) column as
    wal_field words: the native-typed value occupies the LOW bytes of an
    8-byte little-endian word, high bytes zero — the memory layout of
    the reference's ``field_vector<wal_field>`` that tsdbserver sends
    verbatim (sum_op.h:32-33).  ``None`` (empty bucket) becomes the
    type's untouched accumulator sentinel."""
    _wire_id, size, np_dtype = _WIRE_TYPES[ftype]
    sentinel = _SUM_SENTINELS[ftype][kind]
    n = len(vals)
    words = np.zeros(n, dtype="<u8")
    view = words.view(np_dtype)
    step = 8 // size
    if ftype == "bool":
        native = np.fromiter(
            (sentinel if v is None else int(v) for v in vals), dtype="u1", count=n
        )
    elif ftype in ("u64", "u64f"):
        # int() handles Decimal (u64f) and plain ints; mask keeps the
        # two's-complement bytes for any stored-as-signed u64 value.
        native = np.fromiter(
            (
                sentinel if v is None else int(v) & 0xFFFFFFFFFFFFFFFF
                for v in vals
            ),
            dtype="<u8",
            count=n,
        )
    else:
        native = np.fromiter(
            (sentinel if v is None else v for v in vals), dtype=np_dtype, count=n
        )
    view[::step] = native
    return words.tobytes()


class ProtocolError(Exception):
    """Malformed frame — the reference tears the connection down (EINVAL
    from parse_cmd escapes process_stream); we do the same."""


def _pad8(n: int) -> int:
    return (8 - n % 8) % 8


def _pack_bitmap(valid: np.ndarray, offset: int = 0) -> bytes:
    """Validity bitmap: bit ``offset + i`` set when row i is non-NULL,
    padded to whole u64 words (client.py:160-185 Field.pack)."""
    bits = np.zeros(offset + len(valid), dtype=bool)
    bits[offset:] = valid
    packed = np.packbits(bits, bitorder="little").tobytes()
    words = -(-len(bits) // 64)
    return packed.ljust(words * 8, b"\x00")


def _unpack_bitmap(buf: bytes, offset: int, n: int) -> np.ndarray:
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), bitorder="little")
    return bits[offset:offset + n].astype(bool)


def _column_wire_arrays(arrow_col, wire_dtype: str) -> tuple[np.ndarray, np.ndarray]:
    """(values-with-NULLs-as-0, validity) as numpy from an Arrow column.

    Stays in Arrow (fill_null then to_numpy) — the pandas detour would
    promote int64-with-NULLs to float64 and silently round values >2^53.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = arrow_col.combine_chunks() if hasattr(arrow_col, "combine_chunks") else arrow_col
    valid = ~np.asarray(arr.is_null())
    if pa.types.is_decimal(arr.type):  # u64f rides the u64 wire type
        values = np.array(
            [0 if v is None else int(v) for v in arr.to_pylist()],
            dtype=np.dtype(wire_dtype),
        )
    else:
        fill = False if pa.types.is_boolean(arr.type) else 0
        filled = pc.fill_null(arr, fill).to_numpy(zero_copy_only=False)
        values = filled.astype(np.dtype(wire_dtype))
    return values, valid


class _Conn:
    """Blocking recv/send helpers over one (possibly TLS) socket."""

    def __init__(self, sock: socket.socket):
        self.sock = sock

    def recvall(self, size: int) -> bytes:
        buf = bytearray()
        while len(buf) < size:
            part = self.sock.recv(size - len(buf))
            if not part:
                raise ConnectionError("connection closed")
            buf.extend(part)
        return bytes(buf)

    def recv_u32(self) -> int:
        return struct.unpack("<I", self.recvall(4))[0]

    def recv_u16(self) -> int:
        return struct.unpack("<H", self.recvall(2))[0]

    def recv_u64(self) -> int:
        return struct.unpack("<Q", self.recvall(8))[0]

    def send(self, data: bytes) -> None:
        self.sock.sendall(data)

    def send_status(self, code: int) -> None:
        self.send(struct.pack("<Ii", DT_STATUS_CODE, code))


def _parse_tokens(conn: _Conn, grammar: tuple[int, ...]) -> list:
    """Fixed-grammar token parse (tokens.h:parse_cmd): strings are
    ``u16 len < 1024 + bytes``, times/limits ``u64``."""
    out: list = []
    for dt in grammar:
        got = conn.recv_u32()
        if got != dt:
            raise ProtocolError(f"expected token {dt:#x} got {got:#x}")
        if dt in _STRING_TOKENS:
            ln = conn.recv_u16()
            if ln >= 1024:
                raise ProtocolError("string token too long")
            out.append(conn.recvall(ln).decode())
        elif dt in _U64_TOKENS:
            out.append(conn.recv_u64())
        elif dt == DT_END:
            pass
        else:
            raise ProtocolError(f"unsupported grammar token {dt:#x}")
    return out


class TsdbServer:
    """Threaded TCP listener speaking the reference wire protocol.

    ``ssl_context``+``require_auth=True`` reproduces the reference's
    authenticated TLS listener (server.cc:963-1069): the socket is wrapped
    before any frame, the first command must be CT_AUTHENTICATE, and a
    failed auth closes the connection without a status frame.  With
    neither, this is the plaintext local listener (server.cc:952-961).
    """

    def __init__(
        self,
        spark,
        warehouse: str,
        host: str = "127.0.0.1",
        port: int = 0,
        *,
        require_auth: bool = False,
        ssl_context: ssl.SSLContext | None = None,
        write_flush_bytes: int = 32 * 1024 * 1024,
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.require_auth = require_auth
        self.ssl_context = ssl_context
        self.write_flush_bytes = int(write_flush_bytes)
        outer = self

        class _Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:  # pragma: no cover - thin shim
                outer._handle_socket(self.request)

        class _Server(socketserver.ThreadingTCPServer):
            daemon_threads = True
            allow_reuse_address = True

        self._server = _Server((host, port), _Handler)
        self.address = self._server.server_address
        self._thread: threading.Thread | None = None
        # Writer serialization, the analog of the reference's
        # open_or_create_and_lock_series (server.cc:578).  Keyed per
        # MEASUREMENT (coarser than the reference's per-series lock):
        # our writer maintains measurement-level sidecars (layout,
        # watermarks) that concurrent same-measurement writes would race
        # on.  Reads never take a lock (snapshot reads).
        self._write_locks: dict[tuple[str, str], threading.Lock] = {}
        self._write_locks_guard = threading.Lock()

    # -- lifecycle ------------------------------------------------------
    def start(self) -> "TsdbServer":
        self._thread = threading.Thread(
            target=self._server.serve_forever, name="tsdb-server", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._server.shutdown()
        self._server.server_close()
        if self._thread:
            self._thread.join(timeout=5)

    def __enter__(self) -> "TsdbServer":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- connection loop ------------------------------------------------
    def _handle_socket(self, sock: socket.socket) -> None:
        sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, True)
        try:
            if self.ssl_context is not None:
                sock = self.ssl_context.wrap_socket(sock, server_side=True)
            conn = _Conn(sock)
            client = TsdbClient(self.spark, self.warehouse, require_auth=self.require_auth)
            if self.require_auth:
                # First command MUST be AUTHENTICATE (server.cc:1028-1035);
                # on failure: close with no status frame (server.cc:1046-1066).
                ct = conn.recv_u32()
                if ct != CT_AUTHENTICATE:
                    return
                user, pw = _parse_tokens(
                    conn, (DT_USERNAME, DT_PASSWORD, DT_END)
                )
                if not client.authenticate(user, pw):
                    return
                conn.send_status(0)
            self._command_loop(conn, client)
        except (ConnectionError, ProtocolError, ssl.SSLError, OSError):
            pass  # reference: teardown on protocol/socket errors (tokens.h:241-248)
        finally:
            try:
                sock.close()
            except OSError:
                pass

    def _command_loop(self, conn: _Conn, client: TsdbClient) -> None:
        handlers = {
            CT_CREATE_DATABASE: self._h_create_database,
            CT_LIST_DATABASES: self._h_list_databases,
            CT_CREATE_MEASUREMENT: self._h_create_measurement,
            CT_GET_SCHEMA: self._h_get_schema,
            CT_LIST_MEASUREMENTS: self._h_list_measurements,
            CT_LIST_SERIES: self._h_list_series,
            CT_ACTIVE_SERIES: self._h_active_series,
            CT_COUNT_POINTS: self._h_count_points,
            CT_WRITE_POINTS: self._h_write_points,
            CT_DELETE_POINTS: self._h_delete_points,
            CT_SELECT_POINTS_LIMIT: self._h_select_limit,
            CT_SELECT_POINTS_LAST: self._h_select_last,
            CT_SUM_POINTS: self._h_sum_points,
            CT_INTEGRATE_POINTS: self._h_integrate,
            CT_NOP: self._h_nop,
            CT_AUTHENTICATE: self._h_authenticate,
        }
        while True:
            try:
                ct = conn.recv_u32()
            except ConnectionError:
                return
            handler = handlers.get(ct)
            if handler is None:
                return  # unknown command: drop connection (tokens.h:234-238)
            # parse_and_exec: handler streams its payload, then exactly one
            # status frame — 0 or the engine error code.
            try:
                handler(conn, client)
                conn.send_status(0)
            except TsdbError as e:
                conn.send_status(e.code)

    # -- catalog commands -----------------------------------------------
    def _h_create_database(self, conn: _Conn, client: TsdbClient) -> None:
        (db,) = _parse_tokens(conn, (DT_DATABASE, DT_END))
        client.create_database(db)

    def _h_list_databases(self, conn: _Conn, client: TsdbClient) -> None:
        _parse_tokens(conn, (DT_END,))
        for name in client.list_databases():
            raw = name.encode()
            conn.send(struct.pack("<IH", DT_DATABASE, len(raw)) + raw)

    def _h_create_measurement(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas, typed = _parse_tokens(
            conn, (DT_DATABASE, DT_MEASUREMENT, DT_TYPED_FIELDS, DT_END)
        )
        fields: dict[str, str] = {}
        for part in typed.split(","):
            name, _, ftype = part.partition("/")
            fields[name] = ftype
        client.create_measurement(db, meas, fields)

    def _h_get_schema(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas = _parse_tokens(conn, (DT_DATABASE, DT_MEASUREMENT, DT_END))
        for name, ftype in client.get_schema(db, meas):
            raw = name.encode()
            wire_id = _WIRE_TYPES[ftype][0]
            conn.send(
                struct.pack("<IIIH", DT_FIELD_TYPE, wire_id, DT_FIELD_NAME, len(raw))
                + raw
            )

    def _h_list_measurements(self, conn: _Conn, client: TsdbClient) -> None:
        (db,) = _parse_tokens(conn, (DT_DATABASE, DT_END))
        for name in client.list_measurements(db):
            raw = name.encode()
            conn.send(struct.pack("<IH", DT_MEASUREMENT, len(raw)) + raw)

    def _h_list_series(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas = _parse_tokens(conn, (DT_DATABASE, DT_MEASUREMENT, DT_END))
        for name in client.list_series(db, meas):
            raw = name.encode()
            conn.send(struct.pack("<IH", DT_SERIES, len(raw)) + raw)

    def _h_active_series(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas, t0, t1 = _parse_tokens(
            conn, (DT_DATABASE, DT_MEASUREMENT, DT_TIME_FIRST, DT_TIME_LAST, DT_END)
        )
        for name in client.active_series(db, meas, t0, t1):
            raw = name.encode()
            conn.send(struct.pack("<IH", DT_SERIES, len(raw)) + raw)

    def _h_nop(self, conn: _Conn, client: TsdbClient) -> None:
        _parse_tokens(conn, (DT_END,))
        client.nop()

    def _h_authenticate(self, conn: _Conn, client: TsdbClient) -> None:
        user, pw = _parse_tokens(conn, (DT_USERNAME, DT_PASSWORD, DT_END))
        if not client.authenticate(user, pw):
            from simple_tsdb_spark.errors import NotAuthenticated

            raise NotAuthenticated("bad credentials")

    # -- scalar data commands -------------------------------------------
    def _h_count_points(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas, series, t0, t1 = _parse_tokens(
            conn,
            (DT_DATABASE, DT_MEASUREMENT, DT_SERIES, DT_TIME_FIRST, DT_TIME_LAST, DT_END),
        )
        row = client.count_points(db, meas, series, t0, t1).collect()[0]
        # Empty range: engine reports NULL first/last (DIVERGENCES: empty-count
        # edge); the wire carries 0 there.
        conn.send(struct.pack("<IQ", DT_TIME_FIRST, row["time_first"] or 0))
        conn.send(struct.pack("<IQ", DT_TIME_LAST, row["time_last"] or 0))
        conn.send(struct.pack("<IQ", DT_NPOINTS, row["npoints"]))

    def _h_delete_points(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas, series, t = _parse_tokens(
            conn, (DT_DATABASE, DT_MEASUREMENT, DT_SERIES, DT_TIME_LAST, DT_END)
        )
        client.delete_points(db, meas, series, t)

    def _h_integrate(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas, series, field_list, t0, t1 = _parse_tokens(
            conn,
            (DT_DATABASE, DT_MEASUREMENT, DT_SERIES, DT_FIELD_LIST,
             DT_TIME_FIRST, DT_TIME_LAST, DT_END),
        )
        fields = [f for f in field_list.split(",") if f]
        rows = client.integrate_points(db, meas, series, fields, t0, t1).collect()
        if rows:
            row = rows[0]
            tf, tl = row["t0_ns"], row["t1_ns"]
            integrals = [row[f"{f}_integral"] for f in fields]
        else:
            tf, tl = 0, 0
            integrals = [None] * len(fields)
        bitmap = 0
        vals = []
        for i, v in enumerate(integrals):
            if v is None:
                bitmap |= 1 << i  # NULL-poisoned field (IntegralResult bitmap)
                vals.append(0.0)
            else:
                vals.append(float(v))
        conn.send(struct.pack("<IQ", DT_TIME_FIRST, tf))
        conn.send(struct.pack("<IQ", DT_TIME_LAST, tl))
        conn.send(struct.pack("<IQ", DT_INTEGRAL_BITMAP, bitmap))
        conn.send(struct.pack("<I", DT_INTEGRALS) + struct.pack(f"<{len(vals)}d", *vals))

    # -- SELECT streaming -----------------------------------------------
    def _send_select_chunks(self, conn: _Conn, tbl, fields, schema) -> int:
        """Pack one Arrow table as DT_CHUNK frames; returns rows sent."""
        n_total = tbl.num_rows
        if n_total == 0:
            return 0
        ts_all = np.asarray(tbl.column("time_ns").combine_chunks()).astype("<u8")
        cols = []
        for f in fields:
            wire_dtype = _WIRE_TYPES[schema[f]][2]
            cols.append(_column_wire_arrays(tbl.column(f), wire_dtype))
        for start in range(0, n_total, SELECT_CHUNK_POINTS):
            n = min(SELECT_CHUNK_POINTS, n_total - start)
            body = ts_all[start:start + n].tobytes()
            for values, valid in cols:
                body += _pack_bitmap(valid[start:start + n])
                vb = values[start:start + n].tobytes()
                body += vb + b"\x00" * _pad8(len(vb))
            conn.send(struct.pack("<IIII", DT_CHUNK, n, 0, len(body)))
            conn.send(body)
        return n_total

    def _stream_select(self, conn: _Conn, client: TsdbClient, df, db, meas, fields) -> None:
        """Chunked DT_CHUNK frames from a bounded result DataFrame
        (LAST-N path: the client names N explicitly, so one driver-side
        Arrow materialization is the memory contract the caller chose)."""
        schema = dict(client.get_schema(db, meas))
        self._send_select_chunks(conn, df.toArrow(), fields, schema)
        conn.send(struct.pack("<I", DT_END))

    def _select_args(self, conn: _Conn, nt: int):
        return _parse_tokens(
            conn,
            (DT_DATABASE, DT_MEASUREMENT, DT_SERIES, DT_FIELD_LIST,
             DT_TIME_FIRST, DT_TIME_LAST, nt, DT_END),
        )

    def _h_select_limit(self, conn: _Conn, client: TsdbClient) -> None:
        """SELECT streams in time-paginated segments: each segment is an
        ordered LIMIT query whose time predicate pushes to the parquet
        scan (sorted row groups → stat pruning), materialized via Arrow
        and packed vectorized — so an UNBOUNDED select over a huge
        series holds at most ``SELECT_SEGMENT_POINTS`` rows on the
        driver.  Pagination on ``time_ns`` is exact because timestamps
        are unique within a series (the reference's own invariant).  A
        dashboard-scale select fits one segment = one job, identical to
        the unpaginated path."""
        db, meas, series, field_list, t0, t1, n = self._select_args(conn, DT_NLIMIT)
        fields = [f for f in field_list.split(",") if f]
        # The reference client sends NLIMIT=2^64-1 for "unbounded"; Spark's
        # limit() is int32, so anything past that range means no limit.
        remaining = n if n < 2**31 else None
        fields_out = fields or [c for c, _ in client.get_schema(db, meas)]
        schema = dict(client.get_schema(db, meas))
        seg_t0 = t0
        while True:
            n_seg = (
                SELECT_SEGMENT_POINTS
                if remaining is None
                else min(remaining, SELECT_SEGMENT_POINTS)
            )
            df = client.select_points_limit(
                db, meas, series, fields or None, seg_t0, t1, n_seg
            )
            tbl = df.toArrow()
            sent = self._send_select_chunks(conn, tbl, fields_out, schema)
            if remaining is not None:
                remaining -= sent
            if sent < n_seg or (remaining is not None and remaining <= 0):
                break
            seg_t0 = int(tbl.column("time_ns")[-1].as_py()) + 1
        conn.send(struct.pack("<I", DT_END))

    def _h_select_last(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas, series, field_list, t0, t1, n = self._select_args(conn, DT_NLAST)
        fields = [f for f in field_list.split(",") if f]
        df = client.select_points_last(db, meas, series, fields or None, t0, t1, min(n, 2**31 - 1))
        self._stream_select(conn, client, df, db, meas, fields or [c for c, _ in client.get_schema(db, meas)])

    # -- SUM streaming ---------------------------------------------------
    def _h_sum_points(self, conn: _Conn, client: TsdbClient) -> None:
        """Stream DT_SUMS_CHUNK frames incrementally.

        The result is consumed through ``toLocalIterator`` in
        ``SUMS_CHUNK_WINDOWS``-sized batches, so a year-long 1 s-window
        SUM (~3e7 windows) never materializes as one driver-side frame —
        peak driver memory is one result partition + one chunk.  The
        windowed aggregate is globally ordered (``orderBy(series,
        wstart)``) so partition-order iteration preserves window order.
        """
        db, meas, series, field_list, t0, t1, window_ns = _parse_tokens(
            conn,
            (DT_DATABASE, DT_MEASUREMENT, DT_SERIES, DT_FIELD_LIST,
             DT_TIME_FIRST, DT_TIME_LAST, DT_WINDOW_NS, DT_END),
        )
        fields = [f for f in field_list.split(",") if f]
        schema = dict(client.get_schema(db, meas))
        df = client.sum_points(db, meas, series, window_ns, fields, t0, t1)
        batch: list = []
        for row in df.toLocalIterator(prefetchPartitions=True):
            batch.append(row)
            if len(batch) == SUMS_CHUNK_WINDOWS:
                self._send_sums_chunk(conn, batch, fields, schema)
                batch = []
        if batch:
            self._send_sums_chunk(conn, batch, fields, schema)
        conn.send(struct.pack("<I", DT_END))

    @staticmethod
    def _send_sums_chunk(conn: _Conn, rows: list, fields: list, schema: dict) -> None:
        """One DT_SUMS_CHUNK: ``ts[n]`` + per-field sums f64 + mins + maxs
        + counts u64.  Min/max are wal_field words — the field's native
        wire dtype in the LOW bytes of an 8-byte little-endian word
        (``sum_op.h:31-34``; the Grafana datasource decodes them natively,
        ``datasource.go:1841-1916``) — NOT f64 for every type."""
        n = len(rows)
        body = np.fromiter((r["wstart"] for r in rows), dtype="<u8", count=n).tobytes()
        for f in fields:
            body += np.fromiter(
                (float(r[f + "_sum"] or 0.0) for r in rows), dtype="<f8", count=n
            ).tobytes()
        for kind in (0, 1):  # 0 = mins, 1 = maxs
            suffix = "_min" if kind == 0 else "_max"
            for f in fields:
                body += _pack_walfields(
                    [r[f + suffix] for r in rows], schema[f], kind
                )
        for f in fields:
            body += np.fromiter(
                (r[f + "_count"] for r in rows), dtype="<u8", count=n
            ).tobytes()
        conn.send(struct.pack("<IH", DT_SUMS_CHUNK, n))
        conn.send(body)

    # -- WRITE_POINTS ----------------------------------------------------
    def _write_lock(self, db: str, meas: str) -> threading.Lock:
        with self._write_locks_guard:
            return self._write_locks.setdefault((db, meas), threading.Lock())

    def _h_write_points(self, conn: _Conn, client: TsdbClient) -> None:
        db, meas, series = _parse_tokens(conn, (DT_DATABASE, DT_MEASUREMENT, DT_SERIES))
        with self._write_lock(db, meas):
            self._write_points_locked(conn, client, db, meas, series)

    def _write_points_locked(
        self, conn: _Conn, client: TsdbClient, db: str, meas: str, series: str
    ) -> None:
        """Receive DT_CHUNK frames, committing in bounded groups.

        Staged chunk bytes are capped at ``write_flush_bytes``: once the
        cap is reached the group is validated and committed BEFORE the
        next DT_READY_FOR_CHUNK credit goes out, so an unbounded backfill
        (e.g. the reference push_queue draining history) can never grow
        driver memory past one group + one chunk.  This is the
        reference's own shape — chunks land in the WAL as they arrive
        (wal.cc), so a later chunk retransmitting points committed by an
        earlier group verifies-and-drops (wal.cc:87-246) rather than
        rejecting as an intra-batch duplicate.
        """
        import pandas as pd

        schema = client.get_schema(db, meas)
        chunks: list = []
        staged = 0

        def _flush() -> None:
            nonlocal chunks, staged
            if not chunks:
                return
            frames = [
                self._decode_chunk(schema, series, npoints, bitmap_offset, data)
                for npoints, bitmap_offset, data in chunks
            ]
            pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
            # pandas fast lane: pass-1 validation on the driver, ONE Spark
            # job for a monotone append (writer.py::write_points_pandas)
            client.write_points_pandas(db, meas, pdf)
            chunks, staged = [], 0

        while True:
            conn.send(struct.pack("<II", DT_READY_FOR_CHUNK, MAX_CHUNK_DATA_LEN))
            dt = conn.recv_u32()
            if dt == DT_END:
                break
            if dt != DT_CHUNK:
                raise ProtocolError("expected DT_CHUNK or DT_END")
            npoints, bitmap_offset, data_len = struct.unpack("<III", conn.recvall(12))
            if data_len > MAX_CHUNK_DATA_LEN:
                raise ProtocolError("chunk too large")
            chunks.append((npoints, bitmap_offset, conn.recvall(data_len)))
            staged += data_len
            if staged >= self.write_flush_bytes:
                _flush()
        _flush()

    @staticmethod
    def _decode_chunk(schema, series: str, npoints: int, bitmap_offset: int, data: bytes):
        """Inverse of Schema.pack_points (client.py:204-215): ``u64 ts[n]``
        then per schema field bitmap/values/pad.  Vectorized into a
        pandas frame (nullable extension arrays for int/bool NULLs) so
        the Spark hand-off rides Arrow, not per-row pickling — measured
        ~10x on the wire write path."""
        import pandas as pd

        off = 0
        ts = np.frombuffer(data, dtype="<u8", count=npoints, offset=off)
        off += 8 * npoints
        cols: dict[str, object] = {
            "series": np.full(npoints, series, dtype=object),
            "time_ns": ts.astype("int64"),
        }
        for name, ftype in schema:
            _wire_id, size, np_dtype = _WIRE_TYPES[ftype]
            bm_words = -(-(bitmap_offset + npoints) // 64)
            valid = _unpack_bitmap(data[off:off + bm_words * 8], bitmap_offset, npoints)
            off += bm_words * 8
            values = np.frombuffer(data, dtype=np.dtype(np_dtype), count=npoints, offset=off)
            nbytes = npoints * size
            off += nbytes + _pad8(nbytes)
            mask = ~valid
            if ftype == "f64":
                col = values.astype("float64").copy()
                col[mask] = np.nan
            elif ftype == "f32":
                col = values.astype("float32").copy()
                col[mask] = np.nan
            elif ftype == "bool":
                col = pd.arrays.BooleanArray(values.astype(bool), mask.copy())
            elif ftype == "u64f":
                col = np.array(
                    [None if m else Decimal(int(v)) for v, m in zip(values, mask)],
                    dtype=object,
                )
            else:
                col = pd.arrays.IntegerArray(values.astype("int64"), mask.copy())
            cols[name] = col
        return pd.DataFrame(cols)
