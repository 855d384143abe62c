"""WireClient — a native Python client for the TsdbServer wire protocol.

The reference ships its own Python client
(``/root/reference/python/simple_tsdb/simple_tsdb/client.py``) and our
server is proven byte-compatible with it (tests/test_server.py drives
the reference client unchanged).  This module is the OTHER half of that
story: a client of our own speaking the same frames, so deployments
that only need the management/catalog surface (health probes, schema
tooling, the Flask app-context extension) carry zero reference code.

Scope: the catalog + scalar commands — CREATE/LIST databases and
measurements, GET_SCHEMA, LIST/ACTIVE series, COUNT, DELETE, NOP,
AUTHENTICATE (TLS AUTHENTICATE-first handshake included).  The chunked
bulk-data commands (SELECT/WRITE/SUM/INTEGRATE streams) are not here:
bulk data belongs on the Spark path (the in-process ``TsdbClient``) or
the reference client, both already covered by tests — a third chunk
codec would be surface without new semantics.

Wire grammar: ``server.py`` module docstring (tokens from the
reference's ``src/tsdbserver/tokens.h:13-60``); every command ends with
``DT_STATUS_CODE + i32``, 0 on success, which maps back through
:func:`simple_tsdb_spark.errors.error_for_code`.
"""

from __future__ import annotations

import socket
import ssl as ssl_mod
import struct

from simple_tsdb_spark.errors import NotAuthenticated, error_for_code
from simple_tsdb_spark.server import (
    CT_ACTIVE_SERIES,
    CT_AUTHENTICATE,
    CT_COUNT_POINTS,
    CT_CREATE_DATABASE,
    CT_CREATE_MEASUREMENT,
    CT_DELETE_POINTS,
    CT_GET_SCHEMA,
    CT_LIST_DATABASES,
    CT_LIST_MEASUREMENTS,
    CT_LIST_SERIES,
    CT_NOP,
    DT_DATABASE,
    DT_END,
    DT_FIELD_NAME,
    DT_FIELD_TYPE,
    DT_MEASUREMENT,
    DT_NPOINTS,
    DT_PASSWORD,
    DT_SERIES,
    DT_STATUS_CODE,
    DT_TIME_FIRST,
    DT_TIME_LAST,
    DT_TYPED_FIELDS,
    DT_USERNAME,
    ProtocolError,
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
            self.authenticate(*credentials)

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
