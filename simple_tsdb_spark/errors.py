"""Error taxonomy mirroring the reference's status codes.

The reference surfaces 29 numeric status codes over the wire
(``/root/reference/src/libtsdb/exception.h:13-44``, mirrored in its Python
client).  The applicable subset maps onto a ``TsdbError`` hierarchy so a
client switching from the reference can keep code-based error handling;
codes tied to its storage internals (tail files, chunk sizes, WAL chunk
lengths, fsync) have no analog here — Parquet/Spark own those failure
modes — and are listed as N/A below for the audit trail.

| reference code | here |
|---|---|
| OUT_OF_ORDER_TIMESTAMPS (-10) | OutOfOrderTimestamps |
| TIMESTAMP/FIELD/BITMAP_OVERWRITE_MISMATCH (-11..-13) | OverwriteMismatch (one code: row-level verify) |
| NO_SUCH_FIELD (-7) | NoSuchField |
| DUPLICATE_FIELD (-24) | DuplicateField |
| TOO_MANY_FIELDS (-25) | TooManyFields |
| NO_SUCH_DATABASE (-18) | NoSuchDatabase |
| NO_SUCH_MEASUREMENT (-19) | NoSuchMeasurement |
| NO_SUCH_SERIES (-17) | NoSuchSeries |
| MEASUREMENT_EXISTS (-20) | MeasurementExists |
| INVALID_MEASUREMENT/_SERIES (-4/-5) | InvalidName |
| USER_EXISTS / NO_SUCH_USER (-21/-22) | UserExists / NoSuchUser (D9) |
| IO / tail-file / chunk / WAL codes | N/A (storage engine replaced) |
| END_OF_SELECT (-8) | N/A (iterator protocol → DataFrames) |
"""

from __future__ import annotations


class TsdbError(Exception):
    """Base error; ``code`` carries the reference status-code value."""

    code: int = 0


class OutOfOrderTimestamps(TsdbError, ValueError):
    code = -10


class OverwriteMismatch(TsdbError, ValueError):
    code = -11


class NoSuchField(TsdbError, KeyError):
    code = -7


class DuplicateField(TsdbError, ValueError):
    code = -24


class TooManyFields(TsdbError, ValueError):
    code = -25


class NoSuchDatabase(TsdbError, FileNotFoundError):
    code = -18


class NoSuchMeasurement(TsdbError, FileNotFoundError):
    code = -19


class NoSuchSeries(TsdbError, KeyError):
    code = -17


class MeasurementExists(TsdbError, ValueError):
    code = -20


class InvalidName(TsdbError, ValueError):
    code = -4


class UserExists(TsdbError, ValueError):
    code = -21


class NoSuchUser(TsdbError, KeyError):
    code = -22


class NotAuthenticated(TsdbError, PermissionError):
    """Command issued before a successful AUTHENTICATE on a client that
    requires auth (server.cc:1021-1035: the first command on an
    authenticated listener must be AUTHENTICATE)."""

    code = -1  # the reference replies with a generic error status here


def error_for_code(code: int, message: str = "") -> TsdbError:
    """Status code (wire i32) -> the matching TsdbError instance — the
    inverse of the server's ``send_status(e.code)``, used by the wire
    client so code-based handling round-trips the network edge.  Unknown
    codes (reference storage-internal ones we never emit) come back as
    the base TsdbError with ``code`` preserved."""
    for cls in TsdbError.__subclasses__():
        if cls.code == code:
            return cls(message or cls.__name__)
    err = TsdbError(message or f"status code {code}")
    err.code = code
    return err
