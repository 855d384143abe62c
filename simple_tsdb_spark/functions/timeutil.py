"""Nanosecond time helpers.

The reference keys every point by a u64 nanosecond timestamp and aligns
tumbling windows to epoch multiples of ``window_ns``
(``/root/reference/src/libtsdb/sum_op.cc:9-11``).  Spark's TimestampType is
microsecond-resolution, so ``time_ns: long`` stays the canonical ordering
key and window math is integer arithmetic — ``F.window`` is deliberately not
used (SURVEY.md §7.1).

Open upper bounds: the reference uses ``t1 = 2^64-1`` for "no upper bound"
(``python/simple_tsdb/simple_tsdb/client.py:1035``).  Spark longs are
signed, so the API edge clamps any ``t1 >= 2^63`` to ``MAX_TIME_NS``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Largest representable time: signed-long max.  u64 values above this are
# clamped at the API edge (SURVEY.md §7.4).
MAX_TIME_NS = (1 << 63) - 1


def clamp_time_range(t0: int, t1: int) -> tuple[int, int]:
    """Clamp a possibly-open u64 ``[t0, t1]`` range into signed-long space."""
    t0 = max(0, min(int(t0), MAX_TIME_NS))
    t1 = max(0, min(int(t1), MAX_TIME_NS))
    return t0, t1


def round_down_ns(value: int, multiple: int) -> int:
    """round_down_to_nearest_multiple (reference sum_op.cc:10)."""
    return (value // multiple) * multiple


def round_up_ns(value: int, multiple: int) -> int:
    """round_up_to_nearest_multiple (reference sum_op.cc:9)."""
    return -(-value // multiple) * multiple


def bucket_start(time_ns: Column, window_ns: int) -> Column:
    """Aligned tumbling-window start for a timestamp column.

    Matches the reference's epoch-aligned bucketing
    (``sum_op.cc:78-84``): window k covers ``[k*w, (k+1)*w)``.
    Integer math keeps this inside whole-stage codegen.
    """
    w = F.lit(int(window_ns))
    return (F.col(time_ns) if isinstance(time_ns, str) else time_ns).cast("long").__floordiv__(w) * w


def ts_to_ns(ts: Column) -> Column:
    """Convert a TimestampType column (µs precision) to epoch nanoseconds.

    Matches DuckDB ``epoch_ns(ts)`` when the Spark session timezone is UTC.
    """
    return (F.unix_micros(ts) * F.lit(1000)).cast("long")
