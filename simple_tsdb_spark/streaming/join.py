"""Stream-stream interval join — continuous pair matching.

The batch :func:`simple_tsdb_spark.operators.interval_join` finds all
same-series pairs within ±tol; this is the continuous version for two
live measurements (e.g. "alert when a click arrives within an hour of an
error").  It uses Spark's native stream-stream join with an event-time
range condition: with BOTH sides watermarked and the join condition
bounding right's event time to [left − tol, left + tol], Spark can prove
when a buffered row can never match again, so join state is bounded by
(watermark delay + tol) per side — the property that lets this run
forever against an unbounded 100 TB/day stream.  Without the time-range
condition the state would grow without bound (Spark rejects that plan in
append mode).

Semantics match the batch operator (inclusive |Δt| ≤ tol at µs event-time
resolution) — pinned by test_streaming_join equality against
``interval_join`` on the same data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    tol_ns: int,
    right_fields: Sequence[str],
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Continuous same-series pairs with |Δtime| ≤ ``tol_ns``.

    Both inputs are streaming measurement DataFrames (series, time_ns,
    fields...).  Output: left's columns plus ``match_time_ns``,
    ``{f}_match`` per right field, ``delta_ns`` — same shape as the batch
    operator.  ``tol_ns`` must be µs-aligned (event-time clocks are µs).
    """
    tol = int(tol_ns)
    if tol <= 0 or tol % 1000 != 0:
        raise ValueError("tol_ns must be positive and µs-aligned (tol % 1000 == 0)")

    def clocked(df: DataFrame, src_col: str, ts_name: str) -> DataFrame:
        # Integer division: a double division of a ~1.7e18 ns value
        # exceeds 2^53 and rounds, shifting clocks by ±1 µs and breaking
        # the exact-tol boundary vs the batch operator.
        ts = F.expr(f"timestamp_micros({src_col} div 1000)")
        return df.withColumn(ts_name, ts).withWatermark(ts_name, watermark_delay)

    lcols = left.columns
    l = clocked(left, "time_ns", "_lts")
    r = clocked(
        right.select(
            F.col("series").alias("_rseries"),
            F.col("time_ns").alias("match_time_ns"),
            *[F.col(f).alias(f"{f}_match") for f in right_fields],
        ),
        "match_time_ns",
        "_rts",
    )
    cond = (
        (F.col("series") == F.col("_rseries"))
        & (F.col("_rts") >= F.expr(f"_lts - INTERVAL {tol // 1000} MICROSECOND"))
        & (F.col("_rts") <= F.expr(f"_lts + INTERVAL {tol // 1000} MICROSECOND"))
    )
    return (
        l.join(r, cond, "inner")
        # The range condition runs on µs clocks; re-assert it on the exact
        # integer ns values so semantics are bit-identical to the batch op.
        .where(F.abs(F.col("time_ns") - F.col("match_time_ns")) <= tol)
        .select(
            *lcols,
            "match_time_ns",
            *[f"{f}_match" for f in right_fields],
            (F.col("time_ns") - F.col("match_time_ns")).alias("delta_ns"),
        )
    )
