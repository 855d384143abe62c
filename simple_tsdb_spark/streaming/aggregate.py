"""Streaming tumbling-window aggregation — A2 as a continuous query.

The reference computes window aggregates only at query time; Spark's
Structured Streaming maintains them incrementally as data arrives, which
is what a dashboard over a 100 TB / high-rate measurement actually wants:
the aggregate state is O(#open windows × #series), not O(points).

Semantics vs batch ``sum_points``:
- same epoch-aligned tumbling windows (integer ``time_ns`` bucket math —
  wstart = time_ns - time_ns % window_ns — via a derived µs timestamp for
  the watermark clock);
- late data: rows older than the watermark are dropped — the streaming
  analog of the reference's ``time_first`` retention drop (wal.cc:70-85);
  bounded state instead of unbounded reprocessing;
- empty buckets are *not* emitted (no data, no trigger); the batch
  operator remains the source of truth for gap-filled reads.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.fractions import exact_ppm


def streaming_sum_points(
    stream: DataFrame,
    *,
    fields: Sequence[str],
    window_ns: int,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Continuous per-(series, window) sum/min/max/count over a streaming
    measurement DataFrame.  Append-mode compatible (finalized windows only
    once the watermark passes)."""
    w = int(window_ns)
    # Integer division: a double division of a ~1.7e18 ns value exceeds
    # 2^53 and rounds, shifting the event clock by ±1 µs — a boundary
    # point would then land in the wrong F.window group while its integer
    # wstart stays put, splitting one (series, wstart) result into two.
    ts = F.expr("timestamp_micros(time_ns div 1000)")
    src = stream.withColumn("_event_ts", ts).withWatermark("_event_ts", watermark_delay)
    bucket = (F.col("time_ns") - (F.col("time_ns") % F.lit(w))).alias("wstart")
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("window_npoints")]
    for f in fields:
        col = F.col(f)
        aggs += [
            F.sum(col.cast("double")).alias(f"{f}_sum"),
            F.min(col).alias(f"{f}_min"),
            F.max(col).alias(f"{f}_max"),
            F.count(col).alias(f"{f}_count"),
        ]
    # Group on the watermarked event-time window so state expires; surface
    # the exact integer wstart alongside (identical alignment: F.window is
    # epoch-aligned, like the reference's bucket math).
    if w % 1000 != 0:
        raise ValueError("streaming windows need µs-resolution window_ns (w % 1000 == 0)")
    win = F.window(
        "_event_ts",
        f"{w // 1_000_000_000} seconds" if w % 1_000_000_000 == 0 else f"{w // 1000} microseconds",
    )
    return (
        src.groupBy("series", win, bucket)
        .agg(*aggs)
        .drop("window")
    )


def _dur(ns: int) -> str:
    return (
        f"{ns // 1_000_000_000} seconds" if ns % 1_000_000_000 == 0 else f"{ns // 1000} microseconds"
    )


def streaming_hopping_mean(
    stream: DataFrame,
    *,
    field: str,
    window_ns: int,
    slide_ns: int,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Continuous hopping-window mean — the streaming twin of
    ``operators.hopping_mean``, via Spark-native sliding ``F.window``
    (each event updates its ``window/slide`` covering windows; state is
    O(#open windows × #series) and expires with the watermark).

    The sum accumulates in DECIMAL(28,6) exactly like the batch
    operator, so a finalized window's mean is bit-equal to the batch
    result regardless of arrival or reduction order.
    """
    w, s = int(window_ns), int(slide_ns)
    if w % s != 0:
        raise ValueError("window_ns must be a multiple of slide_ns")
    if w % 1000 != 0 or s % 1000 != 0:
        raise ValueError("streaming windows need µs-resolution durations")
    ts = F.expr("timestamp_micros(time_ns div 1000)")
    src = stream.withColumn("_event_ts", ts).withWatermark("_event_ts", watermark_delay)
    col = F.col(field)
    cnt = F.count(col)
    mean = F.when(cnt > 0, F.sum(col.cast("decimal(28,6)")).cast("double") / cnt)
    return (
        src.groupBy("series", F.window("_event_ts", _dur(w), _dur(s)))
        .agg(
            F.count(F.lit(1)).alias("npoints"),
            cnt.alias(f"{field}_count"),
            F.min(col).alias(f"{field}_min"),
            F.max(col).alias(f"{field}_max"),
            mean.alias(f"{field}_mean"),
        )
        .withColumn("wstart", F.expr("unix_micros(window.start) * 1000"))
        .drop("window")
        .select("series", "wstart", "npoints", f"{field}_count", f"{field}_min", f"{field}_max", f"{field}_mean")
    )


def streaming_sessionize(
    stream: DataFrame,
    *,
    gap_ns: int,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Continuous gap-based sessionization — the streaming twin of
    ``operators.timeseries.sessionize`` via Spark-native
    ``session_window`` (state merges adjacent windows and finalizes a
    session once the watermark passes its close; append-mode safe).

    Semantics note: the batch operator keeps two points in one session
    when ``Δt <= gap_ns`` while ``session_window`` merges on strict
    ``<``; event times are µs-resolution here, so passing ``gap+1µs``
    makes the native merge condition exactly ``Δt <= gap_ns``.  Emits
    (series, session_start, session_end, n_events) with the TRUE first/
    last event times (not the gap-padded window bounds); session_id is a
    batch notion (global per-series ordinal) and is omitted.
    """
    g = int(gap_ns)
    if g % 1000 != 0:
        raise ValueError("streaming sessions need µs-resolution gap_ns")
    ts = F.expr("timestamp_micros(time_ns div 1000)")
    src = stream.withColumn("_event_ts", ts).withWatermark("_event_ts", watermark_delay)
    gap_us = g // 1000 + 1
    return (
        src.groupBy("series", F.session_window("_event_ts", f"{gap_us} microseconds"))
        .agg(
            F.min("time_ns").alias("session_start"),
            F.max("time_ns").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .drop("session_window")
        .select("series", "session_start", "session_end", "n_events")
    )


def streaming_burn_rate(
    stream: DataFrame,
    *,
    error_series: str = "error",
    short_ns: int,
    long_ns: int,
    slide_ns: int,
    short_threshold: float,
    long_threshold: float,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Continuous multi-window burn-rate alerting — the streaming twin of
    ``operators.timeseries.burn_rate_alerts``: ONE native sliding
    ``F.window(long, slide)`` aggregation computes both granularities
    (the short window is a conditional sum on ``event_ts >= window.end −
    short``), finalized windows emit in append mode — label-for-label
    identical to the batch operator, which uses the same closed-left
    open-right convention.
    """
    s, w_s, w_l = int(slide_ns), int(short_ns), int(long_ns)
    for w in (w_s, w_l):
        if w % s != 0:
            raise ValueError("windows must be multiples of slide_ns")
        if w % 1000 != 0:
            raise ValueError("streaming windows need µs-resolution durations")
    ts = F.expr("timestamp_micros(time_ns div 1000)")
    src = stream.withColumn("_event_ts", ts).withWatermark("_event_ts", watermark_delay)
    win = F.window("_event_ts", _dur(w_l), _dur(s))
    e = (F.col("series") == error_series).cast("long")
    in_s = (
        F.col("_event_ts")
        >= F.expr(f"window.end - INTERVAL {w_s // 1000} MICROSECONDS")
    ).cast("long")
    agg = (
        src.select("series", "_event_ts", e.alias("_e"), win.alias("window"))
        .groupBy("window")
        .agg(
            F.sum(F.col("_e") * in_s).alias("short_errors"),
            F.sum(in_s).alias("short_total"),
            F.sum("_e").alias("long_errors"),
            F.count(F.lit(1)).alias("long_total"),
        )
        .withColumn("wend", F.expr("unix_micros(window.end) * 1000"))
        .drop("window")
    )
    # ppm integer grid — label-for-label with the batch twin's round-10
    # integer finals (exact cross-multiplied threshold test, no floats).
    ppm_s = exact_ppm(short_threshold, name="short_threshold")
    ppm_l = exact_ppm(long_threshold, name="long_threshold")
    return (
        agg.where(F.col("short_total") > 0)
        .where(
            (F.col("short_errors") * F.lit(1_000_000) >= F.lit(ppm_s) * F.col("short_total"))
            & (F.col("long_errors") * F.lit(1_000_000) >= F.lit(ppm_l) * F.col("long_total"))
        )
        .select(
            "wend",
            "short_errors",
            "short_total",
            F.expr("(1000000 * short_errors) div short_total").alias("short_rate_ppm"),
            "long_errors",
            "long_total",
            F.expr("(1000000 * long_errors) div long_total").alias("long_rate_ppm"),
        )
    )


def streaming_heatmap(
    stream: DataFrame,
    *,
    field: str,
    window_ns: int,
    lo: float,
    hi: float,
    nbins: int,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Continuous 2-D heatmap bins — the streaming twin of
    ``operators.timeseries.heatmap_bins``: per (series, tumbling window,
    clamped value bin) counts maintained incrementally (what a live
    Grafana heatmap panel consumes).  Same bin arithmetic as batch, so
    finalized cells are count-for-count identical.
    """
    w = int(window_ns)
    if w % 1000 != 0:
        raise ValueError("streaming windows need µs-resolution window_ns")
    width = (hi - lo) / nbins
    raw = F.floor((F.col(field) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("long")
    ts = F.expr("timestamp_micros(time_ns div 1000)")
    src = (
        stream.where(F.col(field).isNotNull())
        .withColumn("_event_ts", ts)
        .withWatermark("_event_ts", watermark_delay)
    )
    bucket = (F.col("time_ns") - (F.col("time_ns") % F.lit(w))).alias("wstart")
    return (
        src.groupBy("series", F.window("_event_ts", _dur(w)), bucket, bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .drop("window")
        .select("series", "wstart", "bin", "n")
    )
