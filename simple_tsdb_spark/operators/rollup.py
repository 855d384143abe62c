"""Materialized rollups — continuous aggregates for coarse-window reads.

The reference recomputes every window aggregate from raw points at query
time (sum_op).  At 100 TB that is the wrong trade for dashboards: a
rollup table at a base resolution (e.g. 1 min) is ~10⁴× smaller than raw
and answers any window that is a multiple of the base *exactly*, because
sum/min/max/count re-aggregate losslessly:

    sum_W = Σ sum_w,  min_W = min(min_w),  max_W = max(max_w),
    count_W = Σ count_w        for the w-buckets inside each W-bucket.

(Means re-derive as sum/count — which is why the rollup stores sums, not
means.)

``materialize_rollup`` computes and stores the base rollup (partitioned by
series, sorted by wstart — same layout discipline as raw measurements);
``rollup_sum_points`` answers A2 queries from it; ``hybrid_sum_points``
unions rollup history with a pruned raw-tail aggregation so the rollup
only ever needs *finalized* buckets.  Incremental maintenance strategy:
periodically re-run materialize_rollup over the tail beyond the high-water
mark and append those finalized buckets (idempotent as long as a bucket is
appended exactly once — with Delta/Iceberg on the classpath this becomes a
MERGE on (series, wstart), which also tolerates reprocessing).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_tsdb_spark.operators.windowed import sum_points


def materialize_rollup(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    *,
    fields: Sequence[str],
    base_window_ns: int,
) -> None:
    """Write the base-resolution rollup table for a measurement."""
    agg = sum_points(df, fields=fields, window_ns=base_window_ns, emit_empty=False)
    (
        agg.repartition("series")
        .sortWithinPartitions("wstart")
        .write.mode("overwrite")
        .partitionBy("series")
        .parquet(out_path)
    )


def advance_rollup(
    spark: SparkSession,
    raw_df: DataFrame,
    rollup_path: str,
    *,
    fields: Sequence[str],
    base_window_ns: int,
) -> int:
    """Incrementally append newly *finalized* base buckets to the rollup.

    Finalized = buckets strictly before the bucket containing the raw
    data's max timestamp (that last bucket may still be receiving
    points).  Appends only buckets strictly after the rollup's high-water
    mark, so repeated calls are idempotent and never double-count.
    Returns the number of buckets appended.  This is the body a
    ``foreachBatch`` maintainer calls per micro-batch; on Delta/Iceberg
    it becomes a MERGE and tolerates bucket reprocessing too.

    Caveat: the high-water mark is global to the measurement.  A brand-new
    series whose first points lie below the global mark would be skipped;
    deployments expecting that pattern should track per-series marks (same
    code, grouped hwm) — our ingest ordering validation makes per-series
    time monotone, so existing series can't regress below the mark.
    """
    w = int(base_window_ns)
    max_t = raw_df.agg(F.max("time_ns")).first()[0]
    if max_t is None:
        return 0
    finalized_end = (int(max_t) // w) * w - 1  # last fully-closed bucket end
    try:
        hwm = spark.read.parquet(rollup_path).agg(F.max("wstart")).first()[0]
    except Exception:
        hwm = None
    lo = 0 if hwm is None else int(hwm) + w
    if lo > finalized_end:
        return 0
    fresh = sum_points(
        raw_df, fields=fields, t0=lo, t1=finalized_end, window_ns=w, emit_empty=False
    ).where(F.col("wstart") >= lo)
    n = fresh.count()
    if n:
        (
            fresh.repartition("series")
            .sortWithinPartitions("wstart")
            .write.mode("append")
            .partitionBy("series")
            .parquet(rollup_path)
        )
    return n


def hybrid_sum_points(
    spark: SparkSession,
    raw_df: DataFrame,
    rollup_path: str,
    *,
    fields: Sequence[str],
    base_window_ns: int,
    window_ns: int,
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Continuous-aggregate read: rollup for history, raw for the tail.

    The materialized rollup covers buckets up to its high-water mark;
    buckets at/after the mark aggregate live from raw points.  This is
    the classic continuous-aggregate + real-time union view: the
    streaming job only ever appends *finalized* base buckets, readers
    never see a half-built bucket, and the raw scan is pruned to the
    unfinalized tail (time pushdown does the work).
    """
    w = int(window_ns)
    if w % int(base_window_ns) != 0:
        raise ValueError("window_ns must be a positive multiple of base_window_ns")
    try:
        hwm_row = spark.read.parquet(rollup_path).agg(F.max("wstart")).first()
        hwm = hwm_row[0] if hwm_row and hwm_row[0] is not None else None
    except Exception:
        # missing or empty rollup (no files to infer a schema from) —
        # serve everything from raw
        hwm = None
    if hwm is None:
        return sum_points(
            raw_df, fields=fields, series=series, t0=t0, t1=t1, window_ns=w, emit_empty=False
        )
    # coarse buckets strictly before the one containing the high-water
    # mark come from the rollup; the rest aggregates from raw.
    boundary = (int(hwm) // w) * w
    hist = rollup_sum_points(
        spark, rollup_path, fields=fields, base_window_ns=base_window_ns,
        window_ns=w, series=series, t0=t0, t1=min(t1, boundary - 1),
    )
    tail = sum_points(
        raw_df, fields=fields, series=series, t0=max(t0, boundary), t1=t1,
        window_ns=w, emit_empty=False,
    ).select(hist.columns)
    return hist.unionByName(tail).orderBy("series", "wstart")


def rollup_sum_points(
    spark: SparkSession,
    rollup_path: str,
    *,
    fields: Sequence[str],
    base_window_ns: int,
    window_ns: int,
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """A2 over the rollup: exact for any ``window_ns`` that is a positive
    multiple of ``base_window_ns`` and aligned range endpoints.

    Reads base buckets instead of raw points — the scan is smaller by the
    points-per-bucket factor, and the shuffle keys are (series, coarse
    bucket) over pre-aggregated rows.
    """
    w = int(window_ns)
    if w % int(base_window_ns) != 0 or w <= 0:
        raise ValueError("window_ns must be a positive multiple of base_window_ns")
    df = spark.read.parquet(rollup_path)
    if series is not None:
        if isinstance(series, str):
            df = df.where(F.col("series") == series)
        else:
            df = df.where(F.col("series").isin(list(series)))
    df = df.where(F.col("wstart").between(int(t0), int(t1)))
    coarse = (F.col("wstart") - (F.col("wstart") % F.lit(w))).alias("wstart")
    aggs = [F.sum("window_npoints").alias("window_npoints")]
    for f in fields:
        aggs += [
            F.sum(F.col(f"{f}_sum")).alias(f"{f}_sum"),
            F.min(F.col(f"{f}_min")).alias(f"{f}_min"),
            F.max(F.col(f"{f}_max")).alias(f"{f}_max"),
            F.sum(F.col(f"{f}_count")).alias(f"{f}_count"),
        ]
    return (
        df.groupBy("series", coarse)
        .agg(*aggs)
        .orderBy("series", "wstart")
    )
