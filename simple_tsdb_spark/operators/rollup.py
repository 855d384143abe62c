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


def _read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame | None:
    """Read the rollup table; ``None`` ONLY when it doesn't exist yet.

    Any other read failure re-raises: treating a transient IO error as
    "no rollup yet" would reset the high-water mark to NULL and re-append
    already-finalized buckets — silent double counting in every
    subsequent rollup read."""
    from pyspark.errors.exceptions.captured import AnalysisException

    from simple_tsdb_spark.fs import get_fs

    if not get_fs(rollup_path).exists(rollup_path):
        return None
    try:
        return spark.read.parquet(rollup_path)
    except AnalysisException as e:
        cond = getattr(e, "getCondition", getattr(e, "getErrorClass", lambda: None))()
        if cond in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            return None  # created-but-empty directory: no rollup yet
        raise


def materialize_rollup(
    spark: SparkSession,
    df: DataFrame,
    out_path: str,
    *,
    fields: Sequence[str],
    base_window_ns: int,
    exact: bool = False,
    series_buckets: int | None = None,
) -> None:
    """Write the base-resolution rollup table for a measurement.

    ``exact`` stores the sums as decimals: decimal partials re-aggregate
    associatively, so any coarse window derived from the rollup is
    bit-identical to aggregating the raw points in decimal (the property
    the hybrid driver query's oracle hash relies on).

    ``series_buckets=B`` stores the rollup in the hashed-series layout
    (see sources/writer.py) — mandatory at very high series cardinality,
    where one directory per series would explode the rollup's namespace
    too.  Recorded in the rollup's own layout.json; ``advance_rollup``
    follows it."""
    # sort=False: _write_rollup repartitions by series immediately, so
    # sum_points' presentation orderBy would be a wasted global
    # range-partition sort of the whole rollup (r15; strict win at every
    # scale — rows are identical, layout comes from the write path).
    agg = sum_points(
        df, fields=fields, window_ns=base_window_ns, emit_empty=False,
        exact=exact, decimal_sums=exact, sort=False,
    )
    _write_rollup(agg, out_path, series_buckets, mode="overwrite")
    if series_buckets:
        from simple_tsdb_spark.sources.writer import _save_layout

        _save_layout(out_path, {"series_buckets": int(series_buckets)})


def _write_rollup(agg: DataFrame, out_path: str, series_buckets: int | None, *, mode: str) -> None:
    if series_buckets:
        from simple_tsdb_spark.sources.writer import series_bucket_expr

        (
            agg.withColumn("series_bucket", series_bucket_expr(series_buckets))
            .repartition(F.col("series_bucket"))
            .sortWithinPartitions("series", "wstart")
            .write.mode(mode)
            .partitionBy("series_bucket")
            .parquet(out_path)
        )
    else:
        (
            agg.repartition("series")
            .sortWithinPartitions("wstart")
            .write.mode(mode)
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

    Watermarks are tracked PER SERIES (each series' mark advances with its
    own max timestamp), so a slow or new series neither stalls the others
    nor gets skipped.  Correctness rests on the engine's ingest contract:
    per-series arrival is time-ordered (the reference's own rule, enforced
    by strict-mode write_points), so all points below a series' current
    max are present when its buckets finalize.  Unordered backfills must
    instead rebuild affected buckets (materialize_rollup, or Delta MERGE).
    """
    w = int(base_window_ns)
    per_max = raw_df.groupBy("series").agg(F.max("time_ns").alias("_mx"))
    bounds = per_max.withColumn(
        "_fin", (F.col("_mx") - (F.col("_mx") % F.lit(w))) - 1
    )
    rollup = _read_rollup(spark, rollup_path)
    if rollup is not None:
        marks = rollup.groupBy("series").agg(F.max("wstart").alias("_hwm"))
        bounds = bounds.join(marks, "series", "left")
    else:
        bounds = bounds.withColumn("_hwm", F.lit(None).cast("long"))
    bounds = bounds.withColumn(
        "_lo", F.coalesce(F.col("_hwm") + F.lit(w), F.lit(0))
    ).where(F.col("_lo") <= F.col("_fin")).select("series", "_lo", "_fin")
    # Driver-light: collect only the scalar range (one row), never the
    # per-series bound set — at 10^6 series that collect (and the isin
    # list it used to feed) would be the bottleneck.  The changed-series
    # restriction stays on the cluster as a broadcast semi join (which
    # dynamic partition pruning can push into the series-partitioned
    # scan), and the per-series [lo, fin] windows apply in the broadcast
    # inner join below.
    span = bounds.agg(
        F.min("_lo").alias("lo"), F.max("_fin").alias("fin")
    ).first()
    if span["lo"] is None:
        return 0
    pruned = raw_df.join(F.broadcast(bounds.select("series")), "series", "semi")
    # sort=False: fresh buckets are re-joined and re-partitioned by the
    # append write below — the inner presentation sort is wasted (r15).
    cand = sum_points(
        pruned,
        fields=fields,
        t0=int(span["lo"]),
        t1=int(span["fin"]),
        window_ns=w,
        emit_empty=False,
        sort=False,
    )
    fresh = (
        cand.join(F.broadcast(bounds), "series")
        .where((F.col("wstart") >= F.col("_lo")) & (F.col("wstart") <= F.col("_fin")))
        .drop("_lo", "_fin")
    )
    n = fresh.count()
    if n:
        from simple_tsdb_spark.sources.writer import _layout

        _write_rollup(
            fresh.drop("series_bucket"),
            rollup_path,
            _layout(rollup_path).get("series_buckets"),
            mode="append",
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
    exact: bool = False,
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
    rollup = _read_rollup(spark, rollup_path)
    if rollup is not None:
        # marks feeds THREE consumers (the emptiness probe and the two
        # bmarks broadcast joins below), and broadcast subplans never
        # share work — each would re-scan the rollup and re-aggregate.
        # A LAZY localCheckpoint lets the probe's count() materialize it
        # in the same job it already pays for; the broadcasts then read
        # the persisted rows (r15; the 5a04990 lazy-checkpoint trick).
        # Bounded at every scale: marks is one row per series.  (A
        # cheaper raw-scan CollectLimit emptiness probe was A/B-measured
        # a wash at sf0.1 — the probe job is not the bottleneck, r14.2.)
        marks = rollup.groupBy("series").agg(
            F.max("wstart").alias("_hwm")
        ).localCheckpoint(eager=False)
        have_rollup = marks.count() > 0
    else:
        have_rollup = False  # rollup not created yet — serve from raw
    if not have_rollup:
        return sum_points(
            raw_df, fields=fields, series=series, t0=t0, t1=t1, window_ns=w,
            emit_empty=False, exact=exact,
        )
    # Per series: coarse buckets strictly before the one containing that
    # series' high-water mark come from the rollup; the rest (and series
    # absent from the rollup entirely) aggregate from raw.
    boundary = (F.col("_hwm") - (F.col("_hwm") % F.lit(w))).alias("_boundary")
    bmarks = F.broadcast(marks.select("series", boundary))
    # sort=False on both legs: the hybrid result gets ONE final orderBy
    # after the union, so each leg's own presentation sort is a wasted
    # range-partition exchange + sort (r15; strict win at every scale).
    hist = (
        rollup_sum_points(
            spark, rollup_path, fields=fields, base_window_ns=base_window_ns,
            window_ns=w, series=series, t0=t0, t1=t1, sort=False,
        )
        .join(bmarks, "series")
        .where(F.col("wstart") < F.col("_boundary"))
        .drop("_boundary")
    )
    # Tail raw-scan pruning: when an explicit series set is requested and
    # every one has rollup history, the scalar lower bound min(boundary_s)
    # is safe to push into the raw scan (each series' own boundary filter
    # still applies after).  With series=None a brand-new series could
    # predate every mark, so the raw range stays unpruned for safety.
    t0_tail = t0
    if series is not None:
        wanted = [series] if isinstance(series, str) else list(series)
        # Collect only the REQUESTED series' marks — the driver
        # materialization is bounded by the caller's series list, never
        # by the measurement's total series count.
        mrows = {
            r["series"]: r["_boundary"]
            for r in marks.where(F.col("series").isin(wanted))
            .select("series", boundary)
            .collect()
        }
        if all(s in mrows for s in wanted):
            t0_tail = max(t0, min(mrows[s] for s in wanted))
    tail = (
        sum_points(
            raw_df, fields=fields, series=series, t0=t0_tail, t1=t1,
            window_ns=w, emit_empty=False, exact=exact, sort=False,
        )
        .join(bmarks, "series", "left")
        .where(
            F.col("_boundary").isNull() | (F.col("wstart") >= F.col("_boundary"))
        )
        .drop("_boundary")
        .select(hist.columns)
    )
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
    sort: bool = True,
) -> DataFrame:
    """A2 over the rollup: exact for any ``window_ns`` that is a positive
    multiple of ``base_window_ns`` and aligned range endpoints.
    ``sort=False`` skips the presentation orderBy (see ``sum_points``).

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
    dtypes = dict(df.dtypes)
    for f in fields:
        # Decimal-stored sums (exact rollups) re-aggregate exactly, then
        # surface as the contract's double; double-stored sums pass through.
        s = F.sum(F.col(f"{f}_sum"))
        if dtypes.get(f"{f}_sum", "").startswith("decimal"):
            s = s.cast("double")
        aggs += [
            s.alias(f"{f}_sum"),
            F.min(F.col(f"{f}_min")).alias(f"{f}_min"),
            F.max(F.col(f"{f}_max")).alias(f"{f}_max"),
            F.sum(F.col(f"{f}_count")).alias(f"{f}_count"),
        ]
    out = df.groupBy("series", coarse).agg(*aggs)
    return out.orderBy("series", "wstart") if sort else out
