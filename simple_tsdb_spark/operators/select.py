"""S1/S2 — time-range scans with LIMIT / LAST-N.

Reference behavior (``/root/reference/src/libtsdb/select_op.cc``):

- ``select_op_first`` (S1, select_op.cc:175-231): forward scan of one
  series over ``[t0, t1]``, projecting the requested fields, stopping after
  ``limit`` points.  Results are in ascending time order.
- ``select_op_last`` (S2, select_op.cc:233-371): the *last* N points of the
  range, still returned ascending.

Spark-first: both are pure DataFrame expressions.  Catalyst pushes the
series + time predicates into the Parquet scan (partition pruning on
``series``, row-group min/max pruning on ``time_ns`` — equivalent to the
reference's index binary search, select_op.cc:50-59), prunes columns to the
projection, and plans `TakeOrderedAndProject` for sort+limit so only N rows
per partition survive the local sort before the final merge.

At 100 TB: sort+limit on a time-pruned range is a per-partition top-K
(heap) followed by a driver-side merge of K-row partials, not a global
sort — the pushed-down time filter bounds the scanned rows, which is the
same reason the reference's LAST-N index seek is cheap.  For un-pruned
LAST-N over a huge range, ``select_last_points_probed`` pairs the coarse
time_bucket partition column with newest-first probing (library policy,
SURVEY.md §4.3.3) so the scan never touches old partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.timeutil import clamp_time_range
from simple_tsdb_spark.errors import DuplicateField, NoSuchField
from simple_tsdb_spark.sources.measurement import field_columns


def _base(
    df: DataFrame,
    series: str | Sequence[str] | None,
    fields: Sequence[str] | None,
    t0: int,
    t1: int,
    tiebreak: Sequence[str],
) -> tuple[DataFrame, list[str]]:
    t0, t1 = clamp_time_range(t0, t1)
    if fields is None or len(fields) == 0:
        # Empty projection = all fields in schema order (measurement.h:116-150).
        fields = field_columns(df)
    else:
        known = set(df.columns)
        unknown = [f for f in fields if f not in known]
        if unknown:
            raise NoSuchField(f"unknown fields: {unknown}")  # gen_entries NO_SUCH_FIELD
        if len(set(fields)) != len(fields):
            raise DuplicateField("duplicate field in projection")  # measurement.h:137-139
    out = df.where(F.col("time_ns").between(t0, t1))
    if series is not None:
        if isinstance(series, str):
            out = out.where(F.col("series") == series)
        else:
            out = out.where(F.col("series").isin(list(series)))
    cols = ["series", "time_ns", *fields]
    order = ["time_ns", *[t for t in tiebreak if t in cols]]
    return out.select(*cols), order


def select_points(
    df: DataFrame,
    *,
    series: str | Sequence[str] | None = None,
    fields: Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    limit: int | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SELECT fields FROM series WHERE t0 <= time_ns <= t1 [LIMIT n] — S1.

    ``tiebreak`` columns make the LIMIT cut deterministic when multiple
    points share a timestamp (cannot happen within one reference series —
    timestamps are unique per series — but can across series).
    """
    out, order = _base(df, series, fields, t0, t1, tiebreak)
    out = out.orderBy(*order)
    if limit is not None:
        out = out.limit(int(limit))
    return out


def select_last_points(
    df: DataFrame,
    *,
    series: str | Sequence[str] | None = None,
    fields: Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    last: int = 1,
    per_series: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SELECT ... LAST n — S2: the last ``n`` points of the range, ascending.

    ``per_series=True`` generalizes the reference (which queries one series
    at a time) to last-N *per series* via a ranking window — the idiomatic
    top-K-per-group plan (one shuffle on series, per-partition heap).
    """
    out, order = _base(df, series, fields, t0, t1, tiebreak)
    desc = [F.col(c).desc() for c in order]
    if per_series:
        from pyspark.sql import Window

        w = Window.partitionBy("series").orderBy(*desc)
        out = out.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= int(last)).drop("_rn")
        return out.orderBy("series", *order)
    # Single global LAST-N: TakeOrderedAndProject on the descending order,
    # then ascending re-sort of the tiny result (driver-sized, ≤ last rows).
    return out.orderBy(*desc).limit(int(last)).orderBy(*order)


def _bucket_dirs(
    measurement_path: str, series: str | Sequence[str] | None
) -> dict[str, list[int]]:
    """Per-series sorted time_bucket partition values, from the directory
    listing only (no file is opened — the same metadata op Spark's own
    partition discovery performs; on an object store this is one LIST)."""
    from urllib.parse import unquote

    from simple_tsdb_spark.fs import get_fs
    from simple_tsdb_spark.sources.writer import data_root

    root = data_root(measurement_path)
    fs = get_fs(root)
    allowed: set[str] | None = None
    if series is not None:
        allowed = {series} if isinstance(series, str) else set(series)
    out: dict[str, list[int]] = {}
    for sdir in fs.listdir(root):
        if not sdir.startswith("series="):
            continue
        sname = unquote(sdir[len("series=") :])
        if allowed is not None and sname not in allowed:
            continue
        bs = [
            int(bdir[len("time_bucket=") :])
            for bdir in fs.listdir(f"{root}/{sdir}")
            if bdir.startswith("time_bucket=")
        ]
        out[sname] = sorted(bs)
    return out


def _bucket_dirs_hashed(
    measurement_path: str, series: str | Sequence[str] | None, n_buckets: int
) -> list[int]:
    """Global sorted time_bucket values on a hashed-series layout.

    Listings scale with B × #time_buckets, never #series.  With a series
    restriction, only the series' own hash-bucket directories are listed.
    """
    from pyspark.sql import SparkSession

    from simple_tsdb_spark.fs import get_fs
    from simple_tsdb_spark.sources.writer import data_root

    root = data_root(measurement_path)
    fs = get_fs(root)
    wanted: set[int] | None = None
    if series is not None:
        names = [series] if isinstance(series, str) else list(series)
        # one tiny local job folds the literals' buckets (no table scan)
        spark = SparkSession.getActiveSession()
        row = spark.range(1).select(
            *[
                F.pmod(F.xxhash64(F.lit(s)), F.lit(int(n_buckets))).cast("int").alias(f"b{i}")
                for i, s in enumerate(names)
            ]
        ).first()
        wanted = set(row)
    buckets: set[int] = set()
    for sdir in fs.listdir(root):
        if not sdir.startswith("series_bucket="):
            continue
        if wanted is not None and int(sdir[len("series_bucket=") :]) not in wanted:
            continue
        for bdir in fs.listdir(f"{root}/{sdir}"):
            if bdir.startswith("time_bucket="):
                buckets.add(int(bdir[len("time_bucket=") :]))
    return sorted(buckets)


def tail_bucket_cutoff(
    spark: SparkSession,
    measurement_path: str,
    *,
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    last: int = 1,
    per_series: bool = False,
) -> int | None:
    """The oldest time_bucket the LAST-N query must scan, found by probing
    newest partitions first (the library policy promised in the module
    docstring — mirror of the reference's LAST-N index seek,
    select_op.cc:294-345).

    Buckets partition time totally (bucket = floor(time_ns/bucket_ns)), so
    the last N rows of the range provably live in the newest buckets that
    together hold ≥ N qualifying rows.  The probe widens geometrically
    (newest 1, 2, 4, … buckets), so it runs O(log #buckets) count jobs —
    each pruned to the probed directories — and the final scan reads ≤ 2×
    the tail it needs, independent of retention length.

    Returns None when the layout has no time bucketing (nothing to probe).
    """
    from simple_tsdb_spark.functions.timeutil import clamp_time_range
    from simple_tsdb_spark.sources.writer import _layout, data_root, series_bucket_pred

    layout = _layout(measurement_path)
    bucket_ns = layout.get("time_bucket_ns")
    if not bucket_ns:
        return None
    sbuckets = layout.get("series_buckets")
    t0c, t1c = clamp_time_range(t0, t1)
    lo_b = (t0c // bucket_ns) * bucket_ns
    hi_b = (t1c // bucket_ns) * bucket_ns
    raw = spark.read.parquet(data_root(measurement_path))
    if series is not None:
        raw = raw.where(
            F.col("series") == series
            if isinstance(series, str)
            else F.col("series").isin(list(series))
        )
        if sbuckets:
            raw = raw.where(series_bucket_pred(series, sbuckets))
    n_cands: int | None = None
    if sbuckets:
        buckets = [b for b in _bucket_dirs_hashed(measurement_path, series, sbuckets)
                   if lo_b <= b <= hi_b]
        if per_series:
            # Hash-bucket dirs hold many series, so the candidate set
            # can't come from the listing; count range-active series with
            # one column-pruned cluster job (ships a single scalar).
            n_cands = (
                raw.where(
                    F.col("time_bucket").between(lo_b, hi_b)
                    & F.col("time_ns").between(t0c, t1c)
                )
                .select("series").distinct().count()
            )
    else:
        by_series = _bucket_dirs(measurement_path, series)
        buckets = sorted({b for bs in by_series.values() for b in bs if lo_b <= b <= hi_b})
        if per_series:
            # Series whose partitions intersect the range — the candidate
            # set a per-series probe must satisfy (a series with
            # range-intersecting buckets but < last rows widens the probe
            # to its full extent).
            n_cands = sum(
                1 for bs in by_series.values() if any(lo_b <= b <= hi_b for b in bs)
            )
    if not buckets:
        return lo_b
    k = 1
    while True:
        cutoff = buckets[max(0, len(buckets) - k)]
        if cutoff == buckets[0]:
            return cutoff
        probe = raw.where(
            F.col("time_bucket").between(cutoff, hi_b)
            & F.col("time_ns").between(t0c, t1c)
        )
        if per_series:
            # Driver-light all-satisfied check: every probed row belongs to a
            # candidate series (rows live only in range-intersecting bucket
            # dirs — and on a hashed layout the candidate count was taken
            # over the same range), so "all candidates have >= last rows in
            # the window" is exactly "count of satisfied series == n_cands".
            # The reduction runs on the cluster and ships ONE scalar per
            # probe round — never an O(#series) row set.
            n_ok = (
                probe.groupBy("series")
                .agg(F.count(F.lit(1)).alias("n"))
                .where(F.col("n") >= last)
                .count()
            )
            if n_ok == n_cands:
                return cutoff
        elif probe.select("series").limit(int(last)).count() >= last:
            return cutoff
        k *= 2


def select_last_points_probed(
    spark: SparkSession,
    measurement_path: str,
    *,
    series: str | Sequence[str] | None = None,
    fields: Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    last: int = 1,
    per_series: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """S2 over a native time-bucketed measurement: LAST-N that scans only
    the newest partitions that can hold the answer (see
    ``tail_bucket_cutoff``).  Identical results to ``select_last_points``
    over the full range; the time_bucket predicate lands in the scan's
    PartitionFilters so directory-level pruning happens before any parquet
    footer is read.  Falls back to the plain plan on un-bucketed layouts.
    """
    from simple_tsdb_spark.functions.timeutil import clamp_time_range
    from simple_tsdb_spark.sources.measurement import read_measurement

    cutoff = tail_bucket_cutoff(
        spark, measurement_path, series=series, t0=t0, t1=t1, last=last, per_series=per_series
    )
    if cutoff is None:
        df = read_measurement(spark, measurement_path, t0=t0, t1=t1, series=series)
    else:
        _, t1c = clamp_time_range(t0, t1)
        from simple_tsdb_spark.sources.writer import _layout, data_root, series_bucket_pred

        layout = _layout(measurement_path)
        bucket_ns = layout["time_bucket_ns"]
        hi_b = (t1c // bucket_ns) * bucket_ns
        df = spark.read.parquet(data_root(measurement_path)).where(
            F.col("time_bucket").between(cutoff, hi_b)
        )
        sbuckets = layout.get("series_buckets")
        if sbuckets:
            if series is not None:
                df = df.where(series_bucket_pred(series, sbuckets))
            df = df.drop("series_bucket")
        df = df.drop("time_bucket")
    return select_last_points(
        df,
        series=series,
        fields=fields,
        t0=t0,
        t1=t1,
        last=last,
        per_series=per_series,
        tiebreak=tiebreak,
    )
