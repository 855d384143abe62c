"""The measurement-table contract and source adapters.

Reference data model (``/root/reference/doc/README.txt:20-29``): a
*measurement* holds many *series*, each series an ordered set of points
``(time_ns, field1..fieldN)`` with per-field NULLs.  Spark mapping
(SURVEY.md §1.4): one DataFrame / Parquet dataset per measurement with

    series:  string   (tag / partition key, never null)
    time_ns: long     (u64 ns clamped to signed range, never null)
    <field>: nullable primitive (bool/int/long/float/double)

Physical layout for new tables (see sources/writer.py): Parquet partitioned
by ``series`` (plus an optional coarse time bucket for very long series),
sorted within partitions by ``time_ns`` so row-group min/max statistics
replicate the reference's chunk index (``series.h:11-28``) — Parquet
row-group pruning then serves the same role as its index binary search
(``select_op.cc:50-59``).

At 100 TB: series is the unit of parallelism in the reference
(``doc/LOCKING.txt:3-7``); here a single series can additionally be split
across many row groups / files, so one giant series no longer serializes a
scan.  A coarse ``time_bucket`` partition column (e.g. day) bounds the
file count per partition directory and gives partition-level pruning for
time predicates at the directory level, before row-group stats are even
consulted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Columns that are part of the measurement contract rather than fields.
META_COLUMNS = ("series", "time_ns", "time_bucket", "series_bucket")


def field_columns(df: DataFrame) -> list[str]:
    """The measurement's field names, in schema order (reference
    ``measurement.h:116-150`` — natural order when no projection given)."""
    return [c for c in df.columns if c not in META_COLUMNS]


def validate_measurement(df: DataFrame) -> DataFrame:
    """Assert the measurement contract on a DataFrame (cheap, schema-only)."""
    cols = set(df.columns)
    missing = {"series", "time_ns"} - cols
    if missing:
        raise ValueError(f"measurement is missing required columns: {sorted(missing)}")
    if dict(df.dtypes)["time_ns"] != "bigint":
        raise TypeError("time_ns must be LongType (nanoseconds since epoch)")
    return df


def read_measurement(
    spark: SparkSession,
    path: str,
    *,
    t0: int | None = None,
    t1: int | None = None,
    series=None,
) -> DataFrame:
    """Open a measurement previously written by sources/writer.py.

    If the measurement was written with a coarse ``time_bucket`` partition
    (writer ``time_bucket_ns``) and a query range is given, an equivalent
    partition predicate is applied here so directory-level pruning happens
    before any parquet footer is read — operators' exact ``time_ns``
    filters still apply on top.  Likewise, on a hashed-series layout
    (writer ``series_buckets``) a ``series`` hint adds the constant-folded
    ``series_bucket`` predicate (a *superset* restriction — the exact
    ``series =`` filter still comes from the operator, and stat-prunes row
    groups sorted by series).  Partition columns are dropped from the
    surfaced schema (derivable layout, not data).
    """
    from simple_tsdb_spark.sources.writer import _layout, data_root, series_bucket_pred

    df = spark.read.parquet(data_root(path))
    layout = _layout(path)
    if "time_bucket" in df.columns:
        bucket_ns = layout.get("time_bucket_ns")
        if bucket_ns:
            if t0 is not None:
                df = df.where(F.col("time_bucket") >= (int(t0) // bucket_ns) * bucket_ns)
            if t1 is not None:
                df = df.where(F.col("time_bucket") <= (int(t1) // bucket_ns) * bucket_ns)
        df = df.drop("time_bucket")
    if "series_bucket" in df.columns:
        sbuckets = layout.get("series_buckets")
        if sbuckets and series is not None:
            df = df.where(series_bucket_pred(series, sbuckets))
        df = df.drop("series_bucket")
    return validate_measurement(df)


def adapt_raw_ts(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    t0: int | None = None,
    t1: int | None = None,
):
    """Dtype-dispatching adapter for a driver-provided timestamp column.

    The driver's fixtures have shipped ``events.ts`` as both
    INT64(TIMESTAMP(NANOS)) (read as a raw ns long under ``nanosAsLong``)
    and plain ``timestamp[us]`` (read as TIMESTAMP_NTZ).  This helper owns
    that contract in one place: it returns ``(df, time_ns)`` where
    ``time_ns`` is the canonical epoch-ns LongType expression
    (µs-truncated, matching the DuckDB oracle's ``epoch_ns(ts)`` floor
    semantics under a UTC session), and ``df`` carries an equivalent
    predicate on the *raw* column for any ``t0``/``t1`` given — the
    derived ``time_ns`` expression can't reach parquet row-group stats,
    but a raw-column predicate can, so ranged queries prune I/O in every
    dtype branch (reference clamps before I/O too, ``select_op.cc:18-19``).

    Supported dtypes:
      - ``bigint``          raw epoch ns (legacy ns-parquet fixture)
      - ``timestamp``       µs TIMESTAMP_LTZ → ``unix_micros``
      - ``timestamp_ntz``   wall time; under the UTC session a cast to
                            LTZ reads it as UTC — exactly DuckDB's
                            ``epoch_ns`` semantics on the same file.
    """
    dtype = dict(df.dtypes).get(ts_col)
    ts = F.col(ts_col)
    if dtype == "bigint":
        if t0 is not None:
            df = df.where(ts >= F.lit(int(t0)))
        if t1 is not None:
            # +999 slack: truncation makes time_ns <= raw ts.
            df = df.where(ts <= F.lit(int(t1) + 999))
        time_ns = ts - (ts % F.lit(1000))  # ns long → µs-truncated ns
    elif dtype in ("timestamp", "timestamp_ntz"):

        def _lit(ns: int):
            # Constant-foldable literal comparable to the raw column, so
            # the predicate lands in PushedFilters.
            c = F.timestamp_micros(F.lit(int(ns)))
            return c.cast("timestamp_ntz") if dtype == "timestamp_ntz" else c

        if t0 is not None:
            df = df.where(ts >= _lit(-(-int(t0) // 1000)))  # ceil µs
        if t1 is not None:
            df = df.where(ts <= _lit(int(t1) // 1000))  # floor µs
        base = ts.cast("timestamp_ltz") if dtype == "timestamp_ntz" else ts
        time_ns = F.unix_micros(base) * F.lit(1000)
    else:
        raise TypeError(
            f"column {ts_col!r} must be bigint (epoch ns), timestamp, or "
            f"timestamp_ntz; got {dtype!r}"
        )
    return df, time_ns.cast("long")


def events_measurement(
    spark: SparkSession,
    sf_dir: str,
    *,
    series_col: str = "event_type",
    fields: tuple[str, ...] = ("value", "user_id", "event_id"),
    t0: int | None = None,
    t1: int | None = None,
) -> DataFrame:
    """Adapt the driver's ``events`` table to the measurement contract.

    ``event_type`` plays the series tag; ``ts`` becomes ``time_ns`` at µs
    granularity via :func:`adapt_raw_ts`, which dispatches on the fixture's
    actual dtype (ns long, TIMESTAMP, or TIMESTAMP_NTZ — the driver has
    shipped all of them) and matches the DuckDB oracle's ``epoch_ns(ts)``
    under the UTC session.  ``event_id`` rides along as a field; it also
    serves as a deterministic tiebreak for LIMIT/LAST queries should two
    events in one series share a µs.

    Because ``time_ns`` is *derived*, a predicate on it cannot reach the
    parquet scan; passing the query's ``t0``/``t1`` here adds an
    equivalent predicate on the raw ``ts`` column, which Catalyst pushes
    into row-group pruning.  Native measurements written by
    sources/writer.py store ``time_ns`` directly and need no such hint.
    """
    # read_fixture sets the runtime confs (nanosAsLong for ns-parquet,
    # UTC session) and normalizes any drifted non-ts column dtypes.
    from simple_tsdb_spark.sources.fixtures import read_fixture

    df = read_fixture(spark, sf_dir, "events")
    df, time_ns = adapt_raw_ts(df, t0=t0, t1=t1)
    return df.select(
        F.col(series_col).cast("string").alias("series"),
        time_ns.cast("long").alias("time_ns"),
        *[F.col(f) for f in fields],
    )
