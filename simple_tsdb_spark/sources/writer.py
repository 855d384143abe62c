"""S4/S5 — validated ingest into a measurement table.

Reference semantics (``/root/reference/src/libtsdb/wal.cc:54-347``):

1. timestamps within a write must be strictly increasing per series —
   violation rejects the whole operation (wal.cc:63-68,
   OUT_OF_ORDER_TIMESTAMPS);
2. points below the series' ``time_first`` watermark (previously deleted
   region) are *silently dropped* (wal.cc:70-85);
3. a retransmit overlapping the committed tail must match the stored
   points exactly — same timestamps, values and null bitmaps — and is then
   a no-op for the overlapped part; any difference rejects the write
   (wal.cc:87-246);
4. the remainder (timestamps strictly after ``time_last``) is appended;
   the reference's WAL/commit/fsync machinery (write.cc:37-447) is
   replaced wholesale by the Parquet job-commit protocol plus Structured
   Streaming checkpoints.

Physical layout written here: Parquet partitioned by ``series``, sorted
within partitions by ``time_ns`` — row-group min/max stats on time_ns then
serve as the chunk index (SURVEY.md §1.4).

At 100 TB: validation is expressed as joins/aggregations against only the
*tail* of each touched series (time_ns ≥ min incoming timestamp), which
partition- and stat-prunes to a sliver of the table; the append itself is
partition-local.

Very high series cardinality (≥10⁵): the directory-per-series layout's
limit is partition *namespace* size — listings, dynamic-commit file moves
and per-directory writer churn all scale with #series.  ``write_points``
therefore supports a **hashed-series layout**: pass ``series_buckets=B``
on the first write and the table partitions by
``series_bucket = pmod(xxhash64(series), B)`` (× the optional
``time_bucket``) with ``series`` kept as a *data* column.  Directory
count becomes B × #time_buckets — independent of series cardinality —
while single-series queries still prune partitions (the bucket of a
literal constant-folds at plan time, see ``series_bucket_pred``) and
row groups sorted by (series, time_ns) keep min/max stat pruning.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_tsdb_spark.operators.delete import RetentionWatermarks
from simple_tsdb_spark.sources.measurement import field_columns, validate_measurement


from simple_tsdb_spark.errors import OutOfOrderTimestamps, OverwriteMismatch

__all__ = [
    "write_points",
    "compact_measurement",
    "series_bucket_expr",
    "series_bucket_pred",
    "OutOfOrderTimestamps",
    "OverwriteMismatch",
]


def series_bucket_expr(n_buckets: int, col: str = "series"):
    """The hashed-series partition value: ``pmod(xxhash64(series), B)``."""
    return F.pmod(F.xxhash64(F.col(col)), F.lit(int(n_buckets))).cast("int")


def series_bucket_pred(series, n_buckets: int):
    """Partition-pruning predicate for a series (or set of series) on a
    hashed-series layout.

    Built from *foldable* expressions (``pmod(xxhash64('s'), B)``), which
    Catalyst constant-folds during optimization — so the predicate lands
    in the scan's PartitionFilters and prunes directories without any
    driver-side hash computation or extra job."""
    names = [series] if isinstance(series, str) else list(series)
    pred = None
    for s in names:
        c = F.col("series_bucket") == F.pmod(
            F.xxhash64(F.lit(s)), F.lit(int(n_buckets))
        ).cast("int")
        pred = c if pred is None else (pred | c)
    return pred if pred is not None else F.lit(True)


def _layout(measurement_path: str) -> dict:
    import json

    from simple_tsdb_spark.fs import get_fs

    p = f"{measurement_path}/_tsdb_meta/layout.json"
    fs = get_fs(p)
    if fs.exists(p):
        return json.loads(fs.read_text(p))
    return {}


def _save_layout(measurement_path: str, layout: dict) -> None:
    import json

    from simple_tsdb_spark.fs import get_fs

    p = f"{measurement_path}/_tsdb_meta/layout.json"
    get_fs(p).write_text_atomic(p, json.dumps(layout))


def data_root(measurement_path: str) -> str:
    """Resolve the measurement's active data directory.

    Data starts directly under the measurement path; ``compact_measurement``
    publishes each rewrite as a new immutable ``_gen_NNNNNN`` directory and
    flips the ``generation`` pointer in layout.json.  The flip is one
    small-file atomic publish — safe on local FS *and* object stores,
    unlike directory renames (on S3 a "rename" is an O(files) copy+delete
    and non-atomic).  All readers and writers resolve through this."""
    gen = _layout(measurement_path).get("generation")
    if gen:
        return f"{measurement_path}/_gen_{int(gen):06d}"
    return measurement_path


def write_points(
    spark: SparkSession,
    measurement_path: str,
    batch: DataFrame,
    *,
    mode: str = "strict",
    time_bucket_ns: int | None = None,
    series_buckets: int | None = None,
) -> dict[str, int]:
    """Validated append of ``batch`` (measurement-contract columns).

    ``mode='strict'`` raises on overlap mismatch (reference behavior);
    ``mode='dedup'`` drops any (series, time_ns) already stored without
    verifying values — the idempotent fast path for streaming retries.

    ``time_bucket_ns`` / ``series_buckets`` fix the physical layout on the
    FIRST write (recorded in layout.json; later writes follow it):
    ``series_buckets=B`` selects the hashed-series layout for very high
    series cardinality (see module docstring).

    Returns counters: rows_in, dropped_below_watermark, dropped_overlap,
    appended.
    """
    validate_measurement(batch)
    fields = field_columns(batch)
    # Micro-batches run several validation actions (dup check, watermark
    # count, overlap checks, append count): cache the batch once so each
    # action reads memory, not the source.
    cached = batch = batch.persist()
    try:
        return _write_points_body(
            spark, measurement_path, batch, fields, mode=mode,
            time_bucket_ns=time_bucket_ns, series_buckets=series_buckets,
        )
    finally:
        cached.unpersist()


def _write_points_body(
    spark: SparkSession,
    measurement_path: str,
    batch: DataFrame,
    fields: list[str],
    *,
    mode: str,
    time_bucket_ns: int | None,
    series_buckets: int | None,
) -> dict[str, int]:
    n_in = batch.count()

    # (1) intra-batch ordering: duplicate (series, time_ns) within one
    # write is the DataFrame equivalent of a non-increasing timestamp run.
    dup = (
        batch.groupBy("series", "time_ns").count().where(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise OutOfOrderTimestamps(
            f"duplicate timestamp in batch: series={dup[0]['series']} time_ns={dup[0]['time_ns']}"
        )

    # (2) retention watermark drop (silent, wal.cc:70-85).
    marks = RetentionWatermarks(measurement_path)
    if marks._marks:
        wm_rows = [(s, t) for s, t in marks._marks.items()]
        wm = spark.createDataFrame(wm_rows, "series string, _wm long")
        batch = (
            batch.join(F.broadcast(wm), "series", "left")
            .where((F.col("_wm").isNull()) | (F.col("time_ns") >= F.col("_wm")))
            .drop("_wm")
        )
    n_after_wm = batch.count()

    # (3) overlap with the committed tail.
    dropped_overlap = 0
    root = data_root(measurement_path)
    from simple_tsdb_spark.fs import get_fs

    _fs = get_fs(root)
    exists = _fs.isdir(root) and any(
        e.startswith(("series=", "series_bucket=")) for e in _fs.listdir(root)
    )
    if exists:
        lo = batch.agg(F.min("time_ns")).first()[0]
        if lo is not None:
            stored_tail = (
                spark.read.parquet(root)
                .where(F.col("time_ns") >= lo)  # stat/partition-pruned tail scan
                .select("series", "time_ns", *fields)
            )
            overlap = batch.join(
                stored_tail.withColumnRenamed("time_ns", "time_ns").select(
                    F.col("series"),
                    F.col("time_ns"),
                    *[F.col(f).alias(f"_stored_{f}") for f in fields],
                ),
                ["series", "time_ns"],
                "inner",
            )
            if mode == "strict":
                mismatch_cond = None
                for f in fields:
                    c = ~(
                        (F.col(f) == F.col(f"_stored_{f}"))
                        | (F.col(f).isNull() & F.col(f"_stored_{f}").isNull())
                    )
                    mismatch_cond = c if mismatch_cond is None else (mismatch_cond | c)
                bad = overlap.where(mismatch_cond).limit(1).collect() if fields else []
                if bad:
                    r = bad[0]
                    raise OverwriteMismatch(
                        f"retransmit differs from stored point at series={r['series']} "
                        f"time_ns={r['time_ns']}"
                    )
            dropped_overlap = overlap.count()
            batch = batch.join(
                stored_tail.select("series", "time_ns"), ["series", "time_ns"], "left_anti"
            )
            # Reference additionally rejects *new* timestamps at or below
            # time_last (out-of-order vs the committed store) unless they
            # are exact retransmits; enforce per touched series.
            if mode == "strict":
                tails = (
                    stored_tail.groupBy("series").agg(F.max("time_ns").alias("_tl"))
                )
                stale = (
                    batch.join(F.broadcast(tails), "series")
                    .where(F.col("time_ns") <= F.col("_tl"))
                    .limit(1)
                    .collect()
                )
                if stale:
                    raise OutOfOrderTimestamps(
                        f"new point not after committed time_last: series={stale[0]['series']} "
                        f"time_ns={stale[0]['time_ns']}"
                    )

    # (4) append, partitioned by series (and optionally a coarse time
    # bucket: directory-level time pruning before any footer is read —
    # the first write fixes the layout, later writes follow it).
    layout = _layout(measurement_path)
    if "time_bucket_ns" not in layout or "series_buckets" not in layout:
        layout.setdefault("time_bucket_ns", int(time_bucket_ns) if time_bucket_ns else None)
        layout.setdefault("series_buckets", int(series_buckets) if series_buckets else None)
        _save_layout(measurement_path, layout)
    bucket_ns = layout.get("time_bucket_ns")
    sbuckets = layout.get("series_buckets")
    n_append = batch.count()
    if n_append:
        out = batch
        if sbuckets:
            # hashed-series layout: directory count independent of #series
            part_cols = ["series_bucket"]
            out = out.withColumn("series_bucket", series_bucket_expr(sbuckets))
            shuffle_cols, sort_cols = ["series_bucket"], ["series", "time_ns"]
        else:
            part_cols = ["series"]
            shuffle_cols, sort_cols = ["series"], ["time_ns"]
        if bucket_ns:
            out = out.withColumn(
                "time_bucket", F.col("time_ns") - (F.col("time_ns") % F.lit(int(bucket_ns)))
            )
            part_cols.append("time_bucket")
        (
            out.repartition(*[F.col(c) for c in shuffle_cols])
            .sortWithinPartitions(*sort_cols)
            .write.mode("append")
            .partitionBy(*part_cols)
            .parquet(data_root(measurement_path))
        )
        # Record time_first for series seen for the first time (the
        # reference's time_first metadata file) so windowed reads can skip
        # the full-series min scan; retention deletes advance it later.
        firsts = {
            r["series"]: r["_m"]
            for r in batch.groupBy("series").agg(F.min("time_ns").alias("_m")).collect()
        }
        for s, m in firsts.items():
            if s not in marks._marks:
                marks.advance(s, int(m))
    return {
        "rows_in": n_in,
        "dropped_below_watermark": n_in - n_after_wm,
        "dropped_overlap": dropped_overlap,
        "appended": n_append,
    }


def compact_measurement(
    spark: SparkSession,
    measurement_path: str,
    *,
    target_rows_per_file: int = 4_000_000,
) -> None:
    """S5 analog — rewrite a measurement into few large, time-sorted files
    per series partition (the reference's chunk-fill + gzip compaction,
    write.cc:264-315; here: small-file control after many micro-batches).

    Preserves the measurement's partition layout exactly (series plus the
    coarse time_bucket when layout.json declares one), so post-compaction
    appends land in the same directory scheme.  The rewrite is published
    as a new generation directory + pointer flip (see ``data_root``) —
    write-new then flip, no directory renames, object-store safe; the
    previous generation is removed best-effort afterwards (in-flight
    readers of the old snapshot finish undisturbed on object stores,
    where deletes only hide future LISTs)."""
    from simple_tsdb_spark.fs import get_fs

    fs = get_fs(measurement_path)
    layout = _layout(measurement_path)
    src = data_root(measurement_path)
    df = spark.read.parquet(src)
    fields = field_columns(df)
    sbuckets = layout.get("series_buckets")
    if sbuckets:
        part_cols = ["series_bucket"]
        if "series_bucket" not in df.columns:
            df = df.withColumn("series_bucket", series_bucket_expr(sbuckets))
        shuffle_cols, sort_cols = ["series_bucket"], ["series", "time_ns"]
    else:
        part_cols = ["series"]
        shuffle_cols, sort_cols = ["series"], ["time_ns"]
    bucket_ns = layout.get("time_bucket_ns")
    if bucket_ns:
        if "time_bucket" not in df.columns:
            df = df.withColumn(
                "time_bucket", F.col("time_ns") - (F.col("time_ns") % F.lit(int(bucket_ns)))
            )
        part_cols.append("time_bucket")
    data_cols = (["series"] if sbuckets else []) + ["time_ns", *fields]
    new_gen = int(layout.get("generation") or 0) + 1
    dst = f"{measurement_path}/_gen_{new_gen:06d}"
    (
        df.repartition(*[F.col(c) for c in shuffle_cols])
        .sortWithinPartitions(*sort_cols)
        .select(*part_cols, *data_cols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .partitionBy(*part_cols)
        .parquet(dst)
    )
    layout["generation"] = new_gen
    _save_layout(measurement_path, layout)  # the atomic flip
    # Best-effort cleanup of the superseded generation's data files.
    if src == measurement_path:
        for e in fs.listdir(measurement_path):
            if e.startswith(("series=", "series_bucket=")):
                fs.remove_tree(f"{measurement_path}/{e}")
    else:
        fs.remove_tree(src)
