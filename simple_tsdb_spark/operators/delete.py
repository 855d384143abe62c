"""S6 — front-of-series retention delete.

Reference (``/root/reference/src/libtsdb/delete.cc:11-162``): deletes all
points ``<= t`` from the *front* of a series by advancing ``time_first``
and unlinking fully-covered chunk files.  Deleting "from the future"
(t beyond the last point) is allowed and tombstones any later write ≤ t —
the watermark persists (``wal.cc:70-85`` silently drops arrivals below
``time_first``).

Spark-first: deletion is a partition-scoped overwrite — only series
partitions whose data actually changes are rewritten
(``partitionOverwriteMode=dynamic``), everything else is untouched file
metadata.  The watermark lives in a tiny JSON sidecar per measurement and
is enforced on both the read path (filter) and the ingest path
(streaming/ingest.py drops late arrivals below it), so a delete is
*logically* instant even before the physical rewrite runs: readers apply
the watermark filter regardless.

At 100 TB this two-step (logical tombstone now, physical rewrite as a
background compaction) is the only sane design — synchronous rewrite of a
multi-TB series on every retention tick would dominate the cluster.  On
Delta/Iceberg the physical step becomes ``DELETE WHERE`` + OPTIMIZE.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class RetentionWatermarks:
    """Per-series ``time_first`` watermark sidecar (reference: the
    ``time_first`` file per series, ``doc/LOCKING.txt:50-72``)."""

    def __init__(self, measurement_path: str):
        from simple_tsdb_spark.marks import MarkStore

        self._store = MarkStore(measurement_path, "time_first")
        self.path = self._store.path
        self._fs = self._store._fs

    @property
    def _marks(self):
        return self._store._marks

    def get(self, series: str) -> int:
        return self._store._marks.get(series, 0)

    def advance(self, series: str, time_first: int) -> None:
        # time_first only ever advances (delete.cc: monotone).
        self._store._advance({series: int(time_first)}, floor=0)

    def advance_many(self, firsts: dict[str, int]) -> None:
        """Batch advance with ONE atomic publish per touched shard — a
        first write touching S new series must not rewrite the sidecar
        S times (O(S²) bytes at 10⁵ series); above the shard threshold
        only touched hash buckets rewrite (see marks.py)."""
        self._store._advance(firsts, floor=0)

    def apply(self, df: DataFrame) -> DataFrame:
        """Read-path filter: hide rows below any series' watermark.

        Small mark sets inline as a literal map (stays in codegen); large
        ones broadcast-join so the filter expression stays bounded.
        """
        if not self._marks:
            return df
        if len(self._marks) <= 32:
            marks = F.create_map(
                *[F.lit(x) for kv in self._marks.items() for x in (kv[0], str(kv[1]))]
            )
            wm = F.coalesce(marks[F.col("series")].cast("long"), F.lit(0))
            return df.where(F.col("time_ns") >= wm)
        spark = df.sparkSession
        wm_df = spark.createDataFrame(
            [(s, int(t)) for s, t in self._marks.items()], "series string, _wm long"
        )
        return (
            df.join(F.broadcast(wm_df), "series", "left")
            .where(F.col("_wm").isNull() | (F.col("time_ns") >= F.col("_wm")))
            .drop("_wm")
        )


def delete_points(
    spark: SparkSession,
    measurement_path: str,
    *,
    series: str,
    t: int,
    physical: bool = True,
) -> RetentionWatermarks:
    """Delete all points of ``series`` with ``time_ns <= t``.

    Advances the watermark (logical delete, instant) and — when
    ``physical`` — rewrites only that series' partition without the dropped
    rows.  Returns the updated watermark set.
    """
    from simple_tsdb_spark.fs import get_fs
    from simple_tsdb_spark.sources.writer import _layout, data_root

    fs = get_fs(measurement_path)
    marks = RetentionWatermarks(measurement_path)
    marks.advance(series, int(t) + 1)  # new time_first = t+1 (delete.cc:"t+1")
    if not physical:
        return marks
    # Physical rewrite without directory renames (object-store safe):
    # fully-covered partition directories are simply unlinked — the
    # reference's fully-covered-chunk unlink (delete.cc), atomic per
    # object; the one boundary partition is replaced via Spark's dynamic
    # partition overwrite, whose job commit handles staging.  Readers are
    # correct throughout either way: the watermark filter (advanced
    # above, before any file op) already hides every dropped row.
    root = data_root(measurement_path)
    layout = _layout(measurement_path)
    bucket_ns = layout.get("time_bucket_ns")
    sbuckets = layout.get("series_buckets")
    t = int(t)
    if sbuckets:
        return _delete_points_hashed(
            spark, fs, root, series=series, t=t,
            bucket_ns=bucket_ns, sbuckets=sbuckets, marks=marks,
        )
    part_dir = f"{root}/series={series}"
    if not fs.isdir(part_dir):
        return marks
    rewrite_dirs = []  # partially-covered dirs needing a row-level rewrite
    if bucket_ns:
        boundary = (t // bucket_ns) * bucket_ns
        for bdir in sorted(fs.listdir(part_dir)):
            if not bdir.startswith("time_bucket="):
                continue
            b = int(bdir[len("time_bucket=") :])
            if b + bucket_ns - 1 <= t:  # every possible row <= t
                fs.remove_tree(f"{part_dir}/{bdir}")
            elif b == boundary:
                rewrite_dirs.append(f"{part_dir}/{bdir}")
    else:
        rewrite_dirs.append(part_dir)
    for d in rewrite_dirs:
        kept = (
            spark.read.option("basePath", root)
            .parquet(d)  # partition cols (series[, time_bucket]) surface as data
            .where(F.col("time_ns") > t)
            .sortWithinPartitions("time_ns")
        )
        if kept.limit(1).count() == 0:
            fs.remove_tree(d)  # rewrite would leave nothing: pure unlink
            continue
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            part_cols = ["series"] + (["time_bucket"] if bucket_ns else [])
            (
                kept.write.mode("overwrite")
                .partitionBy(*part_cols)
                .parquet(root)  # dynamic: replaces only the partitions present
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return marks


def _delete_points_hashed(
    spark: SparkSession,
    fs,
    root: str,
    *,
    series: str,
    t: int,
    bucket_ns: int | None,
    sbuckets: int,
    marks: RetentionWatermarks,
) -> RetentionWatermarks:
    """Physical front-delete on a hashed-series layout.

    A hash-bucket directory holds many series, so nothing can be
    unlinked wholesale; instead the affected partitions — the series'
    single hash bucket × the time_buckets at or below the boundary — are
    rewritten without the series' covered rows via dynamic partition
    overwrite.  A partition whose rewrite keeps zero rows is unlinked
    (dynamic overwrite only replaces partitions present in the output).
    Work scales with the covered time range in ONE hash bucket,
    independent of series cardinality.
    """
    if not fs.isdir(root):
        return marks
    # the series lives in exactly one hash bucket — fold it locally (one
    # job on a 1-row relation, no table scan) and touch only that dir
    b = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(series)), F.lit(int(sbuckets))).cast("int")
    ).first()[0]
    base = f"{root}/series_bucket={b}"
    if not fs.isdir(base):
        return marks
    dirs = []  # partitions possibly holding covered rows of this series
    if bucket_ns:
        for bdir in fs.listdir(base):
            if bdir.startswith("time_bucket=") and int(bdir[len("time_bucket=") :]) <= t:
                dirs.append(f"{base}/{bdir}")
    else:
        dirs.append(base)
    part_cols = ["series_bucket"] + (["time_bucket"] if bucket_ns else [])
    for d in dirs:
        src = spark.read.option("basePath", root).parquet(d)
        drop_cond = (F.col("series") == series) & (F.col("time_ns") <= t)
        if src.where(drop_cond).limit(1).count() == 0:
            continue  # nothing of this series to drop here
        kept = src.where(~drop_cond).sortWithinPartitions("series", "time_ns")
        if kept.limit(1).count() == 0:
            fs.remove_tree(d)
            continue
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            kept.write.mode("overwrite").partitionBy(*part_cols).parquet(root)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return marks
