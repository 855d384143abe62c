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
    "write_points_pandas",
    "TimeLastMarks",
    "compact_measurement",
    "series_bucket_expr",
    "series_bucket_pred",
    "OutOfOrderTimestamps",
    "OverwriteMismatch",
]


import re

# Series names that Spark writes as their literal partition-directory
# name (no %XX escaping) — lets the writer prove "no committed data"
# from a directory listing alone.
_PLAIN_SERIES_RE = re.compile(r"^[A-Za-z0-9_.\-]+$")


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


class TimeLastMarks:
    """Per-series committed ``time_last`` sidecar — the reference keeps
    this in the per-series index metadata and checks incoming timestamps
    against it in memory (wal.cc:87-110) so the append-only fast path
    never touches stored data.  Advanced to the incoming batch max
    BEFORE the append publishes; see the crash-safety note at the call
    site.

    Like every measurement sidecar (layout, watermarks), this inherits
    the single-writer-per-measurement contract (DIVERGENCES #6; the
    wire server enforces it with a per-measurement lock) — two
    uncoordinated writer PROCESSES interleaving on one measurement
    could publish a stale snapshot and roll a mark backward."""

    def __init__(self, measurement_path: str):
        from simple_tsdb_spark.marks import MarkStore

        self._store = MarkStore(measurement_path, "time_last")
        # expose the store's mapping + path for existing call sites
        self.path = self._store.path
        self._fs = self._store._fs

    @property
    def _marks(self):
        return self._store._marks

    def get(self, series: str) -> int | None:
        """None = unknown (pre-sidecar data may exist → caller must
        verify against the store)."""
        return self._store._marks.get(series)

    def advance_many(self, highs: dict[str, int]) -> None:
        self._store._advance(highs, floor=0)


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
        marks = RetentionWatermarks(measurement_path)
        stats, batch = _prepass_spark(spark, batch, marks)
        return _write_points_body(
            spark, measurement_path, batch, fields, stats, mode=mode,
            time_bucket_ns=time_bucket_ns, series_buckets=series_buckets,
        )
    finally:
        cached.unpersist()


def write_points_pandas(
    spark: SparkSession,
    measurement_path: str,
    pdf,
    spark_schema,
    *,
    mode: str = "strict",
    time_bucket_ns: int | None = None,
    series_buckets: int | None = None,
    wal_lane: bool = True,
) -> dict[str, int]:
    """``write_points`` for a driver-resident pandas batch (the wire
    server's WRITE_POINTS path).

    Semantics are identical to ``write_points`` — same checks, same
    errors, same counters — but pass 1 (intra-batch ordering + watermark
    classification + counters) runs in pandas on the driver instead of
    as a Spark job, so a monotone point-scale append costs at most ONE
    Spark job (the partitioned write).

    When the batch is a *provably monotone* append (every touched
    series' kept low is strictly above its committed ``time_last`` —
    the sidecar can prove it without touching stored data) the append
    takes the **WAL lane**: the driver writes the parquet files
    directly with pyarrow into the same partition layout, ZERO Spark
    jobs — the analog of the reference absorbing small writes in its
    WAL before chunk-store fold-in (doc/WRITES.txt:1-16); here
    ``compact_measurement`` is the fold-in.  Readers need no union
    logic: the lane's files land in the table's own directories with
    identical schema/stats, so every query sees them immediately.
    ``wal_lane=False`` forces the Spark append (used by the
    equivalence tests).  Equivalence to the DataFrame path is pinned
    in test_ingest.
    """
    missing = [f.name for f in spark_schema.fields if f.name not in pdf.columns]
    if missing:
        raise ValueError(f"pandas batch missing measurement columns: {missing}")
    marks = RetentionWatermarks(measurement_path)
    stats, kept = _prepass_pandas(pdf, marks)
    fields = [f.name for f in spark_schema.fields if f.name not in ("series", "time_ns")]
    if stats.n_after_wm == 0:
        return {
            "rows_in": stats.n_in,
            "dropped_below_watermark": stats.n_in,
            "dropped_overlap": 0,
            "appended": 0,
        }
    if wal_lane:
        res = _try_wal_append_pandas(
            measurement_path, kept, spark_schema, stats, marks,
            time_bucket_ns=time_bucket_ns, series_buckets=series_buckets,
        )
        if res is not None:
            return res
    # createDataFrame maps pandas columns to the schema POSITIONALLY —
    # reindex so a caller's column order can never land values in the
    # wrong field.
    kept = kept[[f.name for f in spark_schema.fields]]
    batch = spark.createDataFrame(kept, schema=spark_schema)
    return _write_points_body(
        spark, measurement_path, batch, fields, stats, mode=mode,
        time_bucket_ns=time_bucket_ns, series_buckets=series_buckets,
        # A driver-resident batch is point-scale by definition (it came
        # through ≤10 MiB wire chunks): one task sorts and fans out to
        # the partition dirs — no shuffle.
        single_task_append=len(kept) <= 2_000_000,
    )


def _pa_type(dt):
    """Spark→Arrow type for the WAL lane's parquet files — must produce
    the same parquet physical/logical types Spark's own writer emits so
    the two lanes' files are indistinguishable to every reader.
    Returns None for anything unmapped (caller falls back to Spark)."""
    import pyarrow as pa
    from pyspark.sql import types as T

    if isinstance(dt, T.LongType):
        return pa.int64()
    if isinstance(dt, T.DoubleType):
        return pa.float64()
    if isinstance(dt, T.FloatType):
        return pa.float32()
    if isinstance(dt, T.IntegerType):
        return pa.int32()
    if isinstance(dt, T.BooleanType):
        return pa.bool_()
    if isinstance(dt, T.StringType):
        return pa.string()
    if isinstance(dt, T.DecimalType):
        return pa.decimal128(dt.precision, dt.scale)
    return None


_WAL_LANE_MAX_ROWS = 2_000_000


def _try_wal_append_pandas(
    measurement_path: str,
    kept,
    spark_schema,
    stats: "_PrePass",
    marks: RetentionWatermarks,
    *,
    time_bucket_ns: int | None,
    series_buckets: int | None,
) -> dict[str, int] | None:
    """Zero-Spark-job append of a provably-monotone driver-resident
    batch: pyarrow writes time-sorted snappy parquet straight into the
    measurement's partition directories (tmp file + atomic rename per
    partition).  This is the reference's WAL absorbing small writes
    before chunk-store fold-in (doc/WRITES.txt:1-16, wal.cc:87-110's
    in-memory time_last short-circuit); ``compact_measurement`` is the
    fold-in.  Returns None when ineligible — the caller then runs the
    Spark commit body:

    * local filesystem only (object stores go through the Spark
      committer);
    * plain ``series=`` layout with escape-free series names (the lane
      does not reimplement Spark's %XX partition-value escaping or
      xxhash64 bucketing);
    * every field type Arrow-mappable;
    * batch low strictly above every touched series' committed
      ``time_last`` — no overlap, no retransmit-verify, crash between
      sidecar advance and file publish errs high (safe direction, same
      order as the Spark lane).
    """
    from simple_tsdb_spark.fs import LocalFS, get_fs

    if len(kept) > _WAL_LANE_MAX_ROWS:
        return None
    layout = _layout(measurement_path)
    if layout.get("series_buckets"):
        return None
    if series_buckets and "series_buckets" not in layout:
        return None  # caller selects the hashed layout on first write
    if not all(isinstance(s, str) and _PLAIN_SERIES_RE.match(s) for s in stats.per_series):
        return None
    if any(lo < 0 for _s, (lo, _hi) in stats.per_series.items()):
        # negative time_ns: numpy floor-div and Spark's truncating %
        # would bucket differently — the Spark lane owns that case
        return None
    if not isinstance(get_fs(measurement_path), LocalFS):
        return None
    pa_fields = [
        (f.name, _pa_type(f.dataType))
        for f in spark_schema.fields
        if f.name != "series"
    ]
    if any(t is None for _n, t in pa_fields):
        return None
    probe = _StoreProbe(measurement_path, layout)
    if probe.need_verify(stats):
        return None

    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    if "time_bucket_ns" not in layout or "series_buckets" not in layout:
        layout.setdefault("time_bucket_ns", int(time_bucket_ns) if time_bucket_ns else None)
        layout.setdefault("series_buckets", None)
        _save_layout(measurement_path, layout)
    bucket_ns = layout.get("time_bucket_ns")
    # Sidecar advances BEFORE the files publish (see _write_points_body).
    probe.tl.advance_many({s: hi for s, (_lo, hi) in stats.per_series.items()})
    root = probe.root
    schema = pa.schema(pa_fields)
    for series, g in kept.groupby("series", sort=False):
        g = g.sort_values("time_ns", kind="mergesort")
        if bucket_ns:
            tb = g["time_ns"].to_numpy() // int(bucket_ns) * int(bucket_ns)
            parts = [
                (f"series={series}/time_bucket={int(b)}", g[tb == b])
                for b in dict.fromkeys(tb.tolist())
            ]
        else:
            parts = [(f"series={series}", g)]
        for rel, gp in parts:
            tbl = pa.Table.from_arrays(
                [
                    pa.Array.from_pandas(gp[name], type=typ)
                    for name, typ in pa_fields
                ],
                schema=schema,
            )
            d = f"{root}/{rel}"
            os.makedirs(d, exist_ok=True)
            fname = f"part-00000-{uuid.uuid4()}.c000.snappy.parquet"
            tmp = f"{d}/.{fname}.tmp"
            pq.write_table(tbl, tmp, compression="snappy")
            os.replace(tmp, f"{d}/{fname}")
    new_firsts = {
        s: int(lo) for s, (lo, _hi) in stats.per_series.items()
        if s not in marks._marks
    }
    if new_firsts:
        marks.advance_many(new_firsts)
    return {
        "rows_in": stats.n_in,
        "dropped_below_watermark": stats.n_in - stats.n_after_wm,
        "dropped_overlap": 0,
        "appended": stats.n_after_wm,
    }


class _StoreProbe:
    """Committed-state probe shared by the Spark commit body and the
    driver-side WAL lane: resolves the data root, whether any committed
    data exists, the ``time_last`` sidecar, and (plain layout only) the
    set of series partition directories — enough to decide whether a
    batch is a provably-monotone append (no retransmit-verify needed,
    the reference's in-memory time_last short-circuit, wal.cc:87-110)."""

    def __init__(self, measurement_path: str, layout: dict):
        from simple_tsdb_spark.fs import get_fs

        self.root = data_root(measurement_path)
        self.fs = get_fs(self.root)
        entries = self.fs.listdir(self.root) if self.fs.isdir(self.root) else []
        self.exists = any(
            e.startswith(("series=", "series_bucket=")) for e in entries
        )
        self.tl = TimeLastMarks(measurement_path)
        # A series with no recorded time_last AND no partition directory
        # has no committed data — nothing to verify against.  The
        # directory test only applies to the plain series layout with
        # escape-free names (Spark %XX-escapes special chars in
        # partition values); anything else conservatively verifies.
        self.plain_dirs = (
            {e[len("series="):] for e in entries if e.startswith("series=")}
            if not layout.get("series_buckets")
            else None
        )

    def known_tl(self, s: str) -> int | None:
        v = self.tl.get(s)
        if v is not None:
            return v
        if (
            self.plain_dirs is not None
            and _PLAIN_SERIES_RE.match(s)
            and s not in self.plain_dirs
        ):
            return -1  # provably no committed data for this series
        return None

    def need_verify(self, stats: "_PrePass") -> bool:
        return self.exists and stats.lo is not None and any(
            self.known_tl(s) is None or s_lo <= self.known_tl(s)
            for s, (s_lo, _s_hi) in stats.per_series.items()
        )


# Tripwire for pathological batch width: write validation materializes
# one row per TOUCHED series on the driver (the reference keeps the same
# per-series state in memory, wal.cc).  A batch touching more series
# than this still commits, but warns — at ~10⁷ touched series the
# driver dict and the time_last sidecar rewrite become the bottleneck;
# split the batch or move the measurement to the hashed-series layout.
MAX_TOUCHED_SERIES = 1_000_000


def _guard_touched(n: int, where: str) -> None:
    if n > MAX_TOUCHED_SERIES:
        import warnings

        warnings.warn(
            f"write batch touches {n} series (> {MAX_TOUCHED_SERIES}); "
            f"per-series validation state at {where} is driver-resident — "
            "split the batch by series to bound driver memory",
            ResourceWarning,
            stacklevel=3,
        )


class _PrePass:
    """Pass-1 result: counters plus per-series kept (lo, hi) ranges."""

    __slots__ = ("n_in", "n_after_wm", "per_series")

    def __init__(self, n_in: int, n_after_wm: int, per_series: dict[str, tuple[int, int]]):
        self.n_in = n_in
        self.n_after_wm = n_after_wm
        self.per_series = per_series  # series -> (min kept ts, max kept ts)

    @property
    def lo(self) -> int | None:
        return min((t[0] for t in self.per_series.values()), default=None)

    @property
    def touched(self) -> list[str]:
        return list(self.per_series)


def _prepass_spark(
    spark: SparkSession, batch: DataFrame, marks: RetentionWatermarks
) -> tuple[_PrePass, DataFrame]:
    """Pass 1 as ONE grouped aggregate: fuses the intra-batch ordering
    check (duplicate (series, time_ns) ≙ non-increasing timestamp run,
    wal.cc:63-68), the retention-watermark classification (wal.cc:70-85),
    the row counters and the per-series kept time ranges — previously
    four separate actions; each action on a micro-batch is a full job
    with fixed scheduling latency, which dominated wire write throughput
    (SCALE.md "Wire server throughput").  Returns (stats,
    watermark-filtered batch)."""
    if marks._marks:
        wm_rows = [(s, t) for s, t in marks._marks.items()]
        wm = spark.createDataFrame(wm_rows, "series string, _wm long")
        pre = batch.join(F.broadcast(wm), "series", "left")
        below = F.col("_wm").isNotNull() & (F.col("time_ns") < F.col("_wm"))
    else:
        pre = batch
        below = F.lit(False)
    per_key = pre.groupBy("series", "time_ns").agg(
        F.count(F.lit(1)).alias("_c"),
        F.min(below.cast("int")).alias("_below"),  # constant within the key
    )
    rows = per_key.groupBy("series").agg(
        F.sum("_c").alias("_n_in"),
        F.min(F.when(F.col("_c") > 1, F.col("time_ns"))).alias("_dup_ts"),
        F.sum(F.when(F.col("_below") == 0, F.col("_c")).otherwise(F.lit(0))).alias("_n_keep"),
        F.min(F.when(F.col("_below") == 0, F.col("time_ns"))).alias("_lo"),
        F.max(F.when(F.col("_below") == 0, F.col("time_ns"))).alias("_hi"),
    ).collect()
    _guard_touched(len(rows), "_prepass_spark")
    for r in rows:
        if r["_dup_ts"] is not None:
            raise OutOfOrderTimestamps(
                f"duplicate timestamp in batch: series={r['series']} time_ns={r['_dup_ts']}"
            )
    stats = _PrePass(
        n_in=sum(r["_n_in"] for r in rows),
        n_after_wm=sum(r["_n_keep"] for r in rows),
        per_series={
            r["series"]: (r["_lo"], r["_hi"]) for r in rows if r["_lo"] is not None
        },
    )
    if marks._marks:
        batch = pre.where(~below).drop("_wm")
    return stats, batch


def _prepass_pandas(pdf, marks: RetentionWatermarks) -> tuple[_PrePass, object]:
    """Driver-side twin of ``_prepass_spark`` for pandas batches — no
    Spark job.  Returns (stats, watermark-filtered pandas frame)."""
    n_in = len(pdf)
    dup = pdf[pdf.duplicated(["series", "time_ns"], keep=False)]
    if len(dup):
        r = dup.iloc[0]
        raise OutOfOrderTimestamps(
            f"duplicate timestamp in batch: series={r['series']} time_ns={int(r['time_ns'])}"
        )
    kept = pdf
    if marks._marks:
        import numpy as np

        # int64 end to end — Series.map would yield float64 when any
        # series lacks a mark, rounding epoch-ns above 2^53 and
        # diverging from the Spark path's exact long comparison.
        wm_i = np.fromiter(
            (marks._marks.get(s, -1) for s in pdf["series"]),
            dtype=np.int64,
            count=len(pdf),
        )
        below = (wm_i >= 0) & (pdf["time_ns"].to_numpy() < wm_i)
        if below.any():
            kept = pdf[~below]
    per_series = {
        s: (int(g.min()), int(g.max()))
        for s, g in kept.groupby("series", sort=False)["time_ns"]
    }
    _guard_touched(len(per_series), "_prepass_pandas")
    return _PrePass(n_in=n_in, n_after_wm=len(kept), per_series=per_series), kept


def _write_points_body(
    spark: SparkSession,
    measurement_path: str,
    batch: DataFrame,
    fields: list[str],
    stats: _PrePass,
    *,
    mode: str,
    time_bucket_ns: int | None,
    series_buckets: int | None,
    single_task_append: bool = False,
) -> dict[str, int]:
    n_in, n_after_wm = stats.n_in, stats.n_after_wm
    lo, touched = stats.lo, stats.touched
    marks = RetentionWatermarks(measurement_path)

    layout = _layout(measurement_path)
    sbuckets_cur = layout.get("series_buckets")

    # --- Pass 2 (only when the batch can overlap committed data): ONE
    # joined aggregate fuses the retransmit-verify, overlap count,
    # committed-time_last ordering check, append count and per-series
    # first timestamps (previously four more actions).  The tail scan
    # prunes to time_ns ≥ lo AND the batch's touched series (partition
    # pruning on the series layout, series_bucket pruning on the hashed
    # layout).  The ``time_last`` sidecar (advanced BEFORE every append,
    # so it can only ever be too high — the safe direction) lets the
    # common monotone append skip this pass entirely: lo strictly above
    # every touched series' committed time_last means no overlap and no
    # stale point can exist, the reference's own in-memory time_last
    # short-circuit (wal.cc:87-110).
    dropped_overlap = 0
    n_append = n_after_wm
    firsts = {s: t[0] for s, t in stats.per_series.items()}
    stored_tls: dict[str, int] = {}
    probe = _StoreProbe(measurement_path, layout)
    root, tl = probe.root, probe.tl
    if probe.need_verify(stats):
        stored = spark.read.parquet(root).where(F.col("time_ns") >= lo)
        if touched and len(touched) <= 256:
            stored = stored.where(F.col("series").isin(touched))
            if sbuckets_cur:
                stored = stored.where(series_bucket_pred(touched, sbuckets_cur))
        stored_tail = stored.select("series", "time_ns", *fields)
        j = batch.join(
            stored_tail.select(
                F.col("series"),
                F.col("time_ns"),
                F.lit(1).alias("_ov"),
                *[F.col(f).alias(f"_stored_{f}") for f in fields],
            ),
            ["series", "time_ns"],
            "left",
        )
        tails = stored_tail.groupBy("series").agg(F.max("time_ns").alias("_tl"))
        j = j.join(F.broadcast(tails), "series", "left")
        is_ov = F.col("_ov").isNotNull()
        mismatch_cond = None
        if mode == "strict" and fields:
            for f in fields:
                c = ~F.col(f).eqNullSafe(F.col(f"_stored_{f}"))
                mismatch_cond = c if mismatch_cond is None else (mismatch_cond | c)
        stale_cond = (~is_ov) & F.col("_tl").isNotNull() & (F.col("time_ns") <= F.col("_tl"))
        aggs = [
            F.sum(F.when(is_ov, 1).otherwise(0)).alias("_n_ov"),
            F.sum(F.when(~is_ov, 1).otherwise(0)).alias("_n_app"),
            F.min(F.when(~is_ov, F.col("time_ns"))).alias("_first_ts"),
            F.min(F.when(stale_cond, F.col("time_ns"))).alias("_stale_ts"),
            F.max("_tl").alias("_tl"),  # committed tail max (constant per series)
        ]
        if mismatch_cond is not None:
            aggs.append(
                F.min(F.when(is_ov & mismatch_cond, F.col("time_ns"))).alias("_mm_ts")
            )
        res = j.groupBy("series").agg(*aggs).collect()
        _guard_touched(len(res), "retransmit-verify")
        if mismatch_cond is not None:
            for r in res:
                if r["_mm_ts"] is not None:
                    raise OverwriteMismatch(
                        f"retransmit differs from stored point at series={r['series']} "
                        f"time_ns={r['_mm_ts']}"
                    )
        if mode == "strict":
            # Reference additionally rejects *new* timestamps at or below
            # time_last (out-of-order vs the committed store) unless they
            # are exact retransmits; enforce per touched series.
            for r in res:
                if r["_stale_ts"] is not None:
                    raise OutOfOrderTimestamps(
                        f"new point not after committed time_last: series={r['series']} "
                        f"time_ns={r['_stale_ts']}"
                    )
        dropped_overlap = sum(r["_n_ov"] for r in res)
        n_append = sum(r["_n_app"] for r in res)
        firsts = {r["series"]: r["_first_ts"] for r in res if r["_first_ts"] is not None}
        # The verify scan revealed each series' true committed tail max
        # (every stored row ≥ lo was scanned, and any committed
        # time_last ≥ lo is in that set; a series absent from `tails`
        # has committed time_last < lo).  Fold it into the sidecar
        # advance so a first write over PRE-SIDECAR data can never
        # initialize time_last below the true committed value (which
        # would let a later write skip a needed verify).
        stored_tls = {r["series"]: r["_tl"] for r in res if r["_tl"] is not None}
        batch = batch.join(
            stored_tail.select("series", "time_ns"), ["series", "time_ns"], "left_anti"
        )

    # --- Pass 3: the append itself, partitioned by series (and
    # optionally a coarse time bucket: directory-level time pruning
    # before any footer is read — the first write fixes the layout,
    # later writes follow it).
    if "time_bucket_ns" not in layout or "series_buckets" not in layout:
        layout.setdefault("time_bucket_ns", int(time_bucket_ns) if time_bucket_ns else None)
        layout.setdefault("series_buckets", int(series_buckets) if series_buckets else None)
        _save_layout(measurement_path, layout)
    bucket_ns = layout.get("time_bucket_ns")
    sbuckets = layout.get("series_buckets")
    if n_append:
        # Advance time_last BEFORE publishing the append: a crash between
        # the two leaves the sidecar too high, which only costs a future
        # overlapping write its verify scan; too low would skip a needed
        # retransmit-verify (unsafe).  Each advance takes the max of the
        # batch's kept high AND the verify scan's committed tail, so a
        # first write over pre-sidecar data records the TRUE committed
        # time_last, never just the batch max.
        tl.advance_many(
            {
                s: max(t[1], stored_tls.get(s, t[1]))
                for s, t in stats.per_series.items()
            }
        )
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
        if single_task_append:
            # Point-scale batch: one task, no shuffle; sorting by
            # (series, time_ns) keeps every partition dir's file
            # time-ordered.
            out = out.coalesce(1).sortWithinPartitions("series", "time_ns")
        else:
            out = out.repartition(*[F.col(c) for c in shuffle_cols]).sortWithinPartitions(
                *sort_cols
            )
        (
            out.write.mode("append")
            .partitionBy(*part_cols)
            .parquet(data_root(measurement_path))
        )
        # Record time_first for series seen for the first time (the
        # reference's time_first metadata file) so windowed reads can skip
        # the full-series min scan; retention deletes advance it later.
        # (firsts came free from the validation aggregates above; ONE
        # sidecar publish regardless of how many series the batch touches.)
        new_firsts = {
            s: int(m) for s, m in firsts.items() if s not in marks._marks
        }
        if new_firsts:
            marks.advance_many(new_firsts)
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
