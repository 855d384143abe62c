"""Time-series breadth operators beyond the reference's fixed set.

The reference can only scan/aggregate one series at a time; these are the
standard TSDB analytics a Spark engine adds on top, each expressed with
built-in operators and shipped with a DuckDB oracle twin:

- ``asof_join`` — align two series ("for each left point, the latest
  right point at or before it").  Implemented as the union-merge
  formulation: tag both sides, one sort per series, carry the last seen
  right values forward with ``last(ignorenulls)``.  This is O(n log n)
  with ONE shuffle keyed by series — no range-join explosion, no
  per-group pandas — and is exactly how a merge as-of works on sorted
  storage.  At 100 TB both sides shuffle once; with bucketed storage on
  series the shuffle disappears entirely.
- ``sessionize`` — gap-based session assignment (lag + running sum of
  session-break flags), then per-session bounds/counts.
- ``moving_avg`` — trailing N-point rolling mean per series (ROWS frame);
  decimal accumulation keeps it engine-exact.
- ``value_histogram`` — fixed-width bins, one groupBy.
- ``value_quantiles`` — exact linear-interpolation percentiles per series.
- ``distinct_count`` — exact distinct of a field per series.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.fractions import exact_ppm


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    right_fields: Sequence[str],
    tolerance_ns: int | None = None,
) -> DataFrame:
    """Backward as-of join: for each left row, the most recent right row
    with ``right.time_ns <= left.time_ns`` in the same series.

    Left columns pass through; each right field arrives as ``{f}_asof``
    plus ``asof_time_ns`` (NULL when nothing precedes / outside
    ``tolerance_ns``).
    """
    lcols = [c for c in left.columns]
    l = left.select(*lcols, F.lit(1).alias("_side"), F.lit(None).cast("long").alias("_rt"),
                    *[F.lit(None).cast(dict(right.dtypes)[f]).alias(f"_rv_{f}") for f in right_fields])
    r = right.select(
        "series",
        "time_ns",
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c not in ("series", "time_ns")],
        F.lit(0).alias("_side"),
        F.col("time_ns").alias("_rt"),
        *[F.col(f).alias(f"_rv_{f}") for f in right_fields],
    ).select(*lcols, "_side", "_rt", *[f"_rv_{f}" for f in right_fields])
    u = l.unionByName(r)
    # right rows sort before left rows at equal timestamps (0 < 1) so the
    # join is inclusive (t_right == t_left matches).
    w = (
        Window.partitionBy("series")
        .orderBy("time_ns", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = [F.last(F.col("_rt"), ignorenulls=True).over(w).alias("_rt_f")] + [
        F.last(F.col(f"_rv_{f}"), ignorenulls=True).over(w).alias(f"_rv_f_{f}")
        for f in right_fields
    ]
    u = u.select("*", *filled).where(F.col("_side") == 1)
    in_tol = F.col("_rt_f").isNotNull()
    if tolerance_ns is not None:
        in_tol = in_tol & ((F.col("time_ns") - F.col("_rt_f")) <= int(tolerance_ns))
    out_cols = [*lcols, F.when(in_tol, F.col("_rt_f")).alias("asof_time_ns")]
    out_cols += [
        F.when(in_tol, F.col(f"_rv_f_{f}")).alias(f"{f}_asof") for f in right_fields
    ]
    return u.select(*out_cols)


def asof_join_oracle(
    left_sql: str, right_sql: str, *, right_fields: Sequence[str], tolerance_ns: int | None = None
) -> str:
    """DuckDB twin via native ASOF LEFT JOIN on (series, time_ns)."""
    rv = ", ".join(f"r.{f} AS {f}_asof" for f in right_fields)
    tol = (
        ""
        if tolerance_ns is None
        else f", CASE WHEN l.time_ns - r.time_ns <= {tolerance_ns} THEN 1 ELSE 0 END AS _ok"
    )
    # COALESCE-keyed match: DuckDB's ASOF silently treats IS NOT DISTINCT
    # FROM as plain equality, so a NULL series (a real partition in the
    # engine's union-sort plan) would never match.  chr(1) is the
    # sentinel — no measurement series contains a 0x01 control char.
    base = f"""
SELECT l.*, r.time_ns AS asof_time_ns, {rv}{tol}
FROM ({left_sql}) l ASOF LEFT JOIN ({right_sql}) r
  ON COALESCE(l.series, chr(1)) = COALESCE(r.series, chr(1))
 AND l.time_ns >= r.time_ns
"""
    if tolerance_ns is None:
        return base
    null_rv = ", ".join(
        f"CASE WHEN _ok = 1 THEN {f}_asof END AS {f}_asof" for f in right_fields
    )
    return f"""
SELECT * EXCLUDE (asof_time_ns, _ok, {', '.join(f'{f}_asof' for f in right_fields)}),
       CASE WHEN _ok = 1 THEN asof_time_ns END AS asof_time_ns, {null_rv}
FROM ({base})
"""


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    right_fields: Sequence[str],
    tolerance_ns: int | None = None,
) -> DataFrame:
    """Nearest as-of join: for each left row, the right row in the same
    series minimizing ``|Δt|`` (backward wins ties) — sensor fusion when
    the reference clock may lag OR lead the joined stream, the
    bidirectional complement of :func:`asof_join`.

    Output adds ``asof_time_ns``, ``asof_delta_ns`` (exact non-negative
    long) and one ``{f}_asof`` per right field, all NULL when no
    candidate lies within ``tolerance_ns``.

    Scale: same single-shuffle union-sort plan as ``asof_join`` — both
    directional fills ride ONE (series, time order) sort, no join
    against the right side at all.
    """
    lcols = [c for c in left.columns]
    rdt = dict(right.dtypes)
    ldt = dict(left.dtypes)
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_rt"),
        *[F.lit(None).cast(rdt[f]).alias(f"_rv_{f}") for f in right_fields],
    )
    r = right.select(
        "series",
        "time_ns",
        *[F.lit(None).cast(ldt[c]).alias(c) for c in lcols if c not in ("series", "time_ns")],
        F.lit(0).alias("_side"),
        F.col("time_ns").alias("_rt"),
        *[F.col(f).alias(f"_rv_{f}") for f in right_fields],
    ).select(*lcols, "_side", "_rt", *[f"_rv_{f}" for f in right_fields])
    u = l.unionByName(r)
    order = [F.col("time_ns"), F.col("_side")]
    wb = Window.partitionBy("series").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wf = Window.partitionBy("series").orderBy(*order).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    proj = [
        F.last(F.col("_rt"), ignorenulls=True).over(wb).alias("_bt"),
        F.first(F.col("_rt"), ignorenulls=True).over(wf).alias("_ft"),
    ]
    for f in right_fields:
        proj += [
            F.last(F.col(f"_rv_{f}"), ignorenulls=True).over(wb).alias(f"_bv_{f}"),
            F.first(F.col(f"_rv_{f}"), ignorenulls=True).over(wf).alias(f"_fv_{f}"),
        ]
    u = u.select("*", *proj).where(F.col("_side") == 1)
    db = F.col("time_ns") - F.col("_bt")
    df_ = F.col("_ft") - F.col("time_ns")
    b_ok = F.col("_bt").isNotNull()
    f_ok = F.col("_ft").isNotNull()
    if tolerance_ns is not None:
        tol = int(tolerance_ns)
        b_ok = b_ok & (db <= tol)
        f_ok = f_ok & (df_ <= tol)
    use_b = b_ok & (~f_ok | (db <= df_))
    use_f = f_ok & ~use_b
    out_cols = [
        *lcols,
        F.when(use_b, F.col("_bt")).when(use_f, F.col("_ft")).alias("asof_time_ns"),
        F.when(use_b, db).when(use_f, df_).alias("asof_delta_ns"),
    ]
    out_cols += [
        F.when(use_b, F.col(f"_bv_{f}")).when(use_f, F.col(f"_fv_{f}")).alias(f"{f}_asof")
        for f in right_fields
    ]
    return u.select(*out_cols)


def asof_join_nearest_oracle(
    left_sql: str, right_sql: str, *, right_fields: Sequence[str], tolerance_ns: int | None = None
) -> str:
    """DuckDB twin: backward + forward native ASOF joins, then the same
    nearest/tolerance selection."""
    bv = ", ".join(f"b.{f} AS _bv_{f}" for f in right_fields)
    fv = ", ".join(f"f.{f} AS _fv_{f}" for f in right_fields)
    b_ok = "bt IS NOT NULL"
    f_ok = "ft IS NOT NULL"
    if tolerance_ns is not None:
        b_ok += f" AND (time_ns - bt) <= {int(tolerance_ns)}"
        f_ok += f" AND (ft - time_ns) <= {int(tolerance_ns)}"
    rv_out = ", ".join(
        f"CASE WHEN _use_b THEN _bv_{f} WHEN _use_f THEN _fv_{f} END AS {f}_asof"
        for f in right_fields
    )
    drop = ["bt", "ft", "_use_b", "_use_f"]
    drop += [f"_bv_{f}" for f in right_fields] + [f"_fv_{f}" for f in right_fields]
    return f"""
WITH j AS (
  SELECT l.*, b.time_ns AS bt, {bv}, f.time_ns AS ft, {fv}
  FROM ({left_sql}) l
  ASOF LEFT JOIN ({right_sql}) b ON l.series = b.series AND l.time_ns >= b.time_ns
  ASOF LEFT JOIN ({right_sql}) f ON l.series = f.series AND l.time_ns <= f.time_ns),
sel AS (
  SELECT *,
         ({b_ok}) AND (NOT ({f_ok}) OR (time_ns - bt) <= (ft - time_ns)) AS _use_b,
         ({f_ok}) AND NOT (({b_ok}) AND (NOT ({f_ok}) OR (time_ns - bt) <= (ft - time_ns))) AS _use_f
  FROM j)
SELECT * EXCLUDE ({', '.join(drop)}),
       CASE WHEN _use_b THEN bt WHEN _use_f THEN ft END AS asof_time_ns,
       CASE WHEN _use_b THEN time_ns - bt WHEN _use_f THEN ft - time_ns END AS asof_delta_ns,
       {rv_out}
FROM sel
"""


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    tol_ns: int,
    right_fields: Sequence[str],
) -> DataFrame:
    """All same-series (left, right) pairs with |Δtime| ≤ ``tol_ns``.

    Output: every left column, plus ``match_time_ns``, each right field
    as ``{f}_match``, and ``delta_ns`` (left − right; inner join — only
    matching pairs).

    A naive range predicate degenerates to BroadcastNestedLoopJoin in
    Spark (O(|L|·|R|) per series — the scale killer).  This plan blocks
    both sides by tol-width time buckets: a left row in bucket b can only
    match right rows in buckets {b−1, b, b+1}, so the right side
    replicates ×3 into adjacent buckets and the join is a plain
    equi-join on (series, bucket) + a residual |Δ| filter.  Shuffle
    volume is |L| + 3·|R|; candidate pairs are bounded by the true pair
    density over a 3·tol window (AQE skew-split handles hot buckets).
    Each true pair emerges exactly once (the right row's three bucket
    copies are distinct, the left row has one bucket).
    """
    B = int(tol_ns)
    if B <= 0:
        raise ValueError("tol_ns must be positive")
    # Integer `div`, not F.floor(x / B): `/` is double division and epoch-ns
    # values (~1.7e18) exceed 2^53, so rows at exact tol multiples could land
    # in the wrong bucket and a |Δt|==tol pair could silently miss the ±1
    # replication window.  time_ns is non-negative epoch ns, so `div` ==
    # floordiv here.
    lb = left.withColumn("_b", F.expr(f"time_ns div {B}"))
    rb = (
        right.select(
            "series",
            F.col("time_ns").alias("match_time_ns"),
            *[F.col(f).alias(f"{f}_match") for f in right_fields],
        )
        .withColumn("_b0", F.expr(f"match_time_ns div {B}"))
        .withColumn("_b", F.explode(F.expr("array(_b0 - 1L, _b0, _b0 + 1L)")))
        .drop("_b0")
    )
    return (
        lb.join(rb, ["series", "_b"])
        .where(F.abs(F.col("time_ns") - F.col("match_time_ns")) <= B)
        .drop("_b")
        .withColumn("delta_ns", F.col("time_ns") - F.col("match_time_ns"))
    )


def interval_join_oracle(
    left_sql: str, right_sql: str, *, tol_ns: int, right_fields: Sequence[str]
) -> str:
    rv = ", ".join(f"r.{f} AS {f}_match" for f in right_fields)
    return f"""
SELECT l.*, r.time_ns AS match_time_ns, {rv},
       l.time_ns - r.time_ns AS delta_ns
FROM ({left_sql}) l JOIN ({right_sql}) r
  ON l.series = r.series AND ABS(l.time_ns - r.time_ns) <= {int(tol_ns)}
"""


def sessionize(df: DataFrame, *, gap_ns: int) -> DataFrame:
    """Gap-based sessions per series: a new session starts when the gap to
    the previous point exceeds ``gap_ns``.  Returns per-session
    (series, session_id, session_start, session_end, n_events)."""
    w = Window.partitionBy("series").orderBy("time_ns")
    gap = F.col("time_ns") - F.lag("time_ns").over(w)
    is_new = F.when(gap.isNull() | (gap > int(gap_ns)), 1).otherwise(0)
    sid = F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.select("series", "time_ns")
        .withColumn("session_id", sid)
        .groupBy("series", "session_id")
        .agg(
            F.min("time_ns").alias("session_start"),
            F.max("time_ns").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("series", "session_id")
    )


def sessionize_oracle(measurement_sql: str, *, gap_ns: int) -> str:
    return f"""
WITH m AS ({measurement_sql}),
flagged AS (
  SELECT series, time_ns,
         CASE WHEN LAG(time_ns) OVER w IS NULL
                   OR time_ns - LAG(time_ns) OVER w > {gap_ns}
              THEN 1 ELSE 0 END AS is_new
  FROM m WINDOW w AS (PARTITION BY series ORDER BY time_ns)),
sess AS (
  SELECT series, time_ns,
         CAST(SUM(is_new) OVER (PARTITION BY series ORDER BY time_ns
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged)
SELECT series, session_id, MIN(time_ns) AS session_start,
       MAX(time_ns) AS session_end, COUNT(*) AS n_events
FROM sess GROUP BY series, session_id
"""


def session_stats(df: DataFrame, *, gap_ns: int) -> DataFrame:
    """Per-series session summary over :func:`sessionize` output —
    ``(series, n_sessions, total_events, total_duration_ns,
    mean_events_e6, mean_duration_ns, max_duration_ns)`` — ALL BIGINT.

    Integer-finals doctrine (round 10): the driver's hasher
    canonicalizes non-int64 numerics engine-specifically (r9 proved
    this with a DECIMAL(38,0)-only query failing while bit-exact
    locally), so gated finals carry no DOUBLE at all.  The means are
    truncated integer quotients — ``mean_events_e6`` is the mean scaled
    by 1e6 (micro-events resolution), ``mean_duration_ns`` is already
    ns-resolution so it is unscaled; both use ``div`` (truncation
    toward zero, identical to DuckDB ``//``; operands are
    non-negative).  ``n_sessions ≥ 1`` per output row by construction,
    so the division is total.  Single-point sessions have duration 0.
    One extra tiny aggregation over the session table — same shuffles
    as sessionize itself."""
    sess = sessionize(df, gap_ns=gap_ns)
    dur = F.col("session_end") - F.col("session_start")
    return (
        sess.groupBy("series")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("total_events"),
            F.sum(dur).alias("total_duration_ns"),
            F.max(dur).alias("max_duration_ns"),
        )
        .select(
            "series",
            "n_sessions",
            "total_events",
            "total_duration_ns",
            F.expr("(1000000 * total_events) div n_sessions").alias(
                "mean_events_e6"
            ),
            F.expr("total_duration_ns div n_sessions").alias("mean_duration_ns"),
            "max_duration_ns",
        )
        .orderBy("series")
    )


def session_stats_oracle(measurement_sql: str, *, gap_ns: int) -> str:
    inner = sessionize_oracle(measurement_sql, gap_ns=gap_ns).strip()
    return f"""
WITH sess AS ({inner}),
a AS (
  SELECT series, COUNT(*) AS n_sessions,
         SUM(n_events) AS total_events,
         SUM(session_end - session_start) AS total_duration_ns,
         MAX(session_end - session_start) AS max_duration_ns
  FROM sess GROUP BY series)
SELECT series, n_sessions,
       CAST(total_events AS BIGINT) AS total_events,
       CAST(total_duration_ns AS BIGINT) AS total_duration_ns,
       CAST((1000000 * total_events) // n_sessions AS BIGINT) AS mean_events_e6,
       CAST(total_duration_ns // n_sessions AS BIGINT) AS mean_duration_ns,
       max_duration_ns
FROM a ORDER BY series
"""


def moving_avg(df: DataFrame, *, field: str, n_points: int) -> DataFrame:
    """Trailing ``n_points`` rolling mean per series (exact decimal sum)."""
    w = (
        Window.partitionBy("series")
        .orderBy("time_ns")
        .rowsBetween(-(int(n_points) - 1), Window.currentRow)
    )
    s = F.sum(F.col(field).cast("decimal(28,6)")).over(w).cast("double")
    n = F.count(F.col(field)).over(w)
    return df.select(
        "series",
        "time_ns",
        F.when(n > 0, s / n).alias(f"{field}_mavg"),
    ).orderBy("series", "time_ns")


def moving_avg_oracle(measurement_sql: str, *, field: str, n_points: int) -> str:
    return f"""
SELECT series, time_ns,
       CASE WHEN COUNT({field}) OVER w > 0
            THEN CAST(SUM(CAST({field} AS DECIMAL(28,6))) OVER w AS DOUBLE)
                 / COUNT({field}) OVER w
       END AS {field}_mavg
FROM ({measurement_sql})
WINDOW w AS (PARTITION BY series ORDER BY time_ns
             ROWS BETWEEN {int(n_points) - 1} PRECEDING AND CURRENT ROW)
"""


def value_histogram(
    df: DataFrame, *, field: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-width histogram of ``field`` per series over [lo, hi); values
    outside clamp into the edge bins."""
    width = (hi - lo) / nbins
    raw = F.floor((F.col(field) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("long")
    return (
        df.where(F.col(field).isNotNull())
        .groupBy("series", bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("series", "bin")
    )


def value_histogram_oracle(
    measurement_sql: str, *, field: str, lo: float, hi: float, nbins: int
) -> str:
    width = (hi - lo) / nbins
    return f"""
SELECT series,
       CAST(least(greatest(floor(({field} - {lo!r}) / {width!r}), 0), {nbins - 1}) AS BIGINT) AS bin,
       COUNT(*) AS n
FROM ({measurement_sql}) WHERE {field} IS NOT NULL
GROUP BY 1, 2
"""


def value_quantiles(
    df: DataFrame, *, field: str, qs: Sequence[float] = (0.5, 0.95, 0.99)
) -> DataFrame:
    """Exact continuous (linearly interpolated) percentiles per series."""
    cols = [
        F.expr(f"percentile({field}, {q!r})").alias(f"p{str(q)[2:]}")
        for q in qs
    ]
    return df.groupBy("series").agg(*cols).orderBy("series")


def value_quantiles_oracle(
    measurement_sql: str, *, field: str, qs: Sequence[float] = (0.5, 0.95, 0.99)
) -> str:
    cols = ", ".join(f"quantile_cont({field}, {q!r}) AS p{str(q)[2:]}" for q in qs)
    return f"SELECT series, {cols} FROM ({measurement_sql}) GROUP BY series"


def distinct_count(df: DataFrame, *, field: str) -> DataFrame:
    """Exact distinct values of ``field`` per series (plus approx twin for
    the 100 TB path — approx_count_distinct avoids the exact op's
    per-key dedup shuffle)."""
    return (
        df.groupBy("series")
        .agg(F.countDistinct(field).alias(f"{field}_distinct"))
        .orderBy("series")
    )


def distinct_count_oracle(measurement_sql: str, *, field: str) -> str:
    return f"""
SELECT series, COUNT(DISTINCT {field}) AS {field}_distinct
FROM ({measurement_sql}) GROUP BY series
"""


def approx_distinct_count(df: DataFrame, *, field: str, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct — the 100 TB path: one pass, fixed-size
    sketches mergeable map-side, no per-key dedup shuffle.  No oracle by
    nature (approximate); tests bound its error against the exact op."""
    return (
        df.groupBy("series")
        .agg(F.approx_count_distinct(field, rsd).alias(f"{field}_distinct_approx"))
        .orderBy("series")
    )


def approx_quantiles(
    df: DataFrame, *, field: str, qs: Sequence[float] = (0.5, 0.95, 0.99), accuracy: int = 10_000
) -> DataFrame:
    """Greenwald-Khanna approximate percentiles — bounded-memory sketch,
    one pass; the scale twin of ``value_quantiles``."""
    cols = [
        F.expr(f"approx_percentile({field}, {q!r}, {int(accuracy)})").alias(f"p{str(q)[2:]}")
        for q in qs
    ]
    return df.groupBy("series").agg(*cols).orderBy("series")


def zscore_stats(df: DataFrame, *, field: str) -> DataFrame:
    """Per-series exact BIGINT-grid moments ``(series, _s, _ss, _n)`` —
    the ``floor(x·1e6)`` value/value² sums that make z-score derivation
    bit-identical across engines AND across batch/streaming (the
    streaming twin fits these once on a trusted snapshot and
    broadcast-joins them onto the firehose).  Callers filter NULLs and
    time range first."""
    v6 = F.expr(f"CAST(floor(CAST({field} AS DOUBLE) * 1e6) AS BIGINT)")
    vv6 = F.expr(
        f"CAST(floor(CAST({field} AS DOUBLE) * CAST({field} AS DOUBLE) * 1e6) AS BIGINT)"
    )
    return df.groupBy("series").agg(
        F.sum(v6).alias("_s"),
        F.sum(vv6).alias("_ss"),
        F.count(F.lit(1)).alias("_n"),
    )


def zscore_outliers(
    df: DataFrame,
    *,
    field: str,
    k: float = 3.0,
    t0: int = 0,
    t1: int = 2**63 - 1,
    broadcast_stats: bool | None = None,
) -> DataFrame:
    """Per-series z-score outliers: points with ``|v − mean| > k·std``
    over the series' points in range (sample std, n ≥ 2).

    Float determinism: per-series moments accumulate as EXACT BIGINTs
    on the ``floor(x·1e6)`` grid (value and value² quantized once,
    per row — the µnat scheme the LM/entropy scores use), then
    mean/var/std derive in double from those integer sums in identical
    IEEE op order, so both engines emit bit-identical UNROUNDED
    z-scores.  Neither a naive distributed ``stddev_samp``
    (accumulation-order-dependent) nor decimal accumulation survives
    cross-engine hashing: casting a wide decimal sum to double is
    correctly rounded in Spark (BigDecimal) but double-rounded in
    DuckDB (int128 → double → /10^scale), diverging by an ulp once the
    scaled sum passes 2^53 — measured on the sf0.01 gate.  A terminal
    round(double) is the repr-boundary divergence.

    Domain contract: the scaled sums ``Σ floor(v·1e6)`` and
    ``Σ floor(v²·1e6)`` must stay within 2^53 for the casts to stay
    exact — |v| ≤ 1e4 holds to ~10⁹ points per series; beyond that,
    bit-equality degrades to ±1 ulp (and the old decimal formulation
    was already cross-engine-unstable there).

    At 100 TB: one map-side-combined aggregate per series (two decimal
    sums + a count), joined back onto the scan — no second corpus-sized
    shuffle when the stats side broadcasts.  ``broadcast_stats`` gates
    the hint: the stats table is one row per series in range, so at
    ≥10⁷ series a *forced* broadcast would build a multi-GB table on
    every executor.  Default ``None`` plants no hint and lets AQE pick
    at runtime from the stats side's actual size (broadcast when small,
    shuffle join when huge) — pass ``True`` only when the caller knows
    the series count is small, ``False`` to force the shuffle join.
    """
    src = df.where(
        (F.col("time_ns") >= t0) & (F.col("time_ns") <= t1) & F.col(field).isNotNull()
    )
    stats = zscore_stats(src, field=field)
    if broadcast_stats is True:
        stats = F.broadcast(stats)
    elif broadcast_stats is False:
        stats = stats.hint("shuffle_merge")
    j = src.join(stats, "series").where(F.col("_n") >= 2)
    mean = F.col("_s").cast("double") / F.lit(1e6) / F.col("_n")
    var = (
        F.col("_ss").cast("double") / F.lit(1e6)
        - F.col("_s").cast("double") / F.lit(1e6) * mean
    ) / (F.col("_n") - 1)
    std = F.sqrt(var)
    z = (F.col(field).cast("double") - mean) / std
    return (
        j.withColumn("zscore", z)
        .where(F.abs(F.col("zscore")) > float(k))
        .select("series", "time_ns", F.col(field).cast("double").alias(field), "zscore")
        .orderBy("series", "time_ns")
    )


def zscore_outliers_oracle(
    measurement_sql: str, *, field: str, k: float = 3.0
) -> str:
    return f"""
WITH m AS ({measurement_sql}),
src AS (SELECT series, time_ns, {field} FROM m WHERE {field} IS NOT NULL),
stats AS (
  SELECT series,
         SUM(CAST(floor(CAST({field} AS DOUBLE) * 1e6) AS BIGINT)) AS _s,
         SUM(CAST(floor(CAST({field} AS DOUBLE) * CAST({field} AS DOUBLE) * 1e6) AS BIGINT)) AS _ss,
         COUNT(*) AS _n
  FROM src GROUP BY series),
z AS (
  SELECT src.series, time_ns, CAST({field} AS DOUBLE) AS {field},
         (CAST({field} AS DOUBLE) - CAST(_s AS DOUBLE) / 1e6 / _n)
               / sqrt((CAST(_ss AS DOUBLE) / 1e6 - CAST(_s AS DOUBLE) / 1e6 * (CAST(_s AS DOUBLE) / 1e6 / _n)) / (_n - 1)) AS zscore
  FROM src JOIN stats ON stats.series = src.series WHERE _n >= 2)
SELECT series, time_ns, {field}, zscore FROM z WHERE abs(zscore) > {k}
"""


def mad_outliers(
    df: DataFrame,
    *,
    field: str,
    k: float = 3.5,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Per-series MAD (median-absolute-deviation) outliers — the robust
    twin of ``zscore_outliers``: points whose modified z-score
    ``0.6745·(v − median) / MAD`` exceeds ``k`` in magnitude (3.5 is
    the Iglewicz–Hoaglin convention).  A z-score's mean/std are pulled
    toward the outliers themselves; medians are not, so MAD flags
    spikes that inflate their own std enough to hide.

    Series whose MAD is 0 (≥ half the points identical) are skipped —
    the modified z-score is undefined there.

    Float determinism: the continuous median (``percentile(…, 0.5)`` /
    ``quantile_cont``) interpolates identically in both engines
    (verified bit-level), and the score derives in double from those
    medians, emitted unrounded (bit-identical IEEE arithmetic).

    At 100 TB: two per-series aggregates (median, then MAD over
    |v − median|) joined back onto the scan.  The exact median buffers
    a series' values within its aggregation — the price of exactness;
    at extreme per-series cardinality use the approx-percentile
    operator to pre-screen.  No forced broadcast: the one-row-per-
    series stats frames join under AQE's runtime choice (the
    zscore_outliers policy).
    """
    src = df.where(
        (F.col("time_ns") >= t0) & (F.col("time_ns") <= t1) & F.col(field).isNotNull()
    )
    v = F.col(field).cast("double")
    med = src.groupBy("series").agg(
        F.expr(f"percentile(CAST({field} AS DOUBLE), 0.5)").alias("_med")
    )
    devs = src.join(med, "series").withColumn("_dev", F.abs(v - F.col("_med")))
    # `devs` feeds both the MAD aggregate and the final join; under the
    # adaptive size threshold materialize once.  No-op at real scale (r14).
    from simple_tsdb_spark.functions.adaptive import materialize_small

    devs = materialize_small(devs)
    mad = devs.groupBy("series").agg(
        F.expr("percentile(_dev, 0.5)").alias("_mad")
    )
    j = devs.join(mad, "series").where(F.col("_mad") > 0)
    mz = F.lit(0.6745) * (v - F.col("_med")) / F.col("_mad")
    return (
        j.withColumn("mscore", mz)
        .where(F.abs(F.col("mscore")) > float(k))
        .select("series", "time_ns", v.alias(field), "mscore")
        .orderBy("series", "time_ns")
    )


def mad_outliers_oracle(measurement_sql: str, *, field: str, k: float = 3.5) -> str:
    return f"""
WITH m AS ({measurement_sql}),
src AS (SELECT series, time_ns, CAST({field} AS DOUBLE) AS {field} FROM m WHERE {field} IS NOT NULL),
med AS (SELECT series, quantile_cont({field}, 0.5) AS _med FROM src GROUP BY series),
devs AS (
  SELECT src.series, time_ns, {field}, abs({field} - _med) AS _dev, _med
  FROM src JOIN med ON med.series = src.series),
mad AS (SELECT series, quantile_cont(_dev, 0.5) AS _mad FROM devs GROUP BY series),
sc AS (
  SELECT devs.series, time_ns, {field},
         CAST(0.6745 AS DOUBLE) * ({field} - _med) / _mad AS mscore
  FROM devs JOIN mad ON mad.series = devs.series WHERE _mad > 0)
SELECT series, time_ns, {field}, mscore FROM sc WHERE abs(mscore) > {k}
"""


def cusum_changepoints(
    df: DataFrame,
    *,
    field: str,
    k: float = 0.5,
    h: float = 5.0,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Two-sided CUSUM drift detection per series: standardize with the
    series' EXACT moments (the ``zscore_outliers`` BIGINT-grid trick), then

    ``S⁺ₜ = max(0, S⁺ₜ₋₁ + zₜ − k)``,  ``S⁻ₜ = max(0, S⁻ₜ₋₁ − zₜ − k)``

    and emit points where either statistic exceeds ``h`` — the page
    test that catches sustained small drifts a point-wise z-score never
    flags.  ``k`` is the slack (drift half-magnitude, in σ), ``h`` the
    decision threshold.

    Determinism: z derives unrounded from exact BIGINT-grid moments
    (identical IEEE doubles both engines), the recursion is an explicit
    fixed-op-order loop mirrored by the recursive-CTE oracle, and the
    statistics emit unrounded.  Series with fewer than 2 points or zero
    variance are skipped.  Sequential per series by definition —
    ``applyInPandas`` (the ewma/holt shape).
    """
    import pandas as pd  # noqa: F401 (worker-side)

    src = df.where(
        (F.col("time_ns") >= t0) & (F.col("time_ns") <= t1) & F.col(field).isNotNull()
    )
    v6 = F.expr(f"CAST(floor(CAST({field} AS DOUBLE) * 1e6) AS BIGINT)")
    vv6 = F.expr(
        f"CAST(floor(CAST({field} AS DOUBLE) * CAST({field} AS DOUBLE) * 1e6) AS BIGINT)"
    )
    stats = src.groupBy("series").agg(
        F.sum(v6).alias("_s"),
        F.sum(vv6).alias("_ss"),
        F.count(F.lit(1)).alias("_n"),
    )
    mean = F.col("_s").cast("double") / F.lit(1e6) / F.col("_n")
    var = (
        F.col("_ss").cast("double") / F.lit(1e6)
        - F.col("_s").cast("double") / F.lit(1e6) * mean
    ) / (F.col("_n") - 1)
    j = (
        src.join(stats, "series")
        .where((F.col("_n") >= 2) & (var > 0))
        .withColumn(
            "_z",
            (F.col(field).cast("double") - mean) / F.sqrt(var),
        )
        .select("series", "time_ns", F.col(field).cast("double").alias(field), "_z")
    )
    kf, hf = float(k), float(h)
    schema = (
        f"series string, time_ns long, {field} double, "
        "cusum_pos double, cusum_neg double"
    )

    def per_series(pdf):
        pdf = pdf.sort_values("time_ns")
        sp = sn = 0.0
        pos, neg = [], []
        for z in pdf["_z"]:
            z = float(z)
            sp = max(0.0, (sp + z) - kf)
            sn = max(0.0, (sn - z) - kf)
            pos.append(sp)
            neg.append(sn)
        return pdf.assign(cusum_pos=pos, cusum_neg=neg).drop(columns=["_z"])

    out = j.groupBy("series").applyInPandas(per_series, schema=schema)
    return out.where(
        (F.col("cusum_pos") > hf) | (F.col("cusum_neg") > hf)
    ).orderBy("series", "time_ns")


def cusum_changepoints_oracle(
    measurement_sql: str, *, field: str, k: float = 0.5, h: float = 5.0
) -> str:
    kf = f"CAST('{float(k)!r}' AS DOUBLE)"
    return f"""
WITH RECURSIVE m AS ({measurement_sql}),
src AS (SELECT series, time_ns, CAST({field} AS DOUBLE) AS v FROM m WHERE {field} IS NOT NULL),
stats AS (
  SELECT series,
         SUM(CAST(floor(v * 1e6) AS BIGINT)) AS _s,
         SUM(CAST(floor(v * v * 1e6) AS BIGINT)) AS _ss,
         COUNT(*) AS _n
  FROM src GROUP BY series),
z AS (
  SELECT src.series, time_ns, v,
         (v - CAST(_s AS DOUBLE) / 1e6 / _n)
               / sqrt((CAST(_ss AS DOUBLE) / 1e6 - CAST(_s AS DOUBLE) / 1e6 * (CAST(_s AS DOUBLE) / 1e6 / _n)) / (_n - 1)) AS _z,
         ROW_NUMBER() OVER (PARTITION BY src.series ORDER BY time_ns) AS rn
  FROM src JOIN stats ON stats.series = src.series
  WHERE _n >= 2
    AND (CAST(_ss AS DOUBLE) / 1e6 - CAST(_s AS DOUBLE) / 1e6 * (CAST(_s AS DOUBLE) / 1e6 / _n)) / (_n - 1) > 0),
rec AS (
  SELECT series, time_ns, v, rn,
         greatest(CAST(0.0 AS DOUBLE), _z - {kf}) AS sp,
         greatest(CAST(0.0 AS DOUBLE), -_z - {kf}) AS sn
  FROM z WHERE rn = 1
  UNION ALL
  SELECT o.series, o.time_ns, o.v, o.rn,
         greatest(CAST(0.0 AS DOUBLE), (r.sp + o._z) - {kf}),
         greatest(CAST(0.0 AS DOUBLE), (r.sn - o._z) - {kf})
  FROM rec r JOIN z o ON o.series = r.series AND o.rn = r.rn + 1)
SELECT series, time_ns, v AS {field},
       sp AS cusum_pos, sn AS cusum_neg
FROM rec WHERE sp > {float(h)!r} OR sn > {float(h)!r}
"""


def seasonal_decompose(
    df: DataFrame,
    *,
    field: str,
    period: int,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Classical additive decomposition per series —
    ``v = trend + seasonal + resid``:

    - ``trend``: centered moving average over ``period`` rows (odd
      period required; NULL where the window is incomplete);
    - ``seasonal``: the phase mean of the detrended values (phase =
      0-based row index mod period), uncentered (the classical
      centering offset is a constant shift into resid);
    - ``resid``: the remainder where both parts exist.

    Float determinism: the trend window sums DECIMAL(28,6) values
    (exact, frame-order independent), the detrended values quantize to
    9 decimals and their phase means accumulate as DECIMAL(28,9) —
    every emitted double derives from exact sums in identical order,
    so the result hash-matches the oracle.  One window pass + one
    phase aggregate join; rows only shuffle on (series) and
    (series, phase).
    """
    from pyspark.sql import Window

    p = int(period)
    if p < 3 or p % 2 == 0:
        raise ValueError("period must be an odd integer ≥ 3")
    k = (p - 1) // 2
    src = df.where(
        (F.col("time_ns") >= t0) & (F.col("time_ns") <= t1) & F.col(field).isNotNull()
    ).select("series", "time_ns", F.col(field).cast("double").alias(field))
    w = Window.partitionBy("series").orderBy("time_ns")
    q = F.col(field).cast("decimal(28,6)")
    # Kept as a sliding frame: the bollinger_bands prefix-sum rewrite was
    # A/B-measured a LOSS here (0.94× at sf0.1, r14.2) — at p=7 the ±k
    # frame is too narrow for the saved re-aggregation to pay for the
    # extra lead/lag window pass.
    wf = w.rowsBetween(-k, k)
    base = (
        src.withColumn("_rn", F.row_number().over(w))
        .withColumn("_ws", F.sum(q).over(wf))
        .withColumn("_wc", F.count(F.lit(1)).over(wf))
        .withColumn(
            "trend",
            F.when(F.col("_wc") == p, F.col("_ws").cast("double") / p),
        )
        .withColumn("_phase", (F.col("_rn") - 1) % p)
        .withColumn(
            "_det",
            F.expr(f"CAST(floor(({field} - trend) * CAST(1000000000 AS DOUBLE)) AS BIGINT)"),
        )
    )
    # `base` (the centered-MA window pass) feeds both the phase-mean
    # aggregate and the join back; under the adaptive size threshold the
    # window would otherwise run twice.  No-op at real scale (r14).
    from simple_tsdb_spark.functions.adaptive import materialize_small

    base = materialize_small(base)
    seas = base.groupBy("series", "_phase").agg(
        (
            F.sum("_det").cast("double") / F.lit(1e9) / F.count("_det")
        ).alias("seasonal")
    )
    return (
        base.join(seas, ["series", "_phase"])
        .select(
            "series",
            "time_ns",
            field,
            "trend",
            "seasonal",
            (F.col(field) - F.col("trend") - F.col("seasonal")).alias("resid"),
        )
        .orderBy("series", "time_ns")
    )


def seasonal_decompose_oracle(
    measurement_sql: str, *, field: str, period: int
) -> str:
    p = int(period)
    k = (p - 1) // 2
    return f"""
WITH m AS ({measurement_sql}),
src AS (
  SELECT series, time_ns, CAST({field} AS DOUBLE) AS v FROM m WHERE {field} IS NOT NULL),
base AS (
  SELECT series, time_ns, v,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY time_ns) AS _rn,
         SUM(CAST(v AS DECIMAL(28,6))) OVER (
           PARTITION BY series ORDER BY time_ns
           ROWS BETWEEN {k} PRECEDING AND {k} FOLLOWING) AS _ws,
         COUNT(*) OVER (
           PARTITION BY series ORDER BY time_ns
           ROWS BETWEEN {k} PRECEDING AND {k} FOLLOWING) AS _wc
  FROM src),
tr AS (
  SELECT series, time_ns, v, _rn,
         CASE WHEN _wc = {p} THEN CAST(_ws AS DOUBLE) / {p} END AS trend,
         (_rn - 1) % {p} AS _phase
  FROM base),
det AS (
  SELECT *, CAST(floor((v - trend) * CAST(1000000000 AS DOUBLE)) AS BIGINT) AS _det FROM tr),
seas AS (
  SELECT series, _phase,
         CAST(SUM(_det) AS DOUBLE) / CAST(1000000000 AS DOUBLE) / COUNT(_det) AS seasonal
  FROM det GROUP BY series, _phase)
SELECT det.series, time_ns, v AS {field}, trend, seas.seasonal,
       v - trend - seas.seasonal AS resid
FROM det JOIN seas ON seas.series = det.series AND seas._phase = det._phase
"""


def find_gaps(
    df: DataFrame,
    *,
    max_gap_ns: int,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Missing-data detection per series: every consecutive-point gap
    exceeding ``max_gap_ns`` in the range — (series, gap_start,
    gap_end, gap_ns), ordered.  The monitoring question every TSDB
    answers ("where did the sensor go quiet?"); one window pass, no
    joins — ``lead`` over the (series)-partitioned time order.
    """
    from pyspark.sql import Window

    src = df.where((F.col("time_ns") >= t0) & (F.col("time_ns") <= t1)).select(
        "series", "time_ns"
    )
    w = Window.partitionBy("series").orderBy("time_ns")
    return (
        src.withColumn("_next", F.lead("time_ns").over(w))
        .where(
            F.col("_next").isNotNull()
            & ((F.col("_next") - F.col("time_ns")) > int(max_gap_ns))
        )
        .select(
            "series",
            F.col("time_ns").alias("gap_start"),
            F.col("_next").alias("gap_end"),
            (F.col("_next") - F.col("time_ns")).alias("gap_ns"),
        )
        .orderBy("series", "gap_start")
    )


def find_gaps_oracle(measurement_sql: str, *, max_gap_ns: int) -> str:
    return f"""
WITH m AS ({measurement_sql}),
g AS (
  SELECT series, time_ns AS gap_start,
         LEAD(time_ns) OVER (PARTITION BY series ORDER BY time_ns) AS gap_end
  FROM m)
SELECT series, gap_start, gap_end, gap_end - gap_start AS gap_ns
FROM g WHERE gap_end IS NOT NULL AND gap_end - gap_start > {int(max_gap_ns)}
"""


def bollinger_bands(
    df: DataFrame,
    *,
    field: str,
    n: int = 20,
    k: float = 2.0,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Bollinger bands per series: trailing-``n``-point moving average
    ± ``k`` sample standard deviations — (series, time_ns, field, ma,
    upper, lower, breakout ∈ {-1,0,1}).  Rows with an incomplete
    trailing window are omitted (the classical convention).

    Float determinism: window sums accumulate DECIMAL(28,6) /
    DECIMAL(38,12) exactly (frame-order independent), ma/std derive in
    double from those exact sums, bands emitted unrounded — bit-equal to
    the oracle.  One window pass, no joins; the same windowed-exact-moment
    trick as ``seasonal_decompose``.
    """
    from pyspark.sql import Window

    N = int(n)
    if N < 2:
        raise ValueError("n must be ≥ 2")
    src = df.where(
        (F.col("time_ns") >= t0) & (F.col("time_ns") <= t1) & F.col(field).isNotNull()
    ).select("series", "time_ns", F.col(field).cast("double").alias(field))
    q = F.col(field).cast("decimal(28,6)")
    # Sliding-frame aggregates re-evaluate the whole N-row frame per row
    # (O(n·N) decimal adds).  The exact-decimal sums make prefix sums
    # lossless: running sum (incremental in WindowExec, O(n)) minus its
    # lag-N is bit-the-same frame sum, and the complete-frame test
    # _wc == N is just row_number ≥ N (r14.2 A/B: 1.28× min / 1.41× med
    # at sf0.1 vs the sliding-frame form; bit-exact vs the oracle).
    # OVERFLOW HEADROOM (VERDICT r14 #3/#8): the old N-row frame sum
    # bounded the accumulator at N·|v|² ≤ 20·10²⁶⁻²; the running prefix
    # accumulates the WHOLE series, so a series with Σv² > 10²⁶ (e.g.
    # |v| ≈ 4·10¹¹ for ~600 rows, or |v| ≈ 10¹⁰ for ~10⁶ rows) overflows
    # decimal(38,12) — and non-ANSI Spark turns that into NULL, which
    # would silently NULL the bands.  The assert_true guard below makes
    # that case a LOUD query error instead (one null-check per row,
    # codegen-fused, free in practice); every non-overflowing input is
    # bit-identical to before.  Inputs are non-null by the filter above,
    # so a NULL running sum can only mean overflow.
    wo = Window.partitionBy("series").orderBy("time_ns")
    wr = wo.rowsBetween(Window.unboundedPreceding, 0)
    zero6 = F.lit(0).cast("decimal(38,6)")
    zero12 = F.lit(0).cast("decimal(38,12)")
    chk = F.assert_true(
        F.col("_cs").isNotNull() & F.col("_css").isNotNull(),
        F.lit(
            "bollinger_bands: decimal prefix-sum overflow (series Σv or Σv² "
            "exceeded the 38-digit accumulator); split the series or scale "
            "the field down"
        ),
    )
    base = (
        src.withColumn("_rn", F.row_number().over(wo))
        .withColumn("_cs", F.sum(q).over(wr))
        .withColumn("_css", F.sum((q * q).cast("decimal(38,12)")).over(wr))
        .withColumn(
            "_ws",
            F.when(
                chk.isNull(),
                F.col("_cs") - F.coalesce(F.lag("_cs", N).over(wo), zero6),
            ),
        )
        .withColumn(
            "_wss", F.col("_css") - F.coalesce(F.lag("_css", N).over(wo), zero12)
        )
        .where(F.col("_rn") >= N)
    )
    ma = F.col("_ws").cast("double") / N
    var = (F.col("_wss").cast("double") - F.col("_ws").cast("double") * ma) / (N - 1)
    std = F.sqrt(var)
    upper = ma + F.lit(float(k)) * std
    lower = ma - F.lit(float(k)) * std
    v = F.col(field)
    return base.select(
        "series",
        "time_ns",
        field,
        ma.alias("ma"),
        upper.alias("upper"),
        lower.alias("lower"),
        F.when(v > upper, F.lit(1))
        .when(v < lower, F.lit(-1))
        .otherwise(F.lit(0))
        .alias("breakout"),
    ).orderBy("series", "time_ns")


def bollinger_bands_oracle(
    measurement_sql: str, *, field: str, n: int = 20, k: float = 2.0
) -> str:
    N = int(n)
    kf = f"CAST('{float(k)!r}' AS DOUBLE)"
    return f"""
WITH m AS ({measurement_sql}),
src AS (
  SELECT series, time_ns, CAST({field} AS DOUBLE) AS v FROM m WHERE {field} IS NOT NULL),
base AS (
  SELECT series, time_ns, v,
         SUM(CAST(v AS DECIMAL(28,6))) OVER tw AS _ws,
         SUM(CAST(CAST(v AS DECIMAL(28,6)) * CAST(v AS DECIMAL(28,6)) AS DECIMAL(38,12))) OVER tw AS _wss,
         COUNT(*) OVER tw AS _wc
  FROM src
  WINDOW tw AS (PARTITION BY series ORDER BY time_ns ROWS BETWEEN {N - 1} PRECEDING AND CURRENT ROW)),
bands AS (
  SELECT series, time_ns, v,
         CAST(_ws AS DOUBLE) / {N} AS ma,
         CAST(_ws AS DOUBLE) / {N} + {kf} * sqrt((CAST(_wss AS DOUBLE) - CAST(_ws AS DOUBLE) * (CAST(_ws AS DOUBLE) / {N})) / ({N} - 1)) AS upper,
         CAST(_ws AS DOUBLE) / {N} - {kf} * sqrt((CAST(_wss AS DOUBLE) - CAST(_ws AS DOUBLE) * (CAST(_ws AS DOUBLE) / {N})) / ({N} - 1)) AS lower
  FROM base WHERE _wc = {N})
SELECT series, time_ns, v AS {field}, ma, upper, lower,
       CASE WHEN v > upper THEN 1 WHEN v < lower THEN -1 ELSE 0 END AS breakout
FROM bands
"""


def incident_windows(
    df: DataFrame,
    *,
    field: str,
    k: float = 3.0,
    gap_ns: int,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Alert → incident rollup: z-score outlier points
    (``zscore_outliers``) merged into incident intervals per series —
    consecutive flagged points closer than ``gap_ns`` belong to one
    incident (gaps-and-islands).  Output (series, incident_start,
    incident_end, n_points, peak_zscore) — what an alerting pipeline
    pages on instead of raw point spam.

    One window pass over the (already sparse) flag stream; inherits
    zscore's exact-moment determinism, so the incident boundaries and
    peak statistics hash-match the oracle.
    """
    from pyspark.sql import Window

    flags = zscore_outliers(df, field=field, k=k, t0=t0, t1=t1)
    w = Window.partitionBy("series").orderBy("time_ns")
    grouped = flags.withColumn(
        "_new",
        F.when(
            F.lag("time_ns").over(w).isNull()
            | ((F.col("time_ns") - F.lag("time_ns").over(w)) > int(gap_ns)),
            1,
        ).otherwise(0),
    ).withColumn("_grp", F.sum("_new").over(w))
    return (
        grouped.groupBy("series", "_grp")
        .agg(
            F.min("time_ns").alias("incident_start"),
            F.max("time_ns").alias("incident_end"),
            F.count(F.lit(1)).alias("n_points"),
            F.max(F.abs(F.col("zscore"))).alias("peak_zscore"),
        )
        .select("series", "incident_start", "incident_end", "n_points", "peak_zscore")
        .orderBy("series", "incident_start")
    )


def incident_windows_oracle(
    measurement_sql: str, *, field: str, k: float = 3.0, gap_ns: int = 0
) -> str:
    inner = zscore_outliers_oracle(measurement_sql, field=field, k=k).strip()
    return f"""
WITH flags AS ({inner}),
grouped AS (
  SELECT series, time_ns, abs(zscore) AS az,
         SUM(CASE WHEN prev IS NULL OR time_ns - prev > {int(gap_ns)} THEN 1 ELSE 0 END)
           OVER (PARTITION BY series ORDER BY time_ns) AS _grp
  FROM (
    SELECT series, time_ns, zscore,
           LAG(time_ns) OVER (PARTITION BY series ORDER BY time_ns) AS prev
    FROM flags))
SELECT series, MIN(time_ns) AS incident_start, MAX(time_ns) AS incident_end,
       COUNT(*) AS n_points, MAX(az) AS peak_zscore
FROM grouped GROUP BY series, _grp
"""


def burn_rate_alerts(
    df: DataFrame,
    *,
    error_series: str = "error",
    short_ns: int,
    long_ns: int,
    slide_ns: int,
    short_threshold: float,
    long_threshold: float,
) -> DataFrame:
    """Multi-window error-budget burn alerts (the SRE workbook pattern):
    fire at window-end ``E`` when the error fraction over BOTH the
    trailing short window ``[E−short, E)`` and the trailing long window
    ``[E−long, E)`` clears its threshold — the short window gives fast
    detection, the long window suppresses blips.  Window membership uses
    Spark's native sliding-window convention (closed-left, open-right),
    so the streaming twin (``streaming_burn_rate``) is label-for-label
    identical.

    Output: one row per firing window end — (wend, short_errors,
    short_total, short_rate_ppm, long_errors, long_total,
    long_rate_ppm), ordered by wend — ALL BIGINT (integer-finals
    doctrine, round 10: no DOUBLE in gated projections).  The rates are
    parts-per-million truncated quotients ``(10^6·errors) div total``;
    thresholds must sit exactly on the same ppm grid
    (``functions.fractions.exact_ppm`` — sub-ppm values raise instead
    of silently coarsening the firing semantics) and the firing test
    is the exact integer cross-multiplication ``10^6·errors ≥
    ppm·total`` — no float comparison anywhere.  ``10^6·total``
    bounds the arithmetic: safe below ~9.2·10^12 points per long
    window.

    Scale: ONE explode to the long window's covering ends (fixed
    fan-out long/slide) with the short-window membership carried as a
    flag, then ONE map-side-combined shuffle on the uniform end key
    computing both granularities as conditional sums — no second
    aggregate, no end-keyed join.
    """
    s = int(slide_ns)
    w_s, w_l = int(short_ns), int(long_ns)
    for w in (w_s, w_l):
        if w % s != 0:
            raise ValueError("windows must be multiples of slide_ns")
    lo = (F.col("time_ns") - F.col("time_ns") % F.lit(s)) + F.lit(s)
    x = df.select(
        (F.col("series") == error_series).cast("long").alias("_e"),
        F.col("time_ns").alias("_t"),
        F.explode(F.sequence(lo, lo + F.lit(w_l - s), F.lit(s))).alias("wend"),
    ).withColumn("_in_s", (F.col("_t") >= F.col("wend") - F.lit(w_s)).cast("long"))
    agg = x.groupBy("wend").agg(
        F.sum(F.col("_e") * F.col("_in_s")).alias("short_errors"),
        F.sum("_in_s").alias("short_total"),
        F.sum("_e").alias("long_errors"),
        F.count(F.lit(1)).alias("long_total"),
    )
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
        .orderBy("wend")
    )


def burn_rate_alerts_oracle(
    measurement_sql: str,
    *,
    error_series: str = "error",
    short_ns: int,
    long_ns: int,
    slide_ns: int,
    short_threshold: float,
    long_threshold: float,
) -> str:
    s = int(slide_ns)
    w_s, w_l = int(short_ns), int(long_ns)
    return f"""
WITH m AS ({measurement_sql}),
x AS (
  SELECT CASE WHEN series = '{error_series}' THEN 1 ELSE 0 END AS _e, time_ns AS _t,
         UNNEST(generate_series(
           (time_ns - time_ns % {s}) + {s},
           (time_ns - time_ns % {s}) + {w_l},
           {s})) AS wend
  FROM m),
agg AS (
  SELECT wend,
         SUM(_e * (CASE WHEN _t >= wend - {w_s} THEN 1 ELSE 0 END)) AS short_errors,
         SUM(CASE WHEN _t >= wend - {w_s} THEN 1 ELSE 0 END) AS short_total,
         SUM(_e) AS long_errors, COUNT(*) AS long_total
  FROM x GROUP BY wend)
SELECT wend, CAST(short_errors AS BIGINT) AS short_errors,
       CAST(short_total AS BIGINT) AS short_total,
       CAST((1000000 * short_errors) // short_total AS BIGINT) AS short_rate_ppm,
       CAST(long_errors AS BIGINT) AS long_errors, long_total,
       CAST((1000000 * long_errors) // long_total AS BIGINT) AS long_rate_ppm
FROM agg
WHERE short_total > 0
  AND 1000000 * short_errors >= {exact_ppm(short_threshold, name="short_threshold")} * short_total
  AND 1000000 * long_errors >= {exact_ppm(long_threshold, name="long_threshold")} * long_total
"""


def heatmap_bins(
    df: DataFrame,
    *,
    field: str,
    t0: int,
    t1: int,
    window_ns: int,
    lo: float,
    hi: float,
    nbins: int,
    series: str | None = None,
) -> DataFrame:
    """2-D heatmap: per (time window, value bin) point counts — what a
    Grafana heatmap panel renders (value distribution drifting over
    time, the multi-series view Min/Max zoom can't show).  Bin edges use
    the :func:`value_histogram` convention (fixed width over [lo, hi),
    out-of-range values clamp into the edge bins).

    Pure integer bucketing + counting — hash-exact; ONE shuffle on the
    uniform (series, wstart, bin) key with map-side combine.
    """
    width = (hi - lo) / nbins
    raw = F.floor((F.col(field) - F.lit(lo)) / F.lit(width))
    bin_ = F.least(F.greatest(raw, F.lit(0)), F.lit(nbins - 1)).cast("long")
    src = df.where(
        F.col(field).isNotNull() & F.col("time_ns").between(int(t0), int(t1))
    )
    if series is not None:
        src = src.where(F.col("series") == series)
    w = int(window_ns)
    return (
        src.groupBy(
            "series",
            (F.col("time_ns") - (F.col("time_ns") % F.lit(w))).alias("wstart"),
            bin_.alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("series", "wstart", "bin")
    )


def heatmap_bins_oracle(
    measurement_sql: str,
    *,
    field: str,
    t0: int,
    t1: int,
    window_ns: int,
    lo: float,
    hi: float,
    nbins: int,
) -> str:
    width = (hi - lo) / nbins
    return f"""
SELECT series, time_ns - (time_ns % {int(window_ns)}) AS wstart,
       CAST(least(greatest(floor(({field} - {lo!r}) / {width!r}), 0), {nbins - 1}) AS BIGINT) AS bin,
       COUNT(*) AS n
FROM ({measurement_sql})
WHERE {field} IS NOT NULL AND time_ns BETWEEN {int(t0)} AND {int(t1)}
GROUP BY 1, 2, 3
"""


def top_values_per_series(
    df: DataFrame, *, field: str, k: int, t0: int = 0, t1: int = 2**63 - 1,
    tiebreak: str = "time_ns",
) -> DataFrame:
    """Top-``k`` points by value per series (value desc, ``tiebreak``
    asc) — the "worst offenders" readout (slowest requests, largest
    payments).  Rank rides a per-series window; at scale each partition
    pre-prunes with its local heap before the single series-keyed
    exchange.
    """
    src = df.where(
        F.col(field).isNotNull() & F.col("time_ns").between(int(t0), int(t1))
    )
    w = Window.partitionBy("series").orderBy(F.col(field).desc(), F.col(tiebreak))
    keep = ["series", "time_ns", field]
    if tiebreak not in keep:
        keep.append(tiebreak)
    return (
        src.select(*keep)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("series", "time_ns", field, "rank")
        .orderBy("series", "rank")
    )


def top_values_per_series_oracle(
    measurement_sql: str, *, field: str, k: int, t0: int = 0, t1: int = 2**63 - 1,
    tiebreak: str = "time_ns",
) -> str:
    return f"""
SELECT series, time_ns, {field}, rank FROM (
  SELECT series, time_ns, {field},
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY {field} DESC, {tiebreak}) AS rank
  FROM ({measurement_sql})
  WHERE {field} IS NOT NULL AND time_ns BETWEEN {int(t0)} AND {int(t1)})
WHERE rank <= {int(k)}
"""


def autocorr(
    df: DataFrame,
    *,
    field: str,
    lags: Sequence[int] = (1, 2, 3),
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Per-series lag-``k`` autocorrelation (Pearson over the
    (x_i, x_{i+k}) pairs) — the seasonality/memory diagnostic behind
    lag selection for forecasting and anomaly baselines: acf≈0 says a
    lag carries no signal, a spike at lag k exposes a k-step cycle.

    Output: (series, lag, n_pairs, acf), one row per requested lag per
    series with ≥ 2 pairs and non-degenerate variance on both ends.

    Float determinism: the five pair moments (Σx, Σy, Σx², Σy², Σxy)
    accumulate as EXACT BIGINTs on the ``floor(·1e6)`` grid — each
    product/square quantized ONCE per pair row (the zscore_outliers
    scheme; both pair members sit in one row after the lead, so the
    cross term quantizes directly) — then the correlation derives in
    double with the identical IEEE op order in both engines, emitted
    UNROUNDED.  Same domain contract as zscore_outliers: scaled sums
    within 2^53.

    At 100 TB: ONE shuffle on series for the lead window; the per-lag
    pair stream is produced by a codegen stack (no extra exchange — the
    (series, lag) aggregate rides the series partitioning with
    map-side combine), and the output is lags × series rows.
    """
    lags = [int(a) for a in lags]
    if not lags or any(a <= 0 for a in lags):
        raise ValueError("lags must be positive")
    v = F.col(field).cast("double")
    src = df.where(
        (F.col("time_ns") >= t0) & (F.col("time_ns") <= t1) & F.col(field).isNotNull()
    ).select("series", "time_ns", v.alias("_v"))
    w = Window.partitionBy("series").orderBy("time_ns")
    leads = src.select(
        "series",
        "_v",
        *[F.lead("_v", a).over(w).alias(f"_l{a}") for a in lags],
    )
    # stack to (lag, x, y) pair rows — codegen, no shuffle
    stacked = leads.select(
        "series",
        F.expr(
            "stack({n}, {args}) AS (lag, _x, _y)".format(
                n=len(lags),
                args=", ".join(f"CAST({a} AS BIGINT), _v, _l{a}" for a in lags),
            )
        ),
    ).where(F.col("_y").isNotNull())
    q = lambda c: F.floor(c * F.lit(1e6)).cast("long")  # noqa: E731
    agg = stacked.groupBy("series", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(q(F.col("_x"))).alias("_sx"),
        F.sum(q(F.col("_y"))).alias("_sy"),
        F.sum(q(F.col("_x") * F.col("_x"))).alias("_sxx"),
        F.sum(q(F.col("_y") * F.col("_y"))).alias("_syy"),
        F.sum(q(F.col("_x") * F.col("_y"))).alias("_sxy"),
    )
    n = F.col("n_pairs").cast("double")
    sx = F.col("_sx").cast("double") / F.lit(1e6)
    sy = F.col("_sy").cast("double") / F.lit(1e6)
    sxx = F.col("_sxx").cast("double") / F.lit(1e6)
    syy = F.col("_syy").cast("double") / F.lit(1e6)
    sxy = F.col("_sxy").cast("double") / F.lit(1e6)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    acf = (n * sxy - sx * sy) / (F.sqrt(vx) * F.sqrt(vy))
    return (
        agg.where((F.col("n_pairs") >= 2) & (vx > 0) & (vy > 0))
        .select("series", "lag", "n_pairs", acf.alias("acf"))
        .orderBy("series", "lag")
    )


def autocorr_oracle(
    measurement_sql: str, *, field: str, lags: Sequence[int] = (1, 2, 3)
) -> str:
    lag_rows = " UNION ALL ".join(
        f"SELECT series, CAST({int(a)} AS BIGINT) AS lag, _v AS _x, "
        f"LEAD(_v, {int(a)}) OVER (PARTITION BY series ORDER BY time_ns) AS _y FROM src"
        for a in lags
    )
    return f"""
WITH m AS ({measurement_sql}),
src AS (SELECT series, time_ns, CAST({field} AS DOUBLE) AS _v FROM m
        WHERE {field} IS NOT NULL),
pairs AS (SELECT * FROM ({lag_rows}) WHERE _y IS NOT NULL),
agg AS (
  SELECT series, lag, COUNT(*) AS n_pairs,
         SUM(CAST(floor(_x * 1e6) AS BIGINT)) AS _sx,
         SUM(CAST(floor(_y * 1e6) AS BIGINT)) AS _sy,
         SUM(CAST(floor(_x * _x * 1e6) AS BIGINT)) AS _sxx,
         SUM(CAST(floor(_y * _y * 1e6) AS BIGINT)) AS _syy,
         SUM(CAST(floor(_x * _y * 1e6) AS BIGINT)) AS _sxy
  FROM pairs GROUP BY series, lag)
SELECT series, lag, n_pairs,
       (CAST(n_pairs AS DOUBLE) * (CAST(_sxy AS DOUBLE) / 1e6)
          - (CAST(_sx AS DOUBLE) / 1e6) * (CAST(_sy AS DOUBLE) / 1e6))
       / (sqrt(CAST(n_pairs AS DOUBLE) * (CAST(_sxx AS DOUBLE) / 1e6)
                 - (CAST(_sx AS DOUBLE) / 1e6) * (CAST(_sx AS DOUBLE) / 1e6))
          * sqrt(CAST(n_pairs AS DOUBLE) * (CAST(_syy AS DOUBLE) / 1e6)
                 - (CAST(_sy AS DOUBLE) / 1e6) * (CAST(_sy AS DOUBLE) / 1e6))) AS acf
FROM agg
WHERE n_pairs >= 2
  AND CAST(n_pairs AS DOUBLE) * (CAST(_sxx AS DOUBLE) / 1e6)
        - (CAST(_sx AS DOUBLE) / 1e6) * (CAST(_sx AS DOUBLE) / 1e6) > 0
  AND CAST(n_pairs AS DOUBLE) * (CAST(_syy AS DOUBLE) / 1e6)
        - (CAST(_sy AS DOUBLE) / 1e6) * (CAST(_sy AS DOUBLE) / 1e6) > 0
"""


def range_moving_avg(df: DataFrame, *, field: str, window_ns: int) -> DataFrame:
    """Trailing TIME-window rolling mean per series — the RANGE-frame
    sibling of :func:`moving_avg` (``n_points`` rows ≠ a fixed duration
    when sampling is irregular; SLO math wants duration).  The frame is
    ``(t − window_ns, t]``: ``RANGE (window_ns−1) PRECEDING`` on the
    integer ``time_ns`` ordering, so duplicate timestamps are peers in
    BOTH engines and the inclusive-bound semantics match exactly.

    Exactness: decimal(28,6) window sum → one double cast → unrounded
    quotient (the proven moving_avg contract).  One shuffle keyed by
    series; the RANGE frame is a sliding two-pointer over each sorted
    partition, never a per-row rescan.
    """
    if window_ns < 1:
        raise ValueError("window_ns must be >= 1")
    w = (
        Window.partitionBy("series")
        .orderBy("time_ns")
        .rangeBetween(-(int(window_ns) - 1), Window.currentRow)
    )
    s = F.sum(F.col(field).cast("decimal(28,6)")).over(w).cast("double")
    n = F.count(F.col(field)).over(w)
    return df.select(
        "series",
        "time_ns",
        F.when(n > 0, s / n).alias(f"{field}_rmavg"),
        n.alias("n_in_window"),
    ).orderBy("series", "time_ns")


def range_moving_avg_oracle(measurement_sql: str, *, field: str, window_ns: int) -> str:
    return f"""
SELECT series, time_ns,
       CASE WHEN COUNT({field}) OVER w > 0
            THEN CAST(SUM(CAST({field} AS DECIMAL(28,6))) OVER w AS DOUBLE)
                 / COUNT({field}) OVER w
       END AS {field}_rmavg,
       COUNT({field}) OVER w AS n_in_window
FROM ({measurement_sql})
WINDOW w AS (PARTITION BY series ORDER BY time_ns
             RANGE BETWEEN {int(window_ns) - 1} PRECEDING AND CURRENT ROW)
"""
