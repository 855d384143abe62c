"""Gap handling: fill modes over the window-aggregate spine, plus EWMA.

``fill_windows`` post-processes A2/A3 output (which emits empty buckets as
NULL — sum_op.cc:108-111 semantics) with the fill policies every TSDB
frontend offers:

- ``'null'``   — keep NULLs (reference behavior);
- ``'zero'``   — 0 for empty buckets;
- ``'previous'`` — last observation carried forward;
- ``'linear'`` — linear interpolation between the neighboring non-empty
  buckets (exterior gaps stay NULL).

All window-function based (two passes over the spine, no UDF, no extra
shuffle beyond the existing per-series sort) and portable to SQL.

``ewma`` is the deliberately non-SQL-expressible one — a recursive
per-series scan — implemented the Spark-idiomatic way for custom stateful
operators: Arrow-batched ``applyInPandas`` per series, vectorized inside
each group.  At 100 TB it shuffles once on series and streams each series
through pandas in columnar batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fill_windows(
    agg: DataFrame, *, value_col: str, mode: str = "linear", time_col: str = "wstart"
) -> DataFrame:
    """Fill NULL buckets of a windowed-aggregate result (per series)."""
    if mode == "null":
        return agg
    if mode == "zero":
        return agg.withColumn(value_col, F.coalesce(F.col(value_col), F.lit(0.0)))
    w = Window.partitionBy("series").orderBy(time_col)
    prev_w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    next_w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    last_v = F.last(F.col(value_col), ignorenulls=True).over(prev_w)
    if mode == "previous":
        return agg.withColumn(value_col, last_v)
    if mode != "linear":
        raise ValueError(f"unknown fill mode {mode!r}")
    # carry the time of the neighboring non-null buckets too
    t_of_v = F.when(F.col(value_col).isNotNull(), F.col(time_col))
    last_t = F.last(t_of_v, ignorenulls=True).over(prev_w)
    next_v = F.first(F.col(value_col), ignorenulls=True).over(next_w)
    next_t = F.first(t_of_v, ignorenulls=True).over(next_w)
    frac = (F.col(time_col) - last_t).cast("double") / (next_t - last_t).cast("double")
    interp = last_v + (next_v - last_v) * frac
    filled = (
        F.when(F.col(value_col).isNotNull(), F.col(value_col))
        .when(last_t.isNull() | next_t.isNull(), F.lit(None))
        .otherwise(interp)
    )
    return agg.withColumn(value_col, filled)


def ewma(
    df: DataFrame, *, field: str, alpha: float, out_col: str | None = None
) -> DataFrame:
    """Exponentially weighted moving average per series (recursive:
    ``y_i = α·v_i + (1-α)·y_{i-1}``, NULLs skipped without weight decay —
    pandas ``ewm(adjust=False, ignore_na=True)`` semantics)."""
    import pandas as pd  # noqa: F401 (worker-side)

    out = out_col or f"{field}_ewma"
    in_cols = ["series", "time_ns", field]
    schema = f"series string, time_ns long, {field} double, {out} double"
    a = float(alpha)

    def per_series(pdf):
        pdf = pdf.sort_values("time_ns")
        pdf[out] = pdf[field].ewm(alpha=a, adjust=False, ignore_na=True).mean()
        return pdf

    return (
        df.select(*in_cols)
        .withColumn(field, F.col(field).cast("double"))
        .groupBy("series")
        .applyInPandas(per_series, schema=schema)
    )


def ewma_oracle(measurement_sql: str, *, field: str, alpha: float, out_col: str | None = None) -> str:
    """DuckDB recursive-CTE twin of ``ewma`` — bit-identical doubles.

    Replicates pandas ``ewm(adjust=False)``'s exact FP op order
    (``_libs/window/aggregations.pyx``): pandas first converts
    ``com = (1-α)/α`` and works with the reconstituted
    ``α_eff = 1/(1+com)`` — NOT necessarily bit-equal to α (hypothesis
    found 1-ulp divergence chains for α that don't round-trip;
    test_properties pins the full recurrence).  The update is
    ``((1-α_eff)·y + α_eff·v) / ((1-α_eff) + α_eff)`` — the denominator
    is NOT folded to 1.0 — with the ``y == v`` short-circuit that keeps
    the value unchanged on exact equality.  ``repr`` round-trips the
    doubles so both engines parse the same bits.

    NULL ``field`` values follow ignore_na carry-forward (NULL rows keep
    the running value; leading NULLs stay NULL until the first
    observation) — the same semantics the Spark operator gets from
    pandas.  Assumes unique (series, time_ns) keys (true of the driver's
    events tables; ties would make both engines order-dependent).
    """
    out = out_col or f"{field}_ewma"
    com = (1.0 - float(alpha)) / float(alpha)
    a_eff = 1.0 / (1.0 + com)
    # String-parse the weights: a bare 17-digit literal is typed DECIMAL
    # by DuckDB and converts to a 1-ulp-off double; CAST('…' AS DOUBLE)
    # is correctly rounded.
    a = f"CAST('{a_eff!r}' AS DOUBLE)"
    b = f"CAST('{1.0 - a_eff!r}' AS DOUBLE)"
    return f"""
WITH RECURSIVE ord AS (
  SELECT series, time_ns, CAST({field} AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY time_ns) AS rn
  FROM ({measurement_sql})),
rec AS (
  SELECT series, time_ns, v, rn, v AS ew FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.series, o.time_ns, o.v, o.rn,
         CASE WHEN o.v IS NULL THEN r.ew
              WHEN r.ew IS NULL THEN o.v
              WHEN r.ew = o.v THEN r.ew
              ELSE (({b} * r.ew) + ({a} * o.v)) / ({b} + {a}) END
  -- null-safe series join: a NULL series is a real group (Spark's
  -- applyInPandas recurses it like any other)
  FROM rec r JOIN ord o ON o.series IS NOT DISTINCT FROM r.series AND o.rn = r.rn + 1)
SELECT series, time_ns, v AS {field}, ew AS {out} FROM rec
"""


def holt_linear(
    df: DataFrame, *, field: str, alpha: float = 0.5, beta: float = 0.3
) -> DataFrame:
    """Holt double exponential smoothing per series — level + trend:

    ``l₁ = v₁, b₁ = 0``;
    ``lₜ = α·vₜ + (1−α)·(lₜ₋₁ + bₜ₋₁)``;
    ``bₜ = β·(lₜ − lₜ₋₁) + (1−β)·bₜ₋₁``.

    Output (series, time_ns, field, level, trend).  NULL ``field`` rows
    are dropped (state is over observations).  The recursion runs as an
    explicit per-series loop (``applyInPandas``, the EWMA pattern) with
    a fixed FP op order mirrored literally by the DuckDB recursive-CTE
    oracle — the unrounded doubles hash-match.

    At 100 TB: sequential-by-construction per series, so the shuffle is
    one partitioning by series and each task runs its series' loop —
    the same cost/shape as ewma; state is O(1) per series.
    """
    import pandas as pd  # noqa: F401 (worker-side)

    a, b1m = float(alpha), 1.0 - float(alpha)
    bt, bt1m = float(beta), 1.0 - float(beta)
    schema = f"series string, time_ns long, {field} double, level double, trend double"

    def per_series(pdf):
        pdf = pdf.sort_values("time_ns")
        lvls, trds = [], []
        lvl = trd = None
        for v in pdf[field]:
            v = float(v)
            if lvl is None:
                lvl, trd = v, 0.0
            else:
                new_lvl = (a * v) + (b1m * (lvl + trd))
                trd = (bt * (new_lvl - lvl)) + (bt1m * trd)
                lvl = new_lvl
            lvls.append(lvl)
            trds.append(trd)
        pdf = pdf.assign(level=lvls, trend=trds)
        return pdf

    return (
        df.select("series", "time_ns", F.col(field).cast("double").alias(field))
        .where(F.col(field).isNotNull())
        .groupBy("series")
        .applyInPandas(per_series, schema=schema)
    )


def holt_linear_oracle(
    measurement_sql: str, *, field: str, alpha: float = 0.5, beta: float = 0.3
) -> str:
    """Recursive-CTE twin of ``holt_linear`` with the identical FP op
    order (string-parsed double literals, see ewma_oracle)."""
    a = f"CAST('{float(alpha)!r}' AS DOUBLE)"
    b1m = f"CAST('{1.0 - float(alpha)!r}' AS DOUBLE)"
    bt = f"CAST('{float(beta)!r}' AS DOUBLE)"
    bt1m = f"CAST('{1.0 - float(beta)!r}' AS DOUBLE)"
    return f"""
WITH RECURSIVE ord AS (
  SELECT series, time_ns, CAST({field} AS DOUBLE) AS v,
         ROW_NUMBER() OVER (PARTITION BY series ORDER BY time_ns) AS rn
  FROM ({measurement_sql}) WHERE {field} IS NOT NULL),
rec AS (
  SELECT series, time_ns, v, rn, v AS lvl, CAST(0.0 AS DOUBLE) AS trd
  FROM ord WHERE rn = 1
  UNION ALL
  SELECT o.series, o.time_ns, o.v, o.rn,
         ({a} * o.v) + ({b1m} * (r.lvl + r.trd)),
         ({bt} * ((({a} * o.v) + ({b1m} * (r.lvl + r.trd))) - r.lvl)) + ({bt1m} * r.trd)
  -- null-safe series join (see ewma_oracle)
  FROM rec r JOIN ord o ON o.series IS NOT DISTINCT FROM r.series AND o.rn = r.rn + 1)
SELECT series, time_ns, v AS {field}, lvl AS level, trd AS trend FROM rec
"""
