"""W1–W3 — per-point analytic transforms (tare / difference / derivative).

The reference implements these client-side in its Grafana datasource over
query results (``grafana/.../pkg/plugin/datasource.go``):

- Tare (datasource.go:1946-1994): subtract the series' first non-null
  value from every value.
- Difference (datasource.go:1996-2039): ``v_i − v_{i−1}`` (NULL if either
  is NULL).
- Derivative (datasource.go:2041-2095): ``period · (v_i − v_{i−1}) / Δt_sec``
  with period ∈ {1 (per-second), 60 (per-minute), 3600 (per-hour)}.

Spark-first: ordinary window functions over
``Window.partitionBy("series").orderBy("time_ns")`` — the engine-side
generalization of what the reference could only do client-side on a single
series' result set.  One shuffle keyed by series; with storage sorted by
(series, time_ns) the per-partition sort is a cheap nearly-sorted pass.
These are single IEEE operations per row (no accumulation), so results are
bit-deterministic and need no ``exact`` mode.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.timeutil import clamp_time_range


def _prep(
    df: DataFrame,
    fields: Sequence[str],
    series: str | Sequence[str] | None,
    t0: int,
    t1: int,
) -> DataFrame:
    t0, t1 = clamp_time_range(t0, t1)
    out = df.where(F.col("time_ns").between(t0, t1))
    if series is not None:
        if isinstance(series, str):
            out = out.where(F.col("series") == series)
        else:
            out = out.where(F.col("series").isin(list(series)))
    return out.select("series", "time_ns", *fields)


def _w():
    return Window.partitionBy("series").orderBy("time_ns")


def tare(
    df: DataFrame,
    *,
    fields: Sequence[str],
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """W1 — value minus the first non-null value of the series in range."""
    out = _prep(df, fields, series, t0, t1)
    w = _w().rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for f in fields:
        first = F.first(F.col(f), ignorenulls=True).over(w)
        out = out.withColumn(f"{f}_tare", (F.col(f) - first).cast("double"))
    return out.select("series", "time_ns", *[f"{f}_tare" for f in fields]).orderBy(
        "series", "time_ns"
    )


def difference(
    df: DataFrame,
    *,
    fields: Sequence[str],
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """W2 — ``v_i − v_{i−1}`` per series (NULL for the first point / NULL gaps)."""
    out = _prep(df, fields, series, t0, t1)
    for f in fields:
        out = out.withColumn(f"{f}_diff", (F.col(f) - F.lag(f).over(_w())).cast("double"))
    return out.select("series", "time_ns", *[f"{f}_diff" for f in fields]).orderBy(
        "series", "time_ns"
    )


def counter_rate(
    df: DataFrame,
    *,
    fields: Sequence[str],
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
) -> DataFrame:
    """Monotone-counter rate with reset handling (beyond the reference's
    plain derivative): when a counter decreases (process restart), the
    pre-reset baseline is taken as 0, so the rate is ``v_i / Δt`` instead
    of a large negative spike — the standard Prometheus-style rule."""
    out = _prep(df, fields, series, t0, t1)
    dt_sec = (F.col("time_ns") - F.lag("time_ns").over(_w())).cast("double") / F.lit(1e9)
    for f in fields:
        v = F.col(f).cast("double")
        lv = F.lag(f).over(_w()).cast("double")
        dv = F.when(v >= lv, v - lv).otherwise(v)
        out = out.withColumn(f"{f}_crate", dv / dt_sec)
    return out.select("series", "time_ns", *[f"{f}_crate" for f in fields]).orderBy(
        "series", "time_ns"
    )


def counter_rate_oracle(measurement_sql: str, *, field: str) -> str:
    return f"""
SELECT series, time_ns,
       (CASE WHEN CAST({field} AS DOUBLE) >= CAST(LAG({field}) OVER w AS DOUBLE)
             THEN CAST({field} AS DOUBLE) - CAST(LAG({field}) OVER w AS DOUBLE)
             ELSE CAST({field} AS DOUBLE) END)
       / ((time_ns - LAG(time_ns) OVER w) / 1e9) AS {field}_crate
FROM ({measurement_sql})
WINDOW w AS (PARTITION BY series ORDER BY time_ns)
"""


def derivative(
    df: DataFrame,
    *,
    fields: Sequence[str],
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    period_sec: float = 1.0,
) -> DataFrame:
    """W3 — ``period · Δv / Δt_sec`` per series.

    ``period_sec``: 1 → units/second, 60 → units/minute, 3600 → units/hour
    (the reference's three Grafana variants, datasource.go:262-268).
    """
    out = _prep(df, fields, series, t0, t1)
    dt_sec = (F.col("time_ns") - F.lag("time_ns").over(_w())).cast("double") / F.lit(1e9)
    for f in fields:
        dv = F.col(f).cast("double") - F.lag(f).over(_w()).cast("double")
        out = out.withColumn(f"{f}_rate", F.lit(float(period_sec)) * dv / dt_sec)
    return out.select("series", "time_ns", *[f"{f}_rate" for f in fields]).orderBy(
        "series", "time_ns"
    )
