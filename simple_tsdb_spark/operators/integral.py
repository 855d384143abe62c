"""A4 — trapezoidal integral over a time range.

Reference (``/root/reference/src/libtsdb/integral_op.cc:5-103``): per field

    integral = Σ 0.5 · (v_i + v_{i-1}) · (t_i − t_{i-1}) / 1e9      [value·sec]

over all points of ``[t0, t1]``; any NULL sample among the integrated
points poisons that field's whole integral to NULL
(``is_null |=``, integral_op.cc:48).  A single point yields
integral = that point's value (integral_op.cc:96-102); zero points yield
nothing.  The result carries ``t0_ns``/``t1_ns`` — the actual first/last
integrated timestamps — so clients can derive the range average
(``main.cc:276-287``, ``client.py:461-481``).

Spark-first: lag() over (partitionBy series, orderBy time_ns) builds each
trapezoid, then one groupBy(series) reduces.  Two shuffles total (window
sort + final agg), both keyed by series; the window sort is exactly the
reference's per-series time order, which the storage layout already
provides within row groups, so at scale the sort is cheap (nearly-sorted
input, spillable).

``exact=True``: trapezoid areas are accumulated in integer/decimal space —
micro-units of value × µs of time — so the sum is order-independent and
bit-comparable against any other engine; the default path sums doubles
(fast, codegen).  Exact mode assumes value columns carry ≤6 meaningful
decimals and µs-resolution timestamps (true of the driver's events table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.timeutil import clamp_time_range
from simple_tsdb_spark.sources.measurement import field_columns


def integrate_points(
    df: DataFrame,
    *,
    fields: Sequence[str] | None = None,
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    exact: bool = False,
) -> DataFrame:
    """Per series: ``t0_ns, t1_ns, npoints`` and one ``{f}_integral`` per
    field (NULL if any integrated sample of that field was NULL).

    Series with no points in range produce no row (the reference reports
    an all-NULL result there; emitting nothing is the multi-series
    equivalent).
    """
    t0, t1 = clamp_time_range(t0, t1)
    if fields is None or len(fields) == 0:
        fields = field_columns(df)

    src = df.where(F.col("time_ns").between(t0, t1))
    if series is not None:
        if isinstance(series, str):
            src = src.where(F.col("series") == series)
        else:
            src = src.where(F.col("series").isin(list(series)))
    src = src.select("series", "time_ns", *fields)

    w = Window.partitionBy("series").orderBy("time_ns")
    lag_t = F.lag("time_ns").over(w)
    proj: list[F.Column] = [F.col("series"), F.col("time_ns"), lag_t.alias("_lag_t")]
    for f in fields:
        v = F.col(f)
        lag_v = F.lag(f).over(w)
        if exact:
            # Integer trapezoid: (v_i + v_{i-1}) in micro-units × Δt in ns.
            # Each term fits and sums exactly in DECIMAL(38,0); the final
            # ×0.5e-6(value-scale)×1e-9(ns→s) happens once, in double.
            vm = F.round(v * 1e6).cast("long")
            lvm = F.round(lag_v * 1e6).cast("long")
            area = (
                (vm + lvm).cast("decimal(38,0)")
                * (F.col("time_ns") - lag_t).cast("decimal(38,0)")
            )
            area = F.when(lag_t.isNotNull(), F.coalesce(area, F.lit(0).cast("decimal(38,0)")))
        else:
            area = F.when(
                lag_t.isNotNull(),
                F.coalesce(
                    0.5 * (v.cast("double") + lag_v.cast("double"))
                    * (F.col("time_ns") - lag_t).cast("double")
                    / F.lit(1e9),
                    F.lit(0.0),
                ),
            )
        proj += [
            area.alias(f"_area_{f}"),
            v.isNull().cast("int").alias(f"_null_{f}"),
            v.cast("double").alias(f"_v_{f}"),
        ]

    terms = src.select(*proj)

    aggs: list[F.Column] = [
        F.min("time_ns").alias("t0_ns"),
        F.max("time_ns").alias("t1_ns"),
        F.count(F.lit(1)).alias("npoints"),
    ]
    for f in fields:
        raw_sum = F.sum(F.col(f"_area_{f}"))
        if exact:
            total = raw_sum.cast("double") * F.lit(0.5e-15)
        else:
            total = raw_sum
        single = F.max(F.col(f"_v_{f}"))  # only row when npoints == 1
        poisoned = F.max(F.col(f"_null_{f}")) == 1
        aggs.append(
            F.when(poisoned, F.lit(None).cast("double"))
            .otherwise(F.when(F.count(F.lit(1)) == 1, single).otherwise(total))
            .alias(f"{f}_integral")
        )
    return terms.groupBy("series").agg(*aggs).orderBy("series")


def time_weighted_avg(
    df: DataFrame,
    *,
    field: str = "value",
    t0: int = 0,
    t1: int = 2**63 - 1,
    window_ns: int,
    series: str | Sequence[str] | None = None,
) -> DataFrame:
    """Time-weighted average per series per tumbling window — the
    linear-interpolation ``time_weight`` of hypertable rollups: trapezoid
    integral of the points inside the window divided by the covered
    duration ``t_last − t_first``.  The right average for irregularly
    sampled gauges, where the plain mean over-weights bursts.

    Conventions follow A4 (:func:`integrate_points`,
    ``/root/reference/src/libtsdb/integral_op.cc:96-102``): a single
    point yields its own value; any NULL sample poisons the window.
    Windows with no points emit nothing (a time-weighted average of an
    empty window is undefined — unlike A2's empty-bucket sums).

    Float determinism: trapezoid areas accumulate as exact
    micro-value × ns integers in DECIMAL(38,0); the final projection is
    one decimal→double cast and two IEEE divisions, replicated verbatim
    in the oracle.  Assumes ≤6 meaningful decimals (the A4 contract).

    Scale: one shuffle keyed (series, window) — finer than A4's
    per-series key, so a giant series spreads over its windows instead
    of serializing; map-side partial aggregation applies.
    """
    t0, t1 = clamp_time_range(t0, t1)
    src = df.where(F.col("time_ns").between(t0, t1))
    if series is not None:
        if isinstance(series, str):
            src = src.where(F.col("series") == series)
        else:
            src = src.where(F.col("series").isin(list(series)))
    w = F.lit(window_ns)
    src = src.select(
        "series",
        "time_ns",
        (F.col("time_ns") - (F.col("time_ns") % w)).alias("wstart"),
        F.col(field).alias("_v"),
    )
    ws = Window.partitionBy("series", "wstart").orderBy("time_ns")
    vm = F.round(F.col("_v") * 1e6).cast("long")
    lvm = F.lag(vm).over(ws)
    lag_t = F.lag("time_ns").over(ws)
    terms = src.select(
        "series",
        "wstart",
        "time_ns",
        F.when(
            lag_t.isNotNull(),
            F.coalesce(vm + lvm, F.lit(0)).cast("decimal(38,0)")
            * (F.col("time_ns") - lag_t).cast("decimal(38,0)"),
        )
        .otherwise(F.lit(0).cast("decimal(38,0)"))
        .alias("_area"),
        F.col("_v").isNull().cast("int").alias("_isn"),
        F.col("_v").cast("double").alias("_vd"),
    )
    agg = terms.groupBy("series", "wstart").agg(
        F.count(F.lit(1)).alias("npoints"),
        F.min("time_ns").alias("t_first"),
        F.max("time_ns").alias("t_last"),
        F.sum("_area").alias("_s"),
        F.max("_isn").alias("_poisoned"),
        F.max("_vd").alias("_single"),
    )
    dt = (F.col("t_last") - F.col("t_first")).cast("double")
    twa = (
        F.when(F.col("_poisoned") == 1, F.lit(None).cast("double"))
        .when(F.col("npoints") == 1, F.col("_single"))
        .otherwise(F.col("_s").cast("double") / dt / F.lit(2e6))
    )
    return agg.select(
        "series", "wstart", "npoints", "t_first", "t_last", twa.alias(f"{field}_twa")
    ).orderBy("series", "wstart")
