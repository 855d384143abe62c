"""User-behavior analytics over the events measurement — cohort
retention and ordered funnels.

Extension operators (no reference counterpart — the reference has no
user dimension): the two classic product-analytics queries every
event-warehouse user runs, expressed as plain aggregations so they are
exactly SQL-expressible (integer outputs, hash-exact oracles).

Scale notes: both group on ``user_id`` — a uniform high-cardinality
key, so the aggregations map-side combine and shuffle one row per
(user[, period / step]) with no skew; no windows over whole strata and
no corpus-sized build sides (each funnel step joins the PREVIOUS
step's survivors, a monotonically shrinking user-keyed table).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "active_users",
    "active_users_oracle",
    "cohort_retention",
    "cohort_retention_oracle",
    "event_funnel",
    "event_funnel_oracle",
    "funnel_conversion_time",
    "funnel_conversion_time_oracle",
]

WEEK_NS = 7 * 24 * 3_600 * 1_000_000_000


def cohort_retention(
    df: DataFrame, *, period_ns: int = WEEK_NS, user_col: str = "user_id"
) -> DataFrame:
    """Retention matrix: users bucketed by first-activity period
    (cohort), counted in every period they are active —
    ``(cohort, period_offset, n_users)``, offsets ≥ 0, ordered.

    Plan: distinct (user, period) activity (map-side combined), a
    per-user min for the cohort, a user-keyed join back, then a count
    over the tiny (cohort, offset) key — every shuffle keyed by user
    or by the matrix cell.  Pure integer arithmetic → hash-exact.
    """
    p = int(period_ns)
    if p <= 0:
        raise ValueError("period_ns must be positive")
    act = (
        df.where(F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("u"),
            (F.col("time_ns") - F.pmod(F.col("time_ns"), F.lit(p))).alias("per"),
        )
        .distinct()
    )
    cohort = act.groupBy("u").agg(F.min("per").alias("cohort"))
    return (
        act.join(cohort, "u")
        .groupBy(
            "cohort",
            # integer div: per and cohort are exact multiples of p, but
            # `/` would route through double (truncate-vs-round casts
            # differ across engines) — keep it in BIGINT arithmetic
            F.expr(f"(per - cohort) DIV {p}").alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort", "period_offset")
    )


def cohort_retention_oracle(
    measurement_sql: str, *, period_ns: int = WEEK_NS, user_col: str = "user_id"
) -> str:
    p = int(period_ns)
    return f"""
WITH m AS ({measurement_sql}),
act AS (
  SELECT DISTINCT {user_col} AS u,
         time_ns - (time_ns % {p}) AS per
  FROM m WHERE {user_col} IS NOT NULL),
cohort AS (SELECT u, MIN(per) AS cohort FROM act GROUP BY u)
SELECT cohort.cohort, (per - cohort.cohort) // {p} AS period_offset,
       COUNT(*) AS n_users
FROM act JOIN cohort ON act.u = cohort.u
GROUP BY 1, 2
ORDER BY 1, 2
"""


def event_funnel(
    df: DataFrame,
    *,
    steps: Sequence[str],
    window_ns: int,
    user_col: str = "user_id",
    type_col: str = "series",
) -> DataFrame:
    """Strictly-ordered funnel: users performing ``steps`` in order,
    each step after the previous one and within ``window_ns`` of the
    FIRST step — ``(step_idx, step, n_users)``, the classic
    monotonically-dropping funnel readout.

    Semantics (the standard min-chain): per user ``t₁ = min(time of
    step₁)``; step *i* is reached iff an event of its type exists in
    ``(tᵢ₋₁, t₁ + window_ns]``, with ``tᵢ`` the earliest such.  The
    chain unrolls into ``len(steps) − 1`` user-keyed joins against the
    previous step's (shrinking) survivor table — identical CTE shape in
    the oracle, so the integer counts are hash-exact.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    w = int(window_ns)
    if w <= 0:
        raise ValueError("window_ns must be positive")
    ev = df.where(
        F.col(user_col).isNotNull() & F.col(type_col).isin(list(steps))
    ).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("st"),
        F.col("time_ns").alias("t"),
    )
    from simple_tsdb_spark.functions.adaptive import materialize_small

    # Each step's survivor table feeds BOTH the next step's join and its
    # own leg of the final union; Spark shares nothing across those
    # consumers (each union leg re-expands the whole join chain — the
    # plan scanned events 5x for 3 steps).  Under the adaptive size
    # threshold materialize each step once; exact no-op at real scale,
    # where the unrolled-CTE shape stands (r14).
    cur = materialize_small(
        ev.where(F.col("st") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("tp"))
        .withColumn("t1", F.col("tp"))
    )
    survivors = [cur.select(F.lit(1).alias("step_idx"), "u")]
    for i, s in enumerate(steps[1:], start=2):
        cur = materialize_small(
            ev.where(F.col("st") == s)
            .join(cur, "u")
            .where((F.col("t") > F.col("tp")) & (F.col("t") <= F.col("t1") + w))
            .groupBy("u")
            .agg(F.min("t").alias("tp"), F.first("t1").alias("t1"))
        )
        survivors.append(cur.select(F.lit(i).alias("step_idx"), "u"))
    from functools import reduce

    allsurv = reduce(lambda a, b: a.unionByName(b), survivors)
    steps_df = df.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_idx int, step string"
    )
    # ONE lazy plan: per-step survivor counts joined onto the step list
    # (empty steps report 0), no driver-side count loop
    return (
        steps_df.join(
            allsurv.groupBy("step_idx").agg(F.count(F.lit(1)).alias("_n")),
            "step_idx",
            "left",
        )
        .select(
            "step_idx",
            "step",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_users"),
        )
        .orderBy("step_idx")
    )


def event_funnel_oracle(
    measurement_sql: str,
    *,
    steps: Sequence[str],
    window_ns: int,
    user_col: str = "user_id",
) -> str:
    w = int(window_ns)
    step_list = ", ".join(f"'{s}'" for s in steps)
    ctes = [
        f"""s1 AS (
  SELECT u, MIN(t) AS tp, MIN(t) AS t1 FROM ev WHERE st = '{steps[0]}' GROUP BY u)"""
    ]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"""s{i} AS (
  SELECT ev.u, MIN(ev.t) AS tp, MIN(s{i - 1}.t1) AS t1
  FROM ev JOIN s{i - 1} ON ev.u = s{i - 1}.u
  WHERE ev.st = '{s}' AND ev.t > s{i - 1}.tp AND ev.t <= s{i - 1}.t1 + {w}
  GROUP BY ev.u)"""
        )
    selects = "\nUNION ALL\n".join(
        f"SELECT {i + 1} AS step_idx, '{s}' AS step, (SELECT COUNT(*) FROM s{i + 1}) AS n_users"
        for i, s in enumerate(steps)
    )
    cte_block = ",\n".join(ctes)
    return f"""
WITH m AS ({measurement_sql}),
ev AS (
  SELECT {user_col} AS u, series AS st, time_ns AS t
  FROM m WHERE {user_col} IS NOT NULL AND series IN ({step_list})),
{cte_block}
SELECT step_idx, step, n_users FROM ({selects})
ORDER BY step_idx
"""


DAY_NS = 24 * 3_600 * 1_000_000_000


def active_users(
    df: DataFrame, *, period_ns: int = DAY_NS, window_periods: int = 7,
    user_col: str = "user_id",
) -> DataFrame:
    """DAU/WAU engagement: per period, the distinct active users (DAU),
    the distinct users active in the trailing ``window_periods`` periods
    (WAU), and stickiness = DAU/WAU — the product-analytics engagement
    readout.

    Output: (period, dau, wau, stickiness_ppm) for every period with
    activity; stickiness is the parts-per-million truncated BIGINT
    quotient (round-10 integer-finals doctrine; wau ≥ dau ≥ 1 per
    emitted period).

    Scale: distinct (user, period) first (map-side combined, uniform
    user keys), then DAU is one count; WAU replicates each user-period
    to its ``window_periods`` covering window ends (fixed fan-out, the
    hopping_mean trick) and count-distincts per end — no window
    functions over whole strata, no self-joins.
    """
    p = int(period_ns)
    k = int(window_periods)
    if p <= 0 or k <= 0:
        raise ValueError("period_ns and window_periods must be positive")
    act = (
        df.where(F.col(user_col).isNotNull())
        .select(
            F.col(user_col).alias("u"),
            (F.col("time_ns") - F.pmod(F.col("time_ns"), F.lit(p))).alias("per"),
        )
        .distinct()
    )
    dau = act.groupBy(F.col("per").alias("period")).agg(F.count(F.lit(1)).alias("dau"))
    wau = (
        act.select(
            "u",
            F.explode(
                F.expr(f"sequence(per, per + {(k - 1)}L * {p}L, {p}L)")
            ).alias("period"),
        )
        .distinct()
        .groupBy("period")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(wau, "period")
        .select(
            "period",
            "dau",
            "wau",
            F.expr("(1000000 * dau) div wau").alias("stickiness_ppm"),
        )
        .orderBy("period")
    )


def active_users_oracle(
    measurement_sql: str, *, period_ns: int = DAY_NS, window_periods: int = 7,
    user_col: str = "user_id",
) -> str:
    p, k = int(period_ns), int(window_periods)
    return f"""
WITH m AS ({measurement_sql}),
act AS (
  SELECT DISTINCT {user_col} AS u, time_ns - (time_ns % {p}) AS per
  FROM m WHERE {user_col} IS NOT NULL),
dau AS (SELECT per AS period, COUNT(*) AS dau FROM act GROUP BY per),
wau AS (
  SELECT period, COUNT(DISTINCT u) AS wau FROM (
    SELECT u, UNNEST(generate_series(per, per + {(k - 1) * p}, {p})) AS period
    FROM act)
  GROUP BY period)
SELECT d.period, d.dau, w.wau,
       (1000000 * d.dau) // w.wau AS stickiness_ppm
FROM dau d JOIN wau w ON d.period = w.period
"""


def funnel_conversion_time(
    df: DataFrame,
    *,
    steps: Sequence[str],
    window_ns: int,
    user_col: str = "user_id",
    type_col: str = "series",
) -> DataFrame:
    """Conversion-latency distribution for users completing the WHOLE
    funnel (same min-chain semantics as :func:`event_funnel`): one row
    with n_converted, min/max latency (exact ns BIGINTs), the truncated
    integer mean, and exact type-7 interpolated p50/p90 on a ×10 grid
    (``10·x_k + fr·(x_{k+1} − x_k)`` with ``fr = ((n−1)·p·10) mod 10``
    over the latency order statistics) — ALL BIGINT, no DOUBLE
    (round-10 integer-finals doctrine).

    Same scale shape as the funnel: shrinking user-keyed joins, then
    the distinct-latency rank histogram (functions/orderstats.py — no
    global row sort) + one scalar aggregate over the converter set.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    w = int(window_ns)
    if w <= 0:
        raise ValueError("window_ns must be positive")
    ev = df.where(
        F.col(user_col).isNotNull() & F.col(type_col).isin(list(steps))
    ).select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("st"),
        F.col("time_ns").alias("t"),
    )
    cur = (
        ev.where(F.col("st") == steps[0])
        .groupBy("u")
        .agg(F.min("t").alias("tp"))
        .withColumn("t1", F.col("tp"))
    )
    for s in steps[1:]:
        cur = (
            ev.where(F.col("st") == s)
            .join(cur, "u")
            .where((F.col("t") > F.col("tp")) & (F.col("t") <= F.col("t1") + w))
            .groupBy("u")
            .agg(F.min("t").alias("tp"), F.first("t1").alias("t1"))
        )
    from simple_tsdb_spark.functions.orderstats import quantile_exprs, rank_histogram

    lat = cur.select((F.col("tp") - F.col("t1")).alias("latency_ns"))
    tot = lat.agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("latency_ns").alias("_min"),
        F.max("latency_ns").alias("_max"),
        F.when(F.count(F.lit(1)) > 0, F.expr("sum(latency_ns) div count(1)")).alias(
            "_mean"
        ),
    )
    # _n from the histogram (with_total) instead of crossJoin(tot): the
    # nested broadcast re-ran the whole funnel-chain subtree a third
    # time per query (tot still computes once for the final scalar row).
    ranked = rank_histogram(lat, "latency_ns", with_total=True)

    # thresholds from the histogram (one agg), scalars from tot — an
    # EMPTY funnel still yields one row (n_converted=0, NULL stats)
    aggs50, thr50 = quantile_exprs("latency_ns", 5, 10)
    aggs90, thr90 = quantile_exprs("latency_ns", 9, 10)
    thr = ranked.agg(*aggs50, *aggs90).select(
        thr50.alias("p50_ns_x10"), thr90.alias("p90_ns_x10")
    )
    return tot.crossJoin(F.broadcast(thr)).select(
        F.col("_n").alias("n_converted"),
        F.col("_min").alias("min_ns"),
        F.col("_max").alias("max_ns"),
        F.col("_mean").alias("mean_ns"),
        "p50_ns_x10",
        "p90_ns_x10",
    )


def funnel_conversion_time_oracle(
    measurement_sql: str,
    *,
    steps: Sequence[str],
    window_ns: int,
    user_col: str = "user_id",
) -> str:
    w = int(window_ns)
    step_list = ", ".join(f"'{s}'" for s in steps)
    ctes = [
        f"""s1 AS (
  SELECT u, MIN(t) AS tp, MIN(t) AS t1 FROM ev WHERE st = '{steps[0]}' GROUP BY u)"""
    ]
    for i, s in enumerate(steps[1:], start=2):
        ctes.append(
            f"""s{i} AS (
  SELECT ev.u, MIN(ev.t) AS tp, MIN(s{i - 1}.t1) AS t1
  FROM ev JOIN s{i - 1} ON ev.u = s{i - 1}.u
  WHERE ev.st = '{s}' AND ev.t > s{i - 1}.tp AND ev.t <= s{i - 1}.t1 + {w}
  GROUP BY ev.u)"""
        )
    last = f"s{len(steps)}"
    cte_block = ",\n".join(ctes)
    return f"""
WITH m AS ({measurement_sql}),
ev AS (
  SELECT {user_col} AS u, series AS st, time_ns AS t
  FROM m WHERE {user_col} IS NOT NULL AND series IN ({step_list})),
{cte_block},
lat AS (SELECT tp - t1 AS latency_ns FROM {last}),
ranked AS (
  SELECT latency_ns,
         ROW_NUMBER() OVER (ORDER BY latency_ns) AS rn,
         COUNT(*) OVER () AS n
  FROM lat)
SELECT COUNT(*) AS n_converted,
       MIN(latency_ns) AS min_ns, MAX(latency_ns) AS max_ns,
       CAST(CASE WHEN COUNT(*) > 0 THEN SUM(latency_ns) // COUNT(*) END AS BIGINT) AS mean_ns,
       10 * MAX(CASE WHEN rn = ((n - 1) * 5) // 10 + 1 THEN latency_ns END)
         + MAX(((n - 1) * 5) % 10)
           * (MAX(CASE WHEN rn = least(((n - 1) * 5) // 10 + 2, n) THEN latency_ns END)
            - MAX(CASE WHEN rn = ((n - 1) * 5) // 10 + 1 THEN latency_ns END)) AS p50_ns_x10,
       10 * MAX(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN latency_ns END)
         + MAX(((n - 1) * 9) % 10)
           * (MAX(CASE WHEN rn = least(((n - 1) * 9) // 10 + 2, n) THEN latency_ns END)
            - MAX(CASE WHEN rn = ((n - 1) * 9) // 10 + 1 THEN latency_ns END)) AS p90_ns_x10
FROM ranked
"""
