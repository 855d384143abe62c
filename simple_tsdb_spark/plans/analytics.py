"""Relational breadth queries over the TPC-H-ish tables.

The reference engine has no joins or general aggregation; these exist to
prove the Spark engine's general-analytics surface (joins, broadcast,
grouped aggregation, top-k-per-group) at scale, with DuckDB oracles.

Plan notes (verified via .explain, see SCALE.md):
- dimension tables (region/nation/customer/supplier) are broadcast — no
  shuffle of the fact table for the join;
- money sums run in exact decimals (prices DECIMAL(12,2), discount
  DECIMAL(4,2) — the data is 2-decimal), so products stay within
  precision 38 on every engine with no scale-loss rounding, then surface
  as doubles;
- top-k-per-group is a ranking window after a partial agg, the standard
  two-shuffle plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str, *, fan_out: bool = True) -> DataFrame:
    from simple_tsdb_spark.sources.fixtures import read_fixture

    df = read_fixture(spark, sf_dir, name)
    if name == "lineitem" and fan_out:
        # The fact table is the probe side of every plan here (the
        # dimensions broadcast).  A small lineitem is one parquet row
        # group → a ONE-task scan that serializes the whole
        # join+aggregate chain on a single core (guide §2.5 input skew);
        # fan it out on the uniform orderkey.  No-op above the adaptive
        # threshold, where the scan has real splits (functions/adaptive).
        from simple_tsdb_spark.functions.adaptive import fan_out_small

        df = fan_out_small(df, "l_orderkey")
    return df


def pricing_summary(spark: SparkSession, sf_dir: str, *, cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    money = "decimal(12,2)"
    disc_price = F.col("l_extendedprice").cast(money) * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.where(F.col("l_shipdate") <= cutoff)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(money)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(money)).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def pricing_summary_oracle(*, cutoff: str = "1998-09-02") -> str:
    return f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation: lineitem ⋈ orders ⋈ customer ⋈ nation with the
    dimension sides broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("n_name")
    )


def revenue_by_nation_oracle() -> str:
    return """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def shipping_priority(
    spark: SparkSession, sf_dir: str, *, segment: str = "BUILDING",
    cutoff: str = "1998-01-01", k: int = 10,
) -> DataFrame:
    """TPC-H Q3 shape — unshipped-order revenue ranking: orders from one
    market segment placed before ``cutoff`` with lineitems shipping
    after it, top-``k`` by revenue.

    Plan shape for 100 TB: the segment-filtered customer list broadcasts
    (dimension), orders⋈lineitem shuffles once on the uniform orderkey,
    both date predicates push to the parquet scans, and the final
    ranking is TakeOrderedAndProject (each partition ships only its
    local top-k).  Revenue accumulates in exact DECIMAL and casts to
    double once (the revenue_by_nation recipe).
    """
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit(cutoff))
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit(cutoff))
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == segment)
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(k)
    )


def shipping_priority_oracle(
    *, segment: str = "BUILDING", cutoff: str = "1998-01-01", k: int = 10
) -> str:
    return f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = '{segment}'
  AND o_orderdate < TIMESTAMP '{cutoff} 00:00:00'
  AND l_shipdate > TIMESTAMP '{cutoff} 00:00:00'
GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
ORDER BY revenue DESC, l_orderkey LIMIT {k}
"""


def daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: events per day × event_type (wide daily activity table).

    The pivot values are fixed (stable schema — the requirement for any
    production pivot); counts are exact ints.
    """
    from simple_tsdb_spark.sources.measurement import adapt_raw_ts

    ev = _t(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    # adapt_raw_ts dispatches on the fixture's ts dtype (ns long vs
    # timestamp[_ntz]); ns → µs must use integer division (a double
    # division of a ~1.7e18 ns value exceeds 2^53 and rounds).  DATE day
    # under the UTC session matches ANSI date_trunc semantics.
    ev, time_ns = adapt_raw_ts(ev)
    ev = ev.withColumn("time_ns", time_ns)
    day = F.to_date(F.timestamp_micros(F.expr("time_ns div 1000")))
    return (
        ev.groupBy(day.alias("day"))
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
        .orderBy("day")
    )


def daily_event_pivot_oracle() -> str:
    cases = ",\n       ".join(
        f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
        for t in ["click", "error", "purchase", "signup", "view"]
    )
    return f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       {cases}
FROM events GROUP BY date_trunc('day', ts)
"""


def revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping sets: order totals by (status, priority) with ROLLUP
    subtotals and grand total — the reference has no grouping sets at all.
    """
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("total"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


def revenue_rollup_oracle() -> str:
    # HAVING COUNT(*) > 0 mirrors Spark's grouping-sets semantics on
    # EMPTY input (Spark emits zero rows; standard SQL emits the ()
    # grand-total row with COUNT 0).  Every grouping-set row over a
    # non-empty input has COUNT >= 1, so this is a no-op otherwise.
    return """
SELECT o_orderstatus, o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       COUNT(*) AS n_orders
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
HAVING COUNT(*) > 0
"""


def top_customers_per_nation(spark: SparkSession, sf_dir: str, *, k: int = 3) -> DataFrame:
    """Top-k customers by order total per nation (ranking window)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("spend"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("spend").desc(), F.col("c_custkey"))
    return (
        spend.join(F.broadcast(cust), spend.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_custkey", "spend")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("n_name", "rank")
    )


def top_customers_oracle(*, k: int = 3) -> str:
    return f"""
SELECT n_name, c_custkey, spend, rank FROM (
  SELECT n_name, c_custkey, spend,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY spend DESC, c_custkey) AS rank
  FROM (
    SELECT n_name, c_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name, c_custkey))
WHERE rank <= {k}
"""


def forecast_revenue(
    spark: SparkSession,
    sf_dir: str,
    *,
    years: tuple[int, int] = (1996, 1998),
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> DataFrame:
    """TPC-H Q6-shaped forecast-revenue-change: the revenue that would
    be lost by dropping small discounts on low-quantity lineitems,
    per ship year.  One filter + one tiny aggregate — the canonical
    "does the predicate reach the scan" query.

    Determinism: the discount/quantity cuts are IEEE compares on the
    raw doubles; revenue accumulates as exact DECIMAL products
    (price·discount on the cent/percent grid), cast to double once.

    At 100 TB: every predicate (ship-year range, discount band,
    quantity cap) pushes to the parquet scan — row groups outside the
    year range never read; the aggregate is a scalar per year
    (map-side combined, no data-sized shuffle).
    """
    li = _t(spark, sf_dir, "lineitem")
    y0, y1 = years
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * F.col("l_discount").cast(
        "decimal(4,2)"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= f"{y0}-01-01")
            & (F.col("l_shipdate") < f"{y1}-01-01")
            & (F.col("l_discount") >= disc_lo)
            & (F.col("l_discount") <= disc_hi)
            & (F.col("l_quantity") < max_qty)
        )
        .groupBy(F.year("l_shipdate").alias("ship_year"))
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("ship_year")
    )


def forecast_revenue_oracle(
    *,
    years: tuple[int, int] = (1996, 1998),
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    max_qty: float = 24.0,
) -> str:
    y0, y1 = years
    return f"""
SELECT CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{y0}-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '{y1}-01-01 00:00:00'
  AND l_discount >= {disc_lo!r} AND l_discount <= {disc_hi!r}
  AND l_quantity < {max_qty!r}
GROUP BY year(l_shipdate)
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition table over the event stream: for
    every user's time-ordered event sequence, count each
    (event_type → next event_type) step and its conditional
    probability — the path-analysis primitive behind funnel discovery
    and next-action models.

    Output: (from_type, to_type, n, prob_ppm) with
    ``prob_ppm = (10^6·n) div Σ n over from_type`` — a truncated
    BIGINT quotient (round-10 integer-finals doctrine).  Ordering within
    a user is (ts, event_id) — event_id is unique, so the sequence is
    total and both engines see identical steps.

    At 100 TB: ONE shuffle on user_id for the lead window (sequences
    stay inside their partition), then a map-side-combined aggregate
    onto the tiny type×type key space; the per-from totals ride a
    window over that already-small frame — no second data-sized
    exchange.
    """
    return event_transitions_frame(_t(spark, sf_dir, "events"))


def event_transitions_frame(ev: DataFrame) -> DataFrame:
    """Core of :func:`event_transitions` over an already-loaded events
    frame with (user_id, ts, event_id, event_type) columns."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("user_id", "ts", "event_id", F.col("event_type").alias("from_type"))
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    tot = Window.partitionBy("from_type")
    return (
        counts.withColumn("_tot", F.sum("n").over(tot))
        .select(
            "from_type",
            "to_type",
            "n",
            F.expr("(1000000 * n) div _tot").alias("prob_ppm"),
        )
        .orderBy("from_type", "to_type")
    )


def event_transitions_oracle() -> str:
    return """
WITH pairs AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
  FROM events),
counts AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM pairs WHERE to_type IS NOT NULL GROUP BY from_type, to_type)
SELECT from_type, to_type, n,
       CAST((1000000 * n) // SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_ppm
FROM counts
"""


def order_priority_counts(
    spark: SparkSession, sf_dir: str, *, date_from: str = "1995-01-01",
    date_to: str = "1995-04-01",
) -> DataFrame:
    """TPC-H Q4 shape — order-priority checking: per priority, how many
    orders placed in the quarter have AT LEAST ONE lineitem that
    shipped after the order date (the late-commitment EXISTS
    predicate, adapted to this schema's columns).

    Plan shape for 100 TB: the date predicate pushes to the orders
    scan; the EXISTS becomes a LEFT SEMI join on the uniform orderkey
    (dedup built into the join — no DISTINCT stage, no row explosion
    from multi-lineitem orders); the final count lands on the 5-value
    priority key map-side.
    """
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit(date_from))
        & (F.col("o_orderdate") < F.lit(date_to))
    )
    # fan_out=False: this lineitem side re-shuffles straight into the
    # semi join, so the small-input fan-out exchange is pure overhead
    # here (A/B 0.92×, r14.2 — the cluster_prune finding).
    li = _t(spark, sf_dir, "lineitem", fan_out=False).select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def order_priority_counts_oracle(
    *, date_from: str = "1995-01-01", date_to: str = "1995-04-01"
) -> str:
    return f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{date_from} 00:00:00'
  AND o_orderdate < TIMESTAMP '{date_to} 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def large_volume_customers(
    spark: SparkSession, sf_dir: str, *, min_quantity: int = 150, k: int = 20
) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: orders whose TOTAL
    lineitem quantity exceeds ``min_quantity``, joined back to the
    customer, top-``k`` by total quantity.

    Plan shape for 100 TB: lineitem aggregates FIRST on the uniform
    orderkey (map-side combined — the group-HAVING replaces Q18's
    IN-subquery with one agg + filter, no second lineitem scan);
    only the few surviving orderkeys join orders, and the customer
    dimension broadcasts.  Final ranking is TakeOrderedAndProject.
    Quantities sum in exact DECIMAL; the emitted total casts once.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .where(F.col("_q") > F.lit(int(min_quantity)))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("o_orderkey"),
            F.to_date("o_orderdate").alias("o_orderdate"),
            F.col("_q").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(int(k))
    )


def large_volume_customers_oracle(*, min_quantity: int = 150, k: int = 20) -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > {int(min_quantity)})
SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       CAST(q AS DOUBLE) AS total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey LIMIT {int(k)}
"""


def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue GROUPING SETS: nation × order-year ROLLUP — per (nation,
    year), per nation subtotal, and the grand total in ONE aggregation
    pass (Spark expands the rollup into grouping sets and shares the
    shuffle; three separate GROUP BYs would scan and shuffle 3×).

    Output: (n_name, o_year, lvl, revenue) with NULL grouping slots
    COALESCEd to '(all)' / 0 and ``lvl`` = grouping(n_name)·2 +
    grouping(o_year), so the result is NULL-free and engine-portable.
    Dimensions (customer, nation) broadcast; revenue accumulates in
    exact DECIMAL and casts once.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    base = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("o_year"), rev.alias("_rev"))
    )
    lvl = (F.grouping("n_name") * 2 + F.grouping("o_year")).cast("int")
    return (
        base.rollup("n_name", "o_year")
        .agg(F.sum("_rev").cast("double").alias("revenue"), lvl.alias("lvl"))
        .select(
            F.coalesce("n_name", F.lit("(all)")).alias("n_name"),
            F.coalesce("o_year", F.lit(0)).alias("o_year"),
            "lvl",
            "revenue",
        )
        .orderBy("lvl", "n_name", "o_year")
    )


def revenue_cube_oracle() -> str:
    return """
WITH base AS (
  SELECT n_name,
         CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey)
SELECT COALESCE(n_name, '(all)') AS n_name,
       COALESCE(o_year, 0) AS o_year,
       CAST(GROUPING(n_name) * 2 + GROUPING(o_year) AS INTEGER) AS lvl,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM base
GROUP BY ROLLUP (n_name, o_year)
HAVING COUNT(*) > 0
"""


def min_cost_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated-subquery shape on this schema: per part
    type, the part(s) whose retail price equals the MINIMUM price
    within that type (ties all kept — Q2 semantics).

    The correlated scalar subquery (``price = (SELECT MIN ... WHERE
    same type)``) decorrelates into ONE window min over the type key —
    a single shuffle instead of an O(types) re-scan; the oracle keeps
    the correlated form, proving the rewrite is value-identical.
    """
    part = _t(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("_min", F.min("p_retailprice").over(w))
        .where(F.col("p_retailprice") == F.col("_min"))
        .select("p_type", "p_partkey", "p_name", "p_retailprice")
        .orderBy("p_type", "p_partkey")
    )


def min_cost_parts_oracle() -> str:
    return """
SELECT p_type, p_partkey, p_name, p_retailprice
FROM part p
WHERE p_retailprice = (
  SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_type = p.p_type)
ORDER BY p_type, p_partkey
"""


def _exact_fraction(x: float, limit: int = 10**6):
    """``x`` as an exact small-denominator Fraction — raises instead of
    silently snapping to a nearby rational (a min_share of 1e-7 would
    otherwise become 0 and disable the HAVING entirely)."""
    from fractions import Fraction

    f = Fraction(x).limit_denominator(limit)
    if float(f) != float(x):
        raise ValueError(
            f"{x!r} is not exactly a rational with denominator <= {limit}; "
            "the integer cross-multiplied threshold requires one"
        )
    return f


def nation_balance_share(
    spark: SparkSession, sf_dir: str, *, min_share: float = 0.01
) -> DataFrame:
    """TPC-H Q11's global-share shape: per nation, the total customer
    account balance, kept only where it exceeds ``min_share`` of the
    GLOBAL total — the group-vs-global-scalar pattern (Q11's
    ``HAVING SUM(...) > (SELECT SUM(...) * fraction)``).

    Integer-finals doctrine (round 10): balances sum as exact CENTS
    (BIGINT) on both branches; the global scalar rides a broadcast (one
    row) instead of re-aggregating per group; ``share_ppm`` is the
    truncated 128-bit integer quotient ``(10^6·t) div g`` and the
    HAVING is the exact cross-multiplication ``t·den > g·num`` (with
    ``min_share = num/den``) — no DOUBLE anywhere in the final.
    The nation dimension broadcasts onto the customer aggregation.
    """
    ms = _exact_fraction(min_share)
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
    per_nation = (
        cust.groupBy("c_nationkey")
        .agg(F.sum(cents).alias("_total"))
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
    )
    total = cust.agg(F.sum(cents).alias("_g"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .where(
            F.col("_total") * F.lit(ms.denominator) > F.col("_g") * F.lit(ms.numerator)
        )
        .select(
            "n_name",
            F.col("_total").alias("total_balance_cents"),
            F.expr("CAST(1000000 AS DECIMAL(38,0)) * _total div _g").alias(
                "share_ppm"
            ),
        )
        .orderBy(F.col("total_balance_cents").desc(), "n_name")
    )


def nation_balance_share_oracle(*, min_share: float = 0.01) -> str:
    ms = _exact_fraction(min_share)
    return f"""
WITH per_nation AS (
  -- grouped by the KEY, not the display name: the engine aggregates on
  -- c_nationkey and broadcast-joins n_name afterwards, so two nations
  -- sharing a name stay separate rows on both sides.
  SELECT n_name, CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS t
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_nationkey, n_name),
total AS (
  SELECT CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS g
  FROM customer)
SELECT n_name, t AS total_balance_cents,
       CAST((1000000::HUGEINT * t) // g AS BIGINT) AS share_ppm
FROM per_nation, total
WHERE t * {ms.denominator} > g * {ms.numerator}
ORDER BY total_balance_cents DESC, n_name
"""


def supplier_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation supplier account-balance profile: count + exact
    continuous quartiles (q1/median/q3) — the procurement-risk readout
    over the one remaining fixture table (supplier), exercising exact
    interpolated percentiles on a dimension join.

    Integer finals (round-10 doctrine): balances quantize to exact
    CENTS, and each quartile rides a ×4 grid — the type-7 rank
    ``(n−1)·q`` for q ∈ {¼, ½, ¾} has a quarter-integer fraction, so
    ``4·((1−g)·x_k + g·x_{k+1})`` over integer cents is an exactly-
    representable integer in ANY IEEE evaluation order (every
    intermediate is an exact quarter-integer < 2^53) — the BIGINT cast
    is engine-exact regardless of how each engine parenthesizes its
    interpolation.  Nation/region broadcast onto the supplier
    aggregation."""
    sup = _t(spark, sf_dir, "supplier").withColumn(
        "_cents", (F.col("s_acctbal").cast("decimal(18,2)") * 100).cast("long")
    )
    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.expr("CAST(percentile(_cents, 0.25) * 4 AS BIGINT)").alias(
                "q1_cents_x4"
            ),
            F.expr("CAST(percentile(_cents, 0.5) * 4 AS BIGINT)").alias(
                "median_cents_x4"
            ),
            F.expr("CAST(percentile(_cents, 0.75) * 4 AS BIGINT)").alias(
                "q3_cents_x4"
            ),
        )
        .orderBy("r_name", "n_name")
    )


def supplier_balance_quartiles_oracle() -> str:
    return """
WITH s AS (
  SELECT s_nationkey,
         CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
  FROM supplier)
SELECT r_name, n_name, COUNT(*) AS n_suppliers,
       CAST(quantile_cont(cents, 0.25) * 4 AS BIGINT) AS q1_cents_x4,
       CAST(quantile_cont(cents, 0.5) * 4 AS BIGINT) AS median_cents_x4,
       CAST(quantile_cont(cents, 0.75) * 4 AS BIGINT) AS q3_cents_x4
FROM s
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""
