"""Exact distributed order statistics on integer score grids.

The round-10 integer-finals doctrine computes quantile thresholds as
exact type-7 order statistics (``x_k``/``x_{k+1}`` picked by 1-indexed
rank).  A naive ``row_number().over(Window.orderBy(score))`` is exact
but moves EVERY scored row to one partition — fine for verification,
a bottleneck at corpus scale.

This helper keeps the exactness and fixes the scale shape: ranks are
resolved against the DISTINCT-VALUE HISTOGRAM.  The corpus-sized work
is one map-side-combined ``groupBy(score).count()`` (uniform integer
keys); only the distinct values — bounded by the score grid's
cardinality (e.g. ≤ 10^6+1 for a ppm grid), not the corpus — flow into
the single-partition running-sum window.  A value's rank span is
``(_lo, _hi]``; the row holding rank ``r`` satisfies
``_lo < r <= _hi``, so every order statistic is one conditional
aggregate over the histogram.

Results are identical to the row_number form by construction (ranks
partition ``1..n`` across the sorted distinct values).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rank_histogram", "stat_at", "quantile_exprs"]


def rank_histogram(values: DataFrame, col: str, *, with_total: bool = False) -> DataFrame:
    """``(col, _lo, _hi)`` per distinct value of ``col`` (NULLs must be
    pre-filtered): ``_hi`` is the cumulative row count through this
    value in ascending order, ``_lo`` the exclusive start — the rank
    span this value occupies in the sorted sequence.

    One shuffle on the score key (partial counts combine map-side),
    then a running sum over the distinct values only.

    ``with_total=True`` also emits ``_n`` — the total row count, i.e.
    the maximum ``_hi`` — as a second frame over the SAME ordered
    single-partition window (no extra pass, no extra exchange).  This
    replaces the former separate ``values.agg(count)`` + broadcast
    crossJoin feeding :func:`quantile_exprs`: the count is identical by
    construction (``_n = max(_hi)``), and the whole extra subtree —
    one more full pass over ``values`` plus a broadcast-exchange job
    per query — disappears at every scale (r15, guide §1.2).
    """
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = (
        values.groupBy(col)
        .agg(F.count(F.lit(1)).alias("_c"))
        .withColumn("_hi", F.sum("_c").over(w))
        .withColumn("_lo", F.col("_hi") - F.col("_c"))
        .drop("_c")
    )
    if with_total:
        wall = Window.orderBy(col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        out = out.withColumn("_n", F.max("_hi").over(wall))
    return out


def stat_at(col: str, rank: Column) -> Column:
    """Aggregate expression extracting the value at 1-indexed ``rank``
    from a :func:`rank_histogram` frame (use inside ``.agg(...)``)."""
    r = rank
    return F.max(F.when((F.col("_lo") < r) & (r <= F.col("_hi")), F.col(col)))


def quantile_exprs(col: str, num: int, den: int) -> tuple[list[Column], Column]:
    """Exact type-7 quantile at ``q = num/den`` on a ×``den`` integer
    grid, over a :func:`rank_histogram` frame crossJoined with a
    broadcast ``_n`` total: with ``idx = (n−1)·num``, ``k = idx div
    den``, ``fr = idx mod den``, the scaled threshold is
    ``den·x_k + fr·(x_{k+1} − x_k)`` — an exact BIGINT whenever ``col``
    is integral.

    Returns ``(agg_exprs, threshold)``: feed every quantile's
    ``agg_exprs`` into ONE ``.agg(...)`` call (a single histogram
    pass computes all of them), then ``.select(threshold.alias(...))``.
    """
    num, den = int(num), int(den)
    k = F.expr(f"((_n - 1) * {num}) div {den}")
    fr = F.expr(f"((_n - 1) * {num}) % {den}")
    tag = f"_q{num}_{den}"
    aggs = [
        stat_at(col, k + 1).alias(f"{tag}_xk"),
        stat_at(col, F.least(k + 2, F.col("_n"))).alias(f"{tag}_xk1"),
        F.max(fr).alias(f"{tag}_fr"),
    ]
    thr = F.lit(den) * F.col(f"{tag}_xk") + F.col(f"{tag}_fr") * (
        F.col(f"{tag}_xk1") - F.col(f"{tag}_xk")
    )
    return aggs, thr
