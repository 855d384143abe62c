"""functions/orderstats.py — distinct-value rank histogram.

The scale-shaped order-statistic path must agree EXACTLY with the naive
global row_number form on any multiset (heavy ties, singletons, negative
values), and the funnel edge case (zero converted users) must still
emit its one summary row.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.orderstats import rank_histogram, stat_at


def _naive_rank(spark, vals, r):
    df = spark.createDataFrame([(v,) for v in vals], schema="x long")
    got = (
        df.withColumn("_rn", F.row_number().over(Window.orderBy("x")))
        .where(F.col("_rn") == r)
        .first()
    )
    return got["x"]


def test_histogram_ranks_match_row_number(spark):
    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(1, 60)
        # heavy ties: values drawn from a small grid, incl. negatives
        vals = [rng.randint(-5, 5) for _ in range(n)]
        df = spark.createDataFrame([(v,) for v in vals], schema="x long")
        hist = rank_histogram(df, "x")
        ranks = sorted({1, n, max(1, n // 2), max(1, n // 3)})
        row = hist.agg(
            *[stat_at("x", F.lit(r)).alias(f"r{r}") for r in ranks]
        ).first()
        want = sorted(vals)
        for r in ranks:
            assert row[f"r{r}"] == want[r - 1], (trial, r, vals)


def test_histogram_spans_partition_full_range(spark):
    vals = [3, 1, 3, 3, 2, 1]
    df = spark.createDataFrame([(v,) for v in vals], schema="x long")
    got = rank_histogram(df, "x").orderBy("x").toPandas()
    # spans tile 1..n with no gaps: (_lo, _hi] per distinct value
    assert list(got.x) == [1, 2, 3]
    assert list(got._lo) == [0, 2, 3]
    assert list(got._hi) == [2, 3, 6]


def test_funnel_empty_still_one_row(spark):
    """No user completes the funnel -> one row, n_converted=0, NULL
    latency stats (the pre-histogram behavior, pinned)."""
    from simple_tsdb_spark.operators.behavior import funnel_conversion_time

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "series": ["view", "view"],
                "user_id": [1, 2],
                "time_ns": [10, 20],
            }
        )
    )
    got = funnel_conversion_time(
        df, steps=("view", "cart", "buy"), window_ns=100, type_col="series"
    ).toPandas()
    assert len(got) == 1
    assert got.n_converted.iloc[0] == 0
    assert pd.isna(got.min_ns.iloc[0]) and pd.isna(got.p50_ns_x10.iloc[0])
