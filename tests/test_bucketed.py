"""Bucketed-table co-location: series-keyed agg + join with NO Exchange."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from simple_tsdb_spark.sources.bucketed import (
    read_bucketed_measurement,
    save_bucketed_measurement,
)


def _mk(spark, seed, n_series=4, n=500):
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    for s in range(n_series):
        t = np.cumsum(rng.integers(1, 50, size=n)).astype("int64")
        for ti, v in zip(t, rng.random(n) * 100):
            rows.append((f"s{s}", int(ti), float(v)))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["series", "time_ns", "value"])
    )


def test_cobucketed_agg_join_no_exchange(spark, tmp_path):
    a, b = _mk(spark, 1), _mk(spark, 2)
    save_bucketed_measurement(spark, a, "m_a", buckets=8, path=str(tmp_path / "ba"))
    save_bucketed_measurement(spark, b, "m_b", buckets=8, path=str(tmp_path / "bb"))
    try:
        ta = read_bucketed_measurement(spark, "m_a")
        tb = read_bucketed_measurement(spark, "m_b")
        agg_a = ta.groupBy("series").agg(F.count(F.lit(1)).alias("n_a"), F.max("time_ns").alias("last_a"))
        agg_b = tb.groupBy("series").agg(F.count(F.lit(1)).alias("n_b"), F.max("time_ns").alias("last_b"))
        q = agg_a.join(agg_b, "series").orderBy("series")
        got = q.toPandas()

        # correctness vs the plain (unbucketed) computation
        pa = a.groupBy("series").agg(F.count(F.lit(1)).alias("n_a"), F.max("time_ns").alias("last_a"))
        pb = b.groupBy("series").agg(F.count(F.lit(1)).alias("n_b"), F.max("time_ns").alias("last_b"))
        want = pa.join(pb, "series").orderBy("series").toPandas()
        pd.testing.assert_frame_equal(got, want)

        # the point: write-time bucketing removed every runtime SHUFFLE —
        # both aggregations run straight on the bucket distribution.  A
        # BroadcastExchange of the tiny aggregated join side is fine (and
        # correct); what must be absent is any hashpartitioning shuffle.
        plan = agg_a.join(agg_b, "series")
        pstr = plan._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in pstr, pstr
        assert pstr.count("Bucketed: true") == 2, pstr
    finally:
        spark.sql("DROP TABLE IF EXISTS m_a")
        spark.sql("DROP TABLE IF EXISTS m_b")


def test_bucketed_scan_prunes_buckets(spark, tmp_path):
    """A single-series filter on a bucketed table reads one bucket, not
    the whole table (SelectedBucketsCount in the scan)."""
    a = _mk(spark, 3)
    save_bucketed_measurement(spark, a, "m_c", buckets=8, path=str(tmp_path / "bc"))
    try:
        tc = read_bucketed_measurement(spark, "m_c")
        q = tc.where(F.col("series") == "s1")
        prev_len = spark.conf.get("spark.sql.maxMetadataStringLength")
        # autoBucketedScan=true lets the planner fall back to a plain scan
        # for filter-only queries; pin it off to observe bucket pruning.
        prev_auto = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
        spark.conf.set("spark.sql.maxMetadataStringLength", "1000")
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        try:
            pstr = q._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.maxMetadataStringLength", prev_len)
            spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev_auto)
        assert "SelectedBucketsCount: 1 out of 8" in pstr, pstr
        assert q.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS m_c")
