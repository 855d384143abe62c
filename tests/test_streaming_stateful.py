"""applyInPandasWithState: EWMA state survives across micro-batches."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T

from simple_tsdb_spark.streaming import streaming_ewma

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("time_ns", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def test_streaming_ewma_cross_batch(spark, tmp_path):
    src = str(tmp_path / "src")

    def mk(rows):
        return spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "v"]), SCHEMA)

    alpha = 0.3
    # NaN at i=7 and the batch-2 boundary i=50 pin ignore_na carry-forward
    rows1 = [("a", 10 * i, None if i == 7 else float(i)) for i in range(50)]
    rows2 = [
        ("a", 10 * (50 + i), None if i == 0 else float(50 + i)) for i in range(50)
    ]
    mk(rows1).coalesce(1).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_ewma(stream, field="v", alpha=alpha)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sewma")
        .start()
    )
    q.processAllAvailable()
    mk(rows2).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM sewma")
        .toPandas()
        .sort_values("time_ns", ignore_index=True)
    )
    # reference: one uninterrupted pandas ewm over the concatenated series.
    # The streaming operator seeds each batch's ewm with the carried state,
    # which reproduces the exact same FP op sequence — bit-identical.
    all_vals = pd.Series([r[2] for r in rows1 + rows2], dtype=float)
    want = all_vals.ewm(alpha=alpha, adjust=False, ignore_na=True).mean()
    assert len(got) == 100
    import numpy as np

    np.testing.assert_array_equal(got.v_ewma.to_numpy(), want.to_numpy())


def test_streaming_holt_cross_batch_equals_batch(spark, tmp_path):
    """streaming_holt continues the Holt recursion across micro-batches
    bit-identically to the batch operator over the concatenated input."""
    from simple_tsdb_spark.operators import holt_linear
    from simple_tsdb_spark.streaming import streaming_holt

    src = str(tmp_path / "hsrc")

    def mk(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["series", "time_ns", "v"]), SCHEMA
        )

    import math
    import random

    rng = random.Random(9)
    rows1 = [("a", 10 * i, None if i == 5 else math.sin(i / 3) + rng.uniform(-0.2, 0.2))
             for i in range(40)]
    rows2 = [("a", 10 * (40 + i), 2.0 * i + rng.uniform(-0.2, 0.2)) for i in range(40)]
    mk(rows1).coalesce(1).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_holt(stream, field="v", alpha=0.5, beta=0.3)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sholt")
        .start()
    )
    q.processAllAvailable()
    mk(rows2).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM sholt")
        .toPandas()
        .sort_values("time_ns", ignore_index=True)
    )
    want = (
        holt_linear(mk(rows1 + rows2), field="v", alpha=0.5, beta=0.3)
        .toPandas()
        .sort_values("time_ns", ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_streaming_twa_matches_batch(spark, tmp_path):
    """Finalized streaming TWA windows equal the batch operator
    bit-for-bit (exact integer accumulator carried across batches)."""
    import pandas as pd
    from pyspark.sql import types as T

    from simple_tsdb_spark.operators import time_weighted_avg
    from simple_tsdb_spark.streaming import streaming_time_weighted_avg

    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    w = 10 * 10**9
    # the watermark is GLOBAL: series b must arrive in batch 1, before
    # batch 1's max event time (14.3 s) makes its 0–10 s rows late
    rows1 = [("a", int(i * 1.3e9) + 5 * 10**8, round(0.07 * i, 2)) for i in range(12)] + [
        ("b", int(i * 2e9) + 5 * 10**8, float(i)) for i in range(6)
    ]  # +0.5 s: event time 0 equals the initial watermark and is dropped
    rows2 = [("a", int((12 + i) * 1.3e9) + 5 * 10**8, round(0.07 * (12 + i), 2)) for i in range(8)]
    src = str(tmp_path / "twa_src")

    def mk(rows):
        return spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "v"]), schema)

    # coalesce(1): each append must land as ONE file — the running
    # query's trigger can list a multi-part append mid-write, and a
    # partial batch advances the 0-second watermark past the remaining
    # part files (dropped as late; flaked under suite-load contention)
    mk(rows1).coalesce(1).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(schema).parquet(src)
    agg = streaming_time_weighted_avg(stream, field="v", window_ns=w, watermark_delay="0 seconds")
    q = agg.writeStream.outputMode("append").format("memory").queryName("twa_agg").start()
    q.processAllAvailable()
    # second batch continues window state, then a far-future point
    # advances the watermark so every data window finalizes
    mk(rows2).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    mk([("a", 10**15, 0.0), ("b", 10**15, 0.0)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    # timeouts fire on the batch AFTER the watermark advances — one more
    # trigger batch flushes every remaining data window
    mk([("a", 10**15 + 1, 0.0)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM twa_agg")
        .toPandas()
        .sort_values(["series", "wstart"], ignore_index=True)
    )
    batch_df = mk(rows1 + rows2)
    want = (
        time_weighted_avg(batch_df, field="v", t0=0, t1=2**62, window_ns=w)
        .toPandas()
        .sort_values(["series", "wstart"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_streaming_active_users_matches_batch(spark, tmp_path):
    """Exact sliding distinct-user counts from the stream (chained
    dedup + stateful counter) equal batch active_users' wau column,
    including a user spanning two micro-batches and duplicate activity."""
    import pandas as pd
    from pyspark.sql import types as T

    from simple_tsdb_spark.operators.behavior import active_users
    from simple_tsdb_spark.streaming import streaming_active_users

    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
        ]
    )
    p = 10 * 10**9
    s_ = 10**9
    rows1 = [
        ("s", 1 * s_, 1), ("s", 2 * s_, 1), ("s", 3 * s_, 2),   # period 0: {1,2}
        ("s", 11 * s_, 1),                                        # period 10: {1}
        ("s", 12 * s_, None),                                     # NULL ignored
    ]
    rows2 = [
        ("s", 13 * s_, 3),                                        # period 10 += {3}
        ("s", 21 * s_, 2),                                        # period 20: {2}
    ]
    src = str(tmp_path / "au_src")

    def mk(rows):
        return spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "user_id"]), schema)

    # coalesce(1): atomic single-file appends (see TWA test above)
    mk(rows1).coalesce(1).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(schema).parquet(src)
    agg = streaming_active_users(stream, period_ns=p, window_periods=2, watermark_delay="30 seconds")
    q = agg.writeStream.outputMode("append").format("memory").queryName("au_agg").start()
    q.processAllAvailable()
    mk(rows2).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    mk([("s", 10**15, 99)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    mk([("s", 10**15 + s_, 99)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM au_agg WHERE period < 1000000000000000")
        .toPandas()
        .sort_values("period", ignore_index=True)
    )
    want = (
        active_users(mk(rows1 + rows2), period_ns=p, window_periods=2)
        .toPandas()[["period", "wau"]]
        .rename(columns={"wau": "n_users"})
    )
    # batch reports only periods with same-period activity (dau join);
    # the stream reports every trailing window with any activity — the
    # batch rows must be a subset with equal counts
    gmap = dict(zip(got.period, got.n_users))
    assert len(want) > 0
    for r in want.itertuples():
        assert gmap[r.period] == r.n_users, (r.period, gmap.get(r.period), r.n_users)
