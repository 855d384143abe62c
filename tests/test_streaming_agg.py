"""Streaming windowed aggregation vs the batch operator (A2 streaming)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import types as T

from simple_tsdb_spark.operators import sum_points
from simple_tsdb_spark.streaming.aggregate import streaming_sum_points

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("time_ns", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def test_streaming_matches_batch(spark, tmp_path):
    rows = [
        ("a", int(i * 0.25e9), float(i)) for i in range(40)
    ] + [("b", int(i * 1e9), 2.0 * i) for i in range(10)]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])
    src = str(tmp_path / "src")
    df = spark.createDataFrame(pdf, SCHEMA)
    df.coalesce(1).write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = streaming_sum_points(stream, fields=["v"], window_ns=2_000_000_000)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_agg")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT series, wstart, window_npoints, v_sum, v_min, v_max, v_count FROM stream_agg")
        .toPandas()
        .sort_values(["series", "wstart"], ignore_index=True)
    )
    want = (
        sum_points(df, fields=["v"], window_ns=2_000_000_000, emit_empty=False)
        .toPandas()
        .sort_values(["series", "wstart"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got, want[["series", "wstart", "window_npoints", "v_sum", "v_min", "v_max", "v_count"]]
    )


def test_streaming_drops_late_data(spark, tmp_path):
    # Watermark: a second batch far in the future finalizes old windows;
    # a late straggler below the watermark must not re-open them.
    src = str(tmp_path / "late_src")
    out = []

    def mk(rows):
        return spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "v"]), SCHEMA)

    mk([("a", int(1e9), 1.0), ("a", int(2e9), 2.0)]).coalesce(1).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = streaming_sum_points(stream, fields=["v"], window_ns=2_000_000_000, watermark_delay="1 seconds")
    q = agg.writeStream.outputMode("append").format("memory").queryName("late_agg").start()
    q.processAllAvailable()
    # jump event time far ahead → watermark passes the first windows
    mk([("a", int(100e9), 3.0)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    n_after_jump = spark.sql("SELECT count(*) FROM late_agg").first()[0]
    # late arrival inside an already-finalized window: dropped
    mk([("a", int(1e9) + 1, 99.0)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    q.stop()
    final = spark.sql("SELECT * FROM late_agg ORDER BY wstart").toPandas()
    assert len(final) == n_after_jump  # no new row for the stale window
    assert 99.0 not in set(final.get("v_sum", []))


def test_streaming_exact_dedup(spark, tmp_path):
    """First-seen copy survives, later duplicates within the watermark
    horizon drop; digest matches the batch operator's md5."""
    import hashlib

    from simple_tsdb_spark.streaming import streaming_exact_dedup

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("event_ts", T.TimestampType(), False),
        ]
    )
    src = str(tmp_path / "dedup_src")
    rows = [
        (1, "alpha", pd.Timestamp("2024-01-01 00:00:00")),
        (2, "beta", pd.Timestamp("2024-01-01 00:00:01")),
        (3, "alpha", pd.Timestamp("2024-01-01 00:00:02")),  # dup of 1
        (4, "gamma", pd.Timestamp("2024-01-01 00:00:03")),
        (5, "beta", pd.Timestamp("2024-01-01 00:00:04")),   # dup of 2
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "event_ts"])
    spark.createDataFrame(pdf, schema).coalesce(1).write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema(schema).parquet(src).coalesce(1)
    out = streaming_exact_dedup(stream, watermark_delay="1 hour")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_dedup")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT doc_id, text, content_md5 FROM stream_dedup").toPandas()
    assert sorted(got.text) == ["alpha", "beta", "gamma"]  # one per content
    md5 = {t: hashlib.md5(t.encode()).hexdigest() for t in ["alpha", "beta", "gamma"]}
    assert {r.text: r.content_md5 for r in got.itertuples()} == md5


def test_streaming_hopping_mean_matches_batch(spark, tmp_path):
    """Finalized hopping windows from the stream equal the batch
    hopping_mean frame bit-for-bit (same decimal-sum mean recipe)."""
    from simple_tsdb_spark.operators import hopping_mean
    from simple_tsdb_spark.streaming.aggregate import streaming_hopping_mean

    rows = [("a", int(i * 0.25e9), float(i) * 1.1) for i in range(40)] + [
        ("b", int(i * 1e9), 2.0 * i) for i in range(10)
    ]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])
    src = str(tmp_path / "hop_src")
    df = spark.createDataFrame(pdf, SCHEMA)
    df.coalesce(1).write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = streaming_hopping_mean(stream, field="v", window_ns=2_000_000_000, slide_ns=500_000_000)
    q = agg.writeStream.outputMode("complete").format("memory").queryName("hop_agg").start()
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM hop_agg")
        .toPandas()
        .sort_values(["series", "wstart"], ignore_index=True)
    )
    want = (
        hopping_mean(df, field="v", window_ns=2_000_000_000, slide_ns=500_000_000)
        .toPandas()
        .sort_values(["series", "wstart"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    """Finalized native session_windows equal batch sessionize sessions
    (true event-time bounds, counts; gap+1µs alignment of <= vs <),
    including a session whose points span two micro-batches."""
    from simple_tsdb_spark.operators.timeseries import sessionize
    from simple_tsdb_spark.streaming import streaming_sessionize

    gap = 2_000_000_000  # 2 s
    s_ = 1_000_000_000
    # series a: sessions [1..3s], [10..10s], [20,22,24s] (24-22 == gap stays);
    # the third session's tail (24s) arrives in batch 2
    rows1 = [("a", 1 * s_, 0.0), ("a", 2 * s_, 0.0), ("a", 3 * s_, 0.0),
             ("a", 10 * s_, 0.0), ("a", 20 * s_, 0.0), ("a", 22 * s_, 0.0),
             ("b", 5 * s_, 0.0)]
    rows2 = [("a", 24 * s_, 0.0)]
    src = str(tmp_path / "sess_src")

    def mk(rows):
        return spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "v"]), SCHEMA)

    mk(rows1).coalesce(1).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = streaming_sessionize(stream, gap_ns=gap, watermark_delay="0 seconds")
    q = agg.writeStream.outputMode("append").format("memory").queryName("sess_agg").start()
    q.processAllAvailable()
    mk(rows2).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    # advance the watermark far past every session, then one more batch
    # so append-mode emits the finalized windows
    mk([("a", 10**15, 0.0)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    mk([("a", 10**15 + 10**9, 0.0)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM sess_agg WHERE session_start < 1000000000000000")
        .toPandas()
        .sort_values(["series", "session_start"], ignore_index=True)
    )
    want = (
        sessionize(mk(rows1 + rows2), gap_ns=gap)
        .toPandas()
        .sort_values(["series", "session_start"], ignore_index=True)
        .drop(columns=["session_id"])
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # the == gap pair (22s, 24s) stayed one session
    a3 = got[(got.series == "a") & (got.session_start == 20 * s_)]
    assert len(a3) == 1 and a3.n_events.iloc[0] == 3 and a3.session_end.iloc[0] == 24 * s_


def test_streaming_burn_rate_matches_batch(spark, tmp_path):
    """Finalized burn-rate alerts from the stream equal the batch
    operator (same closed-left window convention, conditional sums)."""
    from simple_tsdb_spark.operators.timeseries import burn_rate_alerts
    from simple_tsdb_spark.streaming import streaming_burn_rate

    s_ = 1_000_000_000
    rows = [("ok", (2 * i + 1) * s_, 0.0) for i in range(50)] + [
        ("error", (2 * i + 1) * s_ + 1000, 0.0) for i in range(15, 25)
    ]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])
    kw = dict(
        error_series="error", short_ns=10 * s_, long_ns=30 * s_, slide_ns=5 * s_,
        short_threshold=0.3, long_threshold=0.15,
    )
    src = str(tmp_path / "burn_src")
    df = spark.createDataFrame(pdf[["series", "time_ns", "v"]], SCHEMA)
    df.coalesce(1).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = streaming_burn_rate(stream, watermark_delay="0 seconds", **kw)
    q = agg.writeStream.outputMode("append").format("memory").queryName("burn_agg").start()
    q.processAllAvailable()
    # advance watermark, then one more batch to flush finalized windows
    mk = lambda r: spark.createDataFrame(pd.DataFrame(r, columns=["series", "time_ns", "v"]), SCHEMA)
    mk([("ok", 10**15, 0.0)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    mk([("ok", 10**15 + s_, 0.0)]).coalesce(1).write.parquet(src, mode="append")
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM burn_agg WHERE wend < 1000000000000000")
        .toPandas()
        .sort_values("wend", ignore_index=True)
    )
    want = burn_rate_alerts(df, **kw).toPandas().sort_values("wend", ignore_index=True)
    assert len(want) > 0  # the burst fires in this fixture
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_streaming_heatmap_matches_batch(spark, tmp_path):
    from simple_tsdb_spark.operators.timeseries import heatmap_bins
    from simple_tsdb_spark.streaming import streaming_heatmap

    rows = [("a", int(i * 0.7e9) + 1000, (i % 13) - 3.0) for i in range(60)] + [
        ("b", int(i * 2e9) + 1000, float(i)) for i in range(12)
    ]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])
    src = str(tmp_path / "hm_src")
    df = spark.createDataFrame(pdf, SCHEMA)
    df.coalesce(1).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    kw = dict(field="v", window_ns=10_000_000_000, lo=-2.0, hi=8.0, nbins=5)
    q = (
        streaming_heatmap(stream, **kw)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hm_agg")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    key = ["series", "wstart", "bin"]
    got = spark.sql("SELECT * FROM hm_agg").toPandas().sort_values(key, ignore_index=True)
    want = (
        heatmap_bins(df, t0=0, t1=2**62, **kw)
        .toPandas()
        .sort_values(key, ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
