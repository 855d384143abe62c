"""Stream-stream interval join: equality with the batch operator, and
bounded-state plan acceptance (append mode requires the time-range
condition — Spark rejects unbounded stream-stream joins)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from simple_tsdb_spark.operators import interval_join
from simple_tsdb_spark.streaming import streaming_interval_join

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("time_ns", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
    ]
)

BASE = 1_704_067_200_000_000_000  # 2024-01-01 UTC, µs-aligned


def _rows(rng, n, offset):
    return pd.DataFrame(
        {
            "series": [("a" if i % 3 else "b") for i in range(n)],
            "time_ns": np.sort(
                BASE + offset + rng.integers(0, 3_600_000_000, size=n) * 1000
            ),
            "v": rng.random(n),
        }
    )


def test_streaming_equals_batch(spark, tmp_path):
    rng = np.random.default_rng(11)
    lpdf, rpdf = _rows(rng, 50, 0), _rows(rng, 40, 500_000_000)
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    spark.createDataFrame(lpdf, SCHEMA).coalesce(1).write.parquet(lsrc)
    spark.createDataFrame(rpdf, SCHEMA).coalesce(1).write.parquet(rsrc)

    tol = 600_000_000_000  # 10 min
    lstream = spark.readStream.schema(SCHEMA).parquet(lsrc).coalesce(1)
    rstream = spark.readStream.schema(SCHEMA).parquet(rsrc).coalesce(1)
    out = streaming_interval_join(lstream, rstream, tol_ns=tol, right_fields=["v"])
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_ij")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(tuple, spark.sql(
            "SELECT series, time_ns, v, match_time_ns, v_match, delta_ns FROM stream_ij"
        ).collect())
    )
    want = sorted(
        map(tuple, interval_join(
            spark.createDataFrame(lpdf, SCHEMA),
            spark.createDataFrame(rpdf, SCHEMA),
            tol_ns=tol,
            right_fields=["v"],
        ).select("series", "time_ns", "v", "match_time_ns", "v_match", "delta_ns").collect())
    )
    assert len(got) > 0
    assert got == want


def test_streaming_join_rejects_unaligned_tol(spark, tmp_path):
    src = spark.readStream.schema(SCHEMA).parquet(str(tmp_path))
    with pytest.raises(ValueError):
        streaming_interval_join(src, src, tol_ns=1500, right_fields=["v"])


def test_streaming_join_is_stateful_with_watermarks(spark, tmp_path):
    """The join must run as a watermarked stateful symmetric-hash join —
    the configuration under which Spark expires buffered rows at
    watermark+tol (an unwatermarked inner join is accepted too, but its
    state grows forever; this pins that OUR plan carries the watermarks
    and state metrics)."""
    lsrc = str(tmp_path / "lb")
    spark.createDataFrame(_rows(np.random.default_rng(1), 5, 0), SCHEMA).coalesce(1).write.parquet(lsrc)
    out = streaming_interval_join(
        spark.readStream.schema(SCHEMA).parquet(lsrc),
        spark.readStream.schema(SCHEMA).parquet(lsrc),
        tol_ns=60_000_000_000,
        right_fields=["v"],
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("self_ij").start()
    q.processAllAvailable()
    progresses = [p for p in q.recentProgress if p.get("stateOperators")]
    q.stop()
    # self-join: every point matches itself at Δ=0
    n = spark.sql("SELECT count(*) FROM self_ij WHERE delta_ns = 0").first()[0]
    assert n >= 5
    # stateful symmetric-hash join with a non-zero event-time watermark
    assert progresses, "no stateOperators reported — join did not run stateful"
    op = progresses[-1]["stateOperators"][0]
    assert op.get("operatorName", "").startswith("symmetricHashJoin"), op
    wm = progresses[-1].get("eventTime", {}).get("watermark", "")
    assert wm and not wm.startswith("1970"), f"watermark never advanced: {wm!r}"
