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
    rows1 = [("a", 10 * i, float(i)) for i in range(50)]
    rows2 = [("a", 10 * (50 + i), float(50 + i)) for i in range(50)]
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
    # reference: one uninterrupted pandas ewm over the concatenated series
    all_vals = pd.Series([r[2] for r in rows1 + rows2])
    want = all_vals.ewm(alpha=alpha, adjust=False).mean()
    assert len(got) == 100
    # the first row of batch 2 must continue from batch 1's state:
    import numpy as np

    np.testing.assert_allclose(got.v_ewma.to_numpy(), want.to_numpy(), rtol=1e-12)
