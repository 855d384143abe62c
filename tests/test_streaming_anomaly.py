"""Streaming z-score anomaly twin: per-point equality with the batch
operator under the same fitted stats; unfitted series emit nothing."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("time_ns", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def test_streaming_zscore_equal_batch(spark, tmp_path):
    import numpy as np

    from simple_tsdb_spark.operators import zscore_outliers
    from simple_tsdb_spark.operators.timeseries import zscore_stats
    from simple_tsdb_spark.streaming.anomaly import streaming_zscore_outliers

    rng = np.random.default_rng(31)
    rows = []
    for s in ("a", "b"):
        vals = rng.normal(10.0, 2.0, 300).round(3)
        vals[17] = 90.0
        vals[200] = -70.0
        rows += [(s, 1000 + i, float(v)) for i, v in enumerate(vals)]
    rows.append(("a", 5000, None))            # NULL row skipped
    rows.append(("unfitted", 1, 1e9))         # not in the fit → no baseline
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])

    fit = spark.createDataFrame(pdf[pdf.series != "unfitted"].dropna())
    stats = zscore_stats(fit, field="v")

    # batch reference over the SAME rows with the same fitted stats:
    # the batch op fits on its own input, which here equals `fit`
    want = {
        (r.series, r.time_ns): r.zscore
        for r in zscore_outliers(fit, field="v", k=3.0).collect()
    }
    assert want, "expected planted outliers"

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f"{src}/a.parquet")
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_zscore_outliers(stream, stats, field="v", k=3.0)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("z_stream")
        .start()
    )
    q.processAllAvailable()
    got = {
        (r.series, r.time_ns): r.zscore
        for r in spark.sql("SELECT * FROM z_stream").collect()
    }
    q.stop()
    # bit-identical per point; unfitted series absent
    assert got == want
    assert not any(s == "unfitted" for s, _ in got)
