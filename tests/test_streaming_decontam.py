"""Streaming decontamination: flagged-doc equality with the batch twin
(pipeline.spans.decontaminate) and single-flag-per-doc semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from simple_tsdb_spark.pipeline import decontaminate
from simple_tsdb_spark.streaming import streaming_decontaminate_flags

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)


def test_streaming_flags_equal_batch(spark, tmp_path):
    bench_texts = {100: "a b c d e f", 101: "q r s t u"}
    corpus_texts = {
        1: "x a b c d y z w",          # contains bench 4-gram "a b c d"
        2: "clean words only here ok",  # clean
        3: "q r s t u v",              # two bench 4-grams
        4: "a b x c d y q r z t",      # bench words but no shared 4-gram
        5: "x a b c d y z w",          # same text as doc 1 — flagged too
    }
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(
        {
            "doc_id": list(corpus_texts),
            "text": list(corpus_texts.values()),
            "event_ts": [base + pd.Timedelta(seconds=i) for i in range(len(corpus_texts))],
        }
    )
    src = str(tmp_path / "src")
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src, exist_ok=True)
    pdf["event_ts"] = pdf["event_ts"].astype("datetime64[us]")  # file-source TimestampType
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f"{src}/docs.parquet")

    bench_pdf = pd.DataFrame({"doc_id": list(bench_texts), "text": list(bench_texts.values())})
    bench = spark.createDataFrame(bench_pdf)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    flags = streaming_decontaminate_flags(stream, bench, n=4, watermark_delay="1 hour")
    q = (
        flags.writeStream.outputMode("append")
        .format("memory")
        .queryName("decontam_flags")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = set(spark.sql("SELECT doc_id FROM decontam_flags").toPandas().doc_id)

    corpus = spark.createDataFrame(pdf[["doc_id", "text"]])
    want = set(decontaminate(corpus, bench, n=4).toPandas().doc_id)
    assert got == want
    assert got == {1, 3, 5}
    # exactly one flag per contaminated doc (dedup within watermark)
    counts = spark.sql(
        "SELECT doc_id, COUNT(*) c FROM decontam_flags GROUP BY doc_id"
    ).toPandas()
    assert (counts.c == 1).all()
