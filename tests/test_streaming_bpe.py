"""Streaming BPE encode: fit on a snapshot, encode the stream — output
rows identical to the batch twin for the same documents."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from simple_tsdb_spark.pipeline import bpe_encode_counts, bpe_train_sampled
from simple_tsdb_spark.streaming.scores import streaming_bpe_counts

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def test_streaming_bpe_equal_batch(spark, tmp_path):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the lazy dog sleeps",
        "pack my box with five dozen liquor jugs",
        "",
        "the the the",
    ] * 4
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f"{src}/a.parquet")

    corpus = spark.createDataFrame(pdf)
    merges = bpe_train_sampled(corpus, n_merges=30, top_m=64)
    want = (
        bpe_encode_counts(corpus, merges)
        .toPandas()
        .sort_values("doc_id", ignore_index=True)
    )

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        streaming_bpe_counts(stream, merges)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("bpe_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = (
            spark.sql("SELECT * FROM bpe_stream")
            .toPandas()
            .sort_values("doc_id", ignore_index=True)
        )
    finally:
        q.stop()
    pd.testing.assert_frame_equal(got, want)
