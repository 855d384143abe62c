"""Streaming DSIR scoring: per-doc weight equality with the batch twin
(pipeline.text.dsir_logweights) under the same fitted ratio table."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import types as T

from simple_tsdb_spark.pipeline import dsir_logweights
from simple_tsdb_spark.pipeline.text import dsir_ratio_table
from simple_tsdb_spark.streaming.scores import streaming_dsir_scores

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)


def test_streaming_dsir_equal_batch(spark, tmp_path):
    rows = []
    for i in range(20):
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
    for i in range(20, 40):
        rows.append((i, "le renard brun saute par dessus le chien", "fr"))
    rows.append((40, "solo", "en"))  # no bigram → weight 0
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["event_ts"] = pd.Series(
        [base + pd.Timedelta(seconds=i) for i in range(len(pdf))]
    ).astype("datetime64[us]")

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f"{src}/a.parquet")

    corpus = spark.createDataFrame(pdf[["doc_id", "text", "lang"]])
    ratios = dsir_ratio_table(corpus, target_pred="lang = 'en'")
    want = {r.doc_id: r.logw for r in dsir_logweights(corpus, target_pred="lang = 'en'").collect()}

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    scored = streaming_dsir_scores(stream, ratios, watermark_delay="1 seconds")
    q = (
        scored.writeStream.outputMode("append")
        .format("memory")
        .queryName("dsir_stream")
        .start()
    )
    q.processAllAvailable()
    # push the watermark past every corpus doc with a far-future sentinel
    sentinel = pd.DataFrame(
        {
            "doc_id": [999],
            "text": ["flush flush flush"],
            "lang": ["en"],
            "event_ts": pd.Series([base + pd.Timedelta(days=30)]).astype("datetime64[us]"),
        }
    )
    pq.write_table(pa.Table.from_pandas(sentinel, preserve_index=False), f"{src}/b.parquet")
    q.processAllAvailable()
    q.stop()

    got = {
        r.doc_id: r.logw
        for r in spark.sql("SELECT doc_id, logw FROM dsir_stream").collect()
    }
    assert got == want  # sentinel not emitted (watermark), all 41 docs equal
    assert got[40] == 0
    en = sum(got[i] for i in range(20)) / 20
    fr = sum(got[i] for i in range(20, 40)) / 20
    assert en > fr


def test_streaming_ngram_lm_equal_batch(spark, tmp_path):
    """Streaming bigram-LM scoring: per-doc (n_bigrams, xent) equality
    with the batch twin under the same fitted model — covers seen
    bigrams, unseen-bigram/seen-history, full OOV, and the <2-token
    NULL case."""
    from simple_tsdb_spark.pipeline import ngram_lm_score
    from simple_tsdb_spark.pipeline.text import ngram_lm_model
    from simple_tsdb_spark.streaming.lm import streaming_ngram_lm_scores

    rows = []
    for i in range(10):
        rows.append((i, "the cat sat on the mat", "wiki"))
    rows.append((10, "the cat sat quickly", "web"))
    rows.append((11, "zebra quagga okapi", "web"))
    rows.append((12, "solo", "web"))
    base = pd.Timestamp("2024-01-01 00:00:00")
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    pdf["event_ts"] = pd.Series(
        [base + pd.Timedelta(seconds=i) for i in range(len(pdf))]
    ).astype("datetime64[us]")

    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f"{src}/a.parquet")

    corpus = spark.createDataFrame(pdf[["doc_id", "text", "lang"]])
    # fit on the 'wiki' slice, batch twin over the same corpus
    want = {
        r.doc_id: (r.n_bigrams, r.xent)
        for r in ngram_lm_score(corpus, fit_pred="lang = 'wiki'").collect()
    }
    lookup, hist, V = ngram_lm_model(corpus, fit_pred="lang = 'wiki'")

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    scored = streaming_ngram_lm_scores(
        stream, lookup, hist, V, watermark_delay="1 seconds"
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("lm_scores")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    # push the watermark past every corpus doc with a far-future sentinel
    sentinel = pd.DataFrame(
        {
            "doc_id": [999],
            "text": ["flush flush flush"],
            "lang": ["web"],
            "event_ts": pd.Series(
                [base + pd.Timedelta(days=30)]
            ).astype("datetime64[us]"),
        }
    )
    pq.write_table(pa.Table.from_pandas(sentinel, preserve_index=False), f"{src}/b.parquet")
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: (r.n_bigrams, r.xent)
        for r in spark.sql("select * from lm_scores").collect()
    }
    assert got == want
