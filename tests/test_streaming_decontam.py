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


def test_streaming_ngram_novelty_equals_batch(spark, tmp_path):
    """Finalized per-doc novelty rows are value-identical to the batch
    operator on every doc with >= 1 gram."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_tsdb_spark.pipeline import ngram_novelty
    from simple_tsdb_spark.streaming import streaming_ngram_novelty

    ref_texts = {100: "a b c d e f"}
    corpus_texts = {
        1: "a b c d e f",           # novelty 0
        2: "x y z w q r",           # novelty 1
        3: "a b c d x y z w",       # mixed
        4: "a b c d a b c d e",     # repeated grams -> distinct once
    }
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = list(corpus_texts.items()) + [(999, "flush filler words zzz only")]
    ts = [base + pd.Timedelta(seconds=i) for i in range(len(corpus_texts))] + [
        base + pd.Timedelta(days=1)  # advances watermark; own window never closes
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "event_ts": pd.Series(ts).astype("datetime64[us]"),
        }
    )
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf.iloc[:4], preserve_index=False), f"{src}/a.parquet")
    pq.write_table(pa.Table.from_pandas(pdf.iloc[4:], preserve_index=False), f"{src}/b.parquet")
    os.utime(f"{src}/a.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(f"{src}/b.parquet", (1_700_000_100, 1_700_000_100))

    ref = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(ref_texts), "text": list(ref_texts.values())})
    )
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_ngram_novelty(
        stream, ref, n=4, watermark_delay="1 hour", finalize_window="1 minute"
    )
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("novelty_stream").start()
    )
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM novelty_stream").toPandas()
        .sort_values("doc_id", ignore_index=True)
    )

    corpus = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(corpus_texts), "text": list(corpus_texts.values())})
    )
    want = (
        ngram_novelty(corpus, ref, n=4).toPandas()
        .query("n_grams > 0")
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(got.doc_id) == list(want.doc_id)
    for c in ("n_grams", "n_novel", "novelty_ppm"):
        assert list(got[c]) == list(want[c]), c
