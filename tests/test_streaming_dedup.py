"""Streaming near-dup filter (simhash band ownership): equality with the
batch twin on survivors, total recall on exact duplicates, and bounded
stateful execution (two chained stateful operators, append mode)."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import types as T

from simple_tsdb_spark.pipeline import simhash_band_dedup
from simple_tsdb_spark.streaming import streaming_simhash_dedup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)

def _docs() -> list[tuple[int, str]]:
    # Distinct per-doc vocabularies (simhash is order-independent, so
    # texts must differ in their word BAGS, not just order); doc 3 is an
    # exact dup of doc 1, doc 5 a one-word edit of doc 2.
    docs = [(i, " ".join(f"w{i}x{j}" for j in range(24))) for i in range(8)]
    docs[3] = (3, docs[1][1])
    near = docs[2][1].split()
    near[5] = "feline"
    docs[5] = (5, " ".join(near))
    return docs


def _write_one_doc_files(src: str, docs, base_ts: pd.Timestamp):
    """One parquet file per doc with strictly increasing mtimes so the
    file source replays them in doc order, one micro-batch each."""
    os.makedirs(src, exist_ok=True)
    for j, (i, text) in enumerate(docs):
        path = os.path.join(src, f"doc_{j:03d}.parquet")
        ts = base_ts + pd.Timedelta(seconds=i)
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([i], pa.int64()),
                    "text": pa.array([text], pa.string()),
                    "event_ts": pa.array([ts.to_pydatetime()], pa.timestamp("us")),
                }
            ),
            path,
        )
        mt = 1_700_000_000 + 10 * j
        os.utime(path, (mt, mt))


def test_streaming_simhash_dedup_equals_batch_twin(spark, tmp_path):
    base = pd.Timestamp("2024-01-01 00:00:00")
    docs = _docs()
    src = str(tmp_path / "near_src")
    flush = [(999, "totally unrelated flush content zzz qqq")]
    _write_one_doc_files(src, docs, base)
    # flush doc a day later advances the watermark past every real window
    _write_one_doc_files(str(tmp_path / "flush"), flush, base + pd.Timedelta(days=1))
    os.rename(
        str(tmp_path / "flush" / "doc_000.parquet"),
        os.path.join(src, "zzz_flush.parquet"),
    )
    mt = 1_700_000_000 + 10 * 50
    os.utime(os.path.join(src, "zzz_flush.parquet"), (mt, mt))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_simhash_dedup(
        stream, max_hamming=3, watermark_delay="1 hour", finalize_window="1 minute"
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("near_dedup").start()
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT doc_id, simhash FROM near_dedup").toPandas()

    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    twin = simhash_band_dedup(
        spark.createDataFrame(pdf), max_hamming=3, order_col="doc_id"
    ).toPandas()
    want_survivors = set(twin[twin.survives].doc)
    assert set(got.doc_id) == want_survivors
    # exact duplicate (doc 3 == doc 1) can never survive
    assert 1 in want_survivors and 3 not in set(got.doc_id)
    # fingerprints agree between the streaming (pure-expression) and
    # batch (codegen aggregation) simhash forms
    sh_twin = dict(zip(twin.doc, twin.sh))
    assert all(sh_twin[r.doc_id] == r.simhash for r in got.itertuples())


def test_simhash_band_dedup_total_recall(spark):
    """No surviving pair may be within max_hamming of each other —
    pigeonhole guarantees the later one drops."""
    pdf = pd.DataFrame(_docs(), columns=["doc_id", "text"])
    out = simhash_band_dedup(spark.createDataFrame(pdf), max_hamming=3, order_col="doc_id").toPandas()
    surv = out[out.survives]
    fps = list(zip(surv.doc, surv.sh))
    for i, (da, a) in enumerate(fps):
        for db, b in fps[i + 1 :]:
            assert bin(int(a) ^ int(b)).count("1") > 3, (da, db)


def test_streaming_dedup_against_index_equals_batch(spark, tmp_path):
    """Stream-vs-index flags equal the batch twin: a doc's n_bands > 0
    iff dedup_against_index reports it, and exact copies hit all bands."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import dedup_against_index, write_minhash_index
    from simple_tsdb_spark.streaming import streaming_dedup_against_index

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        "doc_id < 400"
    )
    path = str(tmp_path / "mhidx")
    write_minhash_index(spark, corpus, path)

    # stream slice: two exact copies of corpus docs + fresh docs
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [(100000 + r.doc_id, r.text) for r in corpus.limit(2).collect()]
    rows += [(200000 + i, " ".join(f"zz{i}q{j}" for j in range(30))) for i in range(4)]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    pdf["event_ts"] = pd.Series(
        [base + pd.Timedelta(seconds=i) for i in range(len(pdf))]
    ).astype("datetime64[us]")
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f"{src}/a.parquet")

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    flagged = streaming_dedup_against_index(
        stream, path, watermark_delay="1 seconds"
    )
    q = (
        flagged.writeStream.format("memory")
        .queryName("idx_flags")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    sentinel = pdf.iloc[:1].copy()
    sentinel["doc_id"] = [999999]
    sentinel["text"] = ["flush flush flush"]
    sentinel["event_ts"] = pd.Series(
        [base + pd.Timedelta(days=30)]
    ).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(sentinel, preserve_index=False), f"{src}/b.parquet")
    q.processAllAvailable()
    q.stop()

    got = {
        r.doc_id: r.n_bands
        for r in spark.sql("select * from idx_flags").collect()
    }
    new_df = spark.createDataFrame(pdf[["doc_id", "text"]])
    want_pos = {
        r.new_doc: r.n_bands
        for r in dedup_against_index(spark, new_df, path).collect()
    }
    assert set(got) == set(pdf.doc_id)
    for d in pdf.doc_id:
        assert got[d] == want_pos.get(d, 0), d
    # exact copies hit all 4 bands; fresh docs hit none
    assert all(got[100000 + r.doc_id] == 4 for r in corpus.limit(2).collect())
    assert all(got[200000 + i] == 0 for i in range(4))


def test_streaming_source_dedup_rate_first_occurrence(spark, tmp_path):
    """Per (window, source): n_docs counts all arrivals; n_unique
    counts first occurrences only, attributed to the first window —
    verified against a python first-seen model."""
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import types as T

    from simple_tsdb_spark.streaming import streaming_source_dedup_rate

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("source", T.StringType(), False),
            T.StructField("event_ts", T.TimestampType(), False),
        ]
    )
    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = [
        # window 0 (first minute): web a,a,b  niche x
        (1, "a", "web", 0), (2, "a", "web", 5), (3, "b", "web", 10), (4, "x", "niche", 20),
        # window 1: web a (dup from w0 -> counts in n_docs only), c new
        (5, "a", "web", 70), (6, "c", "web", 75),
        # same text in ANOTHER source is its own key
        (7, "a", "niche", 80),
    ]
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "source": [r[2] for r in rows],
            "event_ts": pd.Series(
                [base + pd.Timedelta(seconds=r[3]) for r in rows]
            ).astype("datetime64[us]"),
        }
    )
    flush = pd.DataFrame(
        {
            "doc_id": [99],
            "text": ["zz"],
            "source": ["web"],
            "event_ts": pd.Series([base + pd.Timedelta(days=1)]).astype("datetime64[us]"),
        }
    )
    src = str(tmp_path / "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), f"{src}/a.parquet")
    pq.write_table(pa.Table.from_pandas(flush, preserve_index=False), f"{src}/b.parquet")
    os.utime(f"{src}/a.parquet", (1_700_000_000, 1_700_000_000))
    os.utime(f"{src}/b.parquet", (1_700_000_100, 1_700_000_100))

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = streaming_source_dedup_rate(stream, watermark_delay="1 hour", window="1 minute")
    q = out.writeStream.outputMode("append").format("memory").queryName("dup_mon").start()
    q.processAllAvailable()
    q.stop()
    got = (
        spark.sql("SELECT * FROM dup_mon")
        .toPandas()
        .set_index(["window_start", "source"])
        .sort_index()
    )

    w0, w1 = base, base + pd.Timedelta(minutes=1)
    assert got.loc[(w0, "web"), "n_docs"] == 3
    assert got.loc[(w0, "web"), "n_unique"] == 2  # a, b (second a is a dup)
    assert got.loc[(w0, "web"), "dup_rate_ppm"] == 1_000_000 // 3
    assert got.loc[(w0, "niche"), "n_docs"] == 1 and got.loc[(w0, "niche"), "n_unique"] == 1
    # window 1: 'a' already seen in w0 -> doc only; 'c' is new
    assert got.loc[(w1, "web"), "n_docs"] == 2
    assert got.loc[(w1, "web"), "n_unique"] == 1
    # same text, different source = its own key -> unique in niche
    assert got.loc[(w1, "niche"), "n_unique"] == 1
