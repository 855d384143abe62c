"""Streaming ingest curation: survivors and their split/sample decisions
must match the batch chain (decontaminate → exact_dedup → hash_split →
mixture_sample) run over the same documents."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from simple_tsdb_spark.pipeline import decontaminate, hash_split, mixture_sample
from simple_tsdb_spark.streaming import streaming_curate

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("event_ts", T.TimestampType(), False),
    ]
)


def _write_one_doc_files(src: str, rows, base: pd.Timestamp):
    """One parquet file per doc, increasing mtimes: the file source
    replays them in order, one micro-batch each, so first-arrival
    dedup semantics are deterministic."""
    os.makedirs(src, exist_ok=True)
    for j, (doc_id, text, source) in enumerate(rows):
        ts = (base + pd.Timedelta(seconds=j)).to_pydatetime()
        path = os.path.join(src, f"doc_{j:03d}.parquet")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([doc_id], pa.int64()),
                    "text": pa.array([text], pa.string()),
                    "source": pa.array([source], pa.string()),
                    "event_ts": pa.array([ts], pa.timestamp("us")),
                }
            ),
            path,
        )
        mt = 1_700_000_000 + 10 * j
        os.utime(path, (mt, mt))


def test_streaming_curate_equals_batch_chain(spark, tmp_path):
    bench_texts = {900: "a b c d e f"}
    corpus = [
        (1, "x a b c d y z w", "web"),           # contaminated -> dropped
        (2, "clean doc one two three", "web"),
        (3, "clean doc one two three", "web"),   # exact dup of 2 -> dropped
        (4, "short", "niche"),                   # gram-less, survives filter
        (5, "another clean document here now", "niche"),
        (6, "yet another fine document indeed", "web"),
        (7, "totally different words entirely present", "web"),
    ]
    base = pd.Timestamp("2024-01-01 00:00:00")
    src = str(tmp_path / "src")
    _write_one_doc_files(src, corpus, base)
    # flush doc a day later: advances the watermark past every real
    # window so the per-doc counts finalize; its own window never closes,
    # so it cannot appear in the output.
    flush_dir = str(tmp_path / "flush")
    _write_one_doc_files(
        flush_dir, [(999, "flush filler words zzz", "web")], base + pd.Timedelta(days=1)
    )
    os.rename(
        os.path.join(flush_dir, "doc_000.parquet"), os.path.join(src, "zzz_flush.parquet")
    )
    mt = 1_700_000_000 + 10 * 50
    os.utime(os.path.join(src, "zzz_flush.parquet"), (mt, mt))

    bench = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(bench_texts), "text": list(bench_texts.values())})
    )
    rates = {"web": 60}

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = streaming_curate(
        stream, bench, rates=rates, default_rate=100, n=4,
        watermark_delay="1 hour", finalize_window="1 minute",
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("curated").start()
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM curated").toPandas()

    # batch twin over the same docs (first-arriving = lowest doc order)
    pdf = pd.DataFrame(corpus, columns=["doc_id", "text", "source"])
    docs = spark.createDataFrame(pdf)
    flagged = decontaminate(docs, bench, n=4)
    clean = docs.join(flagged, "doc_id", "left_anti")
    deduped = (
        clean.withColumn("content_md5", F.md5("text"))
        .withColumn(
            "_rn",
            F.row_number().over(Window.partitionBy("content_md5").orderBy("doc_id")),
        )
        .where("_rn = 1")
    )
    sampled = mixture_sample(deduped, rates, default_rate=100)
    split = hash_split(deduped)
    want = (
        deduped.join(sampled.select("doc_id"), "doc_id")
        .join(split.select("doc_id", "split"), "doc_id")
        .select("doc_id", F.col("source").alias("domain"), "split", "content_md5")
        .toPandas()
    )

    got_s = got.sort_values("doc_id").reset_index(drop=True)
    want_s = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)

    ids = set(got.doc_id)
    assert 1 not in ids          # contaminated never reaches the output
    assert len({2, 3} & ids) <= 1  # at most one of the exact-dup pair
    assert 4 in ids              # gram-less doc passes the filter


def test_streaming_temperature_sample_equals_batch(spark, tmp_path):
    """The stream keeps EXACTLY the docs the batch sampler keeps:
    thresholds fit once from a static corpus, stateless keep filter."""
    from simple_tsdb_spark.pipeline import temperature_mixture
    from simple_tsdb_spark.pipeline.curation import _hash60
    from simple_tsdb_spark.streaming import streaming_temperature_sample

    corpus = [
        (i, f"doc number {i} words", "web" if i < 40 else "niche")
        for i in range(50)
    ]
    base = pd.Timestamp("2024-01-01 00:00:00")
    src = str(tmp_path / "src")
    _write_one_doc_files(src, corpus, base)

    pdf = pd.DataFrame(corpus, columns=["doc_id", "text", "source"])
    fit = spark.createDataFrame(pdf)

    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 10).parquet(src)
    )
    out = streaming_temperature_sample(stream, fit, target_total=20)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("temp_sampled").start()
    )
    q.processAllAvailable()
    q.stop()
    got = set(spark.sql("SELECT doc_id FROM temp_sampled").toPandas().doc_id)

    # batch twin: same thresholds -> same keep set
    rep = temperature_mixture(fit, target_total=20).toPandas().set_index("source")
    import hashlib as _hl
    import math

    want = set()
    for doc_id, _txt, source in corpus:
        h = int(_hl.md5(f"temp-v1:{doc_id}".encode()).hexdigest()[:15], 16)
        if h < math.floor(rep.loc[source, "p_keep"] * float(1 << 60)):
            want.add(doc_id)
    assert got == want
    assert 0 < len(got) < 50  # the filter actually selects
    # per-source kept counts agree with the batch REPORT too
    kept_by_src = (
        spark.sql("SELECT source, COUNT(*) AS n FROM temp_sampled GROUP BY source")
        .toPandas().set_index("source").n
    )
    for s_ in kept_by_src.index:
        assert kept_by_src[s_] == rep.loc[s_, "n_kept"]


def test_streaming_temperature_sample_unseen_source_policy(spark, tmp_path):
    """Sources absent from the fit corpus follow unseen_policy: drop by
    default, keep-all with 'keep' — never a silent inner-join drop."""
    from simple_tsdb_spark.streaming import streaming_temperature_sample

    fit = spark.createDataFrame(
        pd.DataFrame(
            [(i, f"doc {i}", "web") for i in range(20)],
            columns=["doc_id", "text", "source"],
        )
    )
    arrivals = [(100 + i, f"new {i}", "brandnew") for i in range(5)]
    base = pd.Timestamp("2024-01-01 00:00:00")
    src = str(tmp_path / "src_unseen")
    _write_one_doc_files(src, arrivals, base)
    stream = spark.readStream.schema(SCHEMA).parquet(src)

    for policy, expect in (("drop", 0), ("keep", 5)):
        out = streaming_temperature_sample(
            stream, fit, target_total=10, unseen_policy=policy
        )
        qname = f"temp_unseen_{policy}"
        q = (
            out.writeStream.outputMode("append").format("memory")
            .queryName(qname).start()
        )
        q.processAllAvailable()
        q.stop()
        n = spark.sql(f"SELECT COUNT(*) AS n FROM {qname}").first()["n"]
        assert n == expect, (policy, n)

    import pytest as _pytest

    with _pytest.raises(ValueError):
        streaming_temperature_sample(stream, fit, target_total=10, unseen_policy="bogus")
