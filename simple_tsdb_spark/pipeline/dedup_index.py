"""Materialized MinHash/LSH band index — incremental crawl dedup.

``minhash_lsh_pairs`` re-minhashes the whole corpus per run; the real
production shape is a DAILY slice arriving against a 100 TB corpus that
must NOT be re-shingled.  ``write_minhash_index`` materializes the
corpus's band buckets once — ``(doc, band_id, key)``, the joinable form
of each document's MinHash signature, parquet partitioned by
``band_id``.  ``dedup_against_index`` minhashes ONLY the new slice and
joins it against the stored buckets on ``(band_id, key)``; work scales
with |new| × bands plus the matched buckets, never with the indexed
corpus.  ``append_to_minhash_index`` folds the (deduped) slice into the
index so tomorrow's slice sees today's docs.

The signature constants (shingle length/stride, hash family, band
layout) are recorded in the manifest and checked on read — a corpus
indexed under different constants must not silently join."""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from simple_tsdb_spark.pipeline.dedup import (
    MINHASH_STRIDE,
    N_BANDS,
    N_HASHES,
    SHINGLE_LEN,
    minhash_band_buckets,
)

__all__ = [
    "write_minhash_index",
    "append_to_minhash_index",
    "dedup_against_index",
    "write_digest_index",
    "filter_against_digest_index",
]

_SIG = {
    "shingle_len": SHINGLE_LEN,
    "stride": MINHASH_STRIDE,
    "n_hashes": N_HASHES,
    "n_bands": N_BANDS,
    "key_buckets": 64,
}

def _kb() -> F.Column:
    """Key-prefix sub-partition: (band_id, kb) directories let a slice
    lookup prune to the partitions its band keys actually hash into.
    (Built lazily — column expressions need an active SparkContext.)"""
    return (
        F.expr("CAST(conv(substring(md5(key), 1, 2), 16, 10) AS INT)")
        % _SIG["key_buckets"]
    )


def write_minhash_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Build the index: one corpus pass (shingle → signature → bands,
    the exact ``minhash_lsh_pairs`` pipeline) and one partitioned
    write.  Returns the manifest."""
    from simple_tsdb_spark.fs import get_fs

    buckets = minhash_band_buckets(df, text_col=text_col, id_col=id_col).withColumn(
        "kb", _kb()
    )
    (
        buckets.repartition(F.col("band_id"), F.col("kb"))
        .write.mode("overwrite")
        .partitionBy("band_id", "kb")
        .parquet(f"{path}/buckets")
    )
    manifest = dict(_SIG)
    get_fs(path).write_text_atomic(f"{path}/manifest.json", json.dumps(manifest))
    return manifest


def _check_manifest(path: str) -> None:
    from simple_tsdb_spark.fs import get_fs

    man = json.loads(get_fs(path).read_text(f"{path}/manifest.json"))
    if man != _SIG:
        raise ValueError(
            f"minhash index at {path} was built under different signature "
            f"constants: index={man} engine={_SIG}"
        )


def append_to_minhash_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Fold a new slice's buckets into the index (append, no rewrite of
    existing partitions' files)."""
    _check_manifest(path)
    buckets = minhash_band_buckets(df, text_col=text_col, id_col=id_col).withColumn(
        "kb", _kb()
    )
    (
        buckets.repartition(F.col("band_id"), F.col("kb"))
        .write.mode("append")
        .partitionBy("band_id", "kb")
        .parquet(f"{path}/buckets")
    )


def dedup_against_index(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate near-dup pairs of NEW documents against the indexed
    corpus: ``(new_doc, corpus_doc, n_bands)``.  Only the new slice is
    shingled/minhashed; the join keys on ``(band_id, key)``, so the
    indexed side contributes only rows whose bucket a new doc actually
    hits.  Self-pairs (a new doc whose id already exists in the index)
    are excluded.  Identical candidate semantics to
    ``minhash_lsh_pairs`` restricted to new×corpus pairs (pinned in
    test_pipeline)."""
    _check_manifest(path)
    newb = minhash_band_buckets(new_df, text_col=text_col, id_col=id_col).withColumn(
        "kb", _kb()
    )
    idx = spark.read.parquet(f"{path}/buckets")
    # Partition pruning: the slice's (band_id, kb) hit set is bounded by
    # n_bands × key_buckets (256 dirs total); a small slice touches a
    # fraction of it, so the index READ — not just the join — scales
    # with the slice.  Above ~half the partitions the filter is noise:
    # skip it (full scan, still no re-minhash of the corpus).
    hits = {
        (r["band_id"], r["kb"])
        for r in newb.select("band_id", "kb").distinct().collect()
    }
    total = _SIG["n_bands"] * _SIG["key_buckets"]
    if len(hits) < total // 2:
        pred = None
        for b, kb in sorted(hits):
            c = (F.col("band_id") == int(b)) & (F.col("kb") == int(kb))
            pred = c if pred is None else (pred | c)
        if pred is not None:
            idx = idx.where(pred)
    return (
        newb.alias("n")
        .join(idx.alias("c"), ["band_id", "kb", "key"])
        .where(F.col("n.doc") != F.col("c.doc"))
        .groupBy(
            F.col("n.doc").alias("new_doc"), F.col("c.doc").alias("corpus_doc")
        )
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def write_digest_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 64,
) -> None:
    """Exact-dedup twin of the band index: the corpus's content digests
    (md5), parquet partitioned by a digest-prefix bucket so a slice
    check prunes to the buckets its digests hit."""
    d = df.select(
        F.md5(F.col(text_col)).alias("digest"),
        F.col(id_col).alias("doc"),
    ).withColumn(
        "bucket",
        F.expr("CAST(conv(substring(digest, 1, 2), 16, 10) AS INT)") % int(buckets),
    )
    (
        d.repartition(F.col("bucket"))
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{path}/digests")
    )
    from simple_tsdb_spark.fs import get_fs

    get_fs(path).write_text_atomic(
        f"{path}/digest_manifest.json", json.dumps({"buckets": int(buckets)})
    )


def filter_against_digest_index(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Drop new documents whose exact content already exists in the
    indexed corpus (LEFT ANTI on digest + partition pruning to the
    buckets the slice's digests hit).  Returns the surviving rows of
    ``new_df`` unchanged."""
    from simple_tsdb_spark.fs import get_fs

    man = json.loads(get_fs(path).read_text(f"{path}/digest_manifest.json"))
    B = int(man["buckets"])
    tagged = new_df.withColumn("_digest", F.md5(F.col(text_col))).withColumn(
        "_bucket",
        F.expr("CAST(conv(substring(_digest, 1, 2), 16, 10) AS INT)") % B,
    )
    hit = sorted(
        r["_bucket"] for r in tagged.select("_bucket").distinct().collect()
    )
    idx = spark.read.parquet(f"{path}/digests").where(F.col("bucket").isin(hit))
    return (
        tagged.join(
            idx.select(F.col("digest").alias("_digest")), "_digest", "left_anti"
        )
        .drop("_digest", "_bucket")
    )
