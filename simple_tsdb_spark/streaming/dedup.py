"""Streaming exact dedup — the ingest-dedup stage of a training-data
pipeline as a continuous query.

Batch twin: ``pipeline.exact_dedup`` (hash-groupBy on the content
digest).  Streaming keeps the FIRST-seen copy of each digest and drops
later duplicates, with state bounded by the watermark horizon
(``dropDuplicatesWithinWatermark``): at 100 TB/day ingest the dedup
state holds one digest per distinct document seen within the horizon,
not the corpus — cross-horizon dedup belongs to the batch operator over
the stored table.

The digest is md5 of the content (same as the batch operator), so a
document deduped on the stream hashes identically in later batch passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_exact_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Drop duplicate-content documents within the watermark horizon.

    Adds ``content_md5``; exactly one copy per digest survives — the
    first-arriving micro-batch's copy (within one micro-batch the
    surviving row is engine-chosen).  The watermark bounds both state
    size and how late a duplicate can arrive and still be caught — the
    deliberate streaming trade documented above.
    """
    return (
        stream.withColumn("content_md5", F.md5(F.col(text_col)))
        .withWatermark(event_time_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


def streaming_simhash_dedup(
    stream: DataFrame,
    *,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
    finalize_window: str = "1 minute",
) -> DataFrame:
    """Streaming NEAR-dup pre-filter: greedy simhash band ownership.

    Batch twin: ``pipeline.dedup.simhash_band_dedup`` (identical
    semantics when arrival order matches the twin's ``order_col``).  Each
    document fans out to its ``max_hamming+1`` simhash band keys
    (pigeonhole over the 32-bit fingerprint, as in ``simhash_pairs``);
    ``dropDuplicatesWithinWatermark`` on (band_id, band value) keeps the
    first presenter of every band key, and a document SURVIVES iff all of
    its band rows survived — i.e. nothing inside the watermark horizon
    collided with any band.

    Recall is total by pigeonhole (a doc at hamming ≤ ``max_hamming``
    from any in-horizon predecessor shares ≥1 band and is dropped);
    precision is the deliberate trade — a band collision at hamming >
    ``max_hamming`` also drops — which is the right polarity for a
    streaming PRE-filter in front of exact batch dedup over the stored
    corpus.  State: one entry per distinct band key in the horizon
    (≤ (max_hamming+1)·docs), expiring with the watermark.

    Two chained stateful operators (dedup → windowed count, an
    append-mode combination Spark supports): survivors finalize once the
    watermark passes their ``finalize_window``.  The fingerprint comes
    from the pure-expression simhash (``text._simhash_expr``) — the
    aggregation-based codegen form is not available before a stateful op.

    Output: (doc_id, simhash), append-mode.
    """
    from simple_tsdb_spark.pipeline.dedup import _simhash_bands
    from simple_tsdb_spark.pipeline.text import _simhash_expr

    k = int(max_hamming) + 1
    bands = _simhash_bands(max_hamming)
    stack = ", ".join(
        f"{i}, CAST(shiftright(sh, {shift}) & {(1 << width) - 1} AS BIGINT)"
        for i, (shift, width) in enumerate(bands)
    )
    banded = (
        stream.withColumn("sh", _simhash_expr(text_col))
        .selectExpr(id_col, event_time_col, "sh", f"stack({k}, {stack}) AS (band_id, band_key)")
        .withWatermark(event_time_col, watermark_delay)
    )
    survivors = banded.dropDuplicatesWithinWatermark(["band_id", "band_key"])
    return (
        survivors.groupBy(F.window(event_time_col, finalize_window), F.col(id_col))
        .agg(F.count(F.lit(1)).alias("_n"), F.first("sh").alias("simhash"))
        .where(F.col("_n") == k)
        .select(id_col, "simhash")
    )


def streaming_dedup_against_index(
    stream: DataFrame,
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Flag streaming documents that near-dup an INDEXED corpus —
    (doc_id, event_ts, n_bands): how many of the doc's LSH bands hit
    any indexed bucket (0 = novel).

    Batch twin: ``pipeline.dedup_index.dedup_against_index`` (a doc's
    ``n_bands > 0`` here iff it appears as a ``new_doc`` there; pinned
    in test_streaming_dedup).  Shape: ONE stateful aggregation (the
    per-(doc, event-time) minhash signature, watermark-bounded) and
    then one stateless stream-static LEFT join per band against the
    DISTINCT materialized bucket keys — chaining a second stateful
    aggregation after the signature is unsupported, so band membership
    rides as columns, not exploded rows.  The static side is re-read
    every micro-batch: an ``append_to_minhash_index`` of yesterday's
    slice is visible to today's stream without a restart."""
    from pyspark.sql import SparkSession

    from simple_tsdb_spark.pipeline.dedup import (
        MERSENNE31,
        MINHASH_STRIDE,
        N_BANDS,
        N_HASHES,
        SHINGLE_LEN,
        _MINHASH_A,
        _MINHASH_B,
        _hash60,
    )
    from simple_tsdb_spark.pipeline.dedup_index import _check_manifest

    _check_manifest(index_path)
    spark = SparkSession.getActiveSession()
    idx = (
        spark.read.parquet(f"{index_path}/buckets")
        .select("band_id", "key")
        .dropDuplicates(["band_id", "key"])
    )

    wm = stream.withWatermark(event_time_col, watermark_delay)
    pos = wm.select(
        F.col(id_col).alias("doc"),
        F.col(event_time_col),
        F.col(text_col).alias("_t"),
        F.explode(
            F.expr(
                f"sequence(1, greatest(length({text_col}) - {SHINGLE_LEN - 1}, 1), "
                f"{MINHASH_STRIDE})"
            )
        ).alias("_i"),
    )
    sh = pos.select(
        "doc",
        event_time_col,
        F.expr(f"substring(_t, _i, {SHINGLE_LEN})").alias("sh"),
    ).withColumn("hb", F.expr(f"{_hash60('sh')} % {MERSENNE31}"))
    sig = sh.groupBy("doc", event_time_col).agg(
        *[
            F.min(
                F.expr(f"({_MINHASH_A[j]}L * hb + {_MINHASH_B[j]}L) % {MERSENNE31}")
            ).alias(f"h{j}")
            for j in range(N_HASHES)
        ]
    )
    rows_per_band = N_HASHES // N_BANDS
    out = sig
    hit_cols = []
    for b in range(N_BANDS):
        parts = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = F.concat_ws(",", *[F.col(p).cast("string") for p in parts])
        bidx = (
            idx.where(F.col("band_id") == b)
            .select(F.col("key").alias(f"_k{b}"), F.lit(1).alias(f"_hit{b}"))
        )
        out = out.withColumn(f"_k{b}", key).join(bidx, f"_k{b}", "left")
        hit_cols.append(F.coalesce(F.col(f"_hit{b}"), F.lit(0)))
    n_bands = hit_cols[0]
    for c in hit_cols[1:]:
        n_bands = n_bands + c
    return out.select(
        F.col("doc").alias(id_col),
        F.col(event_time_col),
        n_bands.cast("long").alias("n_bands"),
    )


def streaming_source_dedup_rate(
    stream: DataFrame,
    *,
    text_col: str = "text",
    domain_col: str = "source",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
    window: str = "1 minute",
) -> DataFrame:
    """Live per-source duplication monitor — the streaming companion of
    batch ``source_dedup_rate``: per (window, source), total arrivals
    vs FIRST-OCCURRENCE uniques and their dup_rate.

    Semantics: uniqueness is global within the watermark horizon and
    attributed to the FIRST arrival's window (a copy arriving two
    windows later counts toward n_docs there but not n_unique — the
    ingest-monitoring reading of "how much of this feed is new").

    Plan: the stream unions with its own
    ``dropDuplicatesWithinWatermark([source, digest])`` branch
    (kind-tagged), then ONE windowed conditional-count aggregation —
    two stateful operators total (dedup state keyed by digest, bounded
    by the horizon; window state bounded by open windows), both
    append-finalized by the watermark.
    """
    wm = stream.withWatermark(event_time_col, watermark_delay).select(
        F.col(domain_col).alias("source"),
        F.col(event_time_col),
        F.md5(F.col(text_col)).alias("_h"),
    )
    uniq = wm.dropDuplicatesWithinWatermark(["source", "_h"]).withColumn(
        "_kind", F.lit("uniq")
    )
    both = wm.withColumn("_kind", F.lit("all")).unionByName(uniq)
    agg = (
        both.groupBy(F.window(event_time_col, window), "source")
        .agg(
            F.count(F.when(F.col("_kind") == "all", 1)).alias("n_docs"),
            F.count(F.when(F.col("_kind") == "uniq", 1)).alias("n_unique"),
        )
    )
    return agg.select(
        F.col("window.start").alias("window_start"),
        "source",
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).alias("n_dup"),
        # ppm integer quotient — label-for-label with the batch twin's
        # round-10 integer finals (n_docs ≥ 1 per emitted group).
        F.expr("(1000000 * (n_docs - n_unique)) div n_docs").alias("dup_rate_ppm"),
    )
