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
