"""Streaming DSIR scoring — importance-weight documents on ingest.

Batch twin: ``pipeline.text.dsir_logweights``.  The fitted model is the
bucket→log-ratio table from ``pipeline.text.dsir_ratio_table`` (≤
``buckets`` rows — fit once over the reference corpus, static
thereafter, exactly how DSIR is used in production: fit on a snapshot,
score the firehose).  The stream side explodes word bigrams, buckets
them with the same portable md5 hash, stream-static LEFT-joins the
broadcast ratio table (unseen buckets contribute 0, matching the batch
operator's left-join-coalesce), and aggregates one integer weight per
document.  The only state is the per-(doc, event-time) sum, bounded by
the watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.pipeline.text import DSIR_BUCKETS, _bigrams_expr

__all__ = ["streaming_dsir_scores", "streaming_bpe_counts"]


def streaming_dsir_scores(
    stream: DataFrame,
    ratio_table: DataFrame,
    *,
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(doc_id, event_ts, logw) stream — one row per document once its
    watermark passes, ``logw`` identical to the batch operator's weight
    for the same document under the same fitted table."""
    B = int(buckets)
    occ = (
        stream.withWatermark(event_time_col, watermark_delay)
        .select(
            F.col(id_col),
            F.col(event_time_col),
            F.explode_outer(F.expr(_bigrams_expr(text_col))).alias("g"),
        )
        .withColumn(
            "b",
            F.when(
                F.col("g").isNotNull(),
                F.expr(
                    f"CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % {B}"
                ),
            ),
        )
    )
    return (
        occ.join(F.broadcast(ratio_table), "b", "left")
        .groupBy(id_col, event_time_col)
        .agg(F.sum(F.coalesce("lr", F.lit(0))).cast("long").alias("logw"))
    )


def streaming_bpe_counts(
    stream: DataFrame,
    merges,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming twin of ``pipeline.bpe.bpe_encode_counts`` — the same
    production shape as DSIR above: the tokenizer is FIT on a snapshot
    (``bpe_train_sampled``), the firehose is encoded as it arrives.
    Encoding is a stateless Arrow-batched projection (mapInPandas), so
    there is no state store and no watermark requirement; the batch and
    stream paths share the same function, so equality is by
    construction and pinned in tests/test_streaming_bpe.py."""
    from simple_tsdb_spark.pipeline.bpe import bpe_encode_counts

    return bpe_encode_counts(stream, merges, text_col=text_col, id_col=id_col)
