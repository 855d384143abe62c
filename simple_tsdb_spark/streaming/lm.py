"""Streaming bigram-LM quality scoring — CCNet-style perplexity
filtering on ingest.

Batch twin: ``pipeline.text.ngram_lm_score``.  The fitted model —
``(lookup, hist, V)`` from ``pipeline.text.ngram_lm_model`` — is
static (fit once on a trusted snapshot, score the firehose).  The
stream explodes word bigrams, stream-static LEFT-joins the lookup
(seen bigram → c2,c1), falls back to the history table for unseen
bigrams with a seen first word, and folds per-occurrence NLLs —
µnat-quantized on integer ``ln`` arguments, BIGINT-accumulated, and
emitted as the UNROUNDED IEEE quotient exactly like the batch
operator, so a document's ``(n_bigrams, xent)`` is bit-identical to
the batch result under the same model.  The only state
is the per-(doc, event-time) aggregate, bounded by the watermark.

The fit tables broadcast here (vocab-sized); at a scale where the
bigram table outgrows broadcast, drop the hint — stream-static
equi-joins also run shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.pipeline.text import _bigrams_expr, _lnq_unats

__all__ = ["streaming_ngram_lm_scores"]


def streaming_ngram_lm_scores(
    stream: DataFrame,
    lookup: DataFrame,
    hist: DataFrame,
    vocab_size: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(doc_id, event_ts, n_bigrams, xent) stream — one row per
    document once its watermark passes; values identical to the batch
    operator under the same fitted model."""
    occ = stream.withWatermark(event_time_col, watermark_delay).select(
        F.col(id_col),
        F.col(event_time_col),
        F.explode_outer(F.expr(_bigrams_expr(text_col))).alias("g"),
    )
    j = (
        occ.join(F.broadcast(lookup), "g", "left")
        .withColumn("_w1", F.substring_index("g", " ", 1))
        .join(
            F.broadcast(hist.select(F.col("w1").alias("_w1"), F.col("c1").alias("_hc1"))),
            "_w1",
            "left",
        )
        .withColumn("_c1", F.coalesce("c1", "_hc1"))
    )
    nll_q = _lnq_unats(
        F.coalesce(F.col("_c1"), F.lit(0)) + F.lit(int(vocab_size))
    ) - _lnq_unats(F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
    return (
        j.withColumn("_c", F.when(F.col("g").isNotNull(), nll_q))
        .groupBy(id_col, event_time_col)
        .agg(
            F.count("g").alias("n_bigrams"),
            F.sum("_c").alias("_S"),
        )
        .select(
            id_col,
            event_time_col,
            "n_bigrams",
            (
                F.col("_S").cast("double")
                / F.col("n_bigrams").cast("double")
                / F.lit(1e6)
            ).alias("xent"),
        )
    )
