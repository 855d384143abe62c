"""Streaming benchmark decontamination — flag contaminated documents on
ingest instead of in a batch sweep.

Batch twin: ``pipeline.spans.decontaminate``.  The benchmark span set is
a STATIC DataFrame (eval sets change rarely and are tiny); the stream
side explodes each document's word n-grams and stream-static joins them
against the benchmark grams — a stateless broadcast join, so the only
state in the query is the final per-doc dedup, bounded by the watermark.

Emitting flags (doc_id of contaminated docs) rather than dropping rows
keeps the operator composable: the ingest pipeline anti-joins flags
against the document stream, while an audit sink can persist them —
the same split the batch operator makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.pipeline.spans import DECONTAM_N, _gram_expr


def streaming_decontaminate_flags(
    stream: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = DECONTAM_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """(doc_id,) stream of documents sharing ≥1 word ``n``-gram with the
    static ``benchmark`` table.

    One stream-static inner join (benchmark grams broadcast — no stream
    state) + one ``dropDuplicatesWithinWatermark`` on the doc id so each
    contaminated doc is flagged once.  State is one entry per flagged doc
    inside the horizon — far smaller than the dedup operators' band
    state, since contamination is rare by construction.
    """
    bench_grams = benchmark.select(
        F.explode(F.expr(_gram_expr(text_col, n))).alias("g")
    ).distinct()
    hits = (
        stream.withWatermark(event_time_col, watermark_delay)
        .select(F.col(id_col), F.col(event_time_col), F.explode(F.expr(_gram_expr(text_col, n))).alias("g"))
        .join(F.broadcast(bench_grams), "g")
    )
    return hits.dropDuplicatesWithinWatermark([id_col]).select(id_col)


def streaming_ngram_novelty(
    stream: DataFrame,
    reference: DataFrame,
    *,
    n: int = DECONTAM_N,
    text_col: str = "text",
    id_col: str = "doc_id",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
    finalize_window: str = "1 minute",
) -> DataFrame:
    """Streaming twin of ``pipeline.spans.ngram_novelty``: per arriving
    doc, the fraction of its DISTINCT word n-grams unseen in the static
    reference corpus — scored on ingest instead of in a batch sweep.

    Exact distinct counting without ``countDistinct`` (unsupported in
    streaming aggs): per-doc gram dedup via
    ``dropDuplicatesWithinWatermark([doc, gram])`` CHAINED into the
    windowed per-doc count — the same two-stateful-operator shape as
    ``streaming_active_users``.  Reference grams broadcast (no stream
    state for the join); rows finalize when the watermark passes their
    window.  Docs with zero grams never appear (explode emits nothing)
    — the batch operator reports them with NULL novelty; callers
    needing that row join the id stream back.

    Output: (doc_id, n_grams, n_novel, novelty_ppm) — value-identical
    to batch on every doc with ≥ 1 gram (pinned in tests).
    """
    ref_grams = reference.select(
        F.explode(F.expr(_gram_expr(text_col, n))).alias("g")
    ).distinct()
    grams = (
        stream.withWatermark(event_time_col, watermark_delay)
        .select(
            F.col(id_col),
            F.col(event_time_col),
            F.explode(F.expr(_gram_expr(text_col, n))).alias("g"),
        )
        .dropDuplicatesWithinWatermark([id_col, "g"])
    )
    marked = grams.join(
        F.broadcast(ref_grams.withColumn("_hit", F.lit(1))), "g", "left"
    )
    agg = (
        marked.groupBy(F.window(event_time_col, finalize_window), F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("n_novel"),
        )
    )
    return agg.select(
        id_col,
        "n_grams",
        "n_novel",
        # ppm integer quotient — label-for-label with the batch twin's
        # round-10 integer finals (n_grams ≥ 1 here: a doc only reaches
        # the aggregate if it produced at least one gram).
        F.expr("(1000000 * n_novel) div n_grams").alias("novelty_ppm"),
    )
