"""Streaming ingest curation — the batch curation chain as ONE
continuous query over arriving documents.

Composes, in a single streaming plan:

1. exact dedup — ``dropDuplicatesWithinWatermark`` on the content md5
   (state bounded by the watermark horizon, as in
   ``streaming_exact_dedup``)
2. contamination filter — explode the doc's word n-grams, stream-static
   LEFT ANTI join against the broadcast benchmark gram set, then a
   windowed per-doc count: the doc survives iff ALL its grams survived
   the anti join.  Dedup → windowed aggregation is the same chained
   stateful-operator shape Spark supports in append mode that
   ``streaming_simhash_dedup`` already uses.
3. split + mixture sampling — the SAME pure salted-md5 expressions as
   batch ``hash_split`` / ``mixture_sample`` (same salts, same bucket
   math), so a doc gets the identical split/keep decision whether it
   arrives on the stream or in a batch backfill — the property that
   lets both paths share one training corpus.

Output (append mode): (doc_id, domain, split, content_md5) for curated
survivors; dropped docs never appear.  Rows finalize when the watermark
passes their window — the same latency trade as the near-dup filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.pipeline.curation import SPLIT_BUCKETS, _hash60
from simple_tsdb_spark.pipeline.spans import DECONTAM_N, _gram_expr


def streaming_curate(
    stream: DataFrame,
    benchmark: DataFrame,
    *,
    rates: dict[str, int] | None = None,
    default_rate: int = 100,
    n: int = DECONTAM_N,
    weights: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "valid", "test"),
    split_salt: str = "split-v1",
    mix_salt: str = "mix-v1",
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
    event_time_col: str = "event_ts",
    watermark_delay: str = "10 minutes",
    finalize_window: str = "1 minute",
) -> DataFrame:
    """Curated document stream: deduped, decontaminated, split, sampled."""
    if sum(weights) != SPLIT_BUCKETS or len(weights) != len(names):
        raise ValueError("weights must sum to 100 and match names")
    rates = dict(rates or {})
    if not all(0 <= r <= 100 for r in rates.values()) or not 0 <= default_rate <= 100:
        raise ValueError("rates must be percentages in [0, 100]")

    bench_grams = benchmark.select(
        F.explode(F.expr(_gram_expr(text_col, n))).alias("g")
    ).distinct()

    deduped = (
        stream.withColumn("content_md5", F.md5(F.col(text_col)))
        .withWatermark(event_time_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )

    # explode_outer keeps gram-less docs (short texts) as one NULL-gram
    # row, which no benchmark gram can match — they always survive.
    grams = deduped.select(
        F.col(id_col),
        F.col(event_time_col),
        F.col(domain_col),
        F.col("content_md5"),
        F.greatest(F.expr(f"size({_gram_expr(text_col, n)})"), F.lit(1)).alias("_n_grams"),
        F.explode_outer(F.expr(_gram_expr(text_col, n))).alias("g"),
    )
    clean_grams = grams.join(F.broadcast(bench_grams), "g", "left_anti")
    survivors = (
        clean_grams.groupBy(
            F.window(event_time_col, finalize_window),
            F.col(id_col),
            F.col(domain_col),
            F.col("content_md5"),
            F.col("_n_grams"),
        )
        .agg(F.count(F.lit(1)).alias("_n_clean"))
        .where(F.col("_n_clean") == F.col("_n_grams"))
    )

    bucket_of = lambda salt: F.expr(
        f"{_hash60(f'''concat('{salt}:', CAST({id_col} AS STRING))''')} % {SPLIT_BUCKETS}"
    )
    split_expr, edge = F.lit(names[-1]), 0
    edges = []
    for w in weights[:-1]:
        edge += w
        edges.append(edge)
    for name, cum in zip(reversed(names[:-1]), reversed(edges)):
        split_expr = F.when(bucket_of(split_salt) < cum, F.lit(name)).otherwise(split_expr)
    rate = F.lit(default_rate)
    for dom, r in sorted(rates.items()):
        rate = F.when(F.col(domain_col) == dom, F.lit(r)).otherwise(rate)

    return (
        survivors.where(bucket_of(mix_salt) < rate)
        .select(
            F.col(id_col),
            F.col(domain_col).alias("domain"),
            split_expr.alias("split"),
            F.col("content_md5"),
        )
    )


def streaming_temperature_sample(
    stream: DataFrame,
    fit_df: DataFrame,
    *,
    target_total: int,
    alpha: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp-v1",
    unseen_policy: str = "drop",
) -> DataFrame:
    """Streaming twin of batch ``temperature_mixture``'s keep decision:
    per-source thresholds are FIT ONCE from a static reference corpus
    (``fit_df`` — the same exact integer-grid expressions, so p_keep
    and the 2^60-scaled threshold are bit-identical to batch), then
    each arriving doc passes a STATELESS md5-threshold filter via a
    stream-static broadcast join on the ≤ #sources threshold table.

    No state, no watermark needed: a doc's keep decision depends only
    on its id hash and its source's fitted threshold, so stream and
    batch backfill keep EXACTLY the same docs — the property that lets
    both paths feed one training corpus.  Output: the surviving rows
    unchanged.

    Sources ABSENT from the fit corpus route through
    ``unseen_policy``: ``"drop"`` (default — the batch twin would have
    fitted p_keep from n_docs=0, i.e. nothing to balance against, and
    the stream/batch keep-set equality claim only covers fitted
    sources) or ``"keep"`` (pass new sources through unsampled until
    the next refit).  The LEFT join makes the policy explicit instead
    of silently inner-joining new sources away.
    """
    from simple_tsdb_spark.pipeline.curation import _temp_thresholds

    if unseen_policy not in ("drop", "keep"):
        raise ValueError(f"unknown unseen_policy {unseen_policy!r}")
    thr = _temp_thresholds(
        fit_df, target_total=target_total, alpha=alpha, domain_col=domain_col
    ).select(F.col("source").alias(domain_col), "_thr")
    h = F.expr(_hash60(f"concat('{salt}:', CAST({id_col} AS STRING))"))
    unseen_keep = F.lit(unseen_policy == "keep")
    return (
        stream.withColumn("_h", h)
        .join(F.broadcast(thr), domain_col, "left")
        .where(
            F.when(F.col("_thr").isNotNull(), F.col("_h") < F.col("_thr"))
            .otherwise(unseen_keep)
        )
        .drop("_h", "_thr")
    )
