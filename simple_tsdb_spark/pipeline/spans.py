"""Span-level curation operators: benchmark decontamination and
boilerplate-span detection.

Both work on word n-gram spans of the space-normalized ``documents``
corpus and are pure DataFrame compositions with DuckDB oracle twins.

Scale shape (the part that matters at 100 TB):

- ``decontaminate``: the benchmark side is tiny by definition (an eval
  set, thousands of docs), so its distinct span set broadcasts; the
  corpus side is a shuffle-free scan + explode + broadcast semi-join,
  then one groupBy on doc_id.  No corpus-sized shuffle on the span key.
- ``boilerplate_spans``: global span document-frequency needs one
  shuffle on the span hash (uniform md5 keys, map-side combine), and
  the df-join back to spans is a second uniform-key shuffle.  Same
  two-shuffle posting-list shape as ngram_jaccard, linear in corpus
  size, no skew (span hashes are uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: decontamination n-gram length (words).  The published convention is
#: 13-gram (GPT-3 appendix C); the synthetic corpus draws ~30-80-word
#: docs from a tiny vocabulary whose only long shared n-grams are exact
#: duplicates, so 4 keeps the same mechanics with a non-empty hit set at
#: test scale.  Real pipelines pass n=13.
DECONTAM_N = 4

#: boilerplate span width (words, non-overlapping windows — C4 dedups at
#: three-sentence granularity; fixed word windows are this corpus's analog).
SPAN_WORDS = 10


def _gram_expr(text_col: str, n: int) -> str:
    """Spark SQL fragment: all overlapping word n-grams of ``text_col``.

    The word array binds ONCE per row as a lambda variable (the
    single-element-array shim, same trick as text._simhash_expr) —
    inlining ``split()`` at every position instead measures ~2x slower
    at 1M docs and compiles far more codegen.
    """
    return (
        f"flatten(transform(array(split({text_col}, ' ')), "
        f"w -> IF(size(w) < {n}, CAST(array() AS ARRAY<STRING>), "
        f"transform(sequence(1, size(w) - {n} + 1), "
        f"i -> array_join(slice(w, i, {n}), ' ')))))"
    )


def _gram_sql(n: int) -> str:
    """DuckDB twin of ``_gram_expr`` (1-based inclusive list slices)."""
    return (
        f"list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - {n - 1}, 0)), "
        f"i -> array_to_string(list_slice(string_split(text, ' '), i, i + {n - 1}), ' '))"
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = DECONTAM_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: per corpus document, the number of
    distinct word ``n``-grams it shares with any benchmark document.

    Docs with ``n_overlap > 0`` are the contamination candidates a
    training pipeline drops or audits before training on the corpus.
    Only flagged docs are returned (the complement is a trivial anti-join
    the caller owns).

    The benchmark span set is deduplicated and **broadcast** — eval sets
    are small by construction, so the corpus never shuffles: scan →
    explode → broadcast hash semi-join → one doc-keyed aggregation.
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    grams = F.explode(F.expr(_gram_expr(text_col, n))).alias("g")
    bench_grams = benchmark.select(grams).distinct()
    # Small corpora fan out before the per-position gram build (serial
    # on a one-task scan otherwise); no-op at real scale (r14.2).
    corpus_grams = fan_out_small(corpus, id_col).select(F.col(id_col), grams)
    hits = corpus_grams.join(F.broadcast(bench_grams), "g")
    return (
        hits.groupBy(id_col)
        .agg(F.countDistinct("g").alias("n_overlap"))
        .orderBy(id_col)
    )


def decontaminate_oracle(
    *,
    n: int = DECONTAM_N,
    table: str = "documents",
    bench_filter: str = "doc_id % 97 = 0",
) -> str:
    """DuckDB twin with the benchmark carved out of ``table`` by
    ``bench_filter`` (how the driver query builds its benchmark set)."""
    return f"""
WITH grams AS (
  SELECT doc_id, UNNEST({_gram_sql(n)}) AS g FROM {table}),
bench AS (SELECT DISTINCT g FROM grams WHERE {bench_filter}),
corpus AS (SELECT doc_id, g FROM grams WHERE NOT ({bench_filter}))
SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_overlap
FROM corpus JOIN bench USING (g)
GROUP BY doc_id
ORDER BY doc_id
"""


def decontaminate_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = DECONTAM_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Contamination ATTRIBUTION: which benchmark document leaked into
    which corpus document, and through how many distinct ``n``-grams.

    The audit-trail companion to ``decontaminate`` (which only counts):
    eval-set owners trace a leak to its source with this.  Same scale
    shape — the benchmark's (bench_id, gram) pairs stay bench-sized and
    broadcast; the corpus side is a shuffle-free scan into the broadcast
    join, then one aggregation keyed on the (corpus, bench) hit pairs.

    Output: (doc_id, bench_id, n_shared), ordered.
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    grams = F.explode(F.expr(_gram_expr(text_col, n))).alias("g")
    bench_grams = benchmark.select(F.col(id_col).alias("bench_id"), grams).distinct()
    # Small corpora fan out before the gram build (see decontaminate).
    corpus_grams = fan_out_small(corpus, id_col).select(F.col(id_col), grams)
    hits = corpus_grams.join(F.broadcast(bench_grams), "g")
    return (
        hits.groupBy(id_col, "bench_id")
        .agg(F.countDistinct("g").alias("n_shared"))
        .orderBy(id_col, "bench_id")
    )


def decontaminate_pairs_oracle(
    *,
    n: int = DECONTAM_N,
    table: str = "documents",
    bench_filter: str = "doc_id % 97 = 0",
) -> str:
    return f"""
WITH grams AS (
  SELECT doc_id, UNNEST({_gram_sql(n)}) AS g FROM {table}),
bench AS (SELECT DISTINCT doc_id AS bench_id, g FROM grams WHERE {bench_filter}),
corpus AS (SELECT doc_id, g FROM grams WHERE NOT ({bench_filter}))
SELECT doc_id, bench_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_shared
FROM corpus JOIN bench USING (g)
GROUP BY doc_id, bench_id
ORDER BY doc_id, bench_id
"""


def _span_expr(text_col: str, k: int) -> str:
    """Non-overlapping ``k``-word windows (the last partial window is a
    span too — a short tail is still dedup-able boilerplate).  Words
    bind once per row (see ``_gram_expr``)."""
    return (
        f"flatten(transform(array(split({text_col}, ' ')), "
        f"w -> transform(sequence(1, size(w), {k}), "
        f"i -> array_join(slice(w, i, {k}), ' '))))"
    )


def _span_sql(k: int) -> str:
    return (
        f"list_transform(generate_series(1, len(string_split(text, ' ')), {k}), "
        f"i -> array_to_string(list_slice(string_split(text, ' '), i, i + {k - 1}), ' '))"
    )


def boilerplate_spans(
    df: DataFrame,
    *,
    k: int = SPAN_WORDS,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate-span profile per document: how much of each doc is
    made of spans that also appear in other documents.

    C4-style span dedup ("remove any three-sentence span occurring more
    than once") split into the measurement half: span global document
    frequency → per-doc count of spans with ``df >= min_df`` elsewhere.
    Emits ``doc_id, n_spans, n_dup_spans, dup_span_frac_ppm`` (the
    fraction as a ppm truncated BIGINT quotient — round-10
    integer-finals doctrine); the removal
    half is a filter/reassembly over the same join the caller applies
    when materializing cleaned text.

    Span identity is the md5 of the span text — the shuffle key is
    uniform, so the df-aggregation and the join back are skew-free.
    A span repeated inside ONE document does not count (document
    frequency, not term frequency — matching C4's cross-document rule).
    """
    # No fan_out_small here: the span stream feeds shuffles immediately
    # (distinct + the df join), so a small-input fan-out exchange is
    # pure overhead — A/B-measured 0.88× at sf0.1 (r14.2).
    spans = df.select(
        F.col(id_col),
        F.posexplode(F.expr(_span_expr(text_col, k))).alias("pos", "span"),
    ).withColumn("h", F.md5("span"))
    span_df = spans.select(id_col, "h").distinct().groupBy("h").agg(
        F.count(F.lit(1)).alias("span_docs")
    )
    joined = spans.join(span_df, "h")
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum((F.col("span_docs") >= min_df).cast("long")).alias("n_dup_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            # ppm truncated quotient (n_spans ≥ 1 per emitted group)
            F.expr("(1000000 * n_dup_spans) div n_spans").alias(
                "dup_span_frac_ppm"
            ),
        )
        .orderBy(id_col)
    )


def boilerplate_spans_oracle(
    *, k: int = SPAN_WORDS, min_df: int = 2, table: str = "documents"
) -> str:
    return f"""
WITH spans AS (
  SELECT doc_id, md5(UNNEST({_span_sql(k)})) AS h FROM {table}),
span_df AS (
  SELECT h, COUNT(DISTINCT doc_id) AS span_docs FROM spans GROUP BY h)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN span_docs >= {min_df} THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       CAST((1000000 * SUM(CASE WHEN span_docs >= {min_df} THEN 1 ELSE 0 END))
             // COUNT(*) AS BIGINT) AS dup_span_frac_ppm
FROM spans JOIN span_df USING (h)
GROUP BY doc_id
ORDER BY doc_id
"""


# -- ExactSubstr-style duplicated regions -----------------------------------

EXSUB_N = 8  # anchor n-gram length (words)


def _pos_gram_expr(text_col: str, n: int) -> str:
    """(pos, g) structs for every overlapping word n-gram, 1-based; the
    word array binds once per row (same shim as ``_gram_expr``)."""
    return (
        f"flatten(transform(array(split({text_col}, ' ')), "
        f"w -> IF(size(w) < {n}, CAST(array() AS ARRAY<STRUCT<pos: INT, g: STRING>>), "
        f"transform(sequence(1, size(w) - {n} + 1), "
        f"i -> named_struct('pos', CAST(i AS INT), 'g', array_join(slice(w, i, {n}), ' '))))))"
    )


def exact_substr_spans(
    df: DataFrame,
    *,
    n: int = EXSUB_N,
    min_count: int = 2,
    gap: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal duplicated regions per document — the ExactSubstr dedup
    shape (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better") approximated with fixed-length word n-gram anchors
    instead of a suffix array.

    An anchor (a word ``n``-gram occurrence) is *duplicated* when its
    gram occurs ≥ ``min_count`` times corpus-wide (any doc, including
    its own — ExactSubstr counts self-repeats).  Per document,
    duplicated anchors whose windows overlap or touch (position gap ≤
    ``gap``, default ``n``) merge into one maximal span, reported as
    word coordinates ``(doc_id, span_start, span_end, n_anchors)`` —
    1-based inclusive, ``span_end = last_anchor + n − 1``.

    At 100 TB: gram occurrences key on their md5 digest (uniform,
    32-char — the gram text itself never shuffles), the duplicate
    filter is one map-side-combined count + an h-keyed join, and the
    span merge is a per-doc window (gaps-and-islands) over the
    duplicated anchors only — output-sized, far below corpus scale.
    (The 128-bit digest keeps false merges negligible at 10¹² grams;
    the suffix-array construction the paper uses is the exact-longest-
    match refinement, not needed for fixed-``n`` anchors.)
    """
    from pyspark.sql import Window

    g = int(gap) if gap is not None else int(n)
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    # Small inputs fan out before the per-position gram md5 chain
    # (serial on a one-task scan otherwise); no-op at real scale.
    occ = fan_out_small(df, id_col).select(
        F.col(id_col).alias("doc"),
        F.explode(F.expr(_pos_gram_expr(text_col, n))).alias("pg"),
    ).select("doc", F.col("pg.pos").alias("pos"), F.md5(F.col("pg.g")).alias("h"))
    # occ is NOT materialized: checkpointing the full gram-occurrence
    # stream to share it between the count aggregate and the anchors
    # join was A/B-measured a LOSS (0.69× at sf0.1, r14.2) — the
    # occurrence stream is corpus-×-positions wide, so the checkpoint
    # write costs more than recomputing the md5 chain per consumer.
    dup = occ.groupBy("h").agg(F.count(F.lit(1)).alias("_c")).where(
        F.col("_c") >= int(min_count)
    )
    anchors = occ.join(dup.select("h"), "h").select("doc", "pos")
    w = Window.partitionBy("doc").orderBy("pos")
    islands = (
        anchors.withColumn("_prev", F.lag("pos").over(w))
        .withColumn(
            "_new",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") - F.col("_prev") > g), 1
            ).otherwise(0),
        )
        .withColumn("_isl", F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        islands.groupBy("doc", "_isl")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            (F.max("pos") + F.lit(int(n) - 1)).cast("long").alias("span_end"),
            F.count(F.lit(1)).alias("n_anchors"),
        )
        .select(
            F.col("doc").alias(id_col), "span_start", "span_end", "n_anchors"
        )
    )


def exact_substr_spans_oracle(
    table: str = "documents",
    *,
    n: int = EXSUB_N,
    min_count: int = 2,
    gap: int | None = None,
) -> str:
    g = int(gap) if gap is not None else int(n)
    return f"""
WITH occ AS (
  SELECT doc_id AS doc, struct_extract(pg, 'pos') AS pos, md5(struct_extract(pg, 'g')) AS h
  FROM (SELECT doc_id,
               UNNEST(list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - {n} + 1, 0)),
                      i -> struct_pack(pos := i, g := array_to_string(string_split(text, ' ')[i : i + {n} - 1], ' ')))) AS pg
        FROM {table})),
dup AS (SELECT h FROM occ GROUP BY h HAVING COUNT(*) >= {min_count}),
anchors AS (SELECT doc, pos FROM occ JOIN dup USING (h)),
isl AS (
  SELECT doc, pos,
         SUM(CASE WHEN prev IS NULL OR pos - prev > {g} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc ORDER BY pos) AS _isl
  FROM (SELECT doc, pos, LAG(pos) OVER (PARTITION BY doc ORDER BY pos) AS prev FROM anchors))
SELECT doc AS doc_id, MIN(pos) AS span_start, MAX(pos) + {n} - 1 AS span_end,
       COUNT(*) AS n_anchors
FROM isl GROUP BY doc, _isl
"""


def ngram_novelty(
    corpus: DataFrame,
    reference: DataFrame,
    *,
    n: int = DECONTAM_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc n-gram NOVELTY against a reference corpus: ``(doc_id,
    n_grams, n_novel, novelty_ppm)`` where ``novelty_ppm`` = the
    parts-per-million truncated integer quotient
    ``(10^6·n_novel) div n_grams`` (ALL columns BIGINT —
    integer-finals doctrine, round 10: no DOUBLE in gated
    projections): the fraction of
    the doc's DISTINCT word n-grams not present anywhere in the reference
    — the diversity/memorization signal curation uses to find
    copy-paste and boilerplate-heavy feeds (the inverse of
    ``decontaminate``'s overlap count, normalized per doc).

    Docs with fewer than ``n`` words emit ``n_grams = 0`` and NULL
    novelty_ppm (no evidence either way — the caller decides the
    policy).

    Scale shape: the reference's distinct gram set stays
    reference-sized and BROADCASTS; the corpus side is one exploded
    scan into the broadcast LEFT join, then one per-doc aggregation —
    the corpus shuffles once, keyed by doc id.
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    ref_grams = reference.select(
        F.explode(F.expr(_gram_expr(text_col, n))).alias("g")
    ).distinct()
    # Small corpora fan out before the gram build (see decontaminate).
    grams = fan_out_small(corpus, id_col).select(
        F.col(id_col), F.explode(F.expr(_gram_expr(text_col, n))).alias("g")
    ).distinct()
    hits = grams.join(
        F.broadcast(ref_grams.withColumn("_hit", F.lit(1))), "g", "left"
    )
    per_doc = hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("_hit").isNull(), 1).otherwise(0)).alias("n_novel"),
    )
    # docs too short for any gram still appear (left join back to ids)
    ids = corpus.select(id_col)
    return (
        ids.join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0).cast("long")).alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.expr("(1000000 * coalesce(n_novel, 0)) div n_grams"),
            ).alias("novelty_ppm"),
        )
        .orderBy(id_col)
    )


def ngram_novelty_oracle(
    *,
    n: int = DECONTAM_N,
    table: str = "documents",
    ref_filter: str = "doc_id % 97 = 0",
) -> str:
    """Twin with the reference carved out of ``table`` by ``ref_filter``
    (the decontaminate_oracle recipe)."""
    return f"""
WITH grams0 AS (
  SELECT doc_id, UNNEST({_gram_sql(n)}) AS g FROM {table}),
ref AS (SELECT DISTINCT g FROM grams0 WHERE {ref_filter}),
corpus AS (
  SELECT DISTINCT doc_id, g FROM grams0 WHERE NOT ({ref_filter})),
per_doc AS (
  SELECT corpus.doc_id, COUNT(*) AS n_grams,
         SUM(CASE WHEN ref.g IS NULL THEN 1 ELSE 0 END) AS n_novel
  FROM corpus LEFT JOIN ref ON corpus.g = ref.g
  GROUP BY corpus.doc_id),
ids AS (SELECT doc_id FROM {table} WHERE NOT ({ref_filter}))
SELECT ids.doc_id,
       COALESCE(n_grams, 0) AS n_grams,
       CAST(COALESCE(n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CASE WHEN COALESCE(n_grams, 0) > 0
            THEN (1000000 * COALESCE(n_novel, 0)) // n_grams
       END AS BIGINT) AS novelty_ppm
FROM ids LEFT JOIN per_doc USING (doc_id)
ORDER BY ids.doc_id
"""
