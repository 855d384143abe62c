"""Text-analysis operators over a documents table.

All expressions are built-in (JVM/codegen) — no UDFs — and each operator
has a DuckDB oracle twin generated from the same constants.  Tokenization
is single-space word splitting (the corpus is space-normalized); the
"BPE-ish" token count uses a regex over letter runs / digit runs / single
punctuation, the standard pre-tokenizer shape.

At 100 TB these are embarrassingly parallel scans — no shuffle at all —
so throughput is bounded by parquet decode + codegen'd string ops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.fractions import exact_ppm

#: BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

#: marker stopwords per language for the n-gram/stopword language heuristic.
#: Deterministic argmax with 'und' (undetermined) when no marker hits.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "en": ("the", "a", "of", "and", "is", "to"),
    "es": ("el", "la", "los", "una", "es", "que"),
    "fr": ("le", "les", "des", "une", "est", "dans"),
    "zh": ("de", "shi", "bu", "le", "wo", "zai"),
}

#: stopword list for the quality score's stopword ratio.
QUALITY_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "is", "to", "in", "that")

SIMHASH_BITS = 32


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def _lnq_unats(col: Column) -> Column:
    """``floor(1e6 · ln(x))`` as BIGINT — the engine-portable µnat
    quantization of a natural log.  Applied to INTEGER inputs only, so a
    1-ulp libm disagreement between engines can flip the floor only when
    ``1e6·ln(k)`` sits within ~1e-9 of an integer (measure-zero in
    practice; ln(1)=0 is exact in both).  Everything downstream of this
    quantization must stay exact integer/decimal algebra or IEEE-exact
    casts and divisions."""
    return F.floor(F.lit(1e6) * F.log(col.cast("double"))).cast("long")


def token_counts(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish pre-token count + char count."""
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    # The BPE_REGEX extract-all is CPU-heavy per row; a small input
    # otherwise runs it inside a single-task scan (adaptive.py; no-op
    # at real scale).
    df = fan_out_small(df, id_col)
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(_tokens(text)).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), 0)).alias("n_bpe_tokens"),
        F.length(text).alias("n_chars_computed"),
    )


def token_counts_oracle(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_REGEX}')) AS n_bpe_tokens,
       length(text) AS n_chars_computed
FROM {table}
"""


def quality_score(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality in [0,1]: favors mid-length documents
    with a healthy stopword ratio and some vocabulary diversity.

    Components (single IEEE ops each — bit-deterministic cross-engine):
      len_score   = least(n_tokens, 256) / 256
      stop_ratio  = stopword tokens / tokens
      uniq_ratio  = distinct tokens / tokens
      score       = 0.4*len_score + 0.3*least(stop_ratio*4, 1.0) + 0.3*uniq_ratio

    ``quality_ppm`` is the SAME score as an exact rational on the ppm
    grid (round-10 integer-finals doctrine): the score equals
    ``(4·min(n,256)·n + 768·min(4·n_stop, n) + 768·n_uniq) / (2560·n)``
    exactly, so the ppm column is one truncated BIGINT division —
    gated projections use it; the float ``quality`` stays as the
    convenience/ranking column.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n = F.size(toks).cast("double")
    stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n_stop = F.expr(f"size(filter(split({text_col}, ' '), t -> t IN ({stop_list})))").cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    len_score = F.least(n, F.lit(256.0)) / F.lit(256.0)
    stop_score = F.least(n_stop / n * F.lit(4.0), F.lit(1.0))
    uniq_score = n_uniq / n
    nl = F.size(toks).cast("long")
    nsl = n_stop.cast("long")
    nul = n_uniq.cast("long")
    num = (
        F.lit(4) * F.least(nl, F.lit(256)) * nl
        + F.lit(768) * F.least(F.lit(4) * nsl, nl)
        + F.lit(768) * nul
    )
    return df.select(
        F.col(id_col),
        nl.alias("n_tokens"),
        num.alias("_qnum"),
        (F.lit(0.4) * len_score + F.lit(0.3) * stop_score + F.lit(0.3) * uniq_score).alias(
            "quality"
        ),
    ).select(
        id_col,
        "n_tokens",
        F.expr("(1000000 * _qnum) div (2560 * n_tokens)").alias("quality_ppm"),
        "quality",
    )


def quality_score_oracle(table: str = "documents", *, gated: bool = False) -> str:
    """``gated=True`` emits (doc_id, n_tokens, quality_ppm) — the
    integer-finals projection (no DOUBLE)."""
    stop_list = ", ".join(f"'{w}'" for w in QUALITY_STOPWORDS)
    n = "CAST(len(string_split(text, ' ')) AS BIGINT)"
    ns = f"CAST(len(list_filter(string_split(text, ' '), t -> t IN ({stop_list}))) AS BIGINT)"
    nu = "CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)"
    ppm = (
        f"(1000000 * (4 * least({n}, 256) * {n}"
        f" + 768 * least(4 * {ns}, {n}) + 768 * {nu})) // (2560 * {n})"
    )
    if gated:
        final = f"{ppm} AS quality_ppm"
    else:
        final = f"""{ppm} AS quality_ppm,
       0.4 * (least(CAST(len(string_split(text, ' ')) AS DOUBLE), 256.0) / 256.0)
     + 0.3 * least(CAST(len(list_filter(string_split(text, ' '), t -> t IN ({stop_list})))
                        AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) * 4.0, 1.0)
     + 0.3 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / CAST(len(string_split(text, ' ')) AS DOUBLE)) AS quality"""
    return f"""
SELECT doc_id,
       {n} AS n_tokens,
       {final}
FROM {table}
"""


def lang_id(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-stopword language vote: count per-language marker hits,
    argmax with alphabetical tiebreak, 'und' when nothing matches."""
    cols = [F.col(id_col)]
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{w}'" for w in markers)
        cols.append(
            F.expr(f"size(filter(split({text_col}, ' '), t -> t IN ({lst})))").alias(f"_n_{lang}")
        )
    scored = df.select(*cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"_n_{lang}") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:  # alphabetical order = deterministic tiebreak
        pred = pred.when(F.col(f"_n_{lang}") == best, F.lit(lang))
    return scored.select(F.col(id_col), pred.alias("lang_pred"), best.alias("votes"))


def lang_id_oracle(table: str = "documents") -> str:
    langs = sorted(LANG_MARKERS)
    counts = ",\n       ".join(
        f"len(list_filter(string_split(text, ' '), t -> t IN "
        f"({', '.join(repr(w) for w in LANG_MARKERS[lang])}))) AS _n_{lang}"
        for lang in langs
    )
    best = "greatest(" + ", ".join(f"_n_{lang}" for lang in langs) + ")"
    case = "CASE WHEN " + best + " = 0 THEN 'und' " + " ".join(
        f"WHEN _n_{lang} = {best} THEN '{lang}'" for lang in langs
    ) + " END"
    return f"""
WITH scored AS (
  SELECT doc_id,
       {counts}
  FROM {table})
SELECT doc_id, {case} AS lang_pred, {best} AS votes FROM scored
"""


def _simhash_expr(text_col: str) -> Column:
    """SimHash over word tokens, single-projection form: per token ONE
    60-bit md5-derived hash; each bit votes ±1; the fingerprint sets bits
    with positive vote sums.  32 interpreted HOF aggregates per row —
    correct but slow; prefer ``simhash_df`` (codegen path) in anything
    hot.  Kept for contexts that need simhash as a pure column expression.
    """
    hashes = (
        f"transform(split({text_col}, ' '), "
        f"t -> CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT))"
    )
    terms = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"aggregate(_hs, 0L, (acc, h) -> acc + "
            f"CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1L ELSE -1L END)"
        )
        terms.append(f"CASE WHEN ({vote}) > 0 THEN {1 << b}L ELSE 0L END")
    # lambda-scoped reuse of the hash array via a higher-order shim:
    # aggregate over a single-element wrapper binds _hs once per row.
    body = " + ".join(terms)
    return F.expr(
        f"aggregate(array({hashes}), 0L, (acc0, _hs) -> acc0 + ({body}))"
    )


def simhash_df(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """(doc, sh[, carry…]): 32-bit SimHash per document — the codegen
    formulation (ROADMAP #3).

    Explodes tokens, hashes each ONCE, and counts the 32 bit votes as
    plain conditional SUMs in one hash aggregation: everything stays in
    whole-stage codegen instead of 32 interpreted ``aggregate`` lambdas
    per row.  Map-side partial aggregation means the shuffle carries
    ~one 32-column row per doc per map partition — vote sums are exact
    integers, so the result is bit-identical to ``_simhash_expr``.
    """
    tok = df.select(
        F.col(id_col).alias("doc"),
        *[F.col(c) for c in carry],
        F.explode(F.split(F.col(text_col), " ")).alias("t"),
    ).withColumn("h", F.expr("CAST(conv(substring(md5(t), 1, 15), 16, 10) AS BIGINT)"))
    votes = [
        F.sum(
            F.expr(f"CASE WHEN (shiftright(h, {b}) & 1) = 1 THEN 1L ELSE -1L END")
        ).alias(f"_v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc").agg(
        *[F.first(c).alias(c) for c in carry], *votes
    )
    sh = " + ".join(
        f"CASE WHEN _v{b} > 0 THEN {1 << b}L ELSE 0L END" for b in range(SIMHASH_BITS)
    )
    return agg.select("doc", *carry, F.expr(sh).alias("sh"))


def _simhash_sql(text_col: str = "text") -> str:
    terms = []
    for b in range(SIMHASH_BITS):
        vote = (
            f"list_sum(list_transform(_hs, h -> "
            f"CASE WHEN ((h >> {b}) & 1) = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"CASE WHEN ({vote}) > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END")
    return " + ".join(terms)


def _simhash_hashes_sql(text_col: str = "text") -> str:
    """DuckDB fragment producing the per-token hash list bound as _hs."""
    return (
        f"list_transform(string_split({text_col}, ' '), "
        f"t -> ('0x' || substr(md5(t), 1, 15))::BIGINT)"
    )


def repetition_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition quality signals per document:

    - ``dup_word_frac_ppm``: 1 − distinct words / words (parts per
      million) — gross repetition.
    - ``top_bigram_n`` / ``top_bigram_frac_ppm``: occurrences of the most
      frequent word 2-gram and its share of all 2-grams — catches looping
      boilerplate that survives a distinct-word check.

    Relational formulation (explode bigrams → count → max) rather than a
    higher-order-function mode computation: identical SQL shape on both
    engines (bit-exact oracle), and at scale the bigram stream aggregates
    map-side first, so the shuffle carries ≤ one row per (doc, distinct
    bigram) per map partition — the shingle-stream pattern the pair
    operators already use.  One-word docs have zero bigrams: n=0, frac=0.
    Fractions are ppm truncated BIGINT quotients (round-10
    integer-finals doctrine: no DOUBLE in gated projections).
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    # Fan a small input out across cores before the split/array work —
    # one exchange (reused by base and bg), no-op at real scale.
    df = fan_out_small(df, id_col)
    words = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col),
        F.size(words).cast("long").alias("n_words"),
        F.size(F.array_distinct(words)).cast("long").alias("n_distinct_words"),
    ).withColumn(
        # ppm integer quotient (n_words ≥ 1: split() of any string
        # yields at least one element)
        "dup_word_frac_ppm",
        F.expr("(1000000 * (n_words - n_distinct_words)) div n_words"),
    )
    # Bigrams as zip(words[:-1], words[1:]) rather than per-position
    # element_at over sequence(): the indexed form re-evaluates split()
    # inside the lambda and generates ~6x slower-to-compile codegen
    # (measured 6.4s vs 1.1s cold at sf0.1; identical output).  The
    # greatest(…, 0) clamp makes one-word docs produce empty slices
    # (sequence(1, 0) would be the DESCENDING [1, 0] — the hazard the
    # old form guarded with an IF).
    bg = df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(arrays_zip("
                f"slice(split({text_col}, ' '), 1, greatest(size(split({text_col}, ' ')) - 1, 0)), "
                f"slice(split({text_col}, ' '), 2, greatest(size(split({text_col}, ' ')) - 1, 0))), "
                f"p -> concat(p['0'], ' ', p['1']))"
            )
        ).alias("bg"),
    )
    top = (
        bg.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams"))
    )
    return (
        base.join(top, id_col, "left")
        .select(
            id_col,
            "n_words",
            "n_distinct_words",
            "dup_word_frac_ppm",
            F.coalesce("top_bigram_n", F.lit(0)).alias("top_bigram_n"),
            F.coalesce(
                F.expr("(1000000 * top_bigram_n) div n_bigrams"), F.lit(0).cast("long")
            ).alias("top_bigram_frac_ppm"),
        )
    )


def repetition_stats_oracle(table: str = "documents") -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_words
  FROM {table}),
bg AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
                               i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS bg
  FROM {table}),
cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY doc_id, bg),
top AS (SELECT doc_id, MAX(c) AS top_bigram_n, SUM(c) AS n_bigrams FROM cnt GROUP BY doc_id)
SELECT base.doc_id, n_words, n_distinct_words,
       (1000000 * (n_words - n_distinct_words)) // n_words AS dup_word_frac_ppm,
       COALESCE(top_bigram_n, 0) AS top_bigram_n,
       CAST(COALESCE((1000000 * top_bigram_n) // n_bigrams, 0) AS BIGINT) AS top_bigram_frac_ppm
FROM base LEFT JOIN top ON base.doc_id = top.doc_id
"""


def fingerprint(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: full-content md5 + 32-bit SimHash (for
    near-dup hamming comparison, see dedup.simhash_pairs)."""
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    df = fan_out_small(df, id_col)
    base = df.withColumn("content_md5", F.md5(F.col(text_col)))
    return simhash_df(base, text_col=text_col, id_col=id_col, carry=("content_md5",)).select(
        F.col("doc").alias(id_col), "content_md5", F.col("sh").alias("simhash")
    )


def fingerprint_oracle(table: str = "documents") -> str:
    # NULL text excluded: a fingerprint of absent content does not exist
    # (the engine's explode-based simhash emits nothing for NULL docs).
    return f"""
WITH h AS (SELECT doc_id, text, {_simhash_hashes_sql('text')} AS _hs FROM {table}
           WHERE text IS NOT NULL)
SELECT doc_id, md5(text) AS content_md5, {_simhash_sql('text')} AS simhash
FROM h
"""


# -- TF-IDF top terms -------------------------------------------------------

def tfidf_topk(
    df: DataFrame,
    *,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_df_frac: float = 1e-3,
) -> DataFrame:
    """Per-document top-``k`` TF-IDF terms.

    Output ``(doc_id, term, tf, df_term, rnk)`` — integer statistics
    only; the float score (``tf · ln((N+1)/(df+1))``, smoothed IDF) is
    used solely to rank, quantized to 9 decimals so a last-ulp ``ln``
    difference between engines cannot flip an ordering (mathematically
    equal scores — e.g. ``2·ln 3`` vs ``ln 9`` — tie exactly and fall
    to the deterministic term tiebreak).

    At 100 TB: term stats aggregate map-side (one row per distinct
    (doc, term) per partition); the rank is one window over doc. The
    ``tf ⋈ df`` join is skew-proof *by construction*, not by AQE luck:
    the term key is Zipf-distributed (a stop-word carries ~N rows), so
    terms whose doc frequency exceeds ``ceil(N · hot_df_frac)`` are
    split out into a bounded "hot" table (≤ avg-distinct-terms-per-doc
    / hot_df_frac rows regardless of corpus size) and broadcast-joined
    — the corpus-sized side never shuffles on a hot key.  The long
    tail joins normally, and every tail key is < ``N · hot_df_frac``
    rows wide by definition, so no shuffle partition can exceed that
    bound.  The corpus text itself is never broadcast.
    """
    from pyspark.sql import Window

    from simple_tsdb_spark.functions.adaptive import fan_out_small

    df = fan_out_small(df, id_col)
    toks = df.select(
        F.col(id_col).alias("doc"), F.explode(_tokens(F.col(text_col))).alias("term")
    ).where(F.length("term") > 0)
    tf = toks.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    # NOT materialized under the adaptive threshold (unlike the LM
    # scorer's doc_bg): the tokenize+count subtree is cheap and the
    # eager checkpoint measured 0.73x at sf0.1 (r14 A/B) — the
    # recompute is the better trade here.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_term"))
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    from simple_tsdb_spark.functions.adaptive import is_small

    if is_small(df):
        # SMALL-INPUT fast lane (r14.2 A/B: 1.42×): the hot/tail split is purely a
        # SKEW device — both lanes resolve the same df_term — so under
        # the adaptive threshold resolve every term with ONE join (AQE
        # broadcasts the vocabulary-sized dfreq side at this scale): no
        # hot-table subplan, no union.  Same rows by construction; at
        # corpus scale this branch never runs and the skew-proof lanes
        # below stand.
        w = Window.partitionBy("doc").orderBy(
            F.col("_score").desc(), F.col("term").asc()
        )
        return (
            tf.join(dfreq, "term")
            .crossJoin(F.broadcast(n_docs))
            .withColumn(
                "_score",
                F.round(
                    F.col("tf")
                    * F.log((F.col("_n") + 1) / (F.col("df_term") + 1).cast("double")),
                    9,
                ),
            )
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= int(k))
            .select(F.col("doc").alias("doc_id"), "term", "tf", "df_term", "rnk")
        )

    # Bounded hot-term table: df ≥ max(2, ceil(N·frac)).
    hot = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .where(
            F.col("df_term")
            >= F.greatest(F.lit(2), F.ceil(F.col("_n") * F.lit(float(hot_df_frac))))
        )
        .select("term", F.col("df_term").alias("_hot_df"))
    )
    tagged = tf.join(F.broadcast(hot), "term", "left")
    hot_part = (
        tagged.where(F.col("_hot_df").isNotNull())
        .withColumn("df_term", F.col("_hot_df"))
        .drop("_hot_df")
    )
    tail_part = tagged.where(F.col("_hot_df").isNull()).drop("_hot_df").join(dfreq, "term")
    w = Window.partitionBy("doc").orderBy(F.col("_score").desc(), F.col("term").asc())
    return (
        hot_part.unionByName(tail_part)
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "_score",
            F.round(
                F.col("tf")
                * F.log((F.col("_n") + 1) / (F.col("df_term") + 1).cast("double")),
                9,
            ),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= int(k))
        .select(F.col("doc").alias("doc_id"), "term", "tf", "df_term", "rnk")
    )


def tfidf_topk_oracle(table: str = "documents", *, k: int = 5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id AS doc, UNNEST(string_split(text, ' ')) AS term FROM {table}),
tf AS (SELECT doc, term, COUNT(*) AS tf FROM toks WHERE len(term) > 0 GROUP BY doc, term),
dfreq AS (SELECT term, COUNT(*) AS df_term FROM tf GROUP BY term),
n AS (SELECT COUNT(DISTINCT doc_id) AS _n FROM {table}),
scored AS (
  SELECT doc, term, tf, df_term,
         round(tf * ln((_n + 1) / CAST(df_term + 1 AS DOUBLE)), 9) AS _score
  FROM tf JOIN dfreq USING (term), n),
ranked AS (
  SELECT doc AS doc_id, term, tf, df_term,
         row_number() OVER (PARTITION BY doc ORDER BY _score DESC, term ASC) AS rnk
  FROM scored)
SELECT doc_id, term, tf, df_term, rnk FROM ranked WHERE rnk <= {k}
"""


# -- BM25 keyword retrieval ---------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_rationals(k1: float, b: float) -> tuple[int, int, int, int]:
    """(a, c, p, q) with k1 = a/c and b = p/q exactly — the integer
    constants the engine-exact ``bm25_munat`` quotient is built from."""
    from fractions import Fraction

    k1f = Fraction(k1).limit_denominator(10**6)
    bf = Fraction(b).limit_denominator(10**6)
    if float(k1f) != float(k1) or float(bf) != float(b):
        raise ValueError("k1/b must be exactly rational for bm25_munat")
    return k1f.numerator, k1f.denominator, bf.numerator, bf.denominator


def _lnq_sql(arg: str) -> str:
    """SQL-text twin of :func:`_lnq_unats` for inline expr building."""
    return f"CAST(floor(1e6 * ln(CAST({arg} AS DOUBLE))) AS BIGINT)"


def bm25_topk(
    df: DataFrame,
    *,
    query_terms: Sequence[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 keyword retrieval: top-k documents for a bag of query terms —
    the classic lexical ranker (Robertson/Spärck Jones; the Lucene
    ``idf = ln((N+1)/(df+0.5))`` flavor), the retrieval complement to
    the embedding ANN family.

    Engine-portable scoring (integer-finals doctrine, round 10): the
    idf is computed on the µnat integer-ln grid from INTEGER arguments
    only — ``lnq(2N+2) − lnq(2·df+1)`` equals
    ``⌊1e6·ln((N+1)/(df+0.5))⌋`` exactly — and the gated score
    ``bm25_munat`` stays on that grid end-to-end: with ``k1 = a/c`` and
    ``b = p/q`` as exact rationals, each term contributes the truncated
    128-bit integer quotient

        (idfq·(a+c)·q·tf·sumdl) div (c·q·tf·sumdl + a·(q−p)·sumdl + a·p·dl·N)

    (numerator in DECIMAL(38,0); Spark ``div`` ≡ DuckDB HUGEINT ``//``,
    both truncate toward zero), summed over terms in query order — NO
    DOUBLE anywhere in the gated path.  The float ``bm25`` column
    (same math in fixed-parenthesization IEEE order) is kept as a
    non-gated convenience; top-k order is (bm25_munat DESC, doc_id).

    Scale: per-term tf is a codegen ``size(filter(...))`` projection —
    the corpus scans ONCE with NO explode and NO shuffle; the df/N/avgdl
    statistics reduce to one broadcast row; the only ordering cost is
    the final top-k (TakeOrderedAndProject).  Query terms are a handful
    by construction; for full-vocabulary retrieval build the inverted
    index instead (the tfidf_topk shape).
    """
    terms = list(query_terms)
    if not terms:
        raise ValueError("query_terms must be non-empty")
    a, c, p, q = _bm25_rationals(k1, b)
    words = f"split({text_col}, ' ')"
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.expr(f"size({words})").cast("long").alias("dl"),
        *[
            F.expr(f"size(filter({words}, t -> t = '{t}'))").cast("long").alias(f"tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("dl").alias("_sumdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"_df{i}")
            for i in range(len(terms))
        ],
    )
    joined = base.crossJoin(F.broadcast(stats))
    dlnorm = F.col("dl").cast("double") / (
        F.col("_sumdl").cast("double") / F.col("_n").cast("double")
    )
    scores = []
    qscores = []
    for i in range(len(terms)):
        idfq = _lnq_unats(F.lit(2) * F.col("_n") + F.lit(2)) - _lnq_unats(
            F.lit(2) * F.col(f"_df{i}") + F.lit(1)
        )
        tf = F.col(f"tf{i}").cast("double")
        s = ((idfq.cast("double") / F.lit(1e6)) * (tf * F.lit(k1 + 1.0))) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * dlnorm)
        )
        scores.append(s)
        # 128-bit integer quotient on the µnat grid — engine-exact;
        # EVERY denominator product rides DECIMAL(38,0) (a 10^6-token
        # doc in a 10^12-doc corpus overflows int64 in the additive
        # terms too, not just c·q·tf·sumdl)
        qscores.append(
            F.expr(
                f"(CAST(({_lnq_sql(f'2 * _n + 2')} - {_lnq_sql(f'2 * _df{i} + 1')})"
                f" AS DECIMAL(38,0)) * {(a + c) * q} * tf{i} * _sumdl)"
                f" div (CAST({c * q} AS DECIMAL(38,0)) * tf{i} * _sumdl"
                f" + CAST({a * (q - p)} AS DECIMAL(38,0)) * _sumdl"
                f" + CAST({a * p} AS DECIMAL(38,0)) * dl * _n)"
            )
        )
    total = scores[0]
    qtotal = qscores[0]
    for s in scores[1:]:
        total = total + s
    for s in qscores[1:]:
        qtotal = qtotal + s
    return (
        joined.select(
            "doc_id",
            "dl",
            *[F.col(f"tf{i}").alias(f"tf_{t}") for i, t in enumerate(terms)],
            qtotal.cast("long").alias("bm25_munat"),
            total.alias("bm25"),
        )
        .orderBy(F.col("bm25_munat").desc(), "doc_id")
        .limit(k)
    )


def bm25_topk_oracle(
    table: str = "documents",
    *,
    query_terms: Sequence[str] = (),
    k: int = 20,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> str:
    terms = list(query_terms)
    tf_defs = ",\n         ".join(
        f"CAST(len(list_filter(string_split(text, ' '), t -> t = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_defs = ",\n         ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}" for i in range(len(terms))
    )
    a, c, p, q = _bm25_rationals(k1, b)
    dlnorm = "CAST(dl AS DOUBLE) / (CAST(sumdl AS DOUBLE) / CAST(n AS DOUBLE))"
    score_parts = []
    qscore_parts = []
    for i in range(len(terms)):
        idf = (
            f"(CAST(floor(1e6 * ln(CAST(2 * n + 2 AS DOUBLE))) AS BIGINT)"
            f" - CAST(floor(1e6 * ln(CAST(2 * df{i} + 1 AS DOUBLE))) AS BIGINT))"
        )
        score_parts.append(
            f"((CAST({idf} AS DOUBLE) / 1000000.0) * (CAST(tf{i} AS DOUBLE) * {k1 + 1.0!r}))"
            f" / (CAST(tf{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r} * ({dlnorm})))"
        )
        qscore_parts.append(
            f"(CAST({idf} AS HUGEINT) * {(a + c) * q} * tf{i} * sumdl)"
            f" // (CAST({c * q} AS HUGEINT) * tf{i} * sumdl"
            f" + CAST({a * (q - p)} AS HUGEINT) * sumdl"
            f" + CAST({a * p} AS HUGEINT) * dl * n)"
        )
    total = score_parts[0]
    qtotal = qscore_parts[0]
    for s in score_parts[1:]:
        total = f"({total} + {s})"
    for s in qscore_parts[1:]:
        qtotal = f"({qtotal} + {s})"
    tf_outs = ", ".join(f"tf{i} AS \"tf_{t}\"" for i, t in enumerate(terms))
    return f"""
WITH base AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
         {tf_defs}
  FROM {table}),
stats AS (
  SELECT COUNT(*) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl,
         {df_defs}
  FROM base)
SELECT doc_id, dl, {tf_outs}, CAST({qtotal} AS BIGINT) AS bm25_munat, {total} AS bm25
FROM base, stats
ORDER BY bm25_munat DESC, doc_id LIMIT {k}
"""


def normalize_text(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Canonical text normalization — the stage run BEFORE exact dedup so
    trivially-different copies (case, runs of whitespace, edge padding)
    collapse to one digest: lowercase, any whitespace run → one space,
    trim.  Emits (doc_id, norm_text, changed, n_chars, n_chars_norm).

    Pure codegen string expressions (lower / regexp_replace / trim) —
    zero shuffles, engine-portable (same regex semantics both sides),
    and ``changed`` is an exact string inequality.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        F.col(id_col),
        norm.alias("norm_text"),
        (norm != F.col(text_col)).alias("changed"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    ).orderBy(id_col)


def normalize_text_oracle(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm_text,
       trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) <> text AS changed,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS BIGINT) AS n_chars_norm
FROM {table}
"""


def doc_chunks(
    df: DataFrame,
    *,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG/training-style document chunking: fixed ``window``-token
    chunks every ``stride`` tokens, with the LAST chunk tail-aligned so
    the document end is always covered by one full-width chunk (the
    HuggingFace ``stride`` convention — no sliver tails, bounded
    overlap).  ``stride < window`` gives overlapping context windows;
    ``stride == window`` gives a disjoint partition except for the
    final chunk, which re-covers up to ``window − (n mod stride)``
    tail tokens to stay full-width.

    Output: (doc_id, chunk_idx, start_tok, n_toks, chunk_text).  For a
    doc of n tokens: 1 chunk when n ≤ window, else
    ``ceil((n-window)/stride) + 1`` chunks with
    ``start_tok = min(chunk_idx·stride, n-window)``.

    Determinism: pure integer index arithmetic + exact string slicing —
    no floats anywhere.

    At 100 TB: zero-shuffle codegen scan (split → sequence → posexplode
    → slice/array_join all whole-stage); output rides the input
    partitioning, so a downstream embed/tokenize stage maps over it
    without an exchange.  Output size ≈ input × window/stride — the
    fan-out is the caller's dial, not a plan property.
    """
    W, S = int(window), int(stride)
    if W <= 0 or S <= 0:
        raise ValueError("window and stride must be positive")
    toks = F.split(F.col(text_col), " ")
    base = df.select(
        F.col(id_col), toks.alias("_w"), F.size(toks).cast("long").alias("_n")
    )
    n_chunks = (
        F.when(F.col("_n") <= W, F.lit(1).cast("long"))
        .otherwise(F.expr(f"(_n - {W} + {S} - 1) DIV {S}") + F.lit(1).cast("long"))
    )
    exploded = base.select(
        id_col,
        "_w",
        "_n",
        F.posexplode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_idx", "_i"
        ),
    )
    start = F.least(
        F.col("chunk_idx").cast("long") * S, F.greatest(F.col("_n") - W, F.lit(0).cast("long"))
    )
    chunk = F.slice(F.col("_w"), start.cast("int") + 1, W)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        start.alias("start_tok"),
        F.size(chunk).cast("long").alias("n_toks"),
        F.array_join(chunk, " ").alias("chunk_text"),
    ).orderBy(id_col, "chunk_idx")


def doc_chunks_oracle(
    table: str = "documents", *, window: int = 64, stride: int = 48
) -> str:
    W, S = int(window), int(stride)
    return f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM {table}),
c AS (
  SELECT doc_id, w, n,
         UNNEST(range(0, CASE WHEN n <= {W} THEN 1
                              ELSE (n - {W} + {S} - 1) // {S} + 1 END)) AS chunk_idx
  FROM t),
s AS (
  SELECT doc_id, w, n, chunk_idx,
         least(chunk_idx * {S}, greatest(n - {W}, 0)) AS start_tok
  FROM c)
SELECT doc_id, chunk_idx, start_tok,
       CAST(len(list_slice(w, start_tok + 1, start_tok + {W})) AS BIGINT) AS n_toks,
       array_to_string(list_slice(w, start_tok + 1, start_tok + {W}), ' ') AS chunk_text
FROM s
"""


def lm_perplexity_buckets(
    df: DataFrame,
    *,
    fit_pred: str = "source = 'src0'",
    text_col: str = "text",
    id_col: str = "doc_id",
    cache: str | None = None,
    sort: bool = True,
) -> DataFrame:
    """CCNet's head/middle/tail split: score every document with the
    bigram-LM cross-entropy (:func:`ngram_lm_score`), cut the corpus at
    the exact 1/3 and 2/3 xent quantiles, and label each doc ``head``
    (lowest perplexity — most like the trusted slice), ``middle`` or
    ``tail``.  The bucket is what downstream mixture sampling keys on
    (CCNet keeps head+middle, drops or down-weights tail).

    Round-10 integer finals: the doc score is the BIGINT
    ``xent_munat`` (µnats/token, truncated) and the terciles are exact
    type-7 interpolated order statistics computed ENTIRELY in integers
    on a ×3 grid — with ``m = N_scored − 1``, ``k = (m·j) div 3``,
    ``fr = (m·j) mod 3`` for j ∈ {1, 2}, the threshold (scaled ×3) is
    ``3·x_k + fr·(x_{k+1} − x_k)``; each label is the exact compare
    ``3·xent_munat ≤ t_x3``.  No DOUBLE anywhere.  Docs with NULL
    xent_munat (no bigrams) get NULL bucket.

    Scale: one scoring pass (the ngram_lm_score plan); the tercile
    order statistics resolve against the distinct-value rank histogram
    (functions/orderstats.py — map-side-combined count on the munat
    key, only distinct scores enter the single-partition cumsum), then
    broadcast back — no corpus-sized sort anywhere.
    """
    scores = ngram_lm_score(df, fit_pred=fit_pred, text_col=text_col, id_col=id_col)
    if cache == "local":
        # The scorer's output is N tiny rows but its subtree (LM fit +
        # hot/tail score joins) is the expensive part, and this plan
        # consumes it 2-3× (thresholds, labels, downstream joins) —
        # materialize once.  Result-transparent: same rows either way.
        # LAZY (r15, like materialize_small): the first consuming job
        # pays for the materialization instead of a separate serialized
        # construction-time job; concurrent consumers are safe via
        # block-level locks.
        import os

        eager = os.environ.get("SPARK_GRAFT_MATERIALIZE_EAGER", "") not in ("", "0")
        scores = scores.localCheckpoint(eager=eager)
    from simple_tsdb_spark.functions.orderstats import quantile_exprs, rank_histogram

    sc = scores.select(id_col, "xent_munat")
    nn = sc.where(F.col("xent_munat").isNotNull())
    # _n rides the histogram itself (max cumulative _hi) — one fewer full
    # pass over nn and one fewer broadcast-exchange job per query, same
    # count by construction (r15; orderstats.rank_histogram).
    ranked = rank_histogram(
        nn.select("xent_munat"), "xent_munat", with_total=True
    )
    # both terciles from ONE histogram pass (one .agg, not two)
    aggs1, thr1 = quantile_exprs("xent_munat", 1, 3)
    aggs2, thr2 = quantile_exprs("xent_munat", 2, 3)
    thr = ranked.agg(*aggs1, *aggs2).select(
        thr1.alias("t_head_x3"), thr2.alias("t_middle_x3")
    )
    bucket = (
        F.when(F.col("xent_munat").isNull(), F.lit(None).cast("string"))
        .when(F.col("xent_munat") * 3 <= F.col("t_head_x3"), F.lit("head"))
        .when(F.col("xent_munat") * 3 <= F.col("t_middle_x3"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    out = sc.crossJoin(F.broadcast(thr)).select(
        id_col, "xent_munat", "t_head_x3", "t_middle_x3", bucket.alias("bucket")
    )
    # sort=False for composing callers (ccnet_curate filters and
    # re-shuffles immediately): the presentation orderBy is a wasted
    # global sort there at every scale.  Rows identical either way.
    return out.orderBy(id_col) if sort else out


def lm_perplexity_buckets_oracle(
    table: str = "documents", *, fit_pred: str = "source = 'src0'"
) -> str:
    lm = ngram_lm_score_oracle(table, fit_pred=fit_pred, gated=True).strip()
    return f"""
WITH scores AS ({lm}),
nn AS (SELECT xent_munat AS x FROM scores WHERE xent_munat IS NOT NULL),
ranked AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn, COUNT(*) OVER () AS n FROM nn),
th AS (
  -- No GROUP BY: an aggregate over an empty ranked still yields exactly one
  -- row (NULL thresholds), matching Spark's NULL-bucket row per doc when no
  -- doc has >=2 tokens.  CASTs keep the finals BIGINT (never HUGEINT).
  SELECT CAST(3 * MAX(CASE WHEN rn = ((n - 1) * 1) // 3 + 1 THEN x END)
       + MAX(((n - 1) * 1) % 3)
         * (MAX(CASE WHEN rn = least(((n - 1) * 1) // 3 + 2, n) THEN x END)
          - MAX(CASE WHEN rn = ((n - 1) * 1) // 3 + 1 THEN x END)) AS BIGINT) AS t_head_x3,
         CAST(3 * MAX(CASE WHEN rn = ((n - 1) * 2) // 3 + 1 THEN x END)
       + MAX(((n - 1) * 2) % 3)
         * (MAX(CASE WHEN rn = least(((n - 1) * 2) // 3 + 2, n) THEN x END)
          - MAX(CASE WHEN rn = ((n - 1) * 2) // 3 + 1 THEN x END)) AS BIGINT) AS t_middle_x3
  FROM ranked)
SELECT doc_id, xent_munat, t_head_x3, t_middle_x3,
       CASE WHEN xent_munat IS NULL THEN NULL
            WHEN 3 * xent_munat <= t_head_x3 THEN 'head'
            WHEN 3 * xent_munat <= t_middle_x3 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scores, th
"""


# -- DSIR importance weights ------------------------------------------------

DSIR_BUCKETS = 4999  # prime; the hashed-feature dimensionality


def _bigrams_expr(text_col: str) -> str:
    """Word-bigram array via the zip-slice form (see repetition_stats —
    ~6x faster codegen than indexed element_at)."""
    return (
        f"transform(arrays_zip("
        f"slice(split({text_col}, ' '), 1, greatest(size(split({text_col}, ' ')) - 1, 0)), "
        f"slice(split({text_col}, ' '), 2, greatest(size(split({text_col}, ' ')) - 1, 0))), "
        f"p -> concat(p['0'], ' ', p['1']))"
    )


def _dsir_occurrences(
    df: DataFrame,
    *,
    target_pred: str,
    buckets: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """(doc, _t, g, b) bigram-occurrence stream with the portable md5
    bucket id; docs with no bigram keep one row with NULL g/b."""
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    B = int(buckets)
    # Small inputs fan out before the bigram explode + per-gram md5 —
    # serial on a one-task scan otherwise; no-op at real scale.
    return fan_out_small(df, id_col).selectExpr(
        f"{id_col} AS doc",
        f"CAST(({target_pred}) AS BOOLEAN) AS _t",
        f"explode_outer({_bigrams_expr(text_col)}) AS g",
    ).withColumn(
        "b",
        F.when(
            F.col("g").isNotNull(),
            F.expr(f"CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT) % {B}"),
        ),
    )


def dsir_ratio_table(
    df: DataFrame,
    *,
    target_pred: str,
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The fitted DSIR model: per-bucket quantized log probability
    ratios ``(b, lr)`` — ≤ ``buckets`` rows, broadcastable at any
    corpus size.  Fit once over a reference corpus, then score batches
    with :func:`dsir_logweights` or a document stream with
    ``streaming.scores.streaming_dsir_scores``."""
    B = int(buckets)
    occ = _dsir_occurrences(df, target_pred=target_pred, buckets=B, text_col=text_col, id_col=id_col)
    return _dsir_ratios_from(occ, B)


def _dsir_ratios_from(occ: DataFrame, B: int) -> DataFrame:
    """The (b, lr) ratio aggregation over a prebuilt occurrence stream
    — shared so ``dsir_logweights`` tokenizes the corpus exactly once."""
    cs = (
        occ.where(F.col("b").isNotNull())
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("cs"),
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("ct"),
        )
    )
    tot = cs.agg(F.sum("cs").alias("ns"), F.sum("ct").alias("nt"))
    return cs.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr(
            f"CAST(floor(1e6 * (ln(CAST(ct + 1 AS DOUBLE)) - ln(CAST(nt + {B} AS DOUBLE)) "
            f"- ln(CAST(cs + 1 AS DOUBLE)) + ln(CAST(ns + {B} AS DOUBLE)))) AS BIGINT)"
        ).alias("lr"),
    )


def dsir_logweights(
    df: DataFrame,
    *,
    target_pred: str,
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance log-weights (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    each document for how target-like it is under hashed word-bigram
    bag-of-ngrams models of the target slice vs the whole corpus.

    ``target_pred`` is a SQL boolean over the table's columns (e.g.
    ``"lang = 'en'"``) selecting the target slice.  Each bigram hashes
    into ``buckets`` (portable md5 hash, so DuckDB reproduces it); per
    bucket the add-one-smoothed log probability ratio quantizes to
    ``floor(1e6·Δln)`` BIGINTs (the similarity.py ``_TRAIN_QUANT``
    trick), and a document's weight is the INTEGER sum ``Σ n_b · lr_b``
    over its bigram occurrences — bit-exact across engines.  Documents
    with no bigram get weight 0.

    At 100 TB: one corpus-wide bucket aggregate (≤ ``buckets`` rows
    after map-side combine), the ratio table broadcasts (bounded by
    ``buckets``, corpus-size independent), and one doc-keyed shuffle of
    (doc, lr) partial sums.  The corpus is never broadcast and never
    shuffles its text.
    """
    B = int(buckets)
    occ = _dsir_occurrences(df, target_pred=target_pred, buckets=B, text_col=text_col, id_col=id_col)
    # NOT materialized: checkpointing the (doc, _t, b) projection to
    # share the tokenize pass between fit and score was A/B-measured a
    # LOSS at sf0.1 (0.97×/0.92× on dsir_weights/dsir_resample, r14.2)
    # — the fit aggregate's map-side combine is cheaper than the
    # checkpoint write+read, and the score-side jobs already overlap.
    # Fit, then score: the FIT pass reduces the corpus to ≤ B (b, lr)
    # rows, materialized eagerly (like the trained-quantizer fits) so
    # the SCORE pass joins a driver-built literal table — exactly two
    # corpus passes total, never a doubled lineage inside one job.
    # SMALL-INPUT lane (r15): keep the ratio table IN the plan as a
    # broadcast subtree instead of a blocking driver collect — the fit
    # broadcast stage and the score side's fan-out stage then run
    # CONCURRENTLY instead of fit serializing ahead of everything (the
    # §9-r14 V-scalar pattern).  Ratios are identical by construction
    # (same aggregation, same rows; equality pinned in tests).  Above
    # the threshold the collect lane stands: at corpus scale the
    # doubled occ lineage inside one job is the recompute/recovery
    # hazard the eager fit avoids.
    from simple_tsdb_spark.functions.adaptive import is_small

    if is_small(df):
        ratios = _dsir_ratios_from(occ, B)
    else:
        ratio_rows = _dsir_ratios_from(occ, B).collect()
        ratios = df.sparkSession.createDataFrame(
            [(int(r["b"]), int(r["lr"])) for r in ratio_rows], "b long, lr long"
        )
    docw = (
        occ.join(F.broadcast(ratios), "b")
        .groupBy("doc")
        .agg(F.sum("lr").alias("logw"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(docw.withColumnRenamed("doc", "doc_id"), "doc_id", "left")
        .select("doc_id", F.coalesce("logw", F.lit(0)).cast("long").alias("logw"))
    )


def dsir_logweights_oracle(
    table: str = "documents", *, target_pred: str = "lang = 'en'", buckets: int = DSIR_BUCKETS
) -> str:
    B = int(buckets)
    return f"""
WITH occ AS (
  SELECT doc_id AS doc, ({target_pred}) AS _t,
         ('0x' || substr(md5(g), 1, 15))::BIGINT % {B} AS b
  FROM (SELECT d.*,
               UNNEST(list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)),
                      i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])) AS g
        FROM {table} d)),
cs AS (SELECT b, COUNT(*) AS cs, SUM(CASE WHEN _t THEN 1 ELSE 0 END) AS ct FROM occ GROUP BY b),
tot AS (SELECT SUM(cs) AS ns, SUM(ct) AS nt FROM cs),
r AS (SELECT b, CAST(floor(1e6 * (ln(CAST(ct + 1 AS DOUBLE)) - ln(CAST(nt + {B} AS DOUBLE))
                                  - ln(CAST(cs + 1 AS DOUBLE)) + ln(CAST(ns + {B} AS DOUBLE)))) AS BIGINT) AS lr
       FROM cs, tot),
dw AS (SELECT doc, CAST(SUM(lr) AS BIGINT) AS logw FROM occ JOIN r USING (b) GROUP BY doc)
SELECT d.doc_id, COALESCE(dw.logw, 0) AS logw
FROM {table} d LEFT JOIN dw ON dw.doc = d.doc_id
"""


# -- PII scrubbing ----------------------------------------------------------

#: Conservative patterns written in the common Java-regex/RE2 subset
#: (no backreferences, no lazy quantifiers) so Spark and DuckDB match
#: identically.  Applied in order: email, IPv4, phone.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-.]\d{3,4}[-.]\d{4}\b"
_PII_ORDER = (
    (PII_EMAIL, "<EMAIL>", "n_emails"),
    (PII_IPV4, "<IP>", "n_ips"),
    (PII_PHONE, "<PHONE>", "n_phones"),
)


def pii_scrub(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Redact emails / IPv4 addresses / phone-shaped numbers — the
    standard pre-training scrub pass.

    Output ``(doc_id, clean_text, n_emails, n_ips, n_phones)``: the
    counts are per-pattern matches on the ORIGINAL text (a string can
    legitimately count under two patterns), while the replacements
    apply sequentially in the fixed order above — both engines do the
    same, so the oracle is exact.  Pure codegen ``regexp_replace`` /
    ``regexp_extract_all`` expressions: an embarrassingly parallel scan
    with no shuffle at any corpus size.
    """
    clean = F.col(text_col)
    counts = []
    for pat, repl, cname in _PII_ORDER:
        clean = F.regexp_replace(clean, pat, repl)
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(cname)
        )
    return df.select(F.col(id_col), clean.alias("clean_text"), *counts)


def pii_scrub_oracle(table: str = "documents") -> str:
    e, i, p = PII_EMAIL, PII_IPV4, PII_PHONE
    return f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text, '{e}', '<EMAIL>', 'g'),
                                     '{i}', '<IP>', 'g'),
                      '{p}', '<PHONE>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(text, '{e}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{i}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_phones
FROM {table}
"""


# -- corpus-level n-gram mining --------------------------------------------

def _ngrams_expr(text_col: str, n: int) -> str:
    """Word n-gram array in the zip-slices form: ``n`` shifted slices
    zipped and joined — stays in whole-stage codegen, unlike a
    ``slice()`` inside a per-position lambda, which interprets per
    element (the repetition_stats/winnowing lesson; measured ~3×
    faster end-to-end on dup_ngram_chars).  Empty when the doc has
    fewer than ``n`` words (the CASE guard: sequence/slice lengths
    would go non-positive)."""
    w = f"split({text_col}, ' ')"
    ln = f"(size({w}) - {n} + 1)"
    zipped = ", ".join(f"slice({w}, {j + 1}, {ln})" for j in range(n))
    joined = ", ' ', ".join(f"p['{j}']" for j in range(n))
    return (
        f"CASE WHEN size({w}) >= {n} THEN "
        f"transform(arrays_zip({zipped}), p -> concat({joined})) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )


def topk_ngrams(
    df: DataFrame, *, n: int = 3, k: int = 100, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide most-frequent word ``n``-grams: ``(gram,
    n_occurrences, n_docs)``, top ``k`` by occurrence count (gram text
    breaks ties).  The boilerplate/contamination reconnaissance query —
    what you run before choosing ``boilerplate_spans``/``decontaminate``
    thresholds.

    At 100 TB: per-doc grams aggregate map-side (partial count +
    count_distinct partials), ONE shuffle on the uniform gram key, and
    the global top-k is TakeOrderedAndProject — each partition ships
    only its local top ``k``, never the full gram table.
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    grams = fan_out_small(df, id_col).selectExpr(
        f"{id_col} AS doc", f"explode({_ngrams_expr(text_col, int(n))}) AS gram"
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("gram").asc())
        .limit(int(k))
    )


def topk_ngrams_oracle(table: str = "documents", *, n: int = 3, k: int = 100) -> str:
    return f"""
WITH toks AS (SELECT doc_id AS doc, string_split(text, ' ') AS w FROM {table}),
grams AS (
  SELECT doc, UNNEST(list_transform(generate_series(1, len(w) - {n} + 1),
                     i -> array_to_string(list_slice(w, i, i + {n} - 1), ' '))) AS gram
  FROM toks WHERE len(w) >= {n})
SELECT gram, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc) AS n_docs
FROM grams GROUP BY gram
ORDER BY n_occurrences DESC, gram ASC LIMIT {k}
"""


def pmi_topk(
    df: DataFrame, *, k: int = 100, min_count: int = 5, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` adjacent-word collocations by pointwise mutual
    information — the phrase-mining pass (what becomes a merged token
    or a stop-phrase).  ``pmi = ln(c_xy·N / (c_x·c_y))`` over corpus
    unigram counts ``c_x`` and adjacent-bigram counts ``c_xy``, with
    ``N`` = total word count.

    Engine-portable: both ln arguments are exact BIGINT products, so the
    score is a µnat-grid integer (``lnq(c_xy·N) − lnq(c_x·c_y)``),
    emitted directly as the BIGINT ``pmi_munat`` (round-10
    integer-finals doctrine — divide by 1e6 for nats).  ``min_count``
    suppresses the unstable low-count tail (classic PMI pathology).

    At 100 TB: two exploded aggregations (unigram, bigram) — uniform
    hash keys, map-side combine — then two m:1 joins of the DISTINCT
    bigram table against the unigram table (post-aggregation keys are
    unique, so no Zipf skew survives to the join), and the global top-k
    is TakeOrderedAndProject.
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    df = fan_out_small(df, id_col)
    words = df.selectExpr(f"explode(split({text_col}, ' ')) AS w")
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = words.agg(F.count(F.lit(1)).alias("n_total"))
    bi = (
        df.selectExpr(f"explode({_bigrams_expr(text_col)}) AS bigram")
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= int(min_count))
        .withColumn("x", F.expr("split_part(bigram, ' ', 1)"))
        .withColumn("y", F.expr("split_part(bigram, ' ', 2)"))
    )
    ux = uni.select(F.col("w").alias("x"), F.col("c").alias("c_x"))
    uy = uni.select(F.col("w").alias("y"), F.col("c").alias("c_y"))
    joined = bi.join(ux, "x").join(uy, "y").crossJoin(F.broadcast(tot))
    pmi_q = _lnq_unats(F.col("c_xy") * F.col("n_total")) - _lnq_unats(
        F.col("c_x") * F.col("c_y")
    )
    return (
        joined.select(
            "bigram",
            "c_xy",
            "c_x",
            "c_y",
            pmi_q.alias("pmi_munat"),
        )
        .orderBy(F.col("pmi_munat").desc(), F.col("bigram").asc())
        .limit(int(k))
    )


def pmi_topk_oracle(table: str = "documents", *, k: int = 100, min_count: int = 5) -> str:
    return f"""
WITH toks AS (SELECT string_split(text, ' ') AS w FROM {table}),
words AS (SELECT UNNEST(w) AS w FROM toks),
uni AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
tot AS (SELECT COUNT(*) AS n_total FROM words),
bi0 AS (
  SELECT UNNEST(list_transform(generate_series(1, len(w) - 1),
                i -> array_to_string(list_slice(w, i, i + 1), ' '))) AS bigram
  FROM toks WHERE len(w) >= 2),
bi AS (
  SELECT bigram, COUNT(*) AS c_xy,
         string_split(bigram, ' ')[1] AS x, string_split(bigram, ' ')[2] AS y
  FROM bi0 GROUP BY bigram HAVING COUNT(*) >= {min_count})
SELECT bigram, c_xy, ux.c AS c_x, uy.c AS c_y,
       CAST(floor(1e6 * ln(CAST(c_xy * n_total AS DOUBLE))) AS BIGINT)
            - CAST(floor(1e6 * ln(CAST(ux.c * uy.c AS DOUBLE))) AS BIGINT) AS pmi_munat
FROM bi JOIN uni ux ON ux.w = bi.x JOIN uni uy ON uy.w = bi.y, tot
ORDER BY pmi_munat DESC, bigram ASC LIMIT {k}
"""


def corpus_stats(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    strata: Sequence[str] = ("lang", "source"),
) -> DataFrame:
    """Per-stratum corpus report — the first query of any curation run:
    doc count, token totals, mean tokens/doc, char totals, and the
    exact median doc length.

    Round-10 integer finals: ``mean_tokens_e6`` is the truncated
    BIGINT quotient (10^6·tokens) div docs, and ``median_chars_x2`` is
    TWICE the interpolated median — at p=0.5 over integers the median
    is always N or N+0.5, so 2× is an exact BIGINT on both engines (no
    DOUBLE reaches the gated projection).

    Scale: one scan, one shuffle on the (small) stratum key with
    map-side combine; the median's per-group sort is bounded by stratum
    size — for heavy-tail strata swap in an approx sketch and drop the
    oracle row (this exact form is the verification path).
    """
    cols = [F.col(c) for c in strata]
    toks = F.size(F.split(F.col(text_col), " ")).cast("long")
    return (
        df.select(*cols, toks.alias("_nt"), F.length(text_col).cast("long").alias("_nc"))
        .groupBy(*cols)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_nt").alias("total_tokens"),
            F.expr("(1000000 * sum(_nt)) div count(1)").alias("mean_tokens_e6"),
            F.sum("_nc").alias("total_chars"),
            F.expr(
                "CAST(2 * percentile(CAST(_nc AS DOUBLE), 0.5) AS BIGINT)"
            ).alias("median_chars_x2"),
        )
        .orderBy(*strata)
    )


def corpus_stats_oracle(table: str = "documents", *, strata: Sequence[str] = ("lang", "source")) -> str:
    keys = ", ".join(strata)
    return f"""
SELECT {keys}, COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       (1000000 * CAST(SUM(len(string_split(text, ' '))) AS BIGINT)) // COUNT(*) AS mean_tokens_e6,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(2 * quantile_cont(CAST(length(text) AS DOUBLE), 0.5) AS BIGINT) AS median_chars_x2
FROM {table} GROUP BY {keys}
"""


def quality_filter_pct(
    df: DataFrame, *, pct: float = 0.1, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Corpus-adaptive quality gate: drop the bottom ``pct`` quantile of
    :func:`quality_score` — the threshold tracks the corpus instead of a
    hand-picked constant (how production quality gates are actually
    tuned).

    Output: (doc_id, quality_ppm, threshold_x1m, keep) — ALL BIGINT /
    BOOLEAN (round-10 integer-finals doctrine).  The threshold is the
    exact type-7 interpolated corpus quantile of ``quality_ppm``
    computed ENTIRELY in integers: with ``pm = round(pct·10^6)``,
    ``idx = (N−1)·pm``, ``k = idx div 10^6``, ``fr = idx mod 10^6``,
    the threshold (scaled ×10^6) is ``10^6·x_k + fr·(x_{k+1} − x_k)``
    over the quality_ppm order statistics — no libm, no float
    interpolation; ``keep`` is the exact comparison
    ``10^6·quality_ppm ≥ threshold_x1m``.

    Scale note: the order statistics resolve against the DISTINCT-
    value rank histogram (functions/orderstats.py) — corpus-sized work
    is one map-side-combined count shuffle on the integer score key;
    only the ≤ grid-cardinality distinct values enter the single-
    partition running sum.  Exact at any corpus size.
    """
    from simple_tsdb_spark.functions.orderstats import quantile_exprs, rank_histogram

    pm = exact_ppm(pct, name="pct")
    scores = quality_score(df, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("quality_ppm")
    )
    # Threshold fits on SCORED docs only: a NULL score (NULL text) must
    # not poison the corpus quantile — those docs get keep = NULL from
    # the comparison instead.
    scored = scores.where(F.col("quality_ppm").isNotNull())
    # _n from the histogram itself — drops a full scored pass + a
    # broadcast job (r15; see rank_histogram with_total).
    ranked = rank_histogram(
        scored.select("quality_ppm"), "quality_ppm", with_total=True
    )
    aggs, thr_expr = quantile_exprs("quality_ppm", pm, 1_000_000)
    thr = ranked.agg(*aggs).select(thr_expr.alias("threshold_x1m"))
    return (
        scores.crossJoin(F.broadcast(thr))
        .select(
            id_col,
            "quality_ppm",
            "threshold_x1m",
            (F.col("quality_ppm") * F.lit(1_000_000) >= F.col("threshold_x1m")).alias(
                "keep"
            ),
        )
        .orderBy(id_col)
    )


def quality_filter_pct_oracle(table: str = "documents", *, pct: float = 0.1) -> str:
    pm = exact_ppm(pct, name="pct")
    q = quality_score_oracle(table, gated=True).strip().rstrip()
    # NULL scores excluded from the fit (mirrors the engine); thr is a
    # plain aggregate over ranked with kk read via scalar subqueries, so a
    # corpus with zero scored docs still yields ONE (NULL-threshold) row
    # like Spark's aggregate-over-empty, not an empty cross join.
    return f"""
WITH scores AS ({q}),
ranked AS (
  SELECT quality_ppm AS q, ROW_NUMBER() OVER (ORDER BY quality_ppm) AS rn
  FROM scores WHERE quality_ppm IS NOT NULL),
kk AS (
  SELECT ((COUNT(quality_ppm) - 1) * {pm}) // 1000000 AS k,
         ((COUNT(quality_ppm) - 1) * {pm}) % 1000000 AS fr,
         COUNT(quality_ppm) AS n
  FROM scores),
thr AS (
  SELECT 1000000 * MAX(CASE WHEN rn = (SELECT k FROM kk) + 1 THEN q END)
       + (SELECT fr FROM kk)
         * (MAX(CASE WHEN rn = least((SELECT k FROM kk) + 2, (SELECT n FROM kk)) THEN q END)
             - MAX(CASE WHEN rn = (SELECT k FROM kk) + 1 THEN q END)) AS threshold_x1m
  FROM ranked)
SELECT doc_id, quality_ppm, threshold_x1m,
       1000000 * quality_ppm >= threshold_x1m AS keep
FROM scores, thr
"""


# -- winnowing fingerprints ------------------------------------------------

def winnowing_fingerprints(
    df: DataFrame, *, n: int = 4, w: int = 5, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every word ``n``-gram, then
    in each window of ``w`` consecutive gram hashes select the minimum
    (leftmost on ties — both engines' position-of-min is leftmost, so
    the variant is deterministic and cross-engine identical).  The
    guarantee: any shared substring of ≥ ``w + n − 1`` words between two
    documents yields at least one shared fingerprint, at a density of
    ~2/(w+1) selected grams — local plagiarism/copy detection that
    exact-hash and simhash fingerprints can't give.

    Output ``(doc_id, pos, fp)`` — 1-based gram position and the 60-bit
    md5-derived gram hash — distinct per doc, ordered.  Documents
    shorter than ``n`` words emit nothing; with fewer grams than ``w``
    the single window covers all grams (standard truncation).

    At 100 TB: a pure per-doc projection (hash array + window scan,
    all codegen, O(L·w) per doc) followed by one explode — ZERO
    shuffles; join the output on ``fp`` (uniform md5 key) to find
    cross-document matches.
    """
    words = f"split({text_col}, ' ')"
    gh = (
        f"CASE WHEN size({words}) >= {n} THEN "
        f"transform(sequence(1, size({words}) - {n} + 1), "
        f"i -> CAST(conv(substring(md5(concat_ws(' ', slice({words}, i, {n}))), 1, 15), 16, 10) AS BIGINT)) "
        f"ELSE CAST(array() AS ARRAY<BIGINT>) END"
    )
    # Each window's slice is materialized ONCE (inner transform), then
    # the indexed outer lambda derives (pos, fp) from it — the naive
    # single-level form re-evaluates slice() three times per window,
    # measured ~2x slower at sf0.1.
    sel = (
        "CASE WHEN size(_gh) = 0 THEN CAST(array() AS ARRAY<STRUCT<pos: INT, fp: BIGINT>>) ELSE "
        f"array_distinct(transform("
        f"transform(sequence(1, greatest(size(_gh) - {w} + 1, 1)), j -> slice(_gh, j, {w})), "
        f"(s, i) -> named_struct("
        f"'pos', CAST(i + array_position(s, array_min(s)) AS INT), "
        f"'fp', array_min(s))))"
        " END"
    )
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    # Small inputs fan out before the per-doc hash+window chain — the
    # O(L·w) codegen work otherwise runs inside a single-task scan
    # (guide §2.5 input skew); no-op at real scale (functions/adaptive.py).
    return (
        fan_out_small(df, id_col)
        .selectExpr(f"{id_col} AS doc_id", f"{gh} AS _gh")
        .selectExpr("doc_id", f"explode({sel}) AS s")
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
        .orderBy("doc_id", "pos", "fp")
    )


def winnowing_fingerprints_oracle(
    table: str = "documents", *, n: int = 4, w: int = 5
) -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM {table}),
gh AS (
  SELECT doc_id,
         list_transform(generate_series(1, len(ws) - {n} + 1),
           i -> ('0x' || substr(md5(array_to_string(list_slice(ws, i, i + {n} - 1), ' ')), 1, 15))::BIGINT
         ) AS g
  FROM toks WHERE len(ws) >= {n}),
sel AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(g) - {w} + 1, 1)), j ->
           {{'pos': j + list_position(list_slice(g, j, j + {w} - 1), list_min(list_slice(g, j, j + {w} - 1))) - 1,
             'fp': list_min(list_slice(g, j, j + {w} - 1))}}) AS fps
  FROM gh WHERE len(g) >= 1)
SELECT DISTINCT doc_id, CAST(f['pos'] AS INTEGER) AS pos, f['fp'] AS fp
FROM (SELECT doc_id, UNNEST(fps) AS f FROM sel)
ORDER BY doc_id, pos, fp
"""


def winnowing_matches(
    df: DataFrame,
    *,
    n: int = 4,
    w: int = 5,
    min_shared: int = 2,
    max_df: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document winnowing matches — the MOSS report: document
    pairs sharing ≥ ``min_shared`` selected fingerprints, with the
    shared count.  Output ``(doc_a, doc_b, n_shared)``, ``doc_a <
    doc_b``, ordered.

    Fingerprints selected by more than ``max_df`` documents are dropped
    before pair generation (boilerplate — MOSS does the same with its
    "ignore fingerprints in > N submissions" setting): pair work is
    then bounded by Σ df² over df ≤ max_df, never quadratic in the
    corpus.  The fp key is a 60-bit md5 hash — uniform, skew-free.

    At 100 TB: per-doc fingerprinting is the zero-shuffle
    :func:`winnowing_fingerprints` scan; the df cap is one aggregate on
    the uniform fp key; pair-gen is a self-join on fp whose per-key
    width is ≤ max_df by construction.
    """
    from simple_tsdb_spark.functions.adaptive import materialize_small

    # The fingerprint table feeds the df-cap aggregate and both legs of
    # the pair self-join; under the adaptive size threshold materialize
    # the winnowing scan once instead of trusting ReuseExchange across
    # three consumers.  No-op at real scale.
    fps = materialize_small(
        winnowing_fingerprints(df, n=n, w=w, text_col=text_col, id_col=id_col)
        .select("doc_id", "fp")
        .distinct()
    )
    fp_df = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df"))
    kept = fps.join(
        fp_df.where(F.col("_df") <= int(max_df)).select("fp"), "fp"
    )
    a = kept.select(F.col("fp"), F.col("doc_id").alias("doc_a"))
    b = kept.select(F.col("fp"), F.col("doc_id").alias("doc_b"))
    pairs = a.join(b, "fp").where(F.col("doc_a") < F.col("doc_b"))
    return (
        pairs.groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= int(min_shared))
        .orderBy("doc_a", "doc_b")
    )


def winnowing_matches_oracle(
    table: str = "documents", *, n: int = 4, w: int = 5,
    min_shared: int = 2, max_df: int = 64,
) -> str:
    inner = winnowing_fingerprints_oracle(table, n=n, w=w).strip().rstrip()
    # reuse the fingerprint oracle as a CTE body (strip its ORDER BY)
    inner = inner[: inner.rindex("ORDER BY")]
    return f"""
WITH fps0 AS ({inner}),
fps AS (SELECT DISTINCT doc_id, fp FROM fps0),
fpdf AS (SELECT fp FROM (SELECT fp, COUNT(*) AS _df FROM fps GROUP BY fp) WHERE _df <= {max_df}),
kept AS (SELECT fps.doc_id, fps.fp FROM fps JOIN fpdf USING (fp)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b, COUNT(*) AS n_shared
FROM pairs GROUP BY doc_a, doc_b HAVING COUNT(*) >= {min_shared}
ORDER BY doc_a, doc_b
"""


# -- bigram-LM quality scoring (CCNet-style perplexity filter) --------------


def ngram_lm_score(
    df: DataFrame,
    *,
    fit_pred: str = "source = 'src0'",
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_frac: float = 1e-3,
    hot_tables: str = "auto",
) -> DataFrame:
    """Per-document cross-entropy under an add-one-smoothed bigram LM
    fit on the ``fit_pred`` subset — the CCNet/KenLM quality-filter
    shape (LM trained on a trusted slice scores the whole crawl; docs
    with high cross-entropy are "unnatural" and get filtered).

    Output ``(doc_id, n_bigrams, nll_munat, xent_munat, xent)``:
    ``nll_munat`` is the exact BIGINT µnat NLL total, ``xent_munat``
    the truncated BIGINT per-token quotient (the integer-finals pair a
    gated projection uses — round-10 doctrine: no DOUBLE under the
    driver's hasher), and ``xent`` = mean over the
    doc's bigrams of ``-ln P(w2|w1)`` with
    ``P = (c2(w1,w2)+1) / (c1(w1)+V)`` (c2/c1 = fit-corpus bigram /
    history counts, V = fit vocab size).  Docs with fewer than 2 tokens
    score NULL.  Tokenization is the engine's standard
    whitespace-split; empty tokens participate (same contract as
    ``repetition_stats``).

    Cross-engine determinism: ``-ln((c2+1)/(c1+V)) = ln(c1+V) −
    ln(c2+1)`` — ``ln`` touches INTEGERS only, each quantized once at
    the ``floor(1e6·ln(x))`` µnat scale; per-bigram NLLs and per-doc
    sums are then exact BIGINTs (order-independent, AQE-stable), and
    ``xent`` is the UNROUNDED IEEE quotient of those BIGINTs.  A finer
    1e-9 post-``ln`` rounding was measurably libm-sensitive across
    engines (driver round-7 hash mismatch), and a terminal
    round(double, 6) diverged at repr boundaries (round-8);
    integer-argument µnat quantization + unrounded division is the
    scheme that survives both.

    At 100 TB: fit-then-score, the dsir/quantizer shape — never a
    doubled corpus lineage inside one job.  The PREP job makes one
    corpus pass (map-side (doc, bigram-type) combine) and collects only
    the BOUNDED hot-key tables: keys whose doc-frequency exceeds
    ``ceil(N·hot_frac)`` number at most avg-distinct-bigrams-per-doc /
    hot_frac, regardless of corpus size.  The SCORE job makes one more
    corpus pass; its joins are skew-proof *by construction* (the
    tfidf_topk pattern, not AQE luck): Zipf-hot bigram/history keys hit
    the broadcast literal tables, and every remaining tail key is
    < ``N·hot_frac`` rows wide.  The fit tables stay distributed
    (vocab-sized); the corpus text itself never shuffles and is never
    broadcast.

    ``hot_tables``: ``'eager'`` materializes the hot tables in the prep
    job as above; ``'lazy'`` leaves them as broadcast subplans (the
    prep pass disappears, but AQE does not reuse exchanges across
    broadcast-subtree boundaries, so the corpus lineage recomputes once
    per hot table — measured 1.3× slower at 10⁶ docs and beyond);
    ``'auto'`` (default) picks eager at ≥200k docs.  Scores are
    identical in every mode (pinned in tests).
    """
    import math

    bg = F.expr(_bigrams_expr(text_col))
    toks = F.split(F.col(text_col), " ")
    fit = df.where(fit_pred)

    # fit-corpus tables (type-level, vocab-sized)
    fit_bg = (
        fit.select(F.explode(bg).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    hist = (
        fit_bg.withColumn("w1", F.substring_index("g", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    lookup = fit_bg.withColumn("w1", F.substring_index("g", " ", 1)).join(hist, "w1")

    # scored-corpus stream, aggregated to (doc, bigram-type)
    from simple_tsdb_spark.functions.adaptive import fan_out_small, materialize_small

    doc_bg = (
        fan_out_small(df, id_col)
        .select(F.col(id_col).alias("doc"), F.explode(bg).alias("g"))
        .groupBy("doc", "g")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    if hot_tables not in ("auto", "eager", "lazy"):
        raise ValueError(f"hot_tables must be auto|eager|lazy, got {hot_tables!r}")

    # --- PREP: bounded scalar + hot-table collects -----------------------
    # V (the fit vocabulary size) is only ever used inside the exact
    # µnat expression in _ngram_lm_finalize — keep it IN the plan as a
    # 1-row broadcast scalar instead of a blocking driver .first() job
    # (r14: one fewer synchronization point per lm query; the fit-vocab
    # pass overlaps the other jobs instead of serializing before them).
    V = fit.select(F.explode(toks).alias("w")).agg(
        F.countDistinct("w").cast("long").alias("_V")
    )

    from simple_tsdb_spark.functions.adaptive import is_small

    if hot_tables == "auto" and is_small(df):
        # SMALL-INPUT fast path (r14 optimization): the hot/tail lanes
        # are purely a SKEW device — every lane resolves the same
        # (c2, c1) pair — so for an input under the adaptive threshold
        # resolve ALL keys with two broadcast m:1 joins instead: no N
        # count job, no hot-table prep, no 4-way union, one stage over
        # doc_bg.  doc_bg is SINGLE-consumer on this lane (the prep
        # consumers only exist in the lane plan below), so it is NOT
        # checkpointed here — the eager materialization job was pure
        # overhead (r14.2 A/B: ngram_lm_score 1.17×, ccnet_curate
        # 1.07×, lm_perplexity_buckets 1.05× from dropping it).
        # Scores are identical in every mode (pinned in tests); at
        # corpus scale this branch never runs and the skew-proof lanes
        # below stand.
        all_scored = (
            doc_bg.join(F.broadcast(lookup.select("g", "c2", "c1")), "g", "left")
            .withColumn("_w1", F.substring_index("g", " ", 1))
            .join(
                F.broadcast(
                    hist.select(F.col("w1").alias("_w1"), F.col("c1").alias("_fc1"))
                ),
                "_w1",
                "left",
            )
            .select("doc", "g", "n", "c2", F.coalesce("c1", "_fc1").alias("c1"))
        )
        return _ngram_lm_finalize(df, all_scored, V, id_col=id_col)

    # LANE path: doc_bg feeds the hot-table prep AND the score pass, and
    # in lazy mode each broadcast subplan re-derives it (AQE does not
    # reuse exchanges across broadcast-subtree boundaries) — 3-4 full
    # recomputes per run.  For a SMALL input, materialize it once; at
    # corpus scale this is a no-op and the documented two-pass
    # fit-then-score design stands (functions/adaptive.py).
    doc_bg = materialize_small(doc_bg)

    N = int(df.select(F.countDistinct(id_col).alias("_n")).first()["_n"])
    thresh = max(2, math.ceil(N * float(hot_frac)))
    dfb = doc_bg.groupBy("g").agg(F.count(F.lit(1)).alias("_dfb"))
    # hot bigram keys carry (c2, c1) pre-resolved — including c1 via the
    # history table for hot-but-unseen-in-fit bigrams, so the hot lane
    # needs no further join at score time
    hot_g = (
        dfb.where(F.col("_dfb") >= thresh)
        .select("g")
        .join(lookup.select("g", "c2", "c1"), "g", "left")
        .withColumn("w1", F.substring_index("g", " ", 1))
        .join(hist.select("w1", F.col("c1").alias("_fc1")), "w1", "left")
        .select("g", "c2", F.coalesce("c1", "_fc1").alias("c1"))
    )
    hot_w1 = (
        dfb.withColumn("w1", F.substring_index("g", " ", 1))
        .groupBy("w1")
        .agg(F.sum("_dfb").alias("_df1"))
        .where(F.col("_df1") >= thresh)
        .select("w1")
        .join(hist, "w1", "left")
        .select("w1", "c1")
    )
    if hot_tables == "eager" or (hot_tables == "auto" and N >= 200_000):
        # ONE collect for both tables (kind-tagged union → the dfb
        # exchange computes once; two collects would rebuild the corpus
        # lineage)
        hot_rows = (
            hot_g.select(F.lit("g").alias("_k"), F.col("g").alias("key"), "c2", "c1")
            .unionByName(
                hot_w1.select(
                    F.lit("w").alias("_k"),
                    F.col("w1").alias("key"),
                    F.lit(None).cast("long").alias("c2"),
                    "c1",
                )
            )
            .collect()
        )
        spark = df.sparkSession
        hot_g_df = spark.createDataFrame(
            [(r["key"], r["c2"], r["c1"]) for r in hot_rows if r["_k"] == "g"],
            "g string, _hc2 long, _hc1 long",
        )
        hot_w1_df = spark.createDataFrame(
            [(r["key"], r["c1"]) for r in hot_rows if r["_k"] == "w"],
            "w1 string, _wc1 long",
        )
    else:
        hot_g_df = hot_g.select(
            "g", F.col("c2").alias("_hc2"), F.col("c1").alias("_hc1")
        )
        hot_w1_df = hot_w1.select("w1", F.col("c1").alias("_wc1"))

    # --- SCORE: one corpus pass ------------------------------------------
    tagged = doc_bg.join(
        F.broadcast(hot_g_df.withColumn("_hot", F.lit(1))), "g", "left"
    )
    hot_done = tagged.where(F.col("_hot").isNotNull()).select(
        "doc", "g", "n", F.col("_hc2").alias("c2"), F.col("_hc1").alias("c1")
    )
    rest = (
        tagged.where(F.col("_hot").isNull())
        .select("doc", "g", "n")
        .join(lookup.select("g", "c2", "c1"), "g", "left")
    )
    matched = rest.where(F.col("c2").isNotNull())
    missing = (
        rest.where(F.col("c2").isNull())
        .select("doc", "g", "n", F.substring_index("g", " ", 1).alias("w1"))
        .join(F.broadcast(hot_w1_df), "w1", "left")
    )
    m_hot = missing.where(F.col("_wc1").isNotNull()).select(
        "doc", "g", "n", F.lit(None).cast("long").alias("c2"), F.col("_wc1").alias("c1")
    )
    # every w1 key here is < thresh doc_bg rows wide by definition
    m_tail = (
        missing.where(F.col("_wc1").isNull())
        .select("doc", "g", "n", "w1")
        .join(hist, "w1", "left")
        .select("doc", "g", "n", F.lit(None).cast("long").alias("c2"), "c1")
    )

    all_scored = hot_done.unionByName(matched).unionByName(m_hot).unionByName(m_tail)
    return _ngram_lm_finalize(df, all_scored, V, id_col=id_col)


def _ngram_lm_finalize(
    df: DataFrame, all_scored: DataFrame, V: "int | DataFrame", *, id_col: str
) -> DataFrame:
    """Shared tail of :func:`ngram_lm_score` — identical for the
    skew-lane and small-input plans (the lanes only differ in HOW each
    (c2, c1) pair is resolved, never in the value resolved).  ``V`` is
    either a Python int or a 1-row ``(_V long)`` frame attached as a
    broadcast scalar (so the vocab pass needs no blocking driver job)."""
    if isinstance(V, DataFrame):
        all_scored = all_scored.crossJoin(F.broadcast(V))
        v_col = F.col("_V")
    else:
        v_col = F.lit(int(V))
    # nll = -ln((c2+1)/(c1+V)) = ln(c1+V) - ln(c2+1): ln is applied to
    # INTEGERS only, each quantized ONCE at the floor(1e6·ln(x)) µnat
    # scale (the scheme dsir_weights proved engine-portable), so every
    # downstream step is exact BIGINT algebra.  The final xent is the
    # UNROUNDED quotient _S/n/1e6 — BIGINT→double casts and IEEE
    # division are correctly-rounded on both engines, so the doubles
    # are bit-identical (the holt_linear pattern).  A terminal
    # round(double, 6) here was the round-7/8 hash flap: Spark rounds
    # via BigDecimal(shortest-repr)+HALF_UP, DuckDB via
    # nearbyint(x·10⁶)/10⁶, and they disagree at representation
    # boundaries (e.g. x=…4999999995) — so no post-division rounding
    # of any kind.
    nll_q = _lnq_unats(
        F.coalesce(F.col("c1"), F.lit(0)) + v_col
    ) - _lnq_unats(F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1))
    per_doc = (
        all_scored.withColumn("_c", nll_q * F.col("n"))
        .groupBy("doc")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.sum("_c").alias("_S"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc.withColumnRenamed("doc", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            # integer finals (round 10): the exact µnat NLL total and the
            # truncated per-token quotient — BIGINTs, engine-portable
            # through any hasher.  NULL for no-bigram docs, like xent.
            F.col("_S").alias("nll_munat"),
            F.when(
                F.col("n_bigrams") > 0, F.expr("_S div n_bigrams")
            ).alias("xent_munat"),
            (
                F.col("_S").cast("double")
                / F.col("n_bigrams").cast("double")
                / F.lit(1e6)
            ).alias("xent"),
        )
    )


def ngram_lm_score_oracle(
    table: str = "documents",
    *,
    fit_pred: str = "source = 'src0'",
    gated: bool = False,
) -> str:
    """``gated=True`` emits the integer-finals projection only
    (doc_id, n_bigrams, nll_munat, xent_munat) — no DOUBLE columns."""
    bg_list = (
        "list_transform(generate_series(1, greatest(len(string_split(text, ' ')) - 1, 0)), "
        "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i + 1])"
    )
    if gated:
        # CAST the SUM-derived finals: DuckDB promotes SUM(BIGINT) and its
        # // quotients to HUGEINT, which pandas fetches as float64 while
        # Spark emits int64 — the driver's value hash then mismatches.
        final = (
            "CAST(_S AS BIGINT) AS nll_munat,\n"
            "       CAST(CASE WHEN n_bigrams > 0 THEN _S // n_bigrams END AS BIGINT) AS xent_munat"
        )
    else:
        final = "CAST(_S AS DOUBLE) / CAST(n_bigrams AS DOUBLE) / 1e6 AS xent"
    return f"""
WITH fit AS (SELECT * FROM {table} WHERE {fit_pred}),
fit_bg AS (
  SELECT g, COUNT(*) AS c2 FROM (SELECT UNNEST({bg_list}) AS g FROM fit) GROUP BY g),
hist AS (
  SELECT split_part(g, ' ', 1) AS w1, SUM(c2) AS c1 FROM fit_bg GROUP BY 1),
vocab AS (
  SELECT COUNT(DISTINCT w) AS _V FROM (SELECT UNNEST(string_split(text, ' ')) AS w FROM fit)),
doc_bg AS (
  SELECT doc_id AS doc, g, COUNT(*) AS n
  FROM (SELECT doc_id, UNNEST({bg_list}) AS g FROM {table}) GROUP BY doc, g),
scored AS (
  -- The history guard mirrors Spark: with an EMPTY fit set (_V = 0 and
  -- c1 NULL) Spark's ln(0) returns NULL (scores poison to NULL per doc);
  -- DuckDB's ln(0) RAISES, so gate it — NULL minus the second term stays
  -- NULL, and SUM over all-NULL stays NULL on both engines.
  SELECT doc, n,
         CASE WHEN COALESCE(c1, 0) + _V > 0
              THEN CAST(floor(1e6 * ln(CAST(COALESCE(c1, 0) + _V AS DOUBLE))) AS BIGINT)
         END
       - CAST(floor(1e6 * ln(CAST(COALESCE(c2, 0) + 1 AS DOUBLE))) AS BIGINT) AS nllq
  FROM doc_bg
  LEFT JOIN fit_bg USING (g)
  LEFT JOIN hist ON split_part(g, ' ', 1) = hist.w1
  CROSS JOIN vocab),
per_doc AS (
  SELECT doc AS doc_id, SUM(n) AS n_bigrams, SUM(nllq * n) AS _S
  FROM scored GROUP BY doc)
SELECT d.doc_id,
       CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams,
       {final}
FROM {table} d LEFT JOIN per_doc USING (doc_id)
"""


# -- DSIR importance resampling (Gumbel top-k) ------------------------------


def dsir_resample(
    df: DataFrame,
    *,
    target_pred: str,
    k: int,
    salt: str = "dsir-v1",
    buckets: int = DSIR_BUCKETS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The SELECTION step of DSIR (Xie et al. 2023 §2.3): sample ``k``
    documents without replacement with probability proportional to
    their importance weight, via the Gumbel top-k trick —
    ``score = logw + Gumbel(doc)`` and take the k largest.  The Gumbel
    noise is derived from a salted md5 hash of the id, so the "sample"
    is fully deterministic, reproducible, and engine-portable (re-salt
    for a fresh draw).

    Scores stay on ``dsir_logweights``'s integer 1e-6·ln scale: the
    Gumbel term quantizes to ``floor(1e6 · -ln(-ln(u)))`` with
    ``u = (h60 + 0.5) / 2^60``, and the final score is an exact BIGINT
    sum — ranking cannot be flipped by float addition order.

    At 100 TB: weights cost dsir_logweights's two corpus passes; the
    top-k is TakeOrderedAndProject (each partition ships only its local
    top k — never a global sort), the reference-free analog of
    ``domain_topk``'s bounded selection.
    """
    # function-local: dedup.py imports from this module at top level
    from simple_tsdb_spark.pipeline.dedup import _hash60

    w = dsir_logweights(
        df, target_pred=target_pred, buckets=buckets, text_col=text_col, id_col=id_col
    )
    h = F.expr(_hash60(f"concat('{salt}:', CAST(doc_id AS STRING))"))
    u = (h.cast("double") + F.lit(0.5)) / F.lit(float(2**60))
    gq = F.floor(F.lit(1e6) * -F.log(-F.log(u))).cast("long")
    return (
        w.withColumn("score", (F.col("logw") + gq).cast("long"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
        .select("doc_id", "logw", "score")
    )


def dsir_resample_oracle(
    table: str = "documents",
    *,
    target_pred: str = "lang = 'en'",
    k: int = 50,
    salt: str = "dsir-v1",
    buckets: int = DSIR_BUCKETS,
) -> str:
    inner = dsir_logweights_oracle(table, target_pred=target_pred, buckets=buckets).strip()
    return f"""
WITH w AS ({inner}),
scored AS (
  SELECT doc_id, logw,
         logw + CAST(floor(1e6 * -ln(-ln(
             ((('0x' || substr(md5(concat('{salt}:', CAST(doc_id AS VARCHAR))), 1, 15))::BIGINT
               + 0.5) / 1152921504606846976.0)))) AS BIGINT) AS score
  FROM w)
SELECT doc_id, logw, score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT {int(k)}
"""


def ngram_lm_model(
    df: DataFrame, *, fit_pred: str, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int]:
    """Fit-once product for ``ngram_lm_score``'s streaming twin:
    ``(lookup(g, c2, c1), hist(w1, c1), V)``.  Same counts the batch
    operator builds inline (equality pinned in test_streaming_scores).
    ``V`` is collected eagerly (one scalar of driver traffic)."""
    bg = F.expr(_bigrams_expr(text_col))
    fit = df.where(fit_pred)
    fit_bg = (
        fit.select(F.explode(bg).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    hist = (
        fit_bg.withColumn("w1", F.substring_index("g", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c2").alias("c1"))
    )
    lookup = (
        fit_bg.withColumn("w1", F.substring_index("g", " ", 1))
        .join(hist, "w1")
        .select("g", "c2", "c1")
    )
    V = int(
        fit.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .agg(F.countDistinct("w").alias("_V"))
        .collect()[0][0]
    )
    return lookup, hist, V


# -- Gopher quality rules ---------------------------------------------------

#: Gopher (Rae et al. 2021, A1.1) requires ≥2 of a small stop-word set.
GOPHER_STOPWORDS: tuple[str, ...] = ("the", "be", "to", "of", "and", "that", "have", "with")

#: "symbol words" counted toward the symbol-to-word ratio rule.
GOPHER_SYMBOLS: tuple[str, ...] = ("#", "...", "…")


def gopher_rules(
    df: DataFrame,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stopwords: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, Appendix A1.1) —
    the line-independent subset: word-count bounds, mean word length
    bounds, fraction of words containing an alphabetic character,
    symbol-to-word ratio, and the minimum stop-word count.  Output one
    row per document with every statistic plus the combined
    ``passes`` flag, so the caller can either filter or audit which
    rule fired.

    Pure codegen expressions over the token array — zero shuffle, one
    embarrassingly parallel scan at any corpus size.  All statistics
    are BIGINTs (counts, plus e6/ppm-scaled truncated quotients for the
    ratios — round-10 integer-finals doctrine) and every rule fires on
    an exact integer cross-multiplication against its e6-grid
    threshold, bit-identical to the DuckDB oracle.
    """
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    sym_list = ", ".join(f"'{w}'" for w in GOPHER_SYMBOLS)
    words = f"split({text_col}, ' ')"
    n = F.expr(f"size({words})").cast("long")
    n_chars = F.expr(
        f"aggregate(transform({words}, w -> length(w)), 0L, (a, b) -> a + CAST(b AS BIGINT))"
    )
    n_alpha = F.expr(
        f"size(filter({words}, w -> w rlike '[A-Za-z]'))"
    ).cast("long")
    n_stop = F.expr(f"size(filter({words}, w -> w IN ({stop_list})))").cast("long")
    n_sym = F.expr(f"size(filter({words}, w -> w IN ({sym_list})))").cast("long")
    m = 1_000_000
    t_minlen = exact_ppm(min_mean_len, name="min_mean_len")
    t_maxlen = exact_ppm(max_mean_len, name="max_mean_len")
    t_alpha = exact_ppm(min_alpha_frac, name="min_alpha_frac")
    t_sym = exact_ppm(max_symbol_ratio, name="max_symbol_ratio")
    passes = (
        (n >= int(min_words))
        & (n <= int(max_words))
        & (n_chars * m >= F.lit(t_minlen) * n)
        & (n_chars * m <= F.lit(t_maxlen) * n)
        & (n_alpha * m >= F.lit(t_alpha) * n)
        & (n_sym * m <= F.lit(t_sym) * n)
        & (n_stop >= int(min_stopwords))
    )
    return df.select(
        F.col(id_col),
        n.alias("n_words"),
        n_chars.alias("_nc"),
        n_alpha.alias("_na"),
        n_sym.alias("_ns"),
        n_stop.alias("n_stopwords"),
        passes.alias("passes"),
    ).select(
        id_col,
        "n_words",
        F.expr("(1000000 * _nc) div n_words").alias("mean_word_len_e6"),
        F.expr("(1000000 * _na) div n_words").alias("alpha_frac_ppm"),
        F.expr("(1000000 * _ns) div n_words").alias("symbol_ratio_ppm"),
        "n_stopwords",
        "passes",
    )


def gopher_rules_oracle(
    table: str = "documents",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    max_symbol_ratio: float = 0.1,
    min_stopwords: int = 2,
) -> str:
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    sym_list = ", ".join(f"'{w}'" for w in GOPHER_SYMBOLS)
    return f"""
WITH s AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
         CAST(list_reduce(list_transform(string_split(text, ' '), w -> len(w)),
                          (a, b) -> a + b) AS BIGINT) AS n_chars,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ({stop_list}))) AS BIGINT) AS n_stopwords,
         CAST(len(list_filter(string_split(text, ' '),
                              w -> w IN ({sym_list}))) AS BIGINT) AS n_sym
  FROM {table})
SELECT doc_id, n_words,
       (1000000 * n_chars) // n_words AS mean_word_len_e6,
       (1000000 * n_alpha) // n_words AS alpha_frac_ppm,
       (1000000 * n_sym) // n_words AS symbol_ratio_ppm,
       n_stopwords,
       (n_words >= {int(min_words)} AND n_words <= {int(max_words)}
        AND 1000000 * n_chars >= {exact_ppm(min_mean_len, name='min_mean_len')} * n_words
        AND 1000000 * n_chars <= {exact_ppm(max_mean_len, name='max_mean_len')} * n_words
        AND 1000000 * n_alpha >= {exact_ppm(min_alpha_frac, name='min_alpha_frac')} * n_words
        AND 1000000 * n_sym <= {exact_ppm(max_symbol_ratio, name='max_symbol_ratio')} * n_words
        AND n_stopwords >= {int(min_stopwords)}) AS passes
FROM s
"""


def dup_ngram_chars(
    df: DataFrame,
    *,
    ns: tuple[int, ...] = (2, 3, 4),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher repetition rule (Rae et al. 2021 A1.1): per document and
    n ∈ ``ns``, the fraction of characters contained in DUPLICATED word
    n-grams — ``(doc_id, n, dup_char_frac)``.  A gram is duplicated
    when it occurs more than once in the doc; its character weight is
    the sum of its word lengths (separators excluded), counted for
    every occurrence, over the doc's total word characters.  Docs with
    fewer than ``n`` words report 0 for that n.

    At 100 TB: per-(doc, n, gram-type) counts aggregate map-side; ONE
    shuffle keyed (doc, n, gram) — uniform, as wide as the gram stream
    — then a doc-keyed rollup.  The fraction is the ppm truncated
    BIGINT quotient (round-10 integer-finals doctrine; NULL for a
    zero-char doc).
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    # One fan-out exchange shared by totals/allg/spine (ReuseExchange);
    # the per-n gram transform chain is the round's heaviest projection.
    df = fan_out_small(df, id_col)
    w = f"split({text_col}, ' ')"
    totals = df.select(
        F.col(id_col).alias("doc"),
        F.expr(
            f"aggregate(transform({w}, x -> length(x)), 0L, (a, b) -> a + CAST(b AS BIGINT))"
        ).alias("_tot"),
    )
    # ONE corpus scan for every n: per-n gram arrays tagged with n,
    # flattened, single explode (a union of per-n streams would scan
    # the corpus len(ns) times)
    tagged = ", ".join(
        f"transform({_ngrams_expr(text_col, int(n))}, "
        f"g -> struct({int(n)} AS n, g AS gram))"
        for n in ns
    )
    allg = df.selectExpr(
        f"{id_col} AS doc", f"inline(flatten(array({tagged})))"
    )
    per_gram = allg.groupBy("doc", "n", "gram").agg(
        F.count(F.lit(1)).alias("_c")
    ).withColumn(
        # chars of ONE occurrence: gram length minus the n-1 separators
        "_len", (F.length(F.col("gram")) - (F.col("n") - 1)).cast("long")
    )
    dup = (
        per_gram.where(F.col("_c") > 1)
        .groupBy("doc", "n")
        .agg(F.sum(F.col("_c") * F.col("_len")).alias("_dup_chars"))
    )
    spine = df.select(F.col(id_col).alias("doc")).crossJoin(
        df.sparkSession.range(1).select(
            F.explode(F.array(*[F.lit(int(n)) for n in ns])).alias("n")
        )
    )
    return (
        spine.join(totals, "doc")
        .join(dup, ["doc", "n"], "left")
        .select(
            F.col("doc").alias(id_col),
            "n",
            F.when(
                F.col("_tot") > 0,
                F.expr("(1000000 * coalesce(_dup_chars, 0)) div _tot"),
            ).alias("dup_char_frac_ppm"),
        )
    )


def dup_ngram_chars_oracle(
    table: str = "documents", *, ns: tuple[int, ...] = (2, 3, 4)
) -> str:
    n_list = ", ".join(f"({int(n)})" for n in ns)
    gram_streams = "\nUNION ALL\n".join(
        f"""  SELECT doc_id AS doc, {int(n)} AS n,
         UNNEST(list_transform(generate_series(1, len(string_split(text, ' ')) - {int(n)} + 1),
                i -> array_to_string(list_slice(string_split(text, ' '), i, i + {int(n)} - 1), ' '))) AS gram
  FROM {table} WHERE len(string_split(text, ' ')) >= {int(n)}"""
        for n in ns
    )
    return f"""
WITH totals AS (
  SELECT doc_id AS doc,
         CAST(list_reduce(list_transform(string_split(text, ' '), x -> len(x)),
                          (a, b) -> a + b) AS BIGINT) AS _tot
  FROM {table}),
grams AS (
{gram_streams}),
per_gram AS (
  SELECT doc, n, gram, COUNT(*) AS _c,
         CAST(len(gram) - (n - 1) AS BIGINT) AS _len
  FROM grams GROUP BY doc, n, gram),
dup AS (
  SELECT doc, n, SUM(_c * _len) AS _dup_chars
  FROM per_gram WHERE _c > 1 GROUP BY doc, n),
spine AS (
  SELECT doc_id AS doc, n FROM {table}, (VALUES {n_list}) t(n))
SELECT spine.doc AS doc_id, spine.n,
       CAST(CASE WHEN _tot > 0
            THEN (1000000 * COALESCE(_dup_chars, 0)) // _tot
       END AS BIGINT) AS dup_char_frac_ppm
FROM spine
JOIN totals ON totals.doc = spine.doc
LEFT JOIN dup ON dup.doc = spine.doc AND dup.n = spine.n
"""


def char_entropy(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document Shannon entropy over the character distribution —
    ``(doc_id, n_chars, entropy_munat_num, entropy_munat, entropy)``
    in nats (``entropy_munat_num``/``entropy_munat`` are the exact
    BIGINT scaled numerator and its truncated per-char quotient — the
    integer-finals pair a gated projection uses; round-10 doctrine:
    no DOUBLE under the driver's hasher).  The classic gibberish /
    binary-noise signal: natural text sits ~2.5–3.3 nats; repeated
    characters → 0; uniform random bytes → ln(alphabet).

    Cross-engine determinism: ``H = Σ −(k/n)·ln(k/n) = ln n −
    (1/n)·Σ k·ln k`` — ``ln`` touches INTEGERS only (the per-char
    counts k and the total n), each quantized once at the
    ``floor(1e6·ln(x))`` µnat scale; the scaled numerator
    ``max(lnq(n)·n − Σ k·lnq(k), 0)`` is an exact BIGINT
    (order-independent, AQE-stable, exactly 0 for single-character
    docs; the clamp absorbs the quantizer's ±n µnat signed error so a
    near-degenerate doc can't report H < 0) and the final entropy is
    the UNROUNDED quotient num/n/1e6 — BIGINT→double casts and IEEE
    division are correctly-rounded on both engines, bit-identical.
    Two earlier variants were engine-sensitive: per-term 1e-12
    rounding of raw ``ln`` (libm divergence, r7 hash fail) and a
    terminal ``round(double, 9)`` (Spark BigDecimal-HALF_UP vs DuckDB
    nearbyint divergence at repr boundaries, r8 hash fail) — neither
    survives; nothing rounds a double here.  One shuffle keyed
    (doc, char) with map-side combine; empty docs score NULL.
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    df = fan_out_small(df, id_col)
    ch = df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.col(text_col), "")).alias("c"),
    ).where(F.length("c") > 0)
    counts = ch.groupBy("doc", "c").agg(F.count(F.lit(1)).alias("_k"))
    ent = counts.groupBy("doc").agg(
        F.sum("_k").alias("n_chars"),
        F.sum(F.col("_k") * _lnq_unats(F.col("_k"))).alias("_S"),
    )
    num = F.greatest(
        _lnq_unats(F.col("n_chars")) * F.col("n_chars") - F.col("_S"), F.lit(0)
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(
            ent.select(
                F.col("doc").alias("doc_id"),
                "n_chars",
                # integer finals (round 10): exact scaled numerator
                # (n·H in µnats, clamped ≥ 0) + truncated per-char
                # quotient — BIGINTs, engine-portable through any
                # hasher.  NULL for empty docs, like entropy.
                num.alias("entropy_munat_num"),
                (
                    num.cast("double") / F.col("n_chars").cast("double") / F.lit(1e6)
                ).alias("entropy"),
            ).withColumn(
                "entropy_munat", F.expr("entropy_munat_num div n_chars")
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
            "entropy_munat_num",
            "entropy_munat",
            "entropy",
        )
    )


def char_entropy_oracle(table: str = "documents", *, gated: bool = False) -> str:
    """``gated=True`` emits the integer-finals projection only
    (doc_id, n_chars, entropy_munat_num, entropy_munat) — no DOUBLE."""
    # The IS NOT NULL gate mirrors Spark's join-miss NULL for zero-char
    # docs: Spark computes the clamp INSIDE the aggregate branch (absent
    # docs stay NULL through the left join), while DuckDB's greatest()
    # IGNORES NULLs, so an unguarded greatest(NULL, 0) would emit 0.
    num = (
        "CASE WHEN ent.n_chars IS NOT NULL THEN "
        "greatest(CAST(floor(1e6 * ln(CAST(ent.n_chars AS DOUBLE))) AS BIGINT)"
        " * ent.n_chars - _S, 0) END"
    )
    if gated:
        # CAST: SUM-derived n_chars makes {num} and its // quotient HUGEINT
        # in DuckDB, fetched as float64 vs Spark's int64 under the hasher.
        final = (
            f"CAST({num} AS BIGINT) AS entropy_munat_num,\n"
            f"       CAST({num} // ent.n_chars AS BIGINT) AS entropy_munat"
        )
    else:
        final = (
            f"CAST({num} AS DOUBLE) / CAST(ent.n_chars AS DOUBLE) / 1e6 AS entropy"
        )
    return f"""
WITH ch AS (
  SELECT doc_id AS doc, UNNEST(string_split(text, '')) AS c FROM {table}),
counts AS (
  SELECT doc, c, COUNT(*) AS _k FROM ch WHERE len(c) > 0 GROUP BY doc, c),
ent AS (
  SELECT doc, SUM(_k) AS n_chars,
         SUM(_k * CAST(floor(1e6 * ln(CAST(_k AS DOUBLE))) AS BIGINT)) AS _S
  FROM counts GROUP BY doc)
SELECT d.doc_id, CAST(COALESCE(ent.n_chars, 0) AS BIGINT) AS n_chars,
       {final}
FROM {table} d LEFT JOIN ent ON ent.doc = d.doc_id
"""
