"""Deduplication operators — exact and near-dup — over documents and
embeddings.

Scale design (the point of each variant):

- ``exact_dedup``: hash-groupBy on content digest.  One shuffle keyed by
  a 128-bit digest — uniform keys, no skew, map-side partial agg.  The
  100 TB workhorse.
- ``ngram_jaccard_pairs``: exact set-similarity via an inverted index
  (explode shingles → join on shingle → count).  A document-frequency cap
  on shingles (``max_df``) bounds the posting-list join fan-out — the
  standard trick that keeps the candidate-pair count near-linear instead
  of quadratic.
- ``minhash_lsh_pairs``: sub-quadratic near-dup at corpus scale: per-doc
  minhash signature (16 hashes) → 4 LSH bands → candidates only collide
  within a band bucket.  Shuffle volume ≈ #docs × #bands, never #docs².
- ``simhash_pairs``: 32-bit simhash + hamming ≤ d, blocked EXACTLY by
  fingerprint bands (pigeonhole over d+1 bands) — the cheapest near-dup
  filter (one long per doc), shuffle ≈ docs × bands, no broadcast.
- ``embedding_dup_pairs``: cosine near-dup blocked by the IVF
  coarse-quantizer list id (cardinality scales with nlist ~ √N, unlike a
  fixed attribute), salted shuffle join (no corpus broadcast,
  parallelism #blocks × salts); attribute equality (label / lang) is an
  optional extra predicate.

All hashing is md5-based and every expression is built-in (no UDFs), so
each operator has a bit-identical DuckDB oracle twin below it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.fractions import exact_ppm

from simple_tsdb_spark.pipeline.text import SIMHASH_BITS, _simhash_sql, simhash_df

SHINGLE_LEN = 8          # char n-gram length
MINHASH_STRIDE = 4       # shingle stride for minhash (denser not needed)
N_HASHES = 16
N_BANDS = 4              # 4 rows per band
MAX_DF = 50              # posting-list cap for the jaccard inverted index

MERSENNE31 = 2_147_483_647
#: universal-hash family constants (fixed, engine-portable integers);
#: Knuth-style multipliers keep high bits well mixed so band buckets
#: don't collide spuriously.
_MINHASH_A = [((2654435761 * (j + 1)) % (1 << 31)) | 1 for j in range(N_HASHES)]
_MINHASH_B = [(40503 * (j + 1) * 69069) % MERSENNE31 for j in range(N_HASHES)]


# -- helpers ----------------------------------------------------------------

def _shingle_rows(df: DataFrame, *, text_col: str, id_col: str, stride: int) -> DataFrame:
    """Codegen-friendly shingle stream: one (doc, sh) row per position.

    Explodes the position *sequence* and computes the substring as a
    plain projection — a ``transform(..., i -> substring(...))`` lambda
    is interpreted per element and measures ~5× slower at scan scale.
    Emits duplicate shingles; callers dedup (``distinct``) or aggregate
    with duplicate-insensitive functions (``min`` for minhash).
    """
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    # NULL text yields NO shingles (no content, no dup evidence).  Without
    # the filter Spark's NULL-ignoring greatest() emits one NULL shingle,
    # every NULL-text doc gets the all-NULL signature, and concat_ws
    # banding collapses them into one shared bucket — phantom pairs the
    # oracle (whose greatest() propagates NULL) never generates.
    # Small inputs fan out across cores before the shingle explode (the
    # per-position substring work otherwise serializes on a one-task scan);
    # no-op at real scale (functions/adaptive.py).
    pos = fan_out_small(df.where(F.col(text_col).isNotNull()), id_col).select(
        F.col(id_col).alias("doc"),
        F.col(text_col).alias("_t"),
        F.explode(
            F.expr(f"sequence(1, greatest(length({text_col}) - {SHINGLE_LEN - 1}, 1), {stride})")
        ).alias("_i"),
    )
    return pos.select("doc", F.expr(f"substring(_t, _i, {SHINGLE_LEN})").alias("sh"))


def _doc_shingle_sets(df: DataFrame, *, text_col: str, id_col: str) -> DataFrame:
    """Per-doc DISTINCT shingle sets via an Arrow-batched pandas_udf —
    a pure projection (no explode, no collect_set shuffle).  Python
    str slicing is code-point based like SQL ``substring``, and the
    ``max(len-K+1, 1)`` floor keeps the short-text behavior of the
    sequence expression in :func:`_shingle_rows` (a doc shorter than
    the shingle length yields its whole text), so the sets are
    identical to ``collect_set`` over the exploded stream."""
    from pyspark.sql.functions import pandas_udf

    k = SHINGLE_LEN

    @pandas_udf("array<string>")
    def _sets(texts):
        import pandas as pd

        out = []
        for t in texts:
            t = t or ""
            n = max(len(t) - k + 1, 1)
            out.append(list({t[i:i + k] for i in range(n)}))
        return pd.Series(out)

    from simple_tsdb_spark.functions.adaptive import fan_out_small

    return fan_out_small(df, id_col).select(
        F.col(id_col).alias("doc"), _sets(F.col(text_col)).alias("shs")
    )


def _shingles_duck(text_col: str, stride: int) -> str:
    return (
        f"list_distinct(list_transform(generate_series(1, greatest(length({text_col}) - {SHINGLE_LEN - 1}, 1), {stride}), "
        f"i -> substr({text_col}, i, {SHINGLE_LEN})))"
    )


def _hash60(expr: str) -> str:
    """60-bit integer from md5 — Spark dialect."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def _hash60_duck(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# -- exact ------------------------------------------------------------------

def exact_dedup(df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: content digest → keeper (min id) + copy count."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min(id_col).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dedup_oracle(table: str = "documents") -> str:
    return f"""
SELECT md5(text) AS content_md5, MIN(doc_id) AS keeper, COUNT(*) AS n_copies
FROM {table} GROUP BY md5(text)
"""


BLOCK_WORDS = 16


def block_dedup(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    block_words: int = BLOCK_WORDS,
) -> DataFrame:
    """Sub-document exact dedup — C4's remove-repeated-lines rule
    re-expressed for unstructured text at fixed ``block_words``-word
    block granularity: every block seen earlier in the corpus (by
    (doc_id, position) order) is dropped, and each document is
    reassembled from its surviving blocks.

    Output per doc: (doc_id, n_blocks, n_kept, kept_text) — strings and
    integers only, no float hazards.

    Scale: one explode (fan-out = docs × blocks, the data size), one
    shuffle keyed by the block digest (uniform — md5), a per-block
    window over the handful of duplicates, then one shuffle back to the
    doc for ordered reassembly.  No corpus broadcast, no pair join —
    this is corpus-linear, unlike any similarity-pair operator.
    """
    # Split ONCE per document and build the block array at doc level,
    # then posexplode.  The previous shape re-ran the regex split of the
    # WHOLE document inside the post-explode per-block slice —
    # O(doc_len x n_blocks) work per doc (r14; 1 split per doc instead
    # of 1 per block, bit-identical blocks).  CollapseProject keeps the
    # non-cheap `_w` alias un-inlined, so the split runs once per row.
    # No fan_out_small here: after the rewrite the doc-level work is one
    # split per doc — the fan-out exchange measured 0.71x (r14 A/B).
    bw = block_words
    blocks_expr = (
        f"transform(sequence(1, (size(_w) + {bw - 1}) div {bw}),"
        f" i -> array_join(slice(_w, (i - 1) * {bw} + 1, {bw}), ' '))"
    )
    exploded = (
        df.select(
            F.col(id_col).alias("doc"),
            F.split(F.col(text_col), " ").alias("_w"),
        )
        .select("doc", F.posexplode(F.expr(blocks_expr)).alias("_p0", "block"))
        .select("doc", (F.col("_p0") + 1).alias("pos"), "block")
    )
    w = Window.partitionBy(F.md5("block"), "block").orderBy("doc", "pos")
    marked = exploded.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(F.col("rn") == 1, F.struct("pos", "block"))
    return (
        marked.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x["block"]
                ),
                " ",
            ).alias("kept_text"),
        )
        .select(F.col("doc").alias("doc_id"), "n_blocks", "n_kept", "kept_text")
        .orderBy("doc_id")
    )


def block_dedup_oracle(table: str = "documents", *, block_words: int = BLOCK_WORDS) -> str:
    return f"""
WITH x AS (
  SELECT doc_id AS doc, string_split(text, ' ') AS words,
         UNNEST(generate_series(1, (len(string_split(text, ' ')) + {block_words - 1}) // {block_words})) AS pos
  FROM {table}),
b AS (
  SELECT doc, pos,
         array_to_string(words[(pos - 1) * {block_words} + 1 : pos * {block_words}], ' ') AS block
  FROM x),
m AS (
  SELECT doc, pos, block,
         ROW_NUMBER() OVER (PARTITION BY md5(block), block ORDER BY doc, pos) AS rn
  FROM b)
SELECT doc AS doc_id, COUNT(*) AS n_blocks,
       CAST(COALESCE(SUM(CASE WHEN rn = 1 THEN 1 END), 0) AS BIGINT) AS n_kept,
       COALESCE(string_agg(block, ' ' ORDER BY pos) FILTER (WHERE rn = 1), '') AS kept_text
FROM m GROUP BY doc
"""


# -- n-gram jaccard ---------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.5,
    max_df: int = MAX_DF,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingles: str = "explode",
    metric: str = "jaccard",
) -> DataFrame:
    """Exact set similarity over (df-capped) char-shingle sets.

    Returns (a, b, <metric>_ppm) for pairs scoring ≥ threshold, a < b
    — the similarity as a parts-per-million truncated BIGINT quotient
    and the threshold as an exact integer cross-multiplication
    (round-10 integer-finals doctrine: no DOUBLE in gated output).
    ``metric='jaccard'`` is |A∩B|/|A∪B|; ``metric='containment'`` is
    |A∩B|/min(|A|,|B|) — the asymmetric measure that catches a short
    document quoted inside a long one, which Jaccard dilutes (the
    ExactSubstr/decontamination failure mode at pair granularity).
    Scores are over the *filtered* shingle sets (doc-frequency ≤
    max_df), identically on both engines.
    """
    if metric not in ("jaccard", "containment"):
        raise ValueError(f"unknown metric {metric!r}")
    # Two-pass postings-list plan (same result, same oracle):
    #   1. the raw shingle stream dedups into per-doc distinct-shingle
    #      sets with ONE corpus-wide aggregation (collect_set builds the
    #      sets map-side, so the shuffle carries ~one bounded-by-doc-size
    #      array per doc, not the 10× occurrence stream); the set
    #      re-explodes downstream — already distinct, no extra shuffle;
    #   2. pass 1 computes shingle document frequencies only, and the hot
    #      stop-list (df > max_df) is small by construction — a LEFT ANTI
    #      join against it (AQE converts to a broadcast anti join at
    #      runtime) drops corpus-scale stop-shingles map-side, BEFORE any
    #      posting list is materialized, so no unbounded array and no
    #      skewed shuffle of hot rows;
    #   3. per-doc filtered-set sizes come from a *window* count over the
    #      filtered stream — which is still hash-partitioned by doc from
    #      the docsets aggregation (explode and a broadcast anti join
    #      preserve the streamed side's distribution), so the window adds
    #      NO exchange; the size then rides inside each posting entry as
    #      struct(doc, sz), which eliminates the separate sizes
    #      aggregation and both doc-keyed size joins of the earlier plan;
    #   4. candidate pairs are *generated* from each ≤max_df posting list
    #      (Σ df² work, no 2-sided shuffle join) and counted, carrying
    #      the two set sizes along (constant per pair key).
    # The docsets exchange is reused by both downstream consumers.
    from pyspark.sql import Window

    if shingles == "arrow":
        # Arrow path: per-doc distinct sets as a projection — replaces
        # the exploded raw stream + collect_set shuffle; downstream the
        # doc-window then needs one exchange on doc instead.  NULL-text
        # docs are filtered first: the explode path drops them (NULL
        # substring rows never reach collect_set), and the projection
        # would otherwise emit them with the {""} set.
        docsets = _doc_shingle_sets(
            df.where(F.col(text_col).isNotNull()), text_col=text_col, id_col=id_col
        )
    else:
        raw = _shingle_rows(df, text_col=text_col, id_col=id_col, stride=1)
        docsets = raw.groupBy("doc").agg(F.collect_set("sh").alias("shs"))
    # The hot-list anti join consumes the docsets subtree from inside a
    # BroadcastExchange, across which neither ReuseExchange nor AQE
    # reuse fires — the shingle explode + collect_set aggregation ran
    # TWICE per query (4 parquet scans in the plan).  Materialize once
    # under the adaptive threshold; no-op at corpus scale, where the
    # documented two-pass postings design stands (r14.2).
    from simple_tsdb_spark.functions.adaptive import materialize_small

    docsets = materialize_small(docsets)
    sh0 = docsets.select("doc", F.explode("shs").alias("sh"))
    hot = sh0.groupBy("sh").agg(F.count(F.lit(1)).alias("df")).where(F.col("df") > max_df)
    sh = sh0.join(hot, "sh", "left_anti")
    sh = sh.withColumn("sz", F.count(F.lit(1)).over(Window.partitionBy("doc")))
    # Posting lists capped at max_df elements by construction (df=1 lists
    # survive but generate no pairs).  array_sort on struct(doc, sz)
    # orders by doc (unique), keeping a < b in the generated pairs.
    postings = sh.groupBy("sh").agg(
        F.array_sort(F.collect_list(F.struct("doc", "sz"))).alias("ds")
    )
    pair_gen = (
        "flatten(transform(ds, (x, i) -> "
        "transform(slice(ds, i + 2, size(ds)), y -> "
        "struct(x.doc AS a, x.sz AS sza, y.doc AS b, y.sz AS szb))))"
    )
    out = (
        postings.select(F.explode(F.expr(pair_gen)).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("p.sza").alias("sza"),
            F.first("p.szb").alias("szb"),
        )
        # ppm integer finals (round 10): the similarity is the exact
        # truncated quotient (10^6·inter) div denom — BIGINT only, no
        # DOUBLE under the driver's hasher — and the threshold test is
        # the exact cross-multiplication 10^6·inter ≥ ppm·denom on the
        # same grid (denominators here are < 2^40, far from overflow).
        .withColumn(
            "_den",
            (
                F.least(F.col("sza"), F.col("szb"))
                if metric == "containment"
                else (F.col("sza") + F.col("szb") - F.col("inter"))
            ),
        )
        .where(
            F.col("inter") * F.lit(1_000_000)
            >= F.lit(exact_ppm(threshold, name="threshold")) * F.col("_den")
        )
        .select(
            "a",
            "b",
            F.expr("(1000000 * inter) div _den").alias(f"{metric}_ppm"),
        )
    )
    return out


def ngram_jaccard_oracle(
    table: str = "documents", *, threshold: float = 0.5, max_df: int = MAX_DF,
    metric: str = "jaccard",
) -> str:
    denom = (
        "least(sa.sz, sb.sz)"
        if metric == "containment"
        else "sa.sz + sb.sz - inter"
    )
    ppm = exact_ppm(threshold, name="threshold")
    return f"""
WITH sh0 AS (
  SELECT doc_id AS doc, UNNEST({_shingles_duck('text', 1)}) AS sh FROM {table}),
rare AS (SELECT sh FROM sh0 GROUP BY sh HAVING COUNT(*) <= {max_df}),
sh AS (SELECT doc, sh0.sh FROM sh0 JOIN rare USING (sh)),
sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
inter AS (
  SELECT x.doc AS a, y.doc AS b, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.sh = y.sh AND x.doc < y.doc
  GROUP BY x.doc, y.doc)
SELECT a, b, {metric}_ppm FROM (
  SELECT a, b, inter, {denom} AS _den,
         (1000000 * inter) // ({denom}) AS {metric}_ppm
  FROM inter
  JOIN sizes sa ON sa.doc = a
  JOIN sizes sb ON sb.doc = b)
WHERE 1000000 * inter >= {ppm} * _den
"""


# -- minhash + LSH ----------------------------------------------------------

def _minhash_signatures(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc, h0..h15): per-doc MinHash signature (shingle → md5 base
    hash → 16-member universal family, MIN per member).  Shared by
    :func:`minhash_band_buckets` and :func:`minhash_est_jaccard`."""
    # No dedup needed: MIN over the shingle multiset equals MIN over the
    # set, so duplicate shingle rows cannot change any signature value.
    sh = _shingle_rows(df, text_col=text_col, id_col=id_col, stride=MINHASH_STRIDE).withColumn(
        "hb", F.expr(f"{_hash60('sh')} % {MERSENNE31}")
    )
    # One md5 per shingle; the 16-member hash family is cheap universal
    # hashing over the base hash: h_j = (A_j·h + B_j) mod (2^31−1).
    return sh.groupBy("doc").agg(
        *[
            F.min(F.expr(f"({_MINHASH_A[j]}L * hb + {_MINHASH_B[j]}L) % {MERSENNE31}")).alias(
                f"h{j}"
            )
            for j in range(N_HASHES)
        ]
    )


def minhash_band_buckets(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
    sig: DataFrame | None = None,
) -> DataFrame:
    """(doc, band_id, key): each document's LSH band buckets — the
    joinable form of its MinHash signature (shingle → 16 md5-seeded
    minhashes → 4 bands of 4).  Shared by ``minhash_lsh_pairs`` and the
    materialized index (``pipeline.dedup_index``).  Pass a precomputed
    ``sig`` (from :func:`_minhash_signatures`) to reuse one signature
    scan across consumers — the banding is a pure projection of it."""
    if sig is None:
        sig = _minhash_signatures(df, text_col=text_col, id_col=id_col)
    rows_per_band = N_HASHES // N_BANDS
    band_cols = []
    for b in range(N_BANDS):
        parts = [f"h{b * rows_per_band + r}" for r in range(rows_per_band)]
        band_cols.append(
            F.concat_ws(",", *[F.col(p).cast("string") for p in parts]).alias(f"band{b}")
        )
    banded = sig.select("doc", *band_cols)
    return banded.selectExpr(
        "doc",
        "stack("
        + str(N_BANDS)
        + ", "
        + ", ".join(f"{b}, band{b}" for b in range(N_BANDS))
        + ") as (band_id, key)",
    )


def minhash_lsh_pairs(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Candidate near-dup pairs via MinHash signatures + LSH banding.

    shingle → 16 md5-seeded minhashes → 4 bands of 4 → docs sharing any
    band bucket become a candidate pair.  Output: (a, b, n_bands shared).
    """
    # NOT materialized here: the band self-join's two legs share one
    # exchange (ReuseExchange fires — identical canonical subplans), so
    # a checkpoint is pure overhead for single-consumer callers
    # (measured 0.85x standalone at sf0.1, r14).  Callers that consume
    # the PAIRS relation several times (dedup_components' edge union,
    # near_dup_rate_by_source's endpoint union) materialize on their
    # side instead.
    buckets = minhash_band_buckets(df, text_col=text_col, id_col=id_col)
    pairs = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band_id", "key"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    return pairs


def minhash_lsh_oracle_parts(table: str = "documents") -> tuple[str, str]:
    """(cte_list, final_select) halves of the oracle, kept separate so
    consumers that must embed the pairs query inside their own WITH
    RECURSIVE (``curation.dedup_components_oracle``) can compose SQL
    structurally instead of reverse-parsing the assembled string."""
    rows_per_band = N_HASHES // N_BANDS
    sig_cols = ",\n         ".join(
        f"MIN(({_MINHASH_A[j]} * hb + {_MINHASH_B[j]}) % {MERSENNE31}) AS h{j}"
        for j in range(N_HASHES)
    )
    band_exprs = []
    for b in range(N_BANDS):
        parts = " || ',' || ".join(
            f"CAST(h{b * rows_per_band + r} AS VARCHAR)" for r in range(rows_per_band)
        )
        band_exprs.append(f"SELECT doc, {b} AS band_id, {parts} AS key FROM sig")
    cte_list = f"""sh0 AS (
  SELECT doc_id AS doc, UNNEST({_shingles_duck('text', MINHASH_STRIDE)}) AS sh FROM {table}),
sh AS (SELECT doc, {_hash60_duck('sh')} % {MERSENNE31} AS hb FROM sh0),
sig AS (
  SELECT doc,
         {sig_cols}
  FROM sh GROUP BY doc),
buckets AS ({' UNION ALL '.join(band_exprs)})"""
    final_select = """
SELECT x.doc AS a, y.doc AS b, COUNT(*) AS n_bands
FROM buckets x JOIN buckets y ON x.band_id = y.band_id AND x.key = y.key AND x.doc < y.doc
GROUP BY x.doc, y.doc
"""
    return cte_list, final_select


def minhash_lsh_oracle(table: str = "documents") -> str:
    cte_list, final_select = minhash_lsh_oracle_parts(table)
    return f"WITH {cte_list}{final_select}"


def minhash_est_jaccard(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """LSH accuracy audit: for every MinHash-LSH candidate pair, the
    signature-estimated Jaccard (matching hashes / 16) next to the EXACT
    shingle-set Jaccard and the signed estimation error — the number you
    tune banding (N_HASHES / N_BANDS / threshold) against before
    committing a 100 TB dedup pass to a similarity bar.

    Output: (a, b, n_bands, est_jaccard_ppm, jaccard_ppm, err_ppm),
    ordered — ALL BIGINT (round-10 integer-finals doctrine): both
    similarities are parts-per-million truncated integer quotients and
    the signed error is their difference on the same ppm grid.

    Scale: candidates come from banding (shuffle ≈ docs × bands, never
    docs²); the exact-Jaccard stage touches ONLY candidate pairs — the
    shingle join fans out per pair, not per corpus.
    """
    from simple_tsdb_spark.functions.adaptive import materialize_small

    # The signature table feeds three consumers (banding, the a-side and
    # b-side signature joins) and the distinct-shingle table three more
    # (sizes, both legs of the intersection join); under the adaptive
    # size threshold each would re-run its whole subtree per consumer —
    # materialize once.  Exact no-op at real scale (the threshold), so
    # the documented two-pass postings design stands there.
    # The signature MIN is duplicate-insensitive, so the signatures are
    # derivable from the DISTINCT shingle table this operator already
    # builds for the exact-Jaccard stage — shingle-explode and md5 the
    # corpus ONCE, not once per table (r14.2 A/B: 1.17×).  At real
    # scale the checkpoints are no-ops and the two aggregations remain
    # independent passes over the same shingle stream.
    dsh = materialize_small(
        _shingle_rows(df, text_col=text_col, id_col=id_col, stride=MINHASH_STRIDE).distinct()
    )
    # ONE checkpoint stage (r15, VERDICT r14 #5): the signature table is
    # a cheap groupBy over the ALREADY-checkpointed distinct-shingle
    # table, so its three consumers (banding, a-side, b-side) re-derive
    # it from the persisted rows instead of paying a second eager
    # checkpoint job per query.  At real scale both materializations are
    # no-ops and the two independent passes stand, as before.
    sig = (
        dsh.withColumn("hb", F.expr(f"{_hash60('sh')} % {MERSENNE31}"))
        .groupBy("doc")
        .agg(
            *[
                F.min(
                    F.expr(f"({_MINHASH_A[j]}L * hb + {_MINHASH_B[j]}L) % {MERSENNE31}")
                ).alias(f"h{j}")
                for j in range(N_HASHES)
            ]
        )
    )
    buckets = minhash_band_buckets(df, text_col=text_col, id_col=id_col, sig=sig)
    pairs = (
        buckets.alias("x")
        .join(buckets.alias("y"), ["band_id", "key"])
        .where(F.col("x.doc") < F.col("y.doc"))
        .groupBy(F.col("x.doc").alias("a"), F.col("y.doc").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )
    sizes = dsh.groupBy("doc").agg(F.count(F.lit(1)).alias("nsh"))
    inter = (
        pairs.select("a", "b")
        .join(dsh.select(F.col("doc").alias("a"), "sh"), "a")
        .join(dsh.select(F.col("doc").alias("b"), "sh"), ["b", "sh"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sig.select(F.col("doc").alias("a"), *[F.col(f"h{j}").alias(f"ha{j}") for j in range(N_HASHES)])
    sb = sig.select(F.col("doc").alias("b"), *[F.col(f"h{j}").alias(f"hb{j}") for j in range(N_HASHES)])
    matches = sum(
        (F.when(F.col(f"ha{j}") == F.col(f"hb{j}"), 1).otherwise(0) for j in range(N_HASHES)),
        F.lit(0),
    )
    inter_c = F.coalesce(F.col("inter"), F.lit(0))
    est_ppm = F.expr(f"(1000000 * _matches) div {int(N_HASHES)}")
    jacc_ppm = F.expr("(1000000 * _inter) div (na + nb - _inter)")
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .join(sizes.select(F.col("doc").alias("a"), F.col("nsh").alias("na")), "a")
        .join(sizes.select(F.col("doc").alias("b"), F.col("nsh").alias("nb")), "b")
        .join(inter, ["a", "b"], "left")
        .withColumn("_matches", matches.cast("long"))
        .withColumn("_inter", inter_c)
        .select(
            "a",
            "b",
            "n_bands",
            est_ppm.alias("est_jaccard_ppm"),
            jacc_ppm.alias("jaccard_ppm"),
            (est_ppm - jacc_ppm).alias("err_ppm"),
        )
        .orderBy("a", "b")
    )


def minhash_est_jaccard_oracle(table: str = "documents") -> str:
    cte_list, _ = minhash_lsh_oracle_parts(table)
    match_sum = " + ".join(
        f"CASE WHEN sa.h{j} = sb.h{j} THEN 1 ELSE 0 END" for j in range(N_HASHES)
    )
    est = f"(1000000 * ({match_sum})) // {int(N_HASHES)}"
    jacc = (
        "(1000000 * COALESCE(i.inter, 0)) // "
        "(na.nsh + nb.nsh - COALESCE(i.inter, 0))"
    )
    return f"""
WITH {cte_list},
pairs AS (
  SELECT x.doc AS a, y.doc AS b, COUNT(*) AS n_bands
  FROM buckets x JOIN buckets y ON x.band_id = y.band_id AND x.key = y.key AND x.doc < y.doc
  GROUP BY x.doc, y.doc),
dsh AS (SELECT doc, sh FROM sh0),
sizes AS (SELECT doc, COUNT(*) AS nsh FROM dsh GROUP BY doc),
i AS (
  SELECT p.a, p.b, COUNT(*) AS inter
  FROM pairs p
  JOIN dsh da ON da.doc = p.a
  JOIN dsh db ON db.doc = p.b AND db.sh = da.sh
  GROUP BY p.a, p.b)
SELECT p.a, p.b, p.n_bands,
       {est} AS est_jaccard_ppm,
       {jacc} AS jaccard_ppm,
       ({est}) - ({jacc}) AS err_ppm
FROM pairs p
JOIN sig sa ON sa.doc = p.a
JOIN sig sb ON sb.doc = p.b
JOIN sizes na ON na.doc = p.a
JOIN sizes nb ON nb.doc = p.b
LEFT JOIN i ON i.a = p.a AND i.b = p.b
"""


# -- simhash ----------------------------------------------------------------

def _simhash_bands(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per band: SIMHASH_BITS split into max_hamming+1
    contiguous bands.  Pigeonhole: flipping ≤ max_hamming bits cannot touch
    all max_hamming+1 bands, so every qualifying pair shares ≥1 band
    exactly — band-bucket candidate generation is EXACT, not approximate
    (the Manku/Jain/Sarma near-duplicate blocking scheme, simplified to
    single-band tables).
    """
    k = max_hamming + 1
    if k > SIMHASH_BITS:
        raise ValueError(f"max_hamming {max_hamming} too large for {SIMHASH_BITS}-bit simhash")
    bounds = [SIMHASH_BITS * i // k for i in range(k + 1)]
    return [(bounds[i], bounds[i + 1] - bounds[i]) for i in range(k)]


def simhash_pairs(
    df: DataFrame,
    *,
    max_hamming: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
) -> DataFrame:
    """All near-dup pairs by simhash hamming distance ≤ ``max_hamming``.

    Scale design: each fingerprint fans out to ``max_hamming+1`` band
    rows; candidates are a self shuffle-join on the (band_id, band value)
    bucket key — high-cardinality, partition-parallel, and NO corpus
    broadcast (a broadcast of the fingerprint table caps out at ~10^8
    docs; buckets shuffle ≈ docs × bands rows, never docs²).  The final
    hamming filter makes the result exact; a groupBy dedups pairs that
    collide in several bands.  ``block_col`` optionally restricts pairs
    to an equal blocking key (e.g. same lang) on top of the band buckets.
    """
    # Codegen simhash (explode + conditional sums, see text.simhash_df);
    # the identical x/y subtrees below shuffle on the same keys, so the
    # fingerprint aggregation runs once and is reused (ReusedExchange).
    fp = simhash_df(df, text_col=text_col, id_col=id_col, carry=(block_col,) if block_col else ())
    if block_col:
        fp = fp.withColumnRenamed(block_col, "blk")
    bands = _simhash_bands(max_hamming)
    stack = ", ".join(
        f"{i}, CAST(shiftright(sh, {shift}) & {(1 << width) - 1} AS BIGINT)"
        for i, (shift, width) in enumerate(bands)
    )
    carry = ["doc", "sh"] + (["blk"] if block_col else [])
    banded = fp.selectExpr(
        *carry, f"stack({len(bands)}, {stack}) AS (band_id, key)"
    )
    cond = [F.col("x.doc") < F.col("y.doc")]
    if block_col:
        cond.append(F.col("x.blk") == F.col("y.blk"))
    pairs = (
        banded.alias("x")
        .join(banded.alias("y"), ["band_id", "key"])
        .where(cond[0] if len(cond) == 1 else cond[0] & cond[1])
        .select(
            F.col("x.doc").alias("a"),
            F.col("y.doc").alias("b"),
            F.bit_count(F.col("x.sh").bitwiseXOR(F.col("y.sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .groupBy("a", "b")
        .agg(F.min("hamming").alias("hamming"))
    )
    return pairs


def simhash_pairs_oracle(
    table: str = "documents", *, max_hamming: int = 6, block_col: str | None = None
) -> str:
    from simple_tsdb_spark.pipeline.text import _simhash_hashes_sql

    blk_sel = f", {block_col} AS blk" if block_col else ""
    blk_cond = " AND x.blk = y.blk" if block_col else ""
    return f"""
WITH h AS (
  -- NULL text excluded: no content, no dup evidence (the engine's
  -- explode-based fingerprint emits nothing for NULL docs)
  SELECT doc_id AS doc{blk_sel}, {_simhash_hashes_sql('text')} AS _hs FROM {table}
  WHERE text IS NOT NULL),
fp AS (
  SELECT doc{', blk' if block_col else ''}, {_simhash_sql('text')} AS sh FROM h)
SELECT a, b, hamming FROM (
  SELECT x.doc AS a, y.doc AS b,
         CAST(bit_count(xor(x.sh, y.sh)) AS INTEGER) AS hamming
  FROM fp x JOIN fp y ON x.doc < y.doc{blk_cond})
WHERE hamming <= {max_hamming}
"""


def simhash_band_dedup(
    df: DataFrame,
    *,
    max_hamming: int = 6,
    order_col: str = "doc_id",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy band-ownership near-dup FILTER (keep/drop per doc), the
    batch twin of ``streaming.streaming_simhash_dedup``.

    Processing docs in ``order_col`` order with a running set of seen
    (band_id, band value) keys — every doc inserts all of its
    ``max_hamming+1`` band keys; a doc SURVIVES iff all of its keys were
    unseen — is order-equivalent to: a doc survives iff it is the
    minimum-``order_col`` presenter of every one of its band keys.  That
    reformulation is a plain window min, so the batch twin is two
    shuffles (band key, then doc) with no sequential pass.

    Recall is total by pigeonhole: two docs at hamming ≤ ``max_hamming``
    share ≥1 band, so the later one can never survive.  Precision is the
    trade: docs sharing a band at hamming > ``max_hamming`` also drop —
    this is a streaming-grade PRE-filter; exact pair finding stays with
    ``simhash_pairs``.  Output: (doc, order, sh, survives).
    """
    fp = simhash_df(df, text_col=text_col, id_col=id_col, carry=(order_col,) if order_col != id_col else ())
    if order_col == id_col:
        fp = fp.withColumn("_ord", F.col("doc"))
    else:
        fp = fp.withColumnRenamed(order_col, "_ord")
    bands = _simhash_bands(max_hamming)
    stack = ", ".join(
        f"{i}, CAST(shiftright(sh, {shift}) & {(1 << width) - 1} AS BIGINT)"
        for i, (shift, width) in enumerate(bands)
    )
    banded = fp.selectExpr("doc", "_ord", "sh", f"stack({len(bands)}, {stack}) AS (band_id, key)")
    from pyspark.sql import Window

    w = Window.partitionBy("band_id", "key")
    owned = banded.withColumn("_first", F.min("_ord").over(w))
    return (
        owned.groupBy("doc")
        .agg(
            F.first("_ord").alias("order"),
            F.first("sh").alias("sh"),
            F.min((F.col("_first") == F.col("_ord")).cast("int")).alias("_all_first"),
        )
        .select("doc", "order", "sh", (F.col("_all_first") == 1).alias("survives"))
    )


def simhash_band_dedup_oracle(
    table: str = "documents",
    *,
    max_hamming: int = 6,
    order_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`simhash_band_dedup`: window-min band
    ownership over the same pigeonhole bands."""
    from simple_tsdb_spark.pipeline.text import _simhash_hashes_sql, _simhash_sql

    bands = _simhash_bands(max_hamming)
    band_rows = " UNION ALL ".join(
        f"SELECT doc, _ord, sh, {i} AS band_id, "
        f"CAST((sh >> {shift}) & {(1 << width) - 1} AS BIGINT) AS key FROM fp"
        for i, (shift, width) in enumerate(bands)
    )
    return f"""
WITH h AS (
  -- NULL text excluded (see simhash_pairs_oracle)
  SELECT doc_id AS doc, {order_col} AS _ord, {_simhash_hashes_sql('text')} AS _hs
  FROM {table} WHERE text IS NOT NULL),
fp AS (SELECT doc, _ord, {_simhash_sql('text')} AS sh FROM h),
banded AS ({band_rows}),
owned AS (
  SELECT doc, _ord, sh,
         MIN(_ord) OVER (PARTITION BY band_id, key) AS _first
  FROM banded)
SELECT doc, MIN(_ord) AS "order", MIN(sh) AS sh,
       CAST(MIN(CASE WHEN _first = _ord THEN 1 ELSE 0 END) AS BOOLEAN) AS survives
FROM owned GROUP BY doc
"""


# -- embedding cosine -------------------------------------------------------

def _dot(u: str, v: str) -> str:
    """Spark SQL fragment: double dot product with sequential fold order."""
    return (
        f"aggregate(zip_with({u}, {v}, (p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
    )


def _cos(ea: str, eb: str) -> Column:
    """cosine(a,b) in double with fixed op order: dot/(sqrt(aa)*sqrt(bb))."""
    return F.expr(f"{_dot(ea, eb)} / (sqrt({_dot(ea, ea)}) * sqrt({_dot(eb, eb)}))")


def _cos_prenorm(ea: str, eb: str, na: str, nb: str) -> Column:
    """cosine via precomputed norms — one dot per pair instead of three.
    Bit-identical to ``_cos``: the norm is a pure function of the vector,
    so hoisting it out of the pair loop changes no values."""
    return F.expr(f"{_dot(ea, eb)} / ({na} * {nb})")


def _norm(e: str) -> Column:
    return F.expr(f"sqrt({_dot(e, e)})")


_COS_DUCK = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def embedding_dup_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    extra_block_col: str | None = None,
    salt_buckets: int = 8,
    centroids=None,
    sub_planes: int = 0,
    max_cluster: int | None = None,
) -> DataFrame:
    """Cosine near-dup pairs within a coarse-quantizer block.

    Output (a, b, cos) — the cosine is the unrounded IEEE value
    (bit-identical across engines; a terminal round(double) diverges at
    repr boundaries).

    Scale design: pairwise work inside a block is O(block²), so the block
    key must scale its cardinality with the corpus — a fixed attribute
    like ``label`` makes the operator quadratic at 10⁹ docs no matter how
    the join is executed.  The default block key is therefore the IVF
    coarse-quantizer assignment (nearest-centroid list id — the same
    expression ``similarity.knn_ivf`` uses; pass ``centroids`` from
    ``similarity.train_ivf_centroids`` for a k-means fit with
    nlist ~ √N — the literal table keeps the oracle bit-exact either
    way; the default is the deterministic init table).  ``extra_block_col`` (e.g. label / lang)
    optionally ANDs an attribute-equality predicate on top.

    The join itself is *salted*: the probe side keeps one deterministic
    salt per row, the build side replicates ``salt_buckets`` ways, and
    the join keys on (block, salt) — every pair still meets exactly once,
    no corpus broadcast, parallelism = #blocks × salt_buckets even when
    a few lists run hot.

    ``sub_planes`` as in :func:`semdedup`: ANDs an LSH sign-bucket into
    the block key (÷~2^k pair work; exact dups keep 100% recall,
    near-dups pay the per-plane LSH recall trade).

    ``max_cluster`` arms the degenerate-quantizer guard
    (:func:`_cap_oversized_blocks`): oversized clusters re-split by
    sign planes, still-oversized ones fall back to anchor pairing —
    no block ever does more than ``max(max_cluster², n·256)`` pair
    work.  Off (None) by default: the guard changes recall for
    oversized clusters, so the oracle-gated queries keep it off.
    """
    # Lazy import: similarity imports dedup's cosine helpers at module
    # level, so the quantizer expressions must be imported at call time.
    from simple_tsdb_spark.pipeline.similarity import (
        _score_array_spark,
        _valid_vec_spark,
    )

    cols = [
        F.col(id_col).alias("doc"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
    ]
    if extra_block_col:
        cols.append(F.col(extra_block_col).alias("xblk"))
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    e = (
        # corrupt vectors screened on the raw column: a NaN pair cosine
        # passes `>= threshold` in BOTH engines (NaN compares greatest),
        # marking a corrupt vector a near-dup of its whole block
        # Small inputs fan out before the per-vector quantizer fold
        # (serial on a one-task scan otherwise); no-op at real scale.
        fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, None))
        .select(*cols)
        .withColumn("_sarr", F.expr(_score_array_spark("emb", dim, centroids)))
        .withColumn(
            # non-nullable (see similarity.knn_ivf): stops the block-key
            # equi-join from inferring an isnotnull filter that inlines and
            # re-evaluates the whole quantizer fold per row
            "blk",
            F.coalesce(
                F.expr("array_position(_sarr, array_max(_sarr)) - 1").cast("int"),
                F.lit(-1),
            ),
        )
        .drop("_sarr")
        .withColumn("nrm", _norm("emb"))
        # zero-norm vectors excluded (cosine undefined; under ANSI mode the
        # division would abort the job — see similarity.knn_brute)
        .where(F.col("nrm") > 0)
    )
    if sub_planes:
        from simple_tsdb_spark.pipeline.similarity import _bucket_expr

        e = e.withColumn(
            "blk",
            F.col("blk") * (1 << int(sub_planes))
            + F.expr(_bucket_expr("emb", dim, int(sub_planes))),
        )
    if max_cluster is not None:
        e = _cap_oversized_blocks(e, max_cluster=max_cluster, dim=dim)
    # Both sides of the salted self-join consume `e` with its quantizer
    # literal fold (the probe and the ×salt_buckets build replicas are
    # different subtrees, so ReuseExchange cannot fire) — materialize
    # once under the adaptive threshold (the knn_ivf/semdedup finding);
    # no-op at real scale (r14.2).
    from simple_tsdb_spark.functions.adaptive import materialize_small

    e = materialize_small(e)
    return _salted_block_pairs(
        e, threshold=threshold, salt_buckets=salt_buckets, xblk=bool(extra_block_col)
    )


#: cap-guard constants: at most 2^8 plane sub-buckets per oversized
#: cluster, and the still-oversized fallback pairs every row against
#: this many anchor rows instead of against the whole block.
_CAP_MAX_PLANES = 8
_CAP_ANCHORS = 256


def _cap_oversized_blocks(
    e: DataFrame, *, max_cluster: int, dim: int, anchors: int = _CAP_ANCHORS
) -> DataFrame:
    """Max-cluster-size guard (VERDICT r8 #6): bound the O(block²) pair
    work even under a DEGENERATE quantizer that dumps the corpus into
    one cluster.

    Two levels, applied only to blocks over ``max_cluster`` rows:

    1. **Plane re-split**: AND ``p = ceil(log2(cnt/max_cluster))`` LSH
       sign-planes (≤ 2^8) into the block key — spread-but-hot clusters
       split ≈2× per plane; exact dups always share sign buckets, so
       exact-dup recall stays 100% (near-dups pay the per-plane LSH
       trade, as with ``sub_planes``).
    2. **Anchor fallback**: a block of (near-)IDENTICAL vectors defeats
       pigeonholing — every row lands in the same sign bucket.  Blocks
       still over the cap after the re-split mark their ``anchors``
       smallest doc ids; pair generation pairs every row against the
       anchors only, so the block's work is ``n·anchors`` instead of
       ``n²``.  For identical vectors one anchor already certifies
       every row a duplicate, which is why the fallback keeps
       ``semdedup``'s keep/drop answer intact there; sparse true pairs
       BETWEEN non-anchor rows are the documented recall trade.

    Both count aggregates are cluster-cardinality-sized (broadcast).
    Returns ``e`` with a rewritten ``blk`` and an ``_anchor`` flag.
    """
    from simple_tsdb_spark.pipeline.similarity import _bucket_expr

    cap = int(max_cluster)
    if cap < 2:
        raise ValueError("max_cluster must be >= 2")
    c1 = e.groupBy("blk").agg(F.count(F.lit(1)).alias("_cnt"))
    planes = F.when(
        F.col("_cnt") > cap,
        F.least(
            F.ceil(F.log2(F.col("_cnt") / F.lit(float(cap)))),
            F.lit(_CAP_MAX_PLANES),
        ),
    ).otherwise(F.lit(0))
    sub = F.expr(_bucket_expr("emb", dim, _CAP_MAX_PLANES))
    e2 = (
        e.join(F.broadcast(c1), "blk")
        .withColumn("_p", planes.cast("int"))
        .withColumn(
            "blk",
            F.col("blk") * F.lit(2 * (1 << _CAP_MAX_PLANES))
            + F.when(
                F.col("_p") > 0,
                sub.bitwiseAND(F.expr("shiftleft(1, _p)") - 1),
            ).otherwise(F.lit(0)),
        )
        .drop("_cnt", "_p")
    )
    c2 = e2.groupBy("blk").agg(F.count(F.lit(1)).alias("_cnt2"))
    w = Window.partitionBy("blk").orderBy("doc")
    return (
        e2.join(F.broadcast(c2), "blk")
        .withColumn(
            "_anchor",
            (F.col("_cnt2") <= cap)
            | (F.row_number().over(w) <= int(anchors)),
        )
        .drop("_cnt2")
    )


def _salted_block_pairs(
    e: DataFrame, *, threshold: float, salt_buckets: int, xblk: bool = False
) -> DataFrame:
    """(a, b, cos) within-block pairs from a precomputed assignment
    ``e = (doc, emb, blk, nrm[, xblk])`` — the salted join of
    ``embedding_dup_pairs``, reusable so callers that already computed
    the quantizer assignment (``semdedup``) don't evaluate the literal
    centroid expressions twice.  If ``e`` carries an ``_anchor`` column
    (from :func:`_cap_oversized_blocks`) the build side keeps anchor
    rows only — capped blocks generate n·anchors pairs, not n²."""
    r = int(salt_buckets)
    capped = "_anchor" in e.columns
    x = e.withColumn("salt", F.pmod(F.hash("doc"), F.lit(r)))
    y = e.where(F.col("_anchor")) if capped else e
    y = y.withColumn("salt", F.explode(F.expr(f"sequence(0, {r - 1})")))
    if capped:
        x = x.drop("_anchor")
        y = y.drop("_anchor")
    # capped mode pairs each row against anchors on EITHER side of the
    # doc order (anchors are the block's smallest ids, so a one-sided
    # `<` would drop nearly every anchor×row pair); canonicalize to
    # a < b and dedup the anchor×anchor double emission (the cosine is
    # bit-symmetric: commuted products, same fold order).
    cond = (
        (F.col("x.doc") != F.col("y.doc"))
        if capped
        else (F.col("x.doc") < F.col("y.doc"))
    )
    if xblk:
        cond = cond & (F.col("x.xblk") == F.col("y.xblk"))
    a_col = (
        F.least(F.col("x.doc"), F.col("y.doc")) if capped else F.col("x.doc")
    )
    b_col = (
        F.greatest(F.col("x.doc"), F.col("y.doc")) if capped else F.col("y.doc")
    )
    pairs = (
        x.alias("x")
        .join(y.alias("y"), ["blk", "salt"])
        .where(cond)
        .select(
            a_col.alias("a"),
            b_col.alias("b"),
            _cos_prenorm("x.emb", "y.emb", "x.nrm", "y.nrm").alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
    return pairs.distinct() if capped else pairs


def embedding_dup_oracle(
    table: str = "embeddings",
    *,
    threshold: float = 0.3,
    dim: int = 64,
    extra_block_col: str | None = None,
    centroids=None,
) -> str:
    from simple_tsdb_spark.pipeline.similarity import (
        _clean_nonzero_duck,
        _score_array_duck,
    )

    xsel = f", {extra_block_col} AS xblk" if extra_block_col else ""
    xcond = " AND x.xblk = y.xblk" if extra_block_col else ""
    cos = _COS_DUCK.format(a="x.emb", b="y.emb")
    return f"""
WITH e0 AS (
  SELECT vec_id AS doc, embedding::DOUBLE[] AS emb{xsel},
         {_score_array_duck("embedding::DOUBLE[]", dim, centroids)} AS sarr
  FROM {table}
  WHERE {_clean_nonzero_duck("embedding")}),
e AS (
  SELECT doc, emb{', xblk' if extra_block_col else ''},
         CAST(list_position(sarr, list_max(sarr)) - 1 AS INTEGER) AS blk
  FROM e0)
SELECT a, b, cos FROM (
  SELECT x.doc AS a, y.doc AS b, {cos} AS cos
  FROM e x JOIN e y ON x.blk = y.blk AND x.doc < y.doc{xcond})
WHERE cos >= {threshold}
"""


# -- SemDeDup ---------------------------------------------------------------

def semdedup(
    df: DataFrame,
    *,
    threshold: float = 0.8,
    centroids=None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    salt_buckets: int = 8,
    sub_planes: int = 0,
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by pairwise cosine within coarse-quantizer clusters.

    Output ``(vec_id, cluster, centroid_cos, keep)`` for EVERY vector.
    Keep rule — the paper's best-performing variant: within a duplicate
    pair the vector FARTHER from its cluster centroid is kept
    preferentially, so a vector is dropped iff some ≥ ``threshold``
    partner in its cluster outranks it (lower ``centroid_cos``, ties by
    id).  Greedy-by-rank like the paper's implementation, not a
    transitive closure (``dedup_components`` provides that graph
    semantics when wanted).

    Scale design: pair generation reuses :func:`embedding_dup_pairs`
    (salted within-cluster join, no corpus broadcast, block cardinality
    scales with the corpus via the quantizer — pass ``centroids`` from
    ``train_ivf_centroids`` with nlist ~ √N); the rank joins key on
    vector id (uniform) and the duplicate-pair stream is output-sized,
    far smaller than the corpus at any realistic threshold.
    ``max_cluster`` arms the degenerate-quantizer guard
    (:func:`_cap_oversized_blocks`) on the pair stage: plane re-split,
    then anchor pairing for clusters that stay oversized — a
    mega-cluster of (near-)identical vectors still resolves correctly
    (every row pairs with an anchor and all but the paper-rule keeper
    drop) at ``n·256`` instead of ``n²`` pair work.  Off by default
    (the oracle-gated query keeps exact pair semantics).
    """
    from simple_tsdb_spark.pipeline.similarity import (
        _score_array_spark,
        _valid_vec_spark,
    )

    from simple_tsdb_spark.functions.adaptive import fan_out_small

    base = (
        # Small inputs fan out before the per-vector quantizer fold
        # (serial on a one-task scan otherwise); no-op at real scale.
        fan_out_small(df, id_col).select(
            F.col(id_col).alias("doc"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
            # corrupt-vector flag (NULL / wrong length / NULL-NaN
            # elements): such rows take the guarded convention below
            # (cluster -1, centroid_cos 0.0) on BOTH engines — without
            # the flag a NaN element would argmax to cluster 0 here
            # (NaN sorts greatest) while the oracle screens it out.
            _valid_vec_spark(vec_col, dim).alias("_ok"),
        )
        .withColumn("_sarr", F.expr(_score_array_spark("emb", dim, centroids)))
        .withColumn(
            # non-nullable (see similarity.knn_ivf): keeps the cluster-key
            # pair join from re-evaluating the quantizer in an inferred
            # isnotnull filter
            "blk",
            F.when(
                F.col("_ok"),
                F.coalesce(
                    F.expr("array_position(_sarr, array_max(_sarr)) - 1").cast("int"),
                    F.lit(-1),
                ),
            ).otherwise(F.lit(-1)),
        )
        .withColumn("nrm", _norm("emb"))
        .withColumn(
            "centroid_cos",
            F.when(
                F.col("_ok") & (F.col("nrm") > 0),
                F.expr("array_max(_sarr)") / F.col("nrm"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("_sarr")
    )
    # `base` (carrying the nlist×dim quantizer literal fold) feeds the
    # report projection AND the pair stage, and the report is consumed
    # three more times downstream — the driver re-analyzes that big
    # expression tree per consumer (the knn_ivf finding).  Materialize
    # once under the adaptive threshold; no-op at real scale (r14.2).
    from simple_tsdb_spark.functions.adaptive import materialize_small

    base = materialize_small(base)
    e = base.select("doc", F.col("blk").alias("cluster"), "centroid_cos")
    # one quantizer evaluation: the pair join reuses base's assignment.
    # Zero-norm vectors stay in `e` (every vector is reported; keep=True,
    # centroid_cos=0.0) but are excluded from PAIR generation — the pair
    # cosine is undefined at norm 0 and would abort under ANSI mode; the
    # oracle's NaN cosine fails its >= threshold cut identically.
    # pair base: positive-norm AND valid — an inf-element vector has
    # nrm = inf > 0 and its NaN pair cosine would PASS the >= threshold
    # cut (NaN sorts greatest in both engines), minting phantom dups
    nz = base.where((F.col("nrm") > 0) & F.col("_ok"))
    pair_base = nz.select("doc", "emb", "blk", "nrm")
    if sub_planes:
        from simple_tsdb_spark.pipeline.similarity import _bucket_expr

        pair_base = nz.select(
            "doc",
            "emb",
            (
                F.col("blk") * (1 << int(sub_planes))
                + F.expr(_bucket_expr("emb", dim, int(sub_planes)))
            ).alias("blk"),
            "nrm",
        )
    if max_cluster is not None:
        pair_base = _cap_oversized_blocks(
            pair_base, max_cluster=max_cluster, dim=dim
        )
    pr = _salted_block_pairs(
        pair_base,
        threshold=threshold,
        salt_buckets=salt_buckets,
    )
    sym = pr.select(F.col("a").alias("doc"), F.col("b").alias("other")).unionByName(
        pr.select(F.col("b").alias("doc"), F.col("a").alias("other"))
    )
    ranked = sym.join(
        e.select("doc", F.col("centroid_cos").alias("_rc")), "doc"
    ).join(
        e.select(F.col("doc").alias("other"), F.col("centroid_cos").alias("_ro")),
        "other",
    )
    dropped = (
        ranked.where(
            (F.col("_ro") < F.col("_rc"))
            | ((F.col("_ro") == F.col("_rc")) & (F.col("other") < F.col("doc")))
        )
        .select("doc")
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return (
        e.join(dropped, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            "cluster",
            "centroid_cos",
            F.col("_d").isNull().alias("keep"),
        )
    )


def semdedup_oracle(
    table: str = "embeddings",
    *,
    threshold: float = 0.8,
    dim: int = 64,
    centroids=None,
    sub_planes: int = 0,
) -> str:
    from simple_tsdb_spark.pipeline.similarity import _bucket_duck, _score_array_duck

    from simple_tsdb_spark.pipeline.similarity import _valid_vec_duck

    cos = _COS_DUCK.format(a="x.emb", b="y.emb")
    sb_sel = (
        f",\n         CASE WHEN _ok THEN {_bucket_duck('emb', dim, int(sub_planes))} END AS _sb"
        if sub_planes
        else ""
    )
    sb_cond = " AND x._sb = y._sb" if sub_planes else ""
    # Corrupt vectors (NULL / wrong length / NULL-NaN elements): reported
    # with the engine's guarded convention (cluster -1, centroid_cos 0.0,
    # keep) but excluded from pair generation — ordered CASE branches keep
    # the quantizer and list_dot_product off corrupt rows (DuckDB raises
    # on NULL elements where Spark's fold yields NULL).
    return f"""
WITH e0 AS (
  SELECT vec_id AS doc,
         {_valid_vec_duck("embedding", dim)} AS _ok,
         CASE WHEN {_valid_vec_duck("embedding", dim)}
              THEN embedding::DOUBLE[] END AS emb
  FROM {table}),
e1 AS (
  SELECT doc, emb, _ok,
         {_score_array_duck("emb", dim, centroids)} AS sarr
  FROM e0),
e AS (
  SELECT doc, emb, _ok,
         CASE WHEN _ok THEN CAST(list_position(sarr, list_max(sarr)) - 1 AS INTEGER)
              ELSE -1 END AS cluster,
         CASE WHEN NOT _ok THEN 0.0
              WHEN sqrt(list_dot_product(emb, emb)) > 0
              THEN list_max(sarr) / sqrt(list_dot_product(emb, emb))
              ELSE 0.0 END AS centroid_cos{sb_sel}
  FROM e1),
pr AS (
  SELECT a, b FROM (
    SELECT x.doc AS a, y.doc AS b, {cos} AS cos
    FROM e x JOIN e y
      ON x.cluster = y.cluster AND x.doc < y.doc AND x._ok AND y._ok{sb_cond})
  WHERE cos >= {threshold}),
sym AS (SELECT a AS doc, b AS other FROM pr UNION ALL SELECT b AS doc, a AS other FROM pr),
dropped AS (
  SELECT DISTINCT sym.doc FROM sym
  JOIN e ra ON ra.doc = sym.doc
  JOIN e rb ON rb.doc = sym.other
  WHERE rb.centroid_cos < ra.centroid_cos
     OR (rb.centroid_cos = ra.centroid_cos AND sym.other < sym.doc))
SELECT e.doc AS vec_id, cluster, centroid_cos,
       (dropped.doc IS NULL) AS keep
FROM e LEFT JOIN dropped ON dropped.doc = e.doc
"""


def source_dedup_rate(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """Per-source duplication report: ``(source, n_docs, n_unique,
    n_dup, dup_rate_ppm)`` — which feeds are redundant (the first
    question a curation budget asks; CCNet/C4 both report this per
    dump/domain).

    ``n_unique`` counts distinct content digests WITHIN the source;
    ``dup_rate_ppm`` is the parts-per-million truncated integer
    quotient ``(10^6·n_dup) div n_docs`` — ALL columns BIGINT
    (integer-finals doctrine, round 10: the driver's hasher
    canonicalizes non-int64 numerics engine-specifically, so gated
    finals carry no DOUBLE).  ``n_docs ≥ 1`` per group.  One
    map-side-combined aggregation keyed (source, md5) collapses copies,
    then a second ≤ #sources-key agg — Zipf-heavy content (the empty
    string, boilerplate) lands on distinct (source, digest) keys, so no
    hot key survives to the second shuffle.
    """
    per_digest = (
        df.groupBy(
            F.col(domain_col).alias("source"), F.md5(F.col(text_col)).alias("_h")
        )
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        per_digest.groupBy("source")
        .agg(
            F.sum("_n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            (F.col("n_docs") - F.col("n_unique")).alias("n_dup"),
            F.expr("(1000000 * (n_docs - n_unique)) div n_docs").alias(
                "dup_rate_ppm"
            ),
        )
        .orderBy("source")
    )


def source_dedup_rate_oracle(
    table: str = "documents",
    *,
    text_col: str = "text",
    domain_col: str = "source",
) -> str:
    return f"""
WITH d AS (
  SELECT {domain_col} AS source, md5({text_col}) AS h, COUNT(*) AS n
  FROM {table} GROUP BY 1, 2)
SELECT source, CAST(SUM(n) AS BIGINT) AS n_docs, COUNT(*) AS n_unique,
       CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dup,
       CAST((1000000 * (SUM(n) - COUNT(*))) // SUM(n) AS BIGINT) AS dup_rate_ppm
FROM d GROUP BY source
"""


def near_dup_rate_by_source(
    df: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    domain_col: str = "source",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Near-dup involvement per source: ``(source, n_docs, n_near_dup,
    near_dup_rate_ppm)`` — the LSH companion to :func:`source_dedup_rate`
    (exact copies vs near copies tell different curation stories:
    syndication vs templating).

    A doc counts as near-dup-involved if it appears in ANY pair.  The
    pair endpoints union + distinct is bounded by the pair count (the
    LSH stage already bands/buckets, so pairs ≪ docs²); the per-source
    report is two small aggregations and a left join on the ≤ #sources
    key.  ``near_dup_rate_ppm`` is the parts-per-million truncated
    BIGINT quotient (round-10 integer-finals doctrine).
    """
    from simple_tsdb_spark.functions.adaptive import materialize_small

    # Both endpoint-projection legs consume the whole pair plan (often a
    # full LSH banding join); under the adaptive size threshold
    # materialize it once.  No-op at real scale (r14; 1.30x at sf0.1).
    pairs = materialize_small(pairs)
    involved = (
        pairs.select(F.col(a_col).alias(id_col))
        .unionByName(pairs.select(F.col(b_col).alias(id_col)))
        .distinct()
    )
    totals = df.groupBy(F.col(domain_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    nd = (
        df.select(id_col, domain_col)
        .join(involved, id_col)
        .groupBy(F.col(domain_col).alias("source"))
        .agg(F.count(F.lit(1)).alias("n_near_dup"))
    )
    return (
        totals.join(nd, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_near_dup", F.lit(0).cast("long")).alias("n_near_dup"),
            F.expr("(1000000 * coalesce(n_near_dup, 0)) div n_docs").alias(
                "near_dup_rate_ppm"
            ),
        )
        .orderBy("source")
    )


def near_dup_rate_by_source_oracle(
    table: str = "documents", *, domain_col: str = "source"
) -> str:
    cte_list, final_select = minhash_lsh_oracle_parts(table)
    return f"""
WITH {cte_list},
p AS ({final_select}),
inv AS (SELECT a AS doc_id FROM p UNION SELECT b FROM p),
tot AS (SELECT {domain_col} AS source, COUNT(*) AS n_docs FROM {table} GROUP BY 1),
nd AS (
  SELECT d.{domain_col} AS source, COUNT(*) AS n_near_dup
  FROM {table} d JOIN inv USING (doc_id) GROUP BY 1)
SELECT tot.source, tot.n_docs, COALESCE(nd.n_near_dup, 0) AS n_near_dup,
       (1000000 * COALESCE(nd.n_near_dup, 0)) // tot.n_docs AS near_dup_rate_ppm
FROM tot LEFT JOIN nd USING (source)
"""
