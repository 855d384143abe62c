"""Similarity search over an embedding column.

- ``knn_brute``: exact top-k by cosine — broadcast the (small) query set,
  scan all candidates once, per-query top-k via ranking window.  O(N·Q)
  but one pass over the corpus with no shuffle of the corpus itself: at
  100 TB this is the *verification* path and the right answer for small Q.
- ``knn_lsh``: the scale path — random-hyperplane LSH signs bucket the
  corpus (deterministic arithmetic weights, no randomness at runtime);
  queries probe only their own bucket.  The corpus shuffle is by bucket
  id (bounded, uniform-ish).
- ``knn_ivf``: the same skeleton with an IVF coarse quantizer: corpus
  vectors assign to their nearest of ``nlist`` centroids (one pass, no
  shuffle of the corpus beyond the list-id join); queries probe their
  ``nprobe`` nearest lists.  Centroids here are deterministic arithmetic
  constants embedded as literals — in production they come from a
  k-means fit, dropped into the same two expressions; keeping them
  literal keeps the DuckDB oracle bit-exact.  ``nprobe = nlist`` probes
  everything and provably equals ``knn_brute``.

Ranking is by cosine rounded to 6 decimals with vec_id tiebreak — fully
deterministic and engine-portable (same rule in the oracle SQL).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.adaptive import fan_out_small
from simple_tsdb_spark.pipeline.dedup import _cos_prenorm, _norm, _COS_DUCK

N_PLANES = 8
_W_MOD = 1_048_576


def _plane_weight(j: int, d: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-0.5, 0.5)."""
    return (((d + 1) * 2654435761 + (j + 1) * 40503) % _W_MOD) / _W_MOD - 0.5


def _bucket_expr(emb: str, dim: int, planes: int = N_PLANES) -> str:
    """Spark SQL fragment: LSH bucket id = sign bits of ``planes`` projections."""
    bits = []
    for j in range(planes):
        w = ", ".join(f"CAST({_plane_weight(j, d)!r} AS DOUBLE)" for d in range(dim))
        proj = (
            f"aggregate(zip_with({emb}, array({w}), (p, q) -> CAST(p AS DOUBLE) * q), "
            f"CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
        )
        bits.append(f"CASE WHEN ({proj}) > 0 THEN {1 << j} ELSE 0 END")
    return " + ".join(bits)


def _bucket_duck(emb: str, dim: int, planes: int = N_PLANES) -> str:
    bits = []
    for j in range(planes):
        w = ", ".join(repr(_plane_weight(j, d)) for d in range(dim))
        proj = f"list_dot_product({emb}, [{w}]::DOUBLE[])"
        bits.append(f"CASE WHEN ({proj}) > 0 THEN {1 << j} ELSE 0 END")
    return " + ".join(bits)


def knn_brute(
    df: DataFrame,
    *,
    query_ids: Sequence[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k for each query id (self excluded).

    Output: (query_id, neighbor_id, cos, rank) — rank by (cos desc, id).

    Zero-norm vectors are EXCLUDED (engine-wide cosine convention):
    cosine is undefined at norm 0, and under Spark's ANSI mode the
    division would abort the whole job — one corrupt embedding must
    not kill a 100 TB scan.  A zero QUERY vector therefore returns no
    rows; a zero corpus vector is never a neighbor.  Both engines
    filter identically (a comparison, no division).

    Corrupt vectors (NULL / NULL-NaN-±inf elements) are screened on the
    RAW column (scan-pushed, no fold inlining): a NaN cosine survives
    ``nrm > 0`` in both engines (NaN compares greatest) and would rank
    FIRST under DESC, crowding a real neighbor out of the top-k.
    """
    e = (
        fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, None))
        .select(
            F.col(id_col).alias("nid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .withColumn("nrm", _norm("emb"))
        .where(F.col("nrm") > 0)
    )
    q = e.where(F.col("nid").isin(list(query_ids))).select(
        F.col("nid").alias("query_id"), F.col("emb").alias("qemb"), F.col("nrm").alias("qnrm")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            _cos_prenorm("qemb", "emb", "qnrm", "nrm").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def knn_brute_oracle(
    table: str = "embeddings", *, query_ids: Sequence[int] = (), k: int = 10
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = _COS_DUCK.format(a="q.emb", b="e.emb")
    return f"""
WITH e AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS emb FROM {table}
           WHERE {_clean_nonzero_duck("embedding")}),
q AS (SELECT nid AS query_id, emb FROM e WHERE nid IN ({ids})),
scored AS (
  SELECT q.query_id, e.nid AS neighbor_id, {cos} AS cos
  FROM e CROSS JOIN q WHERE e.nid <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


def range_search(
    df: DataFrame,
    *,
    query_ids: Sequence[int],
    tau: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Radius search: every corpus vector with cosine ≥ ``tau`` of each
    query vector (self excluded) — the fixed-threshold companion to
    :func:`knn_brute` (retrieval recall sweeps, duplicate audits at a
    known similarity bar).

    Output: (query_id, neighbor_id, cos), ordered by (query_id,
    cos desc, neighbor_id).  The cosine is the UNROUNDED sequential-fold
    double (bit-equal to DuckDB's ``list_dot_product`` form, proven by
    the knn_* gates), so the ``>= tau`` cut lands identically on both
    engines.

    Scale: the query set broadcasts; the corpus is scanned ONCE with no
    shuffle of the vectors themselves — the only exchange carries the
    (query_id, neighbor_id, cos) survivors, whose size the threshold
    bounds.  For huge query sets, bucket both sides with the knn_lsh
    planes first; this exact form is the verification path.
    """
    # zero-norm + corrupt vectors excluded (cosine undefined / NaN ranks
    # first under DESC; see knn_brute)
    e = (
        fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, None))
        .select(
            F.col(id_col).alias("nid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .withColumn("nrm", _norm("emb"))
        .where(F.col("nrm") > 0)
    )
    q = e.where(F.col("nid").isin(list(query_ids))).select(
        F.col("nid").alias("query_id"), F.col("emb").alias("qemb"), F.col("nrm").alias("qnrm")
    )
    return (
        e.crossJoin(F.broadcast(q))
        .where(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            _cos_prenorm("qemb", "emb", "qnrm", "nrm").alias("cos"),
        )
        .where(F.col("cos") >= F.lit(float(tau)))
        .orderBy("query_id", F.col("cos").desc(), "neighbor_id")
    )


def range_search_oracle(
    table: str = "embeddings", *, query_ids: Sequence[int] = (), tau: float = 0.5
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = _COS_DUCK.format(a="q.emb", b="e.emb")
    return f"""
WITH e AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS emb FROM {table}
           WHERE {_clean_nonzero_duck("embedding")}),
q AS (SELECT nid AS query_id, emb FROM e WHERE nid IN ({ids}))
SELECT q.query_id, e.nid AS neighbor_id, {cos} AS cos
FROM e CROSS JOIN q
WHERE e.nid <> q.query_id AND {cos} >= {tau!r}
"""


def _probe_masks(multiprobe: int) -> list[int]:
    """XOR masks for all buckets within hamming ≤ multiprobe (N_PLANES bits)."""
    masks = [0]
    if multiprobe >= 1:
        masks += [1 << j for j in range(N_PLANES)]
    if multiprobe >= 2:
        masks += [
            (1 << i) | (1 << j) for i in range(N_PLANES) for j in range(i + 1, N_PLANES)
        ]
    if multiprobe > 2:
        raise ValueError("multiprobe > 2 not supported (probe count explodes)")
    return masks


def knn_lsh(
    df: DataFrame,
    *,
    query_ids: Sequence[int],
    k: int = 10,
    dim: int = 64,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates share (a neighborhood of) the query's
    LSH sign-bucket.

    ``multiprobe`` also probes every bucket within that hamming distance
    of the query's bucket (0 = exact bucket only): each probed bit
    recovers neighbors that fell just across one hyperplane — the
    standard recall/cost dial.  Probing h≤1 touches 1+N_PLANES of the
    2^N_PLANES buckets (~3.5% of the corpus at 8 planes) instead of 0.4%.
    Output: (query_id, neighbor_id, cos, rank); dedup across probes.
    """
    e = (
        fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, None))
        .select(
            F.col(id_col).alias("nid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .withColumn("bucket", F.expr(_bucket_expr("emb", dim)))
        .withColumn("nrm", _norm("emb"))
        # zero-norm + corrupt vectors excluded (see knn_brute)
        .where(F.col("nrm") > 0)
    )
    # NOT materialized: the double-consumed `e` here carries only the
    # cheap normalize/bucket projection (no quantizer literal), and the
    # checkpoint write measured a wash-to-loss (knn_lsh 1.04×,
    # knn_brute 0.81×, r14.2 A/B) — unlike knn_ivf/semdedup.
    probes = _probe_masks(multiprobe)
    q = e.where(F.col("nid").isin(list(query_ids))).select(
        F.col("nid").alias("query_id"), F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
        F.explode(
            F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in probes])
        ).alias("bucket"),
    )
    scored = (
        e.join(F.broadcast(q), "bucket")
        .where(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            _cos_prenorm("qemb", "emb", "qnrm", "nrm").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def knn_lsh_oracle(
    table: str = "embeddings", *, query_ids: Sequence[int] = (), k: int = 10,
    dim: int = 64, multiprobe: int = 1,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    masks = ", ".join(str(m) for m in _probe_masks(multiprobe))
    cos = _COS_DUCK.format(a="q.emb", b="e.emb")
    return f"""
WITH e AS (
  SELECT vec_id AS nid, embedding::DOUBLE[] AS emb,
         {_bucket_duck("embedding::DOUBLE[]", dim)} AS bucket
  FROM {table}
  WHERE {_clean_nonzero_duck("embedding")}),
q AS (
  SELECT nid AS query_id, emb, xor(bucket, m.mask) AS bucket
  FROM e, UNNEST([{masks}]) AS m(mask) WHERE nid IN ({ids})),
scored AS (
  SELECT q.query_id, e.nid AS neighbor_id, {cos} AS cos
  FROM e JOIN q USING (bucket) WHERE e.nid <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


# -- IVF --------------------------------------------------------------------

N_LISTS = 16


def _centroid(l: int, d: int) -> float:
    """Deterministic pseudo-random centroid component in [-0.5, 0.5)."""
    return (((d + 1) * 2654435761 + (l + 1) * 97911 + 12345) % _W_MOD) / _W_MOD - 0.5


def _centroid_norm(l: int, dim: int) -> float:
    return sum(_centroid(l, d) ** 2 for d in range(dim)) ** 0.5


def default_centroids(nlist: int = N_LISTS, dim: int = 64) -> list[list[float]]:
    """The deterministic pseudo-random centroid table (k-means init)."""
    return [[_centroid(l, d) for d in range(dim)] for l in range(nlist)]


def _score_array_spark(
    emb: str, dim: int, centroids: Sequence[Sequence[float]] | None = None
) -> str:
    """ONE array of the nlist quantizer scores: cos-to-centroid = dot/|c|
    (|emb| is a shared factor, irrelevant to the argmax), rounded to 6
    decimals so ranking ties break identically on every engine.  A single
    array column keeps the expression tree small — separate per-list
    columns re-inline under CollapseProject into an argmax CASE that
    re-evaluates every 64-dim dot nlist+1 times (measured: optimizer
    stalls outright on the collapsed tree)."""
    cs = centroids if centroids is not None else default_centroids(N_LISTS, dim)
    scores = []
    for c in cs:
        w = ", ".join(f"CAST({c[d]!r} AS DOUBLE)" for d in range(dim))
        nrm = sum(x * x for x in c) ** 0.5
        dot = (
            f"aggregate(zip_with({emb}, array({w}), (p, q) -> CAST(p AS DOUBLE) * q), "
            f"CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)"
        )
        scores.append(f"round(({dot}) / CAST({nrm!r} AS DOUBLE), 6)")
    return "array(" + ", ".join(scores) + ")"


def _score_array_duck(
    emb: str, dim: int, centroids: Sequence[Sequence[float]] | None = None
) -> str:
    cs = centroids if centroids is not None else default_centroids(N_LISTS, dim)
    scores = []
    for c in cs:
        w = ", ".join(repr(c[d]) for d in range(dim))
        nrm = sum(x * x for x in c) ** 0.5
        dot = f"list_dot_product({emb}, [{w}]::DOUBLE[])"
        scores.append(f"round(({dot}) / {nrm!r}, 6)")
    return "[" + ", ".join(scores) + "]"


#: fixed-point grid for centroid-mean accumulation: per-dim contributions
#: quantize to floor(x·1e9) BIGINTs so the cross-partition sum is exact
#: integer math — bit-identical for ANY row/partition order and for any
#: engine.  floor() avoids rounding-mode divergence (Spark casts HALF_UP,
#: DuckDB HALF_EVEN); the 1e-9 resolution loss is immaterial to k-means.
_TRAIN_QUANT = 1_000_000_000


def _lloyd_refine(sum_rows_fn, nlist: int, dim: int, iters: int) -> list[list[float]]:
    """Shared Lloyd's driver loop: ``sum_rows_fn(cs)`` returns per-list
    ``(list_id, n, [quantized long sums])`` for the current centroids;
    the mean/guard arithmetic runs HERE in plain Python so the Spark and
    DuckDB trainers produce byte-identical literals whenever their
    quantized sums agree (which exact integer math guarantees)."""
    cs = default_centroids(nlist, dim)
    for _ in range(int(iters)):
        nxt = [list(c) for c in cs]
        for list_id, n, sums in sum_rows_fn(cs):
            if n:
                mean = [(s / _TRAIN_QUANT) / n for s in sums]
                # A near-zero-norm mean (opposing vectors cancel) would
                # make the quantizer score dot/|c| divide by ~0 — NULL in
                # Spark, inf/nan in DuckDB — so argmax assignment would
                # diverge between engines.  Treat it like an empty list:
                # keep the previous centroid.
                if sum(x * x for x in mean) >= 1e-12:
                    nxt[list_id] = mean
        cs = nxt
    return cs


def _cache_train_input(df: DataFrame, cache: str | None) -> DataFrame:
    """Materialization policy for iterative quantizer fits: ``"local"``
    = eager localCheckpoint (executor storage, fastest per iteration),
    ``"disk"`` = DISK_ONLY persist, ``None`` = recompute per iteration
    (zero storage).  See ``train_ivf_centroids`` for the trade."""
    if cache == "local":
        return df.localCheckpoint(eager=True)
    if cache == "disk":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.DISK_ONLY)
    if cache is None:
        return df
    raise ValueError(f"cache must be 'local', 'disk' or None, got {cache!r}")


def train_ivf_centroids(
    df: DataFrame,
    *,
    nlist: int = N_LISTS,
    dim: int = 64,
    iters: int = 3,
    vec_col: str = "embedding",
    cache: str | None = "local",
) -> list[list[float]]:
    """Spherical-k-means refinement of the IVF coarse quantizer (Lloyd's).

    Starts from :func:`default_centroids`, then per iteration: assign
    every vector to its argmax-cos list (one projection — the same
    quantizer expression the read path uses), and recompute each centroid
    as the mean of its assigned vectors (one groupBy; only nlist rows of
    dim sums ever reach the driver, so the driver payload is
    nlist×dim values per iteration regardless of corpus size).  Empty
    lists keep their previous centroid.  The result is a plain Python
    list of literals — exactly what ``knn_ivf``/its DuckDB oracle take,
    so a trained quantizer stays hash-checkable.

    The fit is fully deterministic: per-dim contributions quantize to
    ``floor(x·1e9)`` BIGINTs before summing (see ``_TRAIN_QUANT``), so
    the result is independent of partitioning/row order and
    :func:`train_ivf_centroids_duck` reproduces it bit-for-bit — which
    is what lets a *trained* quantizer sit inside the driver's hash gate
    (both engines independently fit the same literals from the data).

    ``cache`` sizes the fit for the corpus: ``"local"`` (default) pins
    the double-cast vectors in executor storage via an eager
    localCheckpoint — fastest for bench-scale, but at 10⁹×64-dim that
    is ~0.5 TB held across a 2-3 iteration fit; ``"disk"`` persists
    DISK_ONLY (spill instead of RAM); ``None`` materializes nothing and
    recomputes the projection each iteration (iters extra corpus scans,
    zero storage — the right trade when the scan is cheap or storage is
    scarce).  The fit is bit-identical in every mode (the quantized
    sums are partitioning-independent).
    """
    # Zero-norm vectors carry no direction: their cosine scores are NaN
    # and the two engines order NaNs differently, so BOTH trainers drop
    # them from the fit (a no-op on any real corpus — fuzz_corpus.py
    # emb_zero is where this matters).
    emb = _cache_train_input(
        # raw-column corrupt-vector screen first (NaN/±inf would poison
        # the quantized centroid sums; see _valid_vec_spark)
        df.where(_valid_vec_spark(vec_col, None))
        .select(F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"))
        .where(F.expr("aggregate(zip_with(emb, emb, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) > 0")),
        cache,
    )

    def sum_rows(cs):
        assigned = emb.withColumn(
            "_sarr", F.expr(_score_array_spark("emb", dim, cs))
        ).withColumn(
            "list_id", F.expr("array_position(_sarr, array_max(_sarr)) - 1").cast("int")
        )
        rows = (
            assigned.groupBy("list_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.expr(f"CAST(floor(emb[{d}] * CAST({_TRAIN_QUANT} AS DOUBLE)) AS BIGINT)")
                    ).alias(f"s{d}")
                    for d in range(dim)
                ],
            )
            .collect()  # ≤ nlist rows — bounded, corpus-size independent
        )
        return [(r["list_id"], r["n"], [r[f"s{d}"] for d in range(dim)]) for r in rows]

    return _lloyd_refine(sum_rows, nlist, dim, iters)


def train_ivf_centroids_duck(
    con,
    *,
    table: str = "embeddings",
    nlist: int = N_LISTS,
    dim: int = 64,
    iters: int = 3,
) -> list[list[float]]:
    """DuckDB twin of :func:`train_ivf_centroids` — same init, same
    argmax-of-rounded-scores assignment, same floor-quantized integer
    sums, same shared Python mean loop — so both engines fit identical
    centroid literals from the same data.  Used by the oracle builder to
    embed a trained quantizer without touching Spark."""

    def sum_rows(cs):
        sarr = _score_array_duck("embedding::DOUBLE[]", dim, cs)
        scols = ", ".join(
            f"SUM(CAST(floor(emb[{d + 1}] * CAST({_TRAIN_QUANT} AS DOUBLE)) AS BIGINT)) AS s{d}"
            for d in range(dim)
        )
        q = f"""
WITH e AS (
  SELECT embedding::DOUBLE[] AS emb, {sarr} AS sarr FROM {table}
  WHERE {_clean_nonzero_duck("embedding")}),
a AS (
  SELECT emb, CAST(list_position(sarr, list_max(sarr)) - 1 AS INTEGER) AS list_id
  FROM e)
SELECT list_id, COUNT(*) AS n, {scols} FROM a GROUP BY list_id
"""
        return [(r[0], r[1], list(r[2:])) for r in con.execute(q).fetchall()]

    return _lloyd_refine(sum_rows, nlist, dim, iters)


# -- IVF-PQ (product quantization) ------------------------------------------

PQ_M = 8     # subvectors
PQ_K = 16    # centroids per subspace (4-bit codes)


def _pq_centroid(m: int, k: int, d: int) -> float:
    """Deterministic pseudo-random PQ codebook component in [-0.125,
    0.125) — scaled to the per-dim spread of L2-NORMALIZED vectors
    (~1/sqrt(dim)), which is what pq_encode quantizes."""
    u = (((d + 1) * 2654435761 + (k + 1) * 97911 + (m + 1) * 40503 + 777) % _W_MOD) / _W_MOD - 0.5
    return u * 0.25


def pq_codebooks(
    m: int = PQ_M, k: int = PQ_K, dim: int = 64
) -> list[list[list[float]]]:
    """codebooks[m][k] = centroid vector of subspace m (dim/m components).
    Deterministic literals — the PQ analog of :func:`default_centroids`
    (a trained codebook drops into the same expressions)."""
    sub = dim // m
    return [
        [[_pq_centroid(mi, ki, d) for d in range(sub)] for ki in range(k)]
        for mi in range(m)
    ]


def _pq_dist_terms(emb: str, cb: Sequence[Sequence[float]], off: int) -> list[str]:
    """Spark SQL: squared L2 distance from ``emb[off:off+sub]`` to every
    centroid of one subspace, expanded (no lambda) for codegen."""
    out = []
    for c in cb:
        terms = " + ".join(
            f"(({emb}[{off + d}] - CAST({c[d]!r} AS DOUBLE)) * "
            f"({emb}[{off + d}] - CAST({c[d]!r} AS DOUBLE)))"
            for d in range(len(c))
        )
        out.append(f"({terms})")
    return out


def _pq_dist_terms_duck(emb: str, cb: Sequence[Sequence[float]], off: int) -> list[str]:
    out = []
    for c in cb:
        terms = " + ".join(
            f"(({emb}[{off + d + 1}] - {c[d]!r}) * ({emb}[{off + d + 1}] - {c[d]!r}))"
            for d in range(len(c))
        )
        out.append(f"({terms})")
    return out


#: Spark SQL fragment: L2-normalize a double array (sequential-fold dot,
#: the engine-portable op order used everywhere else).
def _valid_vec_spark(vec_col: str, dim: int | None) -> "Column":
    """Predicate on the RAW vector column: not NULL, exactly ``dim``
    long (skipped when ``dim`` is None), no NULL/NaN/±inf elements.
    Referencing only the raw column keeps pushdown harmless — the
    predicate lands on the scan and never duplicates a quantizer/
    projection expression (see the knn_rp inferred-filter regression).
    inf is corrupt here because integer-grid folds turn it into
    LONG_MAX (Spark ``floor(inf)``) and overflow downstream sums."""
    checks = [f"{vec_col} IS NOT NULL"]
    if dim is not None:
        checks.append(f"size({vec_col}) = {int(dim)}")
    checks.append(
        f"NOT exists({vec_col}, x -> x IS NULL OR isnan(CAST(x AS DOUBLE)) "
        f"OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE))"
    )
    return F.expr(" AND ".join(checks))


def _valid_vec_duck(vec_col: str, dim: int | None) -> str:
    """DuckDB twin of :func:`_valid_vec_spark`.  Element screens run
    before anything touches ``list_dot_product``, which RAISES on NULL
    elements instead of yielding NULL like Spark's fold."""
    checks = [f"{vec_col} IS NOT NULL"]
    if dim is not None:
        checks.append(f"len({vec_col}) = {int(dim)}")
    checks.append(
        f"len(list_filter({vec_col}, x -> x IS NULL OR isnan(CAST(x AS DOUBLE)) "
        f"OR isinf(CAST(x AS DOUBLE)))) = 0"
    )
    return "(" + " AND ".join(checks) + ")"


def _clean_nonzero_duck(vec_col: str = "embedding") -> str:
    """Oracle screen for the cosine-ranking family (knn_brute/lsh/ivf/rp,
    range_search, hard_negatives): raw-column validity — NULL vector,
    NULL/NaN/±inf elements, mirroring :func:`_valid_vec_spark` — guarding
    the zero-norm cut.  The CASE guarantees ``list_dot_product`` (which
    RAISES on NULL elements in DuckDB) only ever sees clean vectors.
    Without the element screen a NaN cosine survives ``> 0`` in BOTH
    engines (NaN compares greatest) and, sorting first under DESC, a
    corrupt vector crowds a real neighbor out of the top-k (r11 ADVICE)."""
    return (
        f"(CASE WHEN {_valid_vec_duck(vec_col, None)} "
        f"THEN list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[]) > 0 "
        f"ELSE FALSE END)"
    )


def _norm_expr(emb: str) -> str:
    return (
        f"transform({emb}, x -> x / sqrt(aggregate(zip_with({emb}, {emb}, "
        f"(p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z)))"
    )


def _norm_expr_duck(emb: str) -> str:
    return f"list_transform({emb}, x -> x / sqrt(list_dot_product({emb}, {emb})))"


def pq_encode(
    df: DataFrame,
    *,
    dim: int = 64,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantize vectors: (vec_id, codes array<int> of length M).

    Vectors are L2-normalized first, so squared-L2 ADC ranking is
    cosine ranking (‖q−x‖² = 2−2·cos on unit vectors) — the metric the
    rest of the similarity suite uses.  Each subspace's code is the
    argmin-squared-L2 centroid (smallest code on ties, via
    array_position on the rounded distance array — the same
    engine-portable argmin idiom the IVF quantizer uses).  This is the
    index-BUILD step: at 10⁹ vectors it is one embarrassingly parallel
    scan, and the output is M small ints per vector instead of dim
    floats — the compression that lets an ANN index stay
    memory-resident.
    """
    cbs = codebooks if codebooks is not None else pq_codebooks(dim=dim)
    # Small inputs fan out before the per-vector normalize + M×K distance
    # join (serial on a one-task scan otherwise); no-op at real scale.
    df = fan_out_small(df, id_col)
    # zero-norm vectors excluded: they cannot sit on the unit sphere, and
    # the normalization would divide by zero (ANSI abort; see knn_brute)
    base = df.where(_valid_vec_spark(vec_col, None)).select(
        F.col(id_col).alias("_pqid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
    ).where(F.expr("aggregate(zip_with(emb, emb, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) > 0"))
    return _pq_encode_relational(base, cbs, dim, carry=()).withColumnRenamed(
        "_pqid", id_col
    )


def _subvec_rows_expr(emb: str, m: int, sub: int) -> str:
    """One (subspace, subvector) struct per subspace per row, with the
    L2-normalized vector lambda-bound ONCE (the `_simhash_expr`
    aggregate-wrapper trick) so CollapseProject cannot inline the
    normalization fold into every slice."""
    return (
        f"aggregate(array({_norm_expr(emb)}), "
        f"CAST(NULL AS ARRAY<STRUCT<m: INT, sv: ARRAY<DOUBLE>>>), "
        f"(acc, _nv) -> transform(sequence(0, {m - 1}), mi -> "
        f"named_struct('m', CAST(mi AS INT), 'sv', slice(_nv, mi * {sub} + 1, {sub}))))"
    )


def _pq_encode_relational(base: DataFrame, cbs, dim: int, *, carry: tuple[str, ...]):
    """codes via a RELATIONAL plan instead of per-row interpreted HOF
    distance arrays (which cost ~8k interpreted expression evals per
    vector — measured ~5× slower): explode M (subspace, subvector) rows,
    broadcast-join the M×K literal codebook table, compute each squared
    L2 distance as unrolled codegen arithmetic, and take each subspace's
    argmin with a filtered ``min_by(k, struct(dist, k))`` — the same
    rounded-(dist, k) tiebreak as the oracle's list_position-of-min.
    One shuffle keyed by vector id; everything stays in whole-stage
    codegen.  ``base`` must have columns (_pqid, emb[, carry…])."""
    m = len(cbs)
    kk = len(cbs[0])
    sub = dim // m
    spark = base.sparkSession
    cb_rows = [
        (mi, ki, *[float(c) for c in cbs[mi][ki]]) for mi in range(m) for ki in range(kk)
    ]
    cb_schema = "m int, k int, " + ", ".join(f"c{d} double" for d in range(sub))
    cb_df = spark.createDataFrame(cb_rows, cb_schema)
    rows = base.select(
        "_pqid",
        *carry,
        F.explode(F.expr(_subvec_rows_expr("emb", m, sub))).alias("r"),
    ).select("_pqid", *carry, F.col("r.m").alias("m"), F.col("r.sv").alias("sv"))
    dist = " + ".join(f"((sv[{d}] - c{d}) * (sv[{d}] - c{d}))" for d in range(sub))
    scored = rows.join(F.broadcast(cb_df), "m").withColumn(
        "d", F.expr(f"round({dist}, 6)")
    )
    aggs = [
        F.expr(f"min_by(k, struct(d, k)) FILTER (WHERE m = {mi})").alias(f"_c{mi}")
        for mi in range(m)
    ]
    if carry:
        aggs = [F.first(c).alias(c) for c in carry] + aggs
    return (
        scored.groupBy("_pqid")
        .agg(*aggs)
        .select(
            "_pqid",
            *carry,
            F.expr("array(" + ", ".join(f"_c{mi}" for mi in range(m)) + ")").alias("codes"),
        )
    )


def _pq_codes_expr(emb: str, cbs, dim: int) -> str:
    """Spark SQL: array<int> of per-subspace argmin codes (smallest code
    on ties via array_position on the rounded distance array — the same
    engine-portable argmin idiom the IVF quantizer uses)."""
    m = len(cbs)
    sub = dim // m
    code_exprs = []
    for mi, cb in enumerate(cbs):
        darr = ", ".join(f"round({t}, 6)" for t in _pq_dist_terms(emb, cb, mi * sub))
        code_exprs.append(
            f"CAST(array_position(array({darr}), array_min(array({darr}))) - 1 AS INT)"
        )
    return "array(" + ", ".join(code_exprs) + ")"


def _pq_lloyd(sum_rows_fn, cbs0, iters: int):
    """Shared per-subspace Lloyd's loop for PQ codebooks:
    ``sum_rows_fn(cbs)`` returns rows ``(m, code, n, [quantized long
    sums])`` over the current codebooks; means compute HERE in Python so
    the Spark and DuckDB trainers emit identical literals (the exact
    integer sums make both order-independent).  Empty codes keep their
    centroid; a zero mean is fine for L2 codebooks (nothing divides by a
    centroid norm)."""
    cbs = [[list(c) for c in cb] for cb in cbs0]
    for _ in range(int(iters)):
        nxt = [[list(c) for c in cb] for cb in cbs]
        for m, code, n, sums in sum_rows_fn(cbs):
            if n:
                nxt[m][code] = [(s / _TRAIN_QUANT) / n for s in sums]
        cbs = nxt
    return cbs


def train_pq_codebooks(
    df: DataFrame,
    *,
    dim: int = 64,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 3,
    vec_col: str = "embedding",
    cache: str | None = "local",
) -> list[list[list[float]]]:
    """Per-subspace k-means refinement of the PQ codebooks (Lloyd's),
    bit-deterministic like :func:`train_ivf_centroids`: assignments use
    the engine-portable rounded-argmin expression, per-(subspace, code)
    component sums quantize to ``floor(x·1e9)`` BIGINTs, and the mean
    arithmetic runs in shared Python — so
    :func:`train_pq_codebooks_duck` reproduces identical literals and a
    TRAINED PQ index sits inside the driver's hash gate.  One shuffle
    per iteration (≤ m×k groups); driver payload m×k×(dim/m) values.
    ``cache`` as in :func:`train_ivf_centroids` (``"local"`` /
    ``"disk"`` / ``None``) — every mode fits bit-identical literals."""
    sub = dim // m
    # Zero-norm vectors normalize to NaN (0/0) and the engines' NaN
    # handling diverges (Spark CAST(NaN AS BIGINT) = 0, DuckDB = NULL),
    # so BOTH trainers drop them — no direction, no training signal.
    nemb = _cache_train_input(
        # raw-column corrupt-vector screen first (see train_ivf_centroids)
        df.where(_valid_vec_spark(vec_col, None))
        .where(
            F.expr(
                f"aggregate(zip_with({vec_col}, {vec_col}, (p, q) -> CAST(p AS DOUBLE) * q), "
                "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) > 0"
            )
        ).select(
            F.expr(f"{_norm_expr(f'transform({vec_col}, x -> CAST(x AS DOUBLE))')}").alias("_n")
        ),
        cache,
    )

    def sum_rows(cbs):
        # Literal-free relational argmin, the `_pq_encode_relational`
        # plan applied to the trainer: explode (subspace, subvector)
        # rows (a SMALL lambda — `_n` is already the unit vector, bound
        # once WITHOUT re-normalizing, which would perturb last bits and
        # de-sync the trained literals from the DuckDB twin), broadcast-
        # join the m×k codebook TABLE, compute each squared L2 as one
        # tiny codegen expression over joined columns, and take the
        # per-row argmin with the same rounded-(d, k) min_by tiebreak.
        # The previous form embedded all m·k·sub distance terms as
        # LITERALS in one expression — recompiled every iteration, ~14 s
        # of driver codegen per pass at any data size, and evaluated as
        # interpreted HOF per vector (~5× codegen CPU, the measured
        # penalty that moved the ENCODE path relational); the join form
        # compiles a literal-free plan in milliseconds (measured 56.5 s
        # → 9.4 s for the 3-iteration fit at 5k vectors).  Shuffle
        # shape per iteration = one corpus×m-row exchange keyed
        # (_vid, m) — the same shape as `_pq_encode_relational`'s
        # per-vector-id shuffle, traded against the old form's tiny
        # (m, code) partials because interpreted per-vector CPU
        # dominates that saving at any realistic corpus size.
        # Rounded-argmin values are bit-identical, so trained codebooks
        # are unchanged.
        spark = nemb.sparkSession
        cb_rows = [
            (mi, ki, *[float(c) for c in cbs[mi][ki]])
            for mi in range(m)
            for ki in range(k)
        ]
        cb_schema = "m int, k int, " + ", ".join(f"c{d} double" for d in range(sub))
        cb_df = spark.createDataFrame(cb_rows, cb_schema)
        sv_expr = (
            f"aggregate(array(_n), CAST(NULL AS ARRAY<STRUCT<m: INT, sv: ARRAY<DOUBLE>>>), "
            f"(acc, _nv) -> transform(sequence(0, {m - 1}), mi -> "
            f"named_struct('m', CAST(mi AS INT), 'sv', slice(_nv, CAST(mi AS INT) * {sub} + 1, {sub}))))"
        )
        sv_rows = (
            nemb.withColumn("_vid", F.monotonically_increasing_id())
            .select("_vid", F.explode(F.expr(sv_expr)).alias("r"))
            .select("_vid", F.col("r.m").alias("m"), F.col("r.sv").alias("sv"))
        )
        dist = " + ".join(
            f"((sv[{d}] - c{d}) * (sv[{d}] - c{d}))" for d in range(sub)
        )
        rows = (
            sv_rows.join(F.broadcast(cb_df), "m")
            .withColumn("d", F.expr(f"round({dist}, 6)"))
            .groupBy("_vid", "m")
            .agg(
                F.expr("min_by(k, struct(d, k))").alias("code"),
                F.first("sv").alias("sv"),
            )
        )
        agg = (
            rows.groupBy("m", "code")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.expr(f"CAST(floor(sv[{d}] * CAST({_TRAIN_QUANT} AS DOUBLE)) AS BIGINT)")
                    ).alias(f"s{d}")
                    for d in range(sub)
                ],
            )
            .collect()  # ≤ m×k rows
        )
        return [
            (r["m"], r["code"], r["n"], [r[f"s{d}"] for d in range(sub)]) for r in agg
        ]

    return _pq_lloyd(sum_rows, pq_codebooks(m, k, dim), iters)


def train_pq_codebooks_duck(
    con,
    *,
    table: str = "embeddings",
    dim: int = 64,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 3,
) -> list[list[list[float]]]:
    """DuckDB twin of :func:`train_pq_codebooks` — identical assignment
    expressions, identical quantized sums, shared mean loop."""
    sub = dim // m

    def sum_rows(cbs):
        code_exprs = []
        for mi, cb in enumerate(cbs):
            darr = ", ".join(
                f"round({t}, 6)" for t in _pq_dist_terms_duck("nemb", cb, mi * sub)
            )
            code_exprs.append(
                f"CAST(list_position([{darr}], list_min([{darr}])) - 1 AS INTEGER)"
            )
        codes = "[" + ", ".join(code_exprs) + "]"
        scols = ", ".join(
            f"SUM(CAST(floor(sv[{d + 1}] * CAST({_TRAIN_QUANT} AS DOUBLE)) AS BIGINT)) AS s{d}"
            for d in range(sub)
        )
        q = f"""
WITH e AS (
  SELECT {_norm_expr_duck("embedding::DOUBLE[]")} AS nemb FROM {table}
  WHERE {_clean_nonzero_duck("embedding")}),
c AS (SELECT nemb, {codes} AS codes FROM e),
rows AS (
  SELECT t.m AS m, codes[t.m + 1] AS code,
         nemb[t.m * {sub} + 1 : t.m * {sub} + {sub}] AS sv
  FROM c, (SELECT UNNEST(generate_series(0, {m - 1})) AS m) t)
SELECT m, code, COUNT(*) AS n, {scols} FROM rows GROUP BY m, code
"""
        return [(r[0], r[1], r[2], list(r[3:])) for r in con.execute(q).fetchall()]

    return _pq_lloyd(sum_rows, pq_codebooks(m, k, dim), iters)


TRAIN_SAMPLE_N = 16_384  # default bounded training-sample size


def training_sample(
    df: DataFrame,
    *,
    sample_n: int = TRAIN_SAMPLE_N,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "np.ndarray":
    """Deterministic bounded training sample for quantizer fits (the
    FAISS doctrine: k-means never sees the full corpus — it trains on a
    size-capped sample and the index SCANS the corpus once to encode).

    Selection is the ``sample_n`` rows with the smallest
    ``(md5(CAST(id AS STRING)), id)`` — a hash-rank, so the sample is a
    uniform draw that is (a) independent of partitioning and row order,
    (b) reproducible from the data alone, and (c) identical in any
    engine that agrees on md5 of the id's decimal string (DuckDB does:
    :func:`training_sample_duck` fetches the same rows).  Spark executes
    it as TakeOrderedAndProject — a distributed partial top-N, ONE
    corpus scan, no global sort shuffle — so at 10⁹ vectors the fit
    costs one scan plus a driver-local Lloyd over ≤ ``sample_n``
    vectors (~sample_n×dim×8 bytes; 8 MiB at the 16k default), instead
    of ``iters`` full-corpus assignment passes.

    Zero-norm vectors (no direction) and NULL ids (no stable hash rank)
    are excluded.  Rows come back sorted by id so downstream local math
    is order-canonical.  Returns an (n, dim) float64 array; vectors are
    exact float→double widenings of the stored values, so both engines'
    samples are bit-identical.
    """
    import numpy as np

    rows = (
        df.where(
            F.expr(
                f"aggregate(zip_with({vec_col}, {vec_col}, (p, q) -> CAST(p AS DOUBLE) * q), "
                "CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) > 0"
            )
        )
        # non-finite elements excluded from the fit: inf passes the
        # dot > 0 screen but poisons the local Lloyd shared by both
        # engines (see _valid_vec_spark)
        .where(
            F.expr(
                f"NOT exists({vec_col}, x -> isnan(CAST(x AS DOUBLE)) "
                f"OR abs(CAST(x AS DOUBLE)) = CAST('Infinity' AS DOUBLE))"
            )
        )
        .where(F.col(id_col).isNotNull())
        .select(
            F.col(id_col).alias("_vid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("_v"),
            F.md5(F.col(id_col).cast("string")).alias("_h"),
        )
        .orderBy("_h", "_vid")
        .limit(int(sample_n))
        .collect()  # ≤ sample_n rows — bounded by design, corpus-size independent
    )
    rows.sort(key=lambda r: r["_vid"])
    if not rows:
        return np.zeros((0, 0), dtype=np.float64)
    return np.array([r["_v"] for r in rows], dtype=np.float64)


def training_sample_duck(
    con,
    *,
    table: str = "embeddings",
    sample_n: int = TRAIN_SAMPLE_N,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "np.ndarray":
    """DuckDB twin of :func:`training_sample` — same hash-rank selection
    (md5 of the id's decimal string renders identically), same zero-norm
    and NULL-id exclusions, same id-sorted float64 result — so both
    engines hand the SAME array to the shared local fit."""
    import numpy as np

    rows = con.execute(
        f"""
SELECT {id_col} AS vid, {vec_col}::DOUBLE[] AS v
FROM {table}
WHERE (CASE WHEN {vec_col} IS NULL THEN FALSE
            WHEN len(list_filter({vec_col}, x -> x IS NULL
                     OR isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE)))) > 0
              THEN FALSE
            ELSE list_dot_product({vec_col}::DOUBLE[], {vec_col}::DOUBLE[]) > 0 END)
  AND {id_col} IS NOT NULL
ORDER BY md5({id_col}::VARCHAR), {id_col}
LIMIT {int(sample_n)}
"""
    ).fetchall()
    rows.sort(key=lambda r: r[0])
    if not rows:
        return np.zeros((0, 0), dtype=np.float64)
    return np.array([list(r[1]) for r in rows], dtype=np.float64)


def fit_ivf_centroids_local(
    sample: "np.ndarray",
    *,
    nlist: int = N_LISTS,
    dim: int = 64,
    iters: int = 3,
) -> list[list[float]]:
    """Driver-local spherical-k-means over a BOUNDED training sample
    (pair with :func:`training_sample`).  Same init
    (:func:`default_centroids`), same floor-quantized integer-sum mean
    arithmetic (reuses :func:`_lloyd_refine`), but assignment runs in
    numpy on the sample instead of as ``iters`` distributed corpus
    passes.  Engine parity is structural: both the Spark and DuckDB
    paths call THIS function on bit-identical samples, so the fitted
    literals are identical by construction.  Empty sample (or a cluster
    with no members) keeps the previous centroid, matching the
    distributed trainer's convention."""
    import numpy as np

    if sample.size and sample.shape[1] != dim:
        raise ValueError(
            f"training sample has dim {sample.shape[1]}, expected {dim}"
        )

    def sum_rows(cs):
        if not sample.size:
            return []
        c = np.asarray(cs, dtype=np.float64)
        norms = np.sqrt((c * c).sum(axis=1))
        # assignment = argmax cos = argmax dot/|c| (|v| is a shared
        # factor); ties break to the first (lowest) list, like the
        # distributed trainer's array_position-of-max.
        assign = (sample @ c.T / norms).argmax(axis=1)
        q = np.floor(sample * float(_TRAIN_QUANT)).astype(np.int64)
        out = []
        for list_id in np.unique(assign):
            sel = q[assign == list_id]
            out.append(
                (
                    int(list_id),
                    int(sel.shape[0]),
                    [int(s) for s in sel.sum(axis=0)],
                )
            )
        return out

    return _lloyd_refine(sum_rows, nlist, dim, iters)


def fit_pq_codebooks_local(
    sample: "np.ndarray",
    *,
    dim: int = 64,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 3,
) -> list[list[list[float]]]:
    """Driver-local per-subspace k-means for PQ codebooks over a BOUNDED
    training sample (pair with :func:`training_sample`).  Vectors are
    L2-normalized (as in :func:`train_pq_codebooks`), assignment is
    squared-L2 argmin with first-min (lowest code) tiebreak — the
    ``min_by(k, struct(d, k))`` convention — and means use the shared
    floor-quantized integer sums via :func:`_pq_lloyd`.  Both engines
    call THIS function on bit-identical samples, so trained codebooks
    stay inside the driver's hash gate."""
    import numpy as np

    if sample.size and sample.shape[1] != dim:
        raise ValueError(
            f"training sample has dim {sample.shape[1]}, expected {dim}"
        )
    sub = dim // m
    if sample.size:
        nemb = sample / np.sqrt((sample * sample).sum(axis=1, keepdims=True))
    else:
        nemb = sample

    def sum_rows(cbs):
        if not nemb.size:
            return []
        out = []
        for mi in range(m):
            sv = nemb[:, mi * sub : (mi + 1) * sub]
            cb = np.asarray(cbs[mi], dtype=np.float64)
            d2 = ((sv[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            q = np.floor(sv * float(_TRAIN_QUANT)).astype(np.int64)
            for code in np.unique(assign):
                sel = q[assign == code]
                out.append(
                    (
                        mi,
                        int(code),
                        int(sel.shape[0]),
                        [int(s) for s in sel.sum(axis=0)],
                    )
                )
        return out

    return _pq_lloyd(sum_rows, pq_codebooks(m, k, dim), iters)


def train_ivf_centroids_sampled(
    df: DataFrame,
    *,
    nlist: int = N_LISTS,
    dim: int = 64,
    iters: int = 3,
    sample_n: int = TRAIN_SAMPLE_N,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Sample-bounded IVF quantizer fit: ONE corpus scan (hash-rank
    top-N) + a driver-local Lloyd over ≤ ``sample_n`` vectors.  The
    100 TB-correct trainer — cost is independent of corpus size — and
    the default for the trained gate paths.  Use
    :func:`train_ivf_centroids` when the fit must see every vector."""
    return fit_ivf_centroids_local(
        training_sample(df, sample_n=sample_n, vec_col=vec_col, id_col=id_col),
        nlist=nlist,
        dim=dim,
        iters=iters,
    )


def train_ivf_centroids_sampled_duck(
    con,
    *,
    table: str = "embeddings",
    nlist: int = N_LISTS,
    dim: int = 64,
    iters: int = 3,
    sample_n: int = TRAIN_SAMPLE_N,
) -> list[list[float]]:
    """DuckDB twin of :func:`train_ivf_centroids_sampled` (same sample,
    same local fit → identical literals)."""
    return fit_ivf_centroids_local(
        training_sample_duck(con, table=table, sample_n=sample_n),
        nlist=nlist,
        dim=dim,
        iters=iters,
    )


def train_pq_codebooks_sampled(
    df: DataFrame,
    *,
    dim: int = 64,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 3,
    sample_n: int = TRAIN_SAMPLE_N,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """Sample-bounded PQ codebook fit: ONE corpus scan + driver-local
    per-subspace Lloyd over ≤ ``sample_n`` vectors.  See
    :func:`train_ivf_centroids_sampled` for the doctrine."""
    return fit_pq_codebooks_local(
        training_sample(df, sample_n=sample_n, vec_col=vec_col, id_col=id_col),
        dim=dim,
        m=m,
        k=k,
        iters=iters,
    )


def train_pq_codebooks_sampled_duck(
    con,
    *,
    table: str = "embeddings",
    dim: int = 64,
    m: int = PQ_M,
    k: int = PQ_K,
    iters: int = 3,
    sample_n: int = TRAIN_SAMPLE_N,
) -> list[list[list[float]]]:
    """DuckDB twin of :func:`train_pq_codebooks_sampled`."""
    return fit_pq_codebooks_local(
        training_sample_duck(con, table=table, sample_n=sample_n),
        dim=dim,
        m=m,
        k=k,
        iters=iters,
    )


def pq_encode_oracle(
    table: str = "embeddings",
    *,
    dim: int = 64,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`pq_encode`, codes emitted as a
    comma-joined string (engine-portable; the driver's value hash can't
    compare raw array columns)."""
    cbs = codebooks if codebooks is not None else pq_codebooks(dim=dim)
    sub = dim // len(cbs)
    code_exprs = []
    for mi, cb in enumerate(cbs):
        darr = ", ".join(
            f"round({t}, 6)" for t in _pq_dist_terms_duck("nemb", cb, mi * sub)
        )
        code_exprs.append(
            f"CAST(list_position([{darr}], list_min([{darr}])) - 1 AS INTEGER)"
        )
    codes = "[" + ", ".join(code_exprs) + "]"
    return f"""
WITH e AS (
  SELECT {id_col}, {_norm_expr_duck("embedding::DOUBLE[]")} AS nemb FROM {table}
  WHERE {_clean_nonzero_duck("embedding")})
SELECT {id_col}, array_to_string({codes}, ',') AS pq_code FROM e
"""


def knn_ivf_pq(
    df: DataFrame,
    *,
    query_ids: Sequence[int],
    k: int = 10,
    dim: int = 64,
    nprobe: int = 4,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    centroids: Sequence[Sequence[float]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ approximate top-k: IVF coarse lists bound the candidates,
    PQ codes + a per-query lookup table give O(M) asymmetric distance
    computation (ADC) per candidate instead of O(dim).

    Scale story (the FAISS IVF-PQ shape): the corpus carries only
    (list_id, codes[M]) — M bytes/vector — so the candidate scan reads
    ~dim/M× less data and each distance is M array lookups + adds.  The
    query side precomputes lut[m·K + k] = ||q_m − c_{m,k}||² (M×K doubles
    per query, broadcast with the probes); approx dist =
    Σ_m lut[m·K + codes_m].  Ranking: (rounded adist asc, neighbor id) —
    engine-portable; exact re-ranking of the top candidates is the
    standard refinement and is what ``knn_brute`` provides.

    Output: (query_id, neighbor_id, adist, rank).
    """
    cbs = codebooks if codebooks is not None else pq_codebooks(dim=dim)
    m = len(cbs)
    sub = dim // m
    kk = len(cbs[0])
    nlist = len(centroids) if centroids is not None else N_LISTS
    if not 1 <= nprobe <= nlist:
        raise ValueError(f"nprobe must be in [1, {nlist}]")

    sarr = _score_array_spark("emb", dim, centroids)
    # zero-norm vectors excluded (cosine/PQ undefined; see knn_brute)
    # Small inputs fan out before the quantizer + encode chain (serial
    # on a one-task scan otherwise); no-op at real scale.
    e = (
        fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, None))
        .select(
            F.col(id_col).alias("nid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .where(F.expr("aggregate(zip_with(emb, emb, (p, q) -> p * q), CAST(0.0 AS DOUBLE), (acc, z) -> acc + z) > 0"))
        .withColumn("_sarr", F.expr(sarr))
        .withColumn(
            # non-nullable (see knn_ivf): stops the list_id equi-join from
            # inferring an isnotnull filter that re-evaluates the quantizer
            "list_id",
            F.coalesce(
                F.expr("array_position(_sarr, array_max(_sarr)) - 1").cast("int"),
                F.lit(-1),
            ),
        )
    )
    # `e` feeds the PQ-encode corpus side AND the query/probe side, so
    # the plan carries the nlist×dim quantizer fold twice — driver
    # analysis of that doubled literal tree dominates this query's cost
    # (the r12 plan-size finding).  Materialize once under the adaptive
    # threshold (see knn_ivf); no-op at real scale.
    from simple_tsdb_spark.functions.adaptive import materialize_small

    e = materialize_small(e)
    # codes via the relational codegen encode, list_id carried through the
    # same pipeline — one vector-id-keyed shuffle, no corpus self-join;
    # the probe join's corpus side carries only (nid, list_id, codes).
    corpus = _pq_encode_relational(
        e.drop("_sarr").withColumnRenamed("nid", "_pqid"), cbs, dim, carry=("list_id",)
    ).withColumnRenamed("_pqid", "nid")

    # LUT as one nested codebook literal + HOF instead of m·K expanded
    # round(...) terms: each centroid value appears ONCE (the expanded
    # form repeated it twice per squared diff), cutting the expression
    # text ~4x and the driver's per-run analysis cost with it (VERDICT
    # r12 #6: knn_ivf_pq's bench cost is plan-size-bound driver work,
    # not executor math).  Evaluated only on the tiny probes side
    # (n_queries x nprobe rows), so interpreted-HOF speed is irrelevant.
    # Bit-exactness: aggregate's fold is ((0.0+t0)+t1)+... and every
    # t_i is a square >= 0, so the sums match the expanded form's
    # left-assoc addition bit-for-bit and the DuckDB oracle stays
    # hash-identical.
    cb_lit = "array(" + ", ".join(
        "array(" + ", ".join(
            "array(" + ", ".join(f"CAST({c[d]!r} AS DOUBLE)" for d in range(sub)) + ")"
            for c in cb
        ) + ")"
        for cb in cbs
    ) + ")"
    lut_bound = (
        f"aggregate(array({_norm_expr('qemb')}), CAST(NULL AS ARRAY<DOUBLE>), "
        f"(acc, _nv) -> flatten(transform(sequence(0, {m - 1}), mi -> "
        f"transform(element_at({cb_lit}, mi + 1), c -> "
        f"round(aggregate(zip_with(slice(_nv, mi * {sub} + 1, {sub}), c, "
        f"(p, q) -> (p - q) * (p - q)), CAST(0.0 AS DOUBLE), (a, z) -> a + z), 6)))))"
    )
    qlists = e.where(F.col("nid").isin(list(query_ids))).select(
        F.col("nid").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.posexplode("_sarr").alias("list_id", "s"),
    )
    pw = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("list_id"))
    probes = (
        qlists.withColumn("prank", F.row_number().over(pw))
        .where(F.col("prank") <= nprobe)
        .select(
            "query_id",
            F.expr(lut_bound).alias("lut"),
            "list_id",
        )
    )
    adist = " + ".join(
        f"element_at(lut, {mi} * {kk} + codes[{mi}] + 1)" for mi in range(m)
    )
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .where(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.expr(adist).alias("adist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def knn_ivf_pq_oracle(
    table: str = "embeddings",
    *,
    query_ids: Sequence[int] = (),
    k: int = 10,
    dim: int = 64,
    nprobe: int = 4,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    centroids: Sequence[Sequence[float]] | None = None,
) -> str:
    cbs = codebooks if codebooks is not None else pq_codebooks(dim=dim)
    m = len(cbs)
    sub = dim // m
    kk = len(cbs[0])
    ids = ", ".join(str(i) for i in query_ids)

    code_exprs = []
    for mi, cb in enumerate(cbs):
        darr = ", ".join(f"round({t}, 6)" for t in _pq_dist_terms_duck("nemb", cb, mi * sub))
        code_exprs.append(
            f"CAST(list_position([{darr}], list_min([{darr}])) - 1 AS INTEGER)"
        )
    codes = "[" + ", ".join(code_exprs) + "]"
    lut_terms = []
    for mi, cb in enumerate(cbs):
        lut_terms += [f"round({t}, 6)" for t in _pq_dist_terms_duck("qnemb", cb, mi * sub)]
    lut = "[" + ", ".join(lut_terms) + "]"
    adist = " + ".join(f"lut[{mi} * {kk} + codes[{mi + 1}] + 1]" for mi in range(m))
    return f"""
WITH e0 AS (
  SELECT vec_id AS nid, embedding::DOUBLE[] AS emb,
         {_norm_expr_duck("embedding::DOUBLE[]")} AS nemb,
         {_score_array_duck("embedding::DOUBLE[]", dim, centroids)} AS sarr
  FROM {table}
  WHERE {_clean_nonzero_duck("embedding")}),
e AS (
  SELECT nid, emb, nemb, sarr,
         CAST(list_position(sarr, list_max(sarr)) - 1 AS INTEGER) AS list_id
  FROM e0),
corpus AS (SELECT nid, list_id, {codes} AS codes FROM e),
q AS (SELECT nid AS query_id, nemb AS qnemb, sarr FROM e WHERE nid IN ({ids})),
qscore AS (
  SELECT query_id,
         CAST(generate_subscripts(sarr, 1) - 1 AS INTEGER) AS list_id,
         UNNEST(sarr) AS s
  FROM q),
probes AS (
  SELECT query_id, list_id FROM (
    SELECT query_id, list_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, list_id) AS prank
    FROM qscore)
  WHERE prank <= {nprobe}),
q2 AS (SELECT q.query_id, {lut} AS lut, probes.list_id
       FROM q JOIN probes ON q.query_id = probes.query_id),
scored AS (
  SELECT q2.query_id, corpus.nid AS neighbor_id, {adist} AS adist
  FROM corpus JOIN q2 USING (list_id) WHERE corpus.nid <> q2.query_id),
ranked AS (
  SELECT query_id, neighbor_id, adist,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adist ASC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, adist, rank FROM ranked WHERE rank <= {k}
"""


def knn_ivf(
    df: DataFrame,
    *,
    query_ids: Sequence[int],
    k: int = 10,
    dim: int = 64,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Sequence[Sequence[float]] | None = None,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer.

    Corpus assignment is the argmax quantizer score (smallest list id on
    ties) — a single projection, so the corpus's only movement is the
    shuffle-join on list_id.  Queries rank all list scores and probe the
    top ``nprobe`` (ranking window over queries × lists — tiny).
    Output: (query_id, neighbor_id, cos, rank), dedup-free by
    construction (each corpus vector lives in exactly one list).
    ``centroids`` overrides the deterministic default table — pass
    :func:`train_ivf_centroids` output for a k-means-refined quantizer
    (same literals go to the oracle, so it stays hash-checkable).
    """
    nlist = len(centroids) if centroids is not None else N_LISTS
    if not 1 <= nprobe <= nlist:
        raise ValueError(f"nprobe must be in [1, {nlist}]")
    sarr = _score_array_spark("emb", dim, centroids)
    # corrupt vectors screened on the raw column (see knn_brute) — pushed
    # to the scan, never inlining the quantizer fold
    escore = fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, None)).select(
        F.col(id_col).alias("nid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
    ).withColumn("_sarr", F.expr(sarr))
    # argmax with smallest-list-id tiebreak: first position of the max.
    # COALESCE(..., -1) makes list_id non-nullable: otherwise the list_id
    # equi-join infers an isnotnull(list_id) filter that inlines the whole
    # nlist×dim quantizer fold a SECOND time per corpus row (a 53KB Filter
    # node under the Project).  -1 never matches a probe, so semantics are
    # unchanged.
    e = (
        escore.withColumn(
            "list_id",
            F.coalesce(
                F.expr("array_position(_sarr, array_max(_sarr)) - 1").cast("int"),
                F.lit(-1),
            ),
        )
        .withColumn("nrm", _norm("emb"))
        # zero-norm vectors excluded (cosine undefined; see knn_brute)
        .where(F.col("nrm") > 0)
    )
    # Both the query side and the corpus side consume `e`, so the plan
    # carries the nlist×dim quantizer fold (a ~30 KB literal expression
    # tree) TWICE — the query's cost is dominated by the driver
    # analyzing/optimizing that doubled tree, not executor math (the
    # r12 plan-size finding).  Under the adaptive threshold materialize
    # `e` once: one optimization pass over the big tree, one quantizer
    # evaluation over the corpus, small downstream plans.  No-op at
    # real scale, where the audited single-plan shape stands.
    from simple_tsdb_spark.functions.adaptive import materialize_small

    e = materialize_small(e)
    qlists = (
        e.where(F.col("nid").isin(list(query_ids)))
        .select(
            F.col("nid").alias("query_id"), F.col("emb").alias("qemb"),
            F.col("nrm").alias("qnrm"),
            F.posexplode("_sarr").alias("list_id", "s"),
        )
    )
    pw = Window.partitionBy("query_id").orderBy(F.col("s").desc(), F.col("list_id"))
    probes = (
        qlists.withColumn("prank", F.row_number().over(pw))
        .where(F.col("prank") <= nprobe)
        .select("query_id", "qemb", "qnrm", "list_id")
    )
    corpus = e.drop("_sarr")
    scored = (
        corpus.join(F.broadcast(probes), "list_id")
        .where(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            _cos_prenorm("qemb", "emb", "qnrm", "nrm").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def knn_ivf_oracle(
    table: str = "embeddings", *, query_ids: Sequence[int] = (), k: int = 10,
    dim: int = 64, nprobe: int = 4,
    centroids: Sequence[Sequence[float]] | None = None,
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = _COS_DUCK.format(a="q2.qemb", b="e.emb")
    return f"""
WITH e0 AS (
  SELECT vec_id AS nid, embedding::DOUBLE[] AS emb,
         {_score_array_duck("embedding::DOUBLE[]", dim, centroids)} AS sarr
  FROM {table}
  WHERE {_clean_nonzero_duck("embedding")}),
e AS (
  SELECT nid, emb, sarr,
         CAST(list_position(sarr, list_max(sarr)) - 1 AS INTEGER) AS list_id
  FROM e0),
q AS (SELECT nid AS query_id, emb AS qemb, sarr FROM e WHERE nid IN ({ids})),
qscore AS (
  SELECT query_id,
         CAST(generate_subscripts(sarr, 1) - 1 AS INTEGER) AS list_id,
         UNNEST(sarr) AS s
  FROM q),
probes AS (
  SELECT query_id, list_id FROM (
    SELECT query_id, list_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, list_id) AS prank
    FROM qscore)
  WHERE prank <= {nprobe}),
q2 AS (SELECT q.query_id, q.qemb, probes.list_id
       FROM q JOIN probes ON q.query_id = probes.query_id),
scored AS (
  SELECT q2.query_id, e.nid AS neighbor_id, {cos} AS cos
  FROM e JOIN q2 USING (list_id) WHERE e.nid <> q2.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {k}
"""


def kmeans_clusters(
    df: DataFrame,
    *,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Sequence[Sequence[float]] | None = None,
) -> DataFrame:
    """Per-cluster profile of the corpus under the (optionally trained)
    coarse quantizer — the "topic clustering" read-out a curation
    pipeline uses to inspect corpus composition before mixture design
    (what SemDeDup/SSL-prototype pruning cluster on).

    Output one row per non-empty cluster: ``(cluster, n_vecs, sum_cos,
    min_id, max_id)`` where ``sum_cos`` accumulates each member's
    rounded centroid cosine in DECIMAL(28,6) (order-independent exact
    sum, cast to double at the end — the engine's ``exact=True`` trick)
    so the result is bit-identical across engines and partitionings.

    At 100 TB: assignment is the same single-projection argmax the IVF
    read path uses (no data movement), followed by ONE map-side-combined
    aggregate on ≤ nlist keys; nothing corpus-sized ever shuffles or
    broadcasts.  Pass ``centroids`` from :func:`train_ivf_centroids`
    (nlist ~ √N) for data-fitted clusters at scale.
    """
    sarr = _score_array_spark("emb", dim, centroids)
    # corrupt vectors (NULL / wrong length / NULL-NaN elements) belong to
    # no cluster — raw-column screen, pushed to the scan
    e = (
        fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, dim))
        .select(
            F.col(id_col).alias("vid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .withColumn("_sarr", F.expr(sarr))
        .select(
            F.col("vid"),
            F.expr("CAST(array_position(_sarr, array_max(_sarr)) - 1 AS INT)").alias(
                "cluster"
            ),
            F.expr("array_max(_sarr)").alias("_cos"),
        )
    )
    return (
        e.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("_cos").cast("decimal(18,6)")).cast("double").alias("sum_cos"),
            F.min("vid").alias("min_id"),
            F.max("vid").alias("max_id"),
        )
        .orderBy("cluster")
    )


def kmeans_clusters_oracle(
    table: str = "embeddings",
    *,
    dim: int = 64,
    centroids: Sequence[Sequence[float]] | None = None,
) -> str:
    return f"""
WITH e0 AS (
  SELECT vec_id AS vid,
         {_score_array_duck("embedding::DOUBLE[]", dim, centroids)} AS sarr
  FROM {table}
  WHERE {_valid_vec_duck("embedding", dim)}),
e AS (
  SELECT vid,
         CAST(list_position(sarr, list_max(sarr)) - 1 AS INTEGER) AS cluster,
         list_max(sarr) AS _cos
  FROM e0)
SELECT cluster, COUNT(*) AS n_vecs,
       CAST(SUM(CAST(_cos AS DECIMAL(18,6))) AS DOUBLE) AS sum_cos,
       MIN(vid) AS min_id, MAX(vid) AS max_id
FROM e GROUP BY cluster ORDER BY cluster
"""


def cluster_prune(
    df: DataFrame,
    *,
    k: int,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: Sequence[Sequence[float]] | None = None,
    salts: int = 32,
) -> DataFrame:
    """Cluster-balanced coreset selection (the SSL-prototypes pruning
    rule of Sorscher et al. 2022, arXiv:2206.14486): keep the ``k``
    HARDEST examples per quantizer cluster — lowest centroid cosine =
    farthest from its prototype, the examples that carry the most
    marginal information; easy near-prototype duplicates are dropped.
    Output ``(cluster, vec_id, cos, rk)`` for kept vectors.

    Keep rule: cos ASC, id ASC tiebreak — fully deterministic.

    At 100 TB: assignment is the read path's argmax projection (no
    movement); ranking reuses the salted two-stage idiom
    (``curation.domain_topk``) so a giant cluster cannot pin one task —
    stage 1 ranks within (cluster, salt) and keeps ≤ k rows per salt,
    stage 2 ranks the ≤ salts·k survivors exactly.  With nlist ~ √N
    trained centroids the output is nlist·k rows — coreset-sized.
    """
    from pyspark.sql import Window

    sarr = _score_array_spark("emb", dim, centroids)
    # corrupt vectors carry no prototype distance — raw-column screen.
    # NO small-input fan-out here (unlike the rest of the family): the
    # salted two-stage rank below immediately re-shuffles on
    # (cluster, _salt), so a fan-out exchange is pure overhead —
    # measured 0.76x at sf0.1 (r14 A/B).
    e = (
        df.where(_valid_vec_spark(vec_col, dim))
        .select(
            F.col(id_col).alias("vid"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .withColumn("_sarr", F.expr(sarr))
        .select(
            "vid",
            F.expr("CAST(array_position(_sarr, array_max(_sarr)) - 1 AS INT)").alias(
                "cluster"
            ),
            F.expr("array_max(_sarr)").alias("cos"),
        )
        .withColumn("_salt", F.pmod(F.xxhash64(F.col("vid")), F.lit(int(salts))))
    )
    order = [F.col("cos").asc(), F.col("vid").asc()]
    w1 = Window.partitionBy("cluster", "_salt").orderBy(*order)
    survivors = (
        e.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= int(k))
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("cluster").orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= int(k))
        .select("cluster", F.col("vid").alias(id_col), "cos", "rk")
        .orderBy("cluster", "rk")
    )


def cluster_prune_oracle(
    table: str = "embeddings",
    *,
    k: int,
    dim: int = 64,
    centroids: Sequence[Sequence[float]] | None = None,
) -> str:
    return f"""
WITH e0 AS (
  SELECT vec_id,
         {_score_array_duck("embedding::DOUBLE[]", dim, centroids)} AS sarr
  FROM {table}
  WHERE {_valid_vec_duck("embedding", dim)}),
e AS (
  SELECT vec_id,
         CAST(list_position(sarr, list_max(sarr)) - 1 AS INTEGER) AS cluster,
         list_max(sarr) AS cos
  FROM e0),
ranked AS (
  SELECT cluster, vec_id, cos,
         ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY cos ASC, vec_id ASC) AS rk
  FROM e)
SELECT cluster, vec_id, cos, rk FROM ranked WHERE rk <= {k}
ORDER BY cluster, rk
"""


# -- Johnson–Lindenstrauss random projection --------------------------------


def rp_signs(in_dim: int = 64, out_dim: int = 16, salt: str = "rp-v1") -> list[list[float]]:
    """Deterministic ±1 projection matrix (Achlioptas sign form) from a
    salted md5 parity — reproducible across engines/processes, re-salt
    for a fresh draw.  out_dim × in_dim."""
    import hashlib

    return [
        [
            1.0
            if int(hashlib.md5(f"{salt}:{i}:{j}".encode()).hexdigest()[:15], 16) % 2 == 0
            else -1.0
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def rp_project(
    df: DataFrame,
    *,
    out_dim: int = 16,
    in_dim: int = 64,
    salt: str = "rp-v1",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project each
    embedding onto ``out_dim`` deterministic ±1 sign vectors and scale
    by ``1/√out_dim`` — (vec_id, j, val), one row per output
    coordinate.  JL: pairwise distances are preserved within ε for
    out_dim = O(ln N / ε²), so this is the standard cheapening step
    ahead of brute-force / IVF search over wide embeddings.

    The sign matrix is built ONCE in the driver (``rp_signs``) and
    compiled as literal arrays — no per-row hashing — so the projection
    is a single embarrassingly parallel codegen scan: no shuffle, no
    join, no UDF.  The fold is a sequential left-fold in both engines,
    making every output double BIT-IDENTICAL to the DuckDB oracle
    (verified by the driver's value hash).
    """
    return df.select(
        F.col(id_col),
        F.posexplode(F.expr(_rp_proj_expr(vec_col, in_dim, out_dim, salt))).alias(
            "j", "val"
        ),
    )


def rp_project_oracle(
    table: str = "embeddings",
    *,
    out_dim: int = 16,
    in_dim: int = 64,
    salt: str = "rp-v1",
) -> str:
    import math

    signs = rp_signs(in_dim, out_dim, salt)
    scale = 1.0 / math.sqrt(out_dim)
    values = ",\n  ".join(
        "(" + str(j) + ", [" + ", ".join(repr(s) for s in row) + "])"
        for j, row in enumerate(signs)
    )
    return f"""
SELECT vec_id, j,
       list_reduce(
         list_transform(generate_series(1, {int(in_dim)}),
                        i -> CAST(embedding[i] AS DOUBLE) * s[i]),
         (a, b) -> a + b) * {scale!r} AS val
FROM {table}, (VALUES
  {values}) t(j, s)
"""


def _rp_proj_expr(vec_col: str, in_dim: int, out_dim: int, salt: str) -> str:
    """Spark SQL fragment: the literal-matrix JL projection as an
    array<double> of length ``out_dim`` (shared by rp_project/knn_rp)."""
    import math

    signs = rp_signs(in_dim, out_dim, salt)
    scale = 1.0 / math.sqrt(out_dim)
    arrs = ", ".join(
        "array(" + ", ".join(f"{s!r}D" for s in row) + ")" for row in signs
    )
    return (
        f"transform(array({arrs}), s -> "
        f"aggregate(zip_with({vec_col}, s, (x, w) -> CAST(x AS DOUBLE) * w), "
        f"0.0D, (a, b) -> a + b) * {scale!r}D)"
    )


def knn_rp(
    df: DataFrame,
    *,
    query_ids: Sequence[int],
    k: int = 10,
    out_dim: int = 16,
    overfetch: int = 4,
    in_dim: int = 64,
    salt: str = "rp-v1",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Two-stage ANN via JL projection: stage 1 ranks every corpus
    vector against each query by cosine in the ``out_dim``-dim
    projection (``in_dim/out_dim``× less arithmetic per pair) and keeps
    the top ``k·overfetch`` candidates; stage 2 re-ranks ONLY those
    candidates by exact cosine in the original space.  The classic
    coarse-retrieve → exact-rerank shape: at 10⁹×Q pairs the stage-1
    scan dominates and runs 4× cheaper at the defaults, while stage 2
    touches Q·k·overfetch vectors — noise.

    Output (query_id, neighbor_id, cos, rank) like knn_brute — ``cos``
    is the EXACT original-space cosine.  Deterministic and
    engine-portable: the projected values are bit-identical folds, so
    the stage-1 candidate set matches the oracle exactly.

    Plan shape: queries broadcast twice (projected then raw, both
    Q-sized); candidates broadcast into the re-rank join — the corpus
    is scanned twice, never shuffled or broadcast.
    """
    proj = _rp_proj_expr(vec_col, in_dim, out_dim, salt)
    # Corrupt vectors (NULL / NULL-NaN-±inf elements) screened ONCE on
    # the raw column for both stages: the predicate references only
    # vec_col, so it pushes to the scan WITHOUT inlining the projection
    # fold (unlike a pnrm filter, below).  Without it a NaN projected
    # cosine survives the CASE guard (NaN is not NULL) and ranks first
    # under DESC in both engines — r11 ADVICE.
    df = fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, None))
    # Zero-norm PROJECTED vectors are excluded from stage 1 (cosine
    # undefined; covers zero inputs and sign-cancelled projections; see
    # knn_brute) — but NOT with a `pnrm > 0` pre-filter: Catalyst pushes
    # that predicate through the projection by inlining the whole
    # out_dim×in_dim fold into the Filter, evaluating it TWICE per corpus
    # row (measured 2× stage-1 cost).  Instead the guard rides the cosine
    # as a CASE (a projection — nothing to push down), NULL for excluded
    # rows, and NULLs drop after the top-k window where _pcos is already
    # materialized past the exchange.  NULLS LAST (Spark's DESC default,
    # and DuckDB's) keeps the non-null candidate ranks identical to the
    # oracle's HAVING-filtered ranking.
    ep = df.select(F.col(id_col).alias("nid"), F.expr(proj).alias("pv")).withColumn(
        "pnrm", _norm("pv")
    )
    qp = ep.where(F.col("nid").isin(list(query_ids))).select(
        F.col("nid").alias("query_id"),
        F.col("pv").alias("qpv"),
        F.col("pnrm").alias("qpnrm"),
    )
    cand = (
        ep.crossJoin(F.broadcast(qp))
        .where(F.col("nid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            F.when(
                (F.col("pnrm") > 0) & (F.col("qpnrm") > 0),
                F.round(_cos_prenorm("qpv", "pv", "qpnrm", "pnrm"), 6),
            ).alias("_pcos"),
        )
    )
    w1 = Window.partitionBy("query_id").orderBy(F.col("_pcos").desc(), F.col("neighbor_id"))
    cand = (
        cand.withColumn("_crk", F.row_number().over(w1))
        .where((F.col("_crk") <= int(k) * int(overfetch)) & F.col("_pcos").isNotNull())
        .select("query_id", "neighbor_id")
    )

    # Stage 2: every candidate already has nonzero norms (zero exact norm
    # implies a zero projection, excluded above), so the CASE guard here
    # is pure NULL/NaN-input safety — same no-pushdown shape as stage 1.
    e = df.select(
        F.col(id_col).alias("nid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
    ).withColumn("nrm", _norm("emb"))
    q = e.where(F.col("nid").isin(list(query_ids))).select(
        F.col("nid").alias("query_id"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    rescored = (
        e.join(F.broadcast(cand), e.nid == cand.neighbor_id)
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                (F.col("nrm") > 0) & (F.col("qnrm") > 0),
                _cos_prenorm("qemb", "emb", "qnrm", "nrm"),
            ).alias("cos"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where((F.col("rank") <= int(k)) & F.col("cos").isNotNull())
        .orderBy("query_id", "rank")
    )


def knn_rp_oracle(
    table: str = "embeddings",
    *,
    query_ids: Sequence[int] = (),
    k: int = 10,
    out_dim: int = 16,
    overfetch: int = 4,
    in_dim: int = 64,
    salt: str = "rp-v1",
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    # project from a pre-screened src CTE — the Spark side screens the
    # raw column once ahead of BOTH stages (see knn_rp)
    inner = rp_project_oracle("src", out_dim=out_dim, in_dim=in_dim, salt=salt).strip()
    pcos = _COS_DUCK.format(a="qp.pv", b="p.pv")
    cos = _COS_DUCK.format(a="q.emb", b="e.emb")
    return f"""
WITH src AS (SELECT * FROM {table} WHERE {_valid_vec_duck("embedding", None)}),
prj AS ({inner}),
p AS (SELECT vec_id AS nid, list(val ORDER BY j) AS pv FROM prj
      -- corrupt source vectors project every val to NULL (a NULL vector
      -- or NULL element poisons all out-dims), so the row filter removes
      -- the whole group before list() can build a NULL-bearing list that
      -- list_dot_product would raise on (CASE guards around aggregates
      -- evaluate eagerly in DuckDB — tested)
      WHERE val IS NOT NULL
      GROUP BY vec_id
      HAVING list_dot_product(list(val ORDER BY j), list(val ORDER BY j)) > 0),
qp AS (SELECT nid AS query_id, pv FROM p WHERE nid IN ({ids})),
cand0 AS (
  SELECT qp.query_id, p.nid AS neighbor_id, round({pcos}, 6) AS _pcos
  FROM p CROSS JOIN qp WHERE p.nid <> qp.query_id),
cand AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY _pcos DESC, neighbor_id) AS _crk
    FROM cand0)
  WHERE _crk <= {int(k) * int(overfetch)}),
e AS (SELECT vec_id AS nid, embedding::DOUBLE[] AS emb FROM src
      WHERE {_clean_nonzero_duck("embedding")}),
q AS (SELECT nid AS query_id, emb FROM e WHERE nid IN ({ids})),
rescored AS (
  SELECT cand.query_id, cand.neighbor_id, {cos} AS cos
  FROM cand
  JOIN e ON e.nid = cand.neighbor_id
  JOIN q ON q.query_id = cand.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM rescored)
SELECT query_id, neighbor_id, cos, rank FROM ranked WHERE rank <= {int(k)}
"""


def label_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label embedding centroids (class prototypes — the vectors
    SemDeDup/cluster-prune rank against, and the nearest-class-mean
    classifier baseline), emitted LONG: one (label, pos, n_vecs,
    centroid_sum_q, centroid_q30) row per dimension.

    Exactness: components quantize to ``floor(x · 2³⁰)`` BIGINTs —
    multiplying a double by a power of two is EXACT (mantissa
    unchanged), and floor is exact, so the per-(label, dim) sum
    ``centroid_sum_q`` is an exact integer and ``centroid_q30`` its
    truncated BIGINT quotient on the same 2³⁰ grid (round-10
    integer-finals doctrine — divide by 2³⁰ for the float centroid).
    The ~1e-9 grid is far below float32 input precision.

    Scale: one posexplode scan (rows × dim), ONE shuffle on the tiny
    (label, pos) key with map-side combine — never a vector broadcast,
    never per-label collects.
    """
    # non-finite elements contribute NULL (like NULL elements) instead of
    # Spark's floor(inf) = LONG_MAX, which would overflow the exact sum
    fin = ~F.isnan(F.col("_v")) & (
        F.abs(F.col("_v")) != F.lit(float("inf"))
    )
    q = F.when(fin, F.floor(F.col("_v") * F.lit(float(1 << 30))).cast("long"))
    x = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))")).alias(
            "_p", "_v"
        ),
    ).select("label", (F.col("_p") + 1).alias("pos"), q.alias("_q"))
    return (
        x.groupBy("label", "pos")
        .agg(F.count(F.lit(1)).alias("n_vecs"), F.sum("_q").alias("_s"))
        .select(
            "label",
            "pos",
            "n_vecs",
            F.col("_s").alias("centroid_sum_q"),
            F.expr("_s div n_vecs").alias("centroid_q30"),
        )
        .orderBy("label", "pos")
    )


def label_centroids_oracle(
    table: str = "embeddings", *, vec_col: str = "embedding", label_col: str = "label"
) -> str:
    g = float(1 << 30)
    return f"""
WITH x AS (
  SELECT {label_col} AS label,
         UNNEST(generate_series(1, len({vec_col}))) AS pos, {vec_col} AS emb
  FROM {table}),
q AS (
  SELECT label, pos,
         CASE WHEN isnan(CAST(emb[pos] AS DOUBLE)) OR isinf(CAST(emb[pos] AS DOUBLE))
              THEN NULL
              ELSE CAST(floor(CAST(emb[pos] AS DOUBLE) * {g!r}) AS BIGINT) END AS qv
  FROM x)
SELECT label, pos, COUNT(*) AS n_vecs,
       CAST(SUM(qv) AS BIGINT) AS centroid_sum_q,
       CAST(SUM(qv) AS BIGINT) // COUNT(*) AS centroid_q30
FROM q GROUP BY label, pos
"""


def hard_negatives(
    df: DataFrame,
    *,
    query_ids: Sequence[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector, the top-``k`` most-cosine-similar corpus vectors whose
    ``label`` DIFFERS from the query's — the near-misses a contrastive
    loss learns the most from (the in-batch-negatives upgrade every
    retrieval-training pipeline ships).

    Output: (query_id, neighbor_id, neg_label, cos, rank) — rank by
    (cos desc, neighbor_id); the cosine is the unrounded
    sequential-fold double (the proven knn_* contract).

    At 100 TB: identical shape to :func:`knn_brute` — the query set
    (vectors + labels) broadcasts, the corpus is scanned once with the
    label filter fused into the scan, and only ≤ Q·k rows survive the
    per-query top-k (TakeOrderedAndProject after the window cut).  For
    corpus-scale query sets, run the same mining through the IVF index
    (:func:`search_ann_index`) and apply the label filter on its
    candidates instead.
    """
    # zero-norm + corrupt vectors excluded (see knn_brute)
    e = (
        fan_out_small(df, id_col).where(_valid_vec_spark(vec_col, None))
        .select(
            F.col(id_col).alias("nid"),
            F.col(label_col).alias("neg_label"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .withColumn("nrm", _norm("emb"))
        .where(F.col("nrm") > 0)
    )
    q = e.where(F.col("nid").isin(list(query_ids))).select(
        F.col("nid").alias("query_id"),
        F.col("neg_label").alias("_qlabel"),
        F.col("emb").alias("qemb"),
        F.col("nrm").alias("qnrm"),
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where((F.col("nid") != F.col("query_id")) & (F.col("neg_label") != F.col("_qlabel")))
        .select(
            "query_id",
            F.col("nid").alias("neighbor_id"),
            "neg_label",
            _cos_prenorm("qemb", "emb", "qnrm", "nrm").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hard_negatives_oracle(
    table: str = "embeddings", *, query_ids: Sequence[int] = (), k: int = 10
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    cos = _COS_DUCK.format(a="q.emb", b="e.emb")
    return f"""
WITH e AS (SELECT vec_id AS nid, label AS neg_label, embedding::DOUBLE[] AS emb FROM {table}
           WHERE {_clean_nonzero_duck("embedding")}),
q AS (SELECT nid AS query_id, neg_label AS _qlabel, emb FROM e WHERE nid IN ({ids})),
scored AS (
  SELECT q.query_id, e.nid AS neighbor_id, e.neg_label, {cos} AS cos
  FROM e CROSS JOIN q
  WHERE e.nid <> q.query_id AND e.neg_label <> q._qlabel),
ranked AS (
  SELECT query_id, neighbor_id, neg_label, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, neg_label, cos, rank FROM ranked WHERE rank <= {k}
"""


def ann_recall(
    df: DataFrame,
    *,
    query_ids: Sequence[int],
    k: int = 10,
    dim: int = 64,
    multiprobe: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k audit of the LSH ANN path against exact brute force —
    the acceptance test every approximate index ships with (a recall
    number is the contract an ANN config is tuned to, exactly as
    :func:`minhash_est_jaccard` audits the MinHash banding).

    Output: (query_id, n_hits, recall_ppm) where ``n_hits`` counts the
    exact top-k neighbors the LSH candidate search also returned, and
    ``recall_ppm = (10^6·n_hits) div k`` (truncated BIGINT quotient,
    round-10 integer-finals doctrine).

    At 100 TB: both sides are existing audited plans (broadcast query
    set, single corpus scan each); the final comparison joins two
    ≤ Q·k-row frames — negligible.  The brute-force side is the audit's
    cost; run it over a sampled query set, not the corpus.
    """
    exact = knn_brute(df, query_ids=query_ids, k=k, vec_col=vec_col, id_col=id_col)
    approx = knn_lsh(
        df, query_ids=query_ids, k=k, dim=dim, multiprobe=multiprobe,
        vec_col=vec_col, id_col=id_col,
    )
    hits = exact.select("query_id", "neighbor_id").join(
        approx.select("query_id", "neighbor_id", F.lit(1).alias("_h")),
        ["query_id", "neighbor_id"],
        "left",
    )
    return (
        hits.groupBy("query_id")
        .agg(F.coalesce(F.sum("_h"), F.lit(0)).cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.expr(f"(1000000 * n_hits) div {int(k)}").alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


def ann_recall_oracle(
    table: str = "embeddings", *, query_ids: Sequence[int] = (), k: int = 10,
    dim: int = 64, multiprobe: int = 1,
) -> str:
    exact = knn_brute_oracle(table, query_ids=query_ids, k=k)
    approx = knn_lsh_oracle(table, query_ids=query_ids, k=k, dim=dim, multiprobe=multiprobe)
    return f"""
WITH exact AS ({exact}),
approx AS ({approx})
SELECT exact.query_id,
       CAST(COUNT(approx.neighbor_id) AS BIGINT) AS n_hits,
       (1000000 * COUNT(approx.neighbor_id)) // {int(k)} AS recall_ppm
FROM exact
LEFT JOIN approx
  ON approx.query_id = exact.query_id AND approx.neighbor_id = exact.neighbor_id
GROUP BY exact.query_id
"""


# -- exact second moments / PCA ----------------------------------------------

#: quantization grid for embedding_moments: floor(x·2^20) — float32
#: inputs carry ≤ 24 mantissa bits, so a 2^20 grid loses ~1e-6 at unit
#: scale (far below training noise) while keeping every product and
#: partial sum an exact int64 (|q| ≤ 2^21 for |x| ≤ 2 → products ≤ 2^42).
MOMENT_GRID = 1 << 20


def embedding_moments(
    df: DataFrame,
    *,
    dim: int = 64,
    vec_col: str = "embedding",
    bigint_finals: bool = False,
) -> DataFrame:
    """Exact corpus second moments of the embedding column — the input
    every covariance/PCA/whitening step needs: one row per dimension
    pair ``(pos_i ≤ pos_j)`` with the EXACT integer-grid sums
    ``(n, s_i = Σq_i, s_j = Σq_j, s_ij = Σq_i·q_j)`` where
    ``q = floor(x·2^20)``.  Covariance numerator is then the integer
    ``n·s_ij − s_i·s_j`` and PCA follows driver-side
    (:func:`pca_model`) from these d(d+1)/2 ≈ 2k rows.

    Spark-first shape (the MLlib treeAggregate pattern, Arrow edition):
    ``mapInPandas`` folds each partition into ONE d×d int64 Gram + d
    sum vector — numpy does the heavy lifting via chunked float64
    BLAS matmuls kept EXACT (chunk size chosen so per-chunk sums stay
    < 2^52; falls back to int64 matmul if the data magnitude defeats
    that bound) — then emits d(d+1)/2 partial rows.  The only shuffle
    is #partitions × 2k tiny rows into the final decimal-sum
    aggregation: corpus bytes never move.

    Exactness: float32→float64 cast, ·2^20 (power of two) and floor are
    all exact IEEE ops identical to the DuckDB oracle's
    ``floor(CAST(x AS DOUBLE) * 1048576.0)``; everything after is
    integer arithmetic (final sums as DECIMAL(38,0) — int64-overflow
    safe to ~10^37).  Per-partition int64 partials are safe below
    ~2^21 rows/partition at |x| ≤ 2 (n·qmax² < 2^63 with
    qmax = 2·2^20 → qmax² = 2^42; default maxPartitionBytes yields
    ~2^19 rows of 64-dim float, 4× headroom) — the fold RAISES if the
    running bound is breached rather than wrapping silently.

    ``bigint_finals=True`` casts the decimal sums to BIGINT for a
    gated projection (integer-finals doctrine, round 10: the driver's
    hasher canonicalizes decimals engine-specifically — r9 proved it
    with this very query failing on DECIMAL(38,0) while bit-exact
    locally).  The cast is guarded: any sum outside int64 raises
    instead of truncating (the DuckDB twin's CAST(... AS BIGINT)
    errors on overflow natively, so the two engines fail loudly
    together; gate-scale sums are ~2^58 at worst).
    """
    import numpy as np
    import pandas as pd

    grid = float(MOMENT_GRID)
    d = int(dim)

    def fold(batches):
        iu = np.triu_indices(d)
        n = 0
        peak = 0  # largest |q| seen — bounds every Gram entry by n·peak²
        s = np.zeros(d, dtype=np.int64)
        g = np.zeros((d, d), dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            # corrupt rows excluded, never fatal and never silently
            # folded in: a NULL vector (None), a wrong-length vector, or
            # NULL/non-finite elements (arrow surfaces NULL floats as
            # NaN) carry no usable moments — mirrored in the oracle's
            # valid-vector screen.
            mats = []
            for v in pdf[vec_col].to_numpy():
                if v is None:
                    continue
                a = np.asarray(v, dtype=np.float64)
                if a.shape[0] != d or not np.isfinite(a).all():
                    continue
                mats.append(a)
            if not mats:
                continue
            x = np.stack(mats)
            q = np.floor(x * grid).astype(np.int64)
            n += q.shape[0]
            s += q.sum(axis=0)
            qmax = int(np.abs(q).max()) if q.size else 0
            peak = max(peak, qmax)
            # int64 accumulator guard: fail loudly instead of wrapping
            # (exact Python-int arithmetic; re-partition finer to fix).
            if n * peak * peak > (1 << 62):
                raise OverflowError(
                    "embedding_moments: per-partition Gram bound n*qmax^2 "
                    f"exceeds 2^62 (n={n}, qmax={peak}); use more partitions"
                )
            # keep per-chunk float64 Gram sums < 2^52 so the BLAS path
            # stays exact; degenerate magnitudes fall back to int64.
            lim = (1 << 52) // max(1, qmax * qmax)
            if lim >= 2:
                for lo in range(0, q.shape[0], lim):
                    c = q[lo : lo + lim].astype(np.float64)
                    g += (c.T @ c).astype(np.int64)
            else:
                g += q.T @ q
        if n:
            yield pd.DataFrame(
                {
                    "pos_i": (iu[0] + 1).astype("int32"),
                    "pos_j": (iu[1] + 1).astype("int32"),
                    "n": np.int64(n),
                    "s_i": s[iu[0]],
                    "s_j": s[iu[1]],
                    "s_ij": g[iu],
                }
            )

    partials = df.select(vec_col).mapInPandas(
        fold, schema="pos_i INT, pos_j INT, n BIGINT, s_i BIGINT, s_j BIGINT, s_ij BIGINT"
    )
    dec = "decimal(38,0)"
    out = (
        partials.groupBy("pos_i", "pos_j")
        .agg(
            F.sum("n").alias("n"),
            F.sum(F.col("s_i").cast(dec)).alias("s_i"),
            F.sum(F.col("s_j").cast(dec)).alias("s_j"),
            F.sum(F.col("s_ij").cast(dec)).alias("s_ij"),
        )
        .orderBy("pos_i", "pos_j")
    )
    if bigint_finals:
        # guarded decimal→int64: assert_true raises on overflow (never
        # a silent truncation); coalesce then yields the cast value.
        lim = F.lit(str(2**63 - 1)).cast(dec)

        def checked(c: str):
            col = F.col(c)
            return F.coalesce(
                F.assert_true(
                    (col >= -lim) & (col <= lim),
                    f"embedding_moments: {c} exceeds int64",
                ).cast("long"),
                col.cast("long"),
            ).alias(c)

        out = out.select("pos_i", "pos_j", "n", *(checked(c) for c in ("s_i", "s_j", "s_ij")))
    return out


def embedding_moments_oracle(
    table: str = "embeddings",
    *,
    dim: int = 64,
    vec_col: str = "embedding",
    bigint_finals: bool = False,
) -> str:
    """``bigint_finals=True`` mirrors the Spark gated projection —
    sums CAST to BIGINT (DuckDB raises on overflow natively)."""
    g = float(MOMENT_GRID)
    sum_t = "BIGINT" if bigint_finals else "DECIMAL(38,0)"
    # valid-vector screen mirrors the Spark fold: NULL vectors,
    # wrong-length vectors, and NULL/NaN/inf elements are excluded
    # (CASE guarantees the element scan never feeds a corrupt row on).
    return f"""
WITH q AS (
  SELECT vec_id, UNNEST(generate_series(1, {int(dim)})) AS pos, {vec_col} AS emb
  FROM {table}
  WHERE (CASE WHEN {vec_col} IS NULL THEN FALSE
              WHEN len({vec_col}) <> {int(dim)} THEN FALSE
              WHEN len(list_filter({vec_col}, x -> x IS NULL
                       OR isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE)))) > 0
                THEN FALSE
              ELSE TRUE END)),
qq AS (
  SELECT vec_id, CAST(pos AS INTEGER) AS pos,
         CAST(floor(CAST(emb[pos] AS DOUBLE) * {g!r}) AS BIGINT) AS qv
  FROM q)
SELECT a.pos AS pos_i, b.pos AS pos_j, COUNT(*) AS n,
       CAST(SUM(a.qv) AS {sum_t}) AS s_i,
       CAST(SUM(b.qv) AS {sum_t}) AS s_j,
       CAST(SUM(a.qv * b.qv) AS {sum_t}) AS s_ij
FROM qq a JOIN qq b ON a.vec_id = b.vec_id AND a.pos <= b.pos
GROUP BY 1, 2
"""


def pca_model(moments: DataFrame, *, dim: int = 64) -> dict:
    """Driver-side PCA fit from :func:`embedding_moments` output — the
    bounded-collect step (d(d+1)/2 rows, data-size independent).

    Returns ``{"mean": d, "components": d×d (rows = eigvecs, variance
    DESC), "explained_variance": d}`` as plain Python lists, ready to
    embed as literals into :func:`pca_project` (the rp_project
    pattern: train driver-side once, project as a codegen scan).

    The covariance is formed from EXACT integers
    (``(n·s_ij − s_i·s_j) / (n·(n−1)·grid²)``); only the final
    division and the eigendecomposition are floating point.
    """
    import numpy as np

    d = int(dim)
    rows = moments.collect()
    if not rows:
        raise ValueError("pca_model: empty moments input")
    n = int(rows[0]["n"])
    if n < 2:
        raise ValueError("pca_model: need at least 2 vectors")
    s = np.zeros(d, dtype=object)
    num = np.zeros((d, d), dtype=object)
    for r in rows:
        i, j = r["pos_i"] - 1, r["pos_j"] - 1
        s[i] = int(r["s_i"])
        s[j] = int(r["s_j"])
        num[i][j] = num[j][i] = n * int(r["s_ij"]) - int(r["s_i"]) * int(r["s_j"])
    scale = float(n) * float(n - 1) * float(MOMENT_GRID) ** 2
    cov = (num / scale).astype(np.float64)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    return {
        "mean": [float(int(v)) / (float(n) * float(MOMENT_GRID)) for v in s],
        "components": evecs[:, order].T.tolist(),
        "explained_variance": evals[order].tolist(),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    *,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project embeddings onto the top-``k`` principal components:
    (vec_id, j, val) — the rp_project shape with a TRAINED basis.
    The mean and component matrix ride along as literal arrays, so the
    projection is one shuffle-free codegen scan (no UDF, no join); the
    per-coordinate fold is the proven sequential left-fold.
    """
    mean = model["mean"]
    comps = model["components"][: int(k)]
    d = len(mean)
    marr = "array(" + ", ".join(f"{float(m)!r}D" for m in mean) + ")"
    arrs = ", ".join(
        "array(" + ", ".join(f"{float(w)!r}D" for w in row) + ")" for row in comps
    )
    expr = (
        f"transform(array({arrs}), s -> "
        f"aggregate(zip_with(zip_with({vec_col}, {marr}, "
        f"(x, m) -> CAST(x AS DOUBLE) - m), s, (c, w) -> c * w), "
        f"0.0D, (a, b) -> a + b))"
    )
    return df.select(
        F.col(id_col), F.posexplode(F.expr(expr)).alias("j", "val")
    )


def ivf_stats(
    df: DataFrame,
    *,
    dim: int = 64,
    vec_col: str = "embedding",
    centroids: Sequence[Sequence[float]] | None = None,
) -> DataFrame:
    """IVF quantizer balance audit: per list
    ``(list_id, n_vecs, frac_ppm, load_factor_e6)`` — the operational
    health check for every IVF index at scale.  ``load_factor_e6`` is
    ``(10^6·n·nlist) div total`` (1e6 = perfectly balanced); a hot
    list means a hot probe partition (query latency skew), an empty
    list means wasted recall budget.  Both ratios are truncated BIGINT
    quotients (round-10 integer-finals doctrine).  Empty lists ARE
    emitted (zero-filled spine join) — they're the signal, not noise.

    One corpus scan (the same assignment projection
    :func:`knn_ivf`/:func:`write_ann_index` use), one map-side-combined
    count shuffle of ≤ nlist keys, then an nlist-row spine join — the
    corpus itself never shuffles.
    """
    from pyspark.sql import Window

    nlist = len(centroids) if centroids is not None else N_LISTS
    sarr = _score_array_spark("emb", dim, centroids)
    # corrupt vectors live in no list — raw-column screen (the spine
    # join already dropped their NULL list_id; the screen makes the
    # exclusion explicit and keeps the oracle's element scan safe)
    counts = (
        fan_out_small(df, vec_col).where(_valid_vec_spark(vec_col, dim))
        .select(
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb")
        )
        .withColumn("_sarr", F.expr(sarr))
        .select(
            F.expr("array_position(_sarr, array_max(_sarr)) - 1")
            .cast("int")
            .alias("list_id")
        )
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    spine = df.sparkSession.range(nlist).select(
        F.col("id").cast("int").alias("list_id")
    )
    f = spine.join(counts, "list_id", "left").select(
        "list_id", F.coalesce("n_vecs", F.lit(0).cast("long")).alias("n_vecs")
    )
    t = f.withColumn("total", F.sum("n_vecs").over(Window.partitionBy()))
    return t.select(
        "list_id",
        "n_vecs",
        F.when(
            F.col("total") > 0, F.expr("(1000000 * n_vecs) div total")
        ).alias("frac_ppm"),
        F.when(
            F.col("total") > 0,
            F.expr(f"(1000000 * n_vecs * {int(nlist)}) div total"),
        ).alias("load_factor_e6"),
    ).orderBy("list_id")


def ivf_stats_oracle(
    table: str = "embeddings",
    *,
    dim: int = 64,
    centroids: Sequence[Sequence[float]] | None = None,
) -> str:
    nlist = len(centroids) if centroids is not None else N_LISTS
    return f"""
WITH e AS (
  SELECT {_score_array_duck("embedding::DOUBLE[]", dim, centroids)} AS sarr
  FROM {table}
  WHERE {_valid_vec_duck("embedding", dim)}),
a AS (
  SELECT CAST(list_position(sarr, list_max(sarr)) - 1 AS INTEGER) AS list_id
  FROM e),
c AS (SELECT list_id, COUNT(*) AS n_vecs FROM a GROUP BY 1),
spine AS (
  SELECT CAST(UNNEST(generate_series(0, {nlist - 1})) AS INTEGER) AS list_id),
f AS (
  SELECT spine.list_id, COALESCE(c.n_vecs, 0) AS n_vecs
  FROM spine LEFT JOIN c USING (list_id)),
t AS (SELECT list_id, n_vecs, SUM(n_vecs) OVER () AS total FROM f)
SELECT list_id, n_vecs,
       CAST(CASE WHEN total > 0 THEN (1000000 * n_vecs) // total END AS BIGINT) AS frac_ppm,
       CAST(CASE WHEN total > 0 THEN (1000000 * n_vecs * {nlist}) // total END AS BIGINT) AS load_factor_e6
FROM t
"""


def quantize_embeddings_int8(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-dimension int8 quantization — the standard vector-
    index export step (4× smaller than float32, SIMD-friendly dot
    products): ``q = clamp(floor(x · 127 / maxabs_dim), −127, 127)``,
    one output row per (vec_id, pos) plus the dimension's scale so the
    consumer can dequantize (``x ≈ q · maxabs/127``).

    Engine-exact by construction: per-dim ``maxabs`` is an order-free
    MAX of exact doubles, the scale ride-along is the raw double, and
    the quantized value uses floor (no round(double) — the proven
    determinism contract).  Zero-variance dims (maxabs = 0) quantize
    to 0 with scale 0.

    At 100 TB: one posexplode scan into a (pos)-keyed max aggregation
    (64 keys, map-side combined), the d-row stats table broadcasts
    back, and the quantization is a pure expression — the corpus
    shuffles once on the tiny pos key for stats and never again.
    """
    x = df.select(
        F.col(id_col),
        F.posexplode(F.expr(f"transform({vec_col}, v -> CAST(v AS DOUBLE))")).alias(
            "_p", "_v"
        ),
    ).select(F.col(id_col), (F.col("_p") + 1).alias("pos"), F.col("_v"))
    stats = x.groupBy("pos").agg(F.max(F.abs(F.col("_v"))).alias("maxabs"))
    q = F.when(F.col("maxabs") == 0.0, F.lit(0)).otherwise(
        F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(F.col("_v") * F.lit(127.0) / F.col("maxabs")).cast("int"),
            ),
        )
    )
    return (
        x.join(F.broadcast(stats), "pos")
        .select(
            F.col(id_col),
            "pos",
            q.cast("int").alias("q"),
            (F.col("maxabs") / F.lit(127.0)).alias("scale"),
        )
        .orderBy(id_col, "pos")
    )


def quantize_embeddings_int8_oracle(
    table: str = "embeddings", *, vec_col: str = "embedding", id_col: str = "vec_id"
) -> str:
    return f"""
WITH x AS (
  SELECT {id_col}, UNNEST(generate_series(1, len({vec_col}))) AS pos,
         {vec_col}::DOUBLE[] AS emb
  FROM {table}),
v AS (SELECT {id_col}, CAST(pos AS INTEGER) AS pos, emb[pos] AS val FROM x),
stats AS (SELECT pos, MAX(abs(val)) AS maxabs FROM v GROUP BY pos)
SELECT v.{id_col}, v.pos,
       CAST(CASE WHEN maxabs = 0.0 THEN 0
                 -- Spark's floor(NaN) is 0 (an inf element makes maxabs
                 -- inf: inf/inf = NaN for that element, x/inf = 0 for
                 -- the rest); DuckDB's floor(NaN) = NaN would raise in
                 -- the INTEGER cast, so mirror the 0 explicitly
                 WHEN isnan(val * 127.0 / maxabs) THEN 0
                 ELSE GREATEST(-127, LEAST(127,
                      CAST(floor(val * 127.0 / maxabs) AS INTEGER)))
            END AS INTEGER) AS q,
       maxabs / 127.0 AS scale
FROM v JOIN stats USING (pos)
"""


def assign_lists_arrow(
    df: DataFrame,
    *,
    dim: int = 64,
    centroids: Sequence[Sequence[float]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Arrow/BLAS fast path for the IVF corpus assignment: (vec_id,
    list_id) via one float64 matmul per Arrow batch instead of the
    nlist×dim interpreted-lambda folds.  Measured (500k×64, local[32],
    SCALE.md): comparable at nlist=16 (the gated default), **15× at
    nlist=64, 5× at nlist=256** — the codegen expression's cost grows
    with nlist (one interpreted fold per list) while the matmul
    doesn't, and production IVF sizes nlist ≈ √N (thousands at 100 M+
    vectors), squarely in the regime where only this path is viable.

    Contract: replicates the quantizer semantics (cos-to-centroid
    rounded to 6 decimals, argmax with smallest-list tiebreak) but the
    dot products accumulate in BLAS order, not the sequential fold —
    so a vector whose top-two scores tie EXACTLY at the 6th decimal
    may land in a different (equally valid) list.  For that reason
    this is the BULK-BUILD path (index construction, stats at scale);
    gated queries keep the codegen expression, and the fixture pin in
    tests shows zero divergence on real data.
    """
    import numpy as np
    import pandas as pd

    cs = np.asarray(
        centroids if centroids is not None else default_centroids(N_LISTS, dim),
        dtype=np.float64,
    )
    nrm = np.sqrt((cs * cs).sum(axis=1))
    nrm[nrm == 0] = 1.0

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            scores = (x @ cs.T) / nrm  # (rows, nlist)
            # round-6 then first-max — mirrors round(...,6) + array_position
            scores = np.round(scores, 6)
            lid = scores.argmax(axis=1).astype("int32")  # argmax = first max
            yield pd.DataFrame({id_col: pdf[id_col], "list_id": lid})

    return df.select(id_col, vec_col).mapInPandas(
        batches, schema=f"{id_col} long, list_id int"
    )
