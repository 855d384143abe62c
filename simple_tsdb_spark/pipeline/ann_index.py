"""Materialized IVF index — build once, search many.

``knn_ivf`` builds its inverted lists inside every query; a deployment
builds the index ONCE and pays only probe-sized I/O per query.
``write_ann_index`` assigns each vector to its quantizer list (the
same argmax expression ``knn_ivf`` uses) and writes the corpus as
parquet **partitioned by list_id**, plus a JSON manifest (centroids,
dim, optional PQ codebooks).  ``search_ann_index`` ranks the
centroid table for each query ON THE DRIVER (nlist × dim floats —
tiny), then reads ONLY the probed list partitions: directory-level
partition pruning, so per-query I/O scales with ``nprobe/nlist`` of
the corpus, not the corpus (asserted in explain_audit).

Deterministic end to end: the driver-side probe ranking recomputes the
quantizer score with the same sequential fold the Spark expression
uses (bit-identical doubles), so ``search_ann_index`` over an index
built with the default quantizer equals ``knn_ivf`` row for row
(pinned in test_pipeline).
"""

from __future__ import annotations

import json
import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from simple_tsdb_spark.pipeline.dedup import _cos_prenorm, _norm
from simple_tsdb_spark.pipeline.similarity import (
    N_LISTS,
    _score_array_spark,
    default_centroids,
    pq_codebooks,
)

__all__ = ["write_ann_index", "search_ann_index", "embedding_dups_against_index"]


def write_ann_index(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    dim: int = 64,
    centroids: Sequence[Sequence[float]] | None = None,
    with_pq: bool = False,
    codebooks: Sequence[Sequence[Sequence[float]]] | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign: str = "codegen",
) -> dict:
    """Build the materialized index: one corpus projection (the
    assignment is pure codegen), one partitioned write — no shuffle
    beyond the write's own fan-out.  Returns the manifest.

    ``assign="arrow"`` routes the corpus assignment through the
    BLAS fast path (:func:`pipeline.similarity.assign_lists_arrow`) —
    the bulk-build choice once nlist grows past a few dozen (15× at
    nlist=64, SCALE.md); search semantics are unchanged and
    round-trip equality to the codegen build is pinned in
    test_cluster_cap/test_pipeline.  Exact round-6 score ties may
    place a vector in a different (equally valid) list.
    """
    from simple_tsdb_spark.fs import get_fs

    if assign not in ("codegen", "arrow"):
        raise ValueError("assign must be codegen|arrow")
    cents = [list(map(float, c)) for c in (centroids or default_centroids(dim=dim))]
    base = df.select(
        F.col(id_col).alias("vec_id"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
    )
    if assign == "arrow":
        from simple_tsdb_spark.pipeline.similarity import assign_lists_arrow

        lids = assign_lists_arrow(
            df, dim=dim, centroids=cents, vec_col=vec_col, id_col=id_col
        ).withColumnRenamed(id_col, "vec_id")
        e = base.join(lids, "vec_id")
    else:
        sarr = _score_array_spark("emb", dim, cents)
        e = (
            base.withColumn("_sarr", F.expr(sarr))
            .withColumn(
                "list_id",
                F.expr("array_position(_sarr, array_max(_sarr)) - 1").cast("int"),
            )
            .drop("_sarr")
        )
    cols = ["vec_id", "emb", "list_id"]
    if with_pq:
        from simple_tsdb_spark.pipeline.similarity import _pq_encode_relational

        cbs = codebooks or pq_codebooks(dim=dim)
        e = (
            _pq_encode_relational(
                e.withColumnRenamed("vec_id", "_pqid"), cbs, dim, carry=("emb", "list_id")
            )
            .withColumnRenamed("_pqid", "vec_id")
        )
        cols.append("codes")
    else:
        cbs = None
    (
        e.select(*cols)
        .repartition(F.col("list_id"))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{path}/vectors")
    )
    manifest = {
        "dim": int(dim),
        "nlist": len(cents),
        "centroids": cents,
        "with_pq": bool(with_pq),
        "codebooks": [[list(map(float, c)) for c in cb] for cb in cbs] if cbs else None,
    }
    get_fs(path).write_text_atomic(f"{path}/manifest.json", json.dumps(manifest))
    return manifest


def _vectors_dir(man: dict) -> str:
    """Current vector-data directory: fresh builds write ``vectors``;
    rebalance flips the manifest pointer to ``vectors_gen<N>`` (the
    object-store-safe generation pattern — no renames, old generation
    stays readable until swept)."""
    return man.get("vectors_dir", "vectors")


def _quantizer_scores_py(vec: Sequence[float], cents: list[list[float]]) -> list[float]:
    """Driver-side replica of ``_score_array_spark``: sequential-fold
    dot / centroid norm — bit-identical to the Spark expression."""
    out = []
    for c in cents:
        acc = 0.0
        for x, y in zip(vec, c):
            acc += float(x) * float(y)
        nrm = 0.0
        for y in c:
            nrm += float(y) * float(y)
        out.append(acc / math.sqrt(nrm))
    return out


def _round6_spark(x: float) -> float:
    """Driver replica of Spark's ``round(double, 6)`` (BigDecimal
    HALF_UP on the exact binary value)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(x).quantize(Decimal("1e-6"), rounding=ROUND_HALF_UP))


def _pq_lut_py(vec: Sequence[float], cbs) -> list[float]:
    """Driver replica of knn_ivf_pq's per-query lookup table: normalize
    (sequential-fold dot), then per (subspace, centroid) the
    left-associated squared-L2 sum, rounded like Spark."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    nrm = math.sqrt(acc)
    nv = [float(x) / nrm for x in vec]
    sub = len(cbs[0][0])
    lut = []
    for mi, cb in enumerate(cbs):
        off = mi * sub
        for c in cb:
            d = 0.0
            for j in range(sub):
                t = nv[off + j] - float(c[j])
                d += t * t
            lut.append(_round6_spark(d))
    return lut


def search_ann_index(
    spark: SparkSession,
    path: str,
    *,
    query_ids: Sequence[int],
    k: int = 10,
    nprobe: int = 4,
    method: str = "exact",
) -> DataFrame:
    """Top-k search against a materialized index: probe lists are
    ranked on the driver from the manifest's centroid table, and the
    corpus read is filtered to ``list_id IN (probed)`` — partition
    pruning keeps I/O at ``≈ nprobe/nlist`` of the index regardless of
    corpus size.  Query vectors are fetched from the index by id (a
    bounded pushed-down read).

    ``method='exact'``: cosine over the stored vectors — output
    (query_id, neighbor_id, cos, rank), identical to ``knn_ivf`` under
    the same quantizer.  ``method='adc'``: asymmetric distance over the
    stored PQ codes (requires ``with_pq=True`` at build) — the scan
    reads only (vec_id, codes, list_id), ~dim/M× less data; output
    (query_id, neighbor_id, adist, rank), identical to ``knn_ivf_pq``
    (the per-query LUT is a bit-exact driver replica of the Spark
    expression, HALF_UP rounding included)."""
    from simple_tsdb_spark.fs import get_fs

    if method not in ("exact", "adc"):
        raise ValueError("method must be exact|adc")
    man = json.loads(get_fs(path).read_text(f"{path}/manifest.json"))
    cents = man["centroids"]
    nlist = man["nlist"]
    if method == "adc" and not man.get("with_pq"):
        raise ValueError("index was built without PQ codes (with_pq=False)")
    if not 1 <= int(nprobe) <= nlist:
        raise ValueError(f"nprobe must be in [1, {nlist}]")

    vectors = spark.read.parquet(f"{path}/{_vectors_dir(man)}")
    qrows = (
        vectors.where(F.col("vec_id").isin(list(query_ids)))
        .select("vec_id", "emb")
        .collect()
    )
    if len(qrows) != len(set(query_ids)):
        missing = set(query_ids) - {r["vec_id"] for r in qrows}
        raise KeyError(f"query ids not in index: {sorted(missing)}")

    probe_rows = []
    qvec_rows = []
    lut_rows = []
    probed_lists: set[int] = set()
    for r in qrows:
        scores = _quantizer_scores_py(r["emb"], cents)
        # rank by (score desc, list_id asc) — knn_ivf's probe order
        order = sorted(range(nlist), key=lambda l: (-scores[l], l))[: int(nprobe)]
        nrm = 0.0
        for x in r["emb"]:
            nrm += float(x) * float(x)
        qvec_rows.append((int(r["vec_id"]), [float(x) for x in r["emb"]], math.sqrt(nrm)))
        if method == "adc":
            lut_rows.append((int(r["vec_id"]), _pq_lut_py(r["emb"], man["codebooks"])))
        for l in order:
            probe_rows.append((int(r["vec_id"]), int(l)))
            probed_lists.add(int(l))

    probes = spark.createDataFrame(probe_rows, "query_id long, list_id int")

    if method == "adc":
        cbs = man["codebooks"]
        m, kk = len(cbs), len(cbs[0])
        luts = spark.createDataFrame(lut_rows, "query_id long, lut array<double>")
        corpus = vectors.where(F.col("list_id").isin(sorted(probed_lists))).select(
            "vec_id", "codes", "list_id"
        )
        adist = " + ".join(
            f"element_at(lut, {mi} * {kk} + codes[{mi}] + 1)" for mi in range(m)
        )
        scored = (
            corpus.join(F.broadcast(probes), "list_id")
            .where(F.col("vec_id") != F.col("query_id"))
            .join(F.broadcast(luts), "query_id")
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                F.expr(adist).alias("adist"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("adist").asc(), F.col("neighbor_id")
        )
    else:
        qvecs = spark.createDataFrame(
            qvec_rows, "query_id long, qemb array<double>, qnrm double"
        )
        corpus = vectors.where(
            F.col("list_id").isin(sorted(probed_lists))
        ).withColumn("nrm", _norm("emb"))
        scored = (
            corpus.join(F.broadcast(probes), "list_id")
            .where(F.col("vec_id") != F.col("query_id"))
            .join(F.broadcast(qvecs), "query_id")
            .select(
                "query_id",
                F.col("vec_id").alias("neighbor_id"),
                _cos_prenorm("qemb", "emb", "qnrm", "nrm").alias("cos"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("neighbor_id")
        )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .orderBy("query_id", "rank")
    )


def embedding_dups_against_index(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    *,
    threshold: float = 0.3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Incremental embedding near-dup: cosine duplicates of NEW vectors
    against the indexed corpus, blocked by the index's quantizer list —
    ``(new_id, corpus_id, cos)`` with ``cos ≥ threshold`` (unrounded).

    The incremental-trio sibling of ``dedup_against_index`` (minhash)
    and ``filter_against_digest_index`` (exact): only the new slice is
    quantizer-assigned, and the corpus read partition-prunes to the
    lists the slice actually lands in (≤ nlist directories, bounded by
    the slice).  Same candidate semantics as ``embedding_dup_pairs``
    under the index's quantizer, restricted to new×corpus pairs
    (pinned in test_pipeline).  Self-id pairs are excluded so a re-sent
    vector doesn't match itself."""
    from simple_tsdb_spark.fs import get_fs
    from simple_tsdb_spark.pipeline.similarity import _score_array_spark

    man = json.loads(get_fs(path).read_text(f"{path}/manifest.json"))
    cents = man["centroids"]
    sarr = _score_array_spark("emb", man["dim"], cents)
    new = (
        new_df.select(
            F.col(id_col).alias("new_id"),
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("emb"),
        )
        .withColumn("_sarr", F.expr(sarr))
        .withColumn(
            "list_id", F.expr("array_position(_sarr, array_max(_sarr)) - 1").cast("int")
        )
        .drop("_sarr")
        .withColumn("nnrm", _norm("emb"))
        .withColumnRenamed("emb", "nemb")
    )
    hit = sorted(r["list_id"] for r in new.select("list_id").distinct().collect())
    idx = (
        spark.read.parquet(f"{path}/{_vectors_dir(man)}")
        .where(F.col("list_id").isin(hit))
        .select("vec_id", "emb", "list_id")
        .withColumn("nrm", _norm("emb"))
    )
    return (
        new.join(idx, "list_id")
        .where(F.col("new_id") != F.col("vec_id"))
        .select(
            "new_id",
            F.col("vec_id").alias("corpus_id"),
            _cos_prenorm("nemb", "emb", "nnrm", "nrm").alias("cos"),
        )
        .where(F.col("cos") >= float(threshold))
    )


def index_health(spark: SparkSession, path: str) -> DataFrame:
    """Health report for a materialized IVF index WITHOUT touching the
    vectors: per list ``(list_id, n_vecs, frac_ppm, load_factor_e6)``
    — the operational twin of :func:`pipeline.similarity.ivf_stats` computed
    from the index's own partitioned layout (a ``list_id``-pruned
    count over the parquet footers; at 100 TB this reads metadata, not
    embeddings).  Empty lists appear zero-filled (the manifest's nlist
    is the spine), matching ivf_stats' contract row-for-row — equality
    on a shared corpus is pinned in tests.

    Use it as the re-balance trigger: a hot list (load_factor ≫ 1)
    means hot probe partitions; re-train centroids (train_ivf_centroids)
    and rebuild with ``assign="arrow"`` when it drifts.
    """
    from pyspark.sql import Window

    from simple_tsdb_spark.fs import get_fs

    man = json.loads(get_fs(path).read_text(f"{path}/manifest.json"))
    nlist = int(man["nlist"])
    counts = (
        spark.read.parquet(f"{path}/{_vectors_dir(man)}")
        .groupBy("list_id")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
    )
    spine = spark.range(nlist).select(F.col("id").cast("int").alias("list_id"))
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
            F.expr(f"(1000000 * n_vecs * {nlist}) div total"),
        ).alias("load_factor_e6"),
    ).orderBy("list_id")


def rebalance_ann_index(
    spark: SparkSession,
    path: str,
    *,
    max_load: float = 2.0,
    iters: int = 3,
) -> dict:
    """Self-healing step for a drifted index: if any quantizer list's
    ``load_factor`` (from :func:`index_health` — metadata only) exceeds
    ``max_load``, re-train the centroids on the STORED vectors
    (spherical k-means, :func:`train_ivf_centroids`), re-assign through
    the Arrow bulk path, write a NEW generation directory
    (``vectors_gen<N>``) and atomically flip the manifest pointer — the
    object-store-safe generation pattern the storage compactor uses (no
    renames; readers opened against the old manifest keep working, and
    the old generation stays until swept).

    PQ codes (if present) carry over unchanged: they encode the vector
    against the codebooks, independent of list membership, so ADC
    search stays valid under the new quantizer.

    Returns ``{"rebalanced", "max_load_before"[, "max_load_after",
    "generation" | "rejected_load"]}``.  No-op (rebalanced=False) when
    the index is already within ``max_load``, and the pointer only
    flips when the candidate generation MEASURABLY improves the max
    load factor (see the improvement guard below) — a retrain cannot
    balance intrinsically concentrated data, and must never replace a
    better index with a worse one.
    """
    from simple_tsdb_spark.fs import get_fs
    from simple_tsdb_spark.pipeline.similarity import (
        assign_lists_arrow,
        train_ivf_centroids,
    )

    man = json.loads(get_fs(path).read_text(f"{path}/manifest.json"))
    before_e6 = index_health(spark, path).agg(F.max("load_factor_e6")).first()[0]
    before = float(before_e6) / 1e6
    report = {"rebalanced": False, "max_load_before": before}
    # Nearest-ppm snap (not exact_ppm): this is an operational trigger
    # compared against the e6-quantized measured load factor, and callers
    # legitimately derive max_load from a measured float (load_after + eps)
    # that need not sit on the 1e-6 grid.  Gated finals use exact_ppm.
    if before_e6 <= int(round(float(max_load) * 1e6)):
        return report

    stored = spark.read.parquet(f"{path}/{_vectors_dir(man)}")
    cents = train_ivf_centroids(
        stored, nlist=int(man["nlist"]), dim=int(man["dim"]), iters=int(iters),
        vec_col="emb",
    )
    lids = assign_lists_arrow(
        stored.select("vec_id", "emb"), dim=int(man["dim"]), centroids=cents,
        vec_col="emb", id_col="vec_id",
    )
    cols = ["vec_id", "emb", "list_id"] + (["codes"] if man.get("with_pq") else [])
    gen = int(man.get("generation", 0)) + 1
    newdir = f"vectors_gen{gen}"
    (
        stored.drop("list_id")
        .join(lids, "vec_id")
        .select(*cols)
        .repartition(F.col("list_id"))
        .write.mode("overwrite")
        .partitionBy("list_id")
        .parquet(f"{path}/{newdir}")
    )
    # Improvement guard: measure the CANDIDATE generation before any
    # flip.  Lloyd's retrain heals placement-induced skew (bad default
    # centroids vs spread data) but CANNOT balance intrinsically
    # concentrated data (a corpus where 70 % of vectors share one
    # direction keeps one hot list no matter where centroids sit —
    # measured, SCALE.md); in that regime a retrain can even land
    # worse.  Only adopt the new generation when it measurably helps.
    nvecs = spark.read.parquet(f"{path}/{newdir}")
    cand_counts = nvecs.groupBy("list_id").agg(F.count(F.lit(1)).alias("n"))
    tot = int(stored.count())
    after = max(
        (int(r["n"]) * int(man["nlist"])) / tot for r in cand_counts.collect()
    )
    if after >= before:
        report.update(rejected_load=float(after))
        return report  # keep the old generation; candidate dir left for sweep
    man2 = {
        **man,
        "centroids": [list(map(float, c)) for c in cents],
        "vectors_dir": newdir,
        "generation": gen,
    }
    get_fs(path).write_text_atomic(f"{path}/manifest.json", json.dumps(man2))
    report.update(
        rebalanced=True, max_load_after=float(after), generation=gen
    )
    return report
