"""Corpus-curation operators: dedup clustering, deterministic splits,
stratified per-domain selection.

These are the steps a training-data pipeline runs *after* pair-finding
(dedup.py) and scoring (text.py): collapse near-dup pairs into clusters
and pick one keeper per cluster, carve reproducible train/val/test
splits, and cap each source domain's contribution.

Scale design:

- ``dedup_components``: connected components over the near-dup pair graph
  via hash-to-min label propagation — per iteration one shuffle keyed by
  doc id (edges join labels, then min-aggregate), lineage truncated with
  ``localCheckpoint`` so the plan stays O(1) per round.  Convergence in
  O(graph diameter) rounds; near-dup clusters are shallow (dup chains of
  depth > ~30 do not occur in real corpora — the cap raises rather than
  silently mislabeling).  The only driver-side value per round is one
  aggregated "labels changed" scalar.  No vertex or edge set is ever
  collected or broadcast.
- ``hash_split``: split assignment is a pure md5 expression on the id —
  shuffle-free, deterministic across engines, stable under corpus
  growth (a doc's split never depends on other rows).
- ``domain_topk``: top-k per domain in two window stages: stage 1 ranks
  within (domain, salt) — the salt spreads a hot domain over ``salts``
  tasks, and external-sort windows spill instead of buffering arrays —
  keeping ≤ salts×k rows per domain for the stage-2 exact rank.  The
  final shuffle therefore carries ≤ domains×salts×k rows no matter how
  skewed the corpus is.

All expressions are built-in (no UDFs); each operator has a DuckDB oracle
twin so the driver's hash gate covers it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.pipeline.dedup import _hash60, _hash60_duck

#: hash-to-min rounds before declaring the pair graph pathological.
CC_MAX_ITER = 30

#: stage-1 fan-out for domain_topk (tasks a hot domain is spread over).
TOPK_SALTS = 16

#: small-input CC fast lane: max edges collected for driver union-find.
CC_COLLECT_EDGES = 2_000_000


def _cc_small_lane(
    pairs: DataFrame,
    docs: DataFrame | None,
    *,
    a_col: str,
    b_col: str,
    id_col: str,
    stats: dict | None,
) -> DataFrame | None:
    """Small-input fast lane for :func:`dedup_components` (r14): when the
    gating input is under the adaptive size threshold, collect the edge
    list ONCE (hard-capped) and run exact union-find on the driver —
    2 jobs instead of the loop's ~15 serialized join+checkpoint+count
    jobs.  Labels are identical by construction: union-by-min keeps the
    component's minimum id at the root, so ``find(n)`` IS the min
    reachable id — the hash-to-min fixpoint.  Returns None (lane does
    not apply) above the threshold, over the edge cap, or when disabled
    via ``SPARK_GRAFT_CC_COLLECT_EDGES=0`` — the distributed loop then
    runs unchanged (the audited 100 TB design)."""
    import os

    from simple_tsdb_spark.functions.adaptive import is_small

    try:
        cap = int(os.environ.get("SPARK_GRAFT_CC_COLLECT_EDGES", CC_COLLECT_EDGES))
    except ValueError:
        cap = CC_COLLECT_EDGES
    if cap <= 0:
        return None
    if not is_small(docs if docs is not None else pairs):
        return None
    rows = pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")).take(cap + 1)
    if len(rows) > cap:
        return None
    parent: dict = {}

    def find(x):
        while parent[x] != x:  # path halving
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        a, b = r[0], r[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra

    from pyspark.sql.types import StructField, StructType

    id_type = pairs.schema[a_col].dataType
    schema = StructType(
        [StructField("doc", id_type), StructField("component", id_type)]
    )
    spark = pairs.sparkSession
    lbl = spark.createDataFrame([(n, find(n)) for n in parent], schema)
    if stats is not None:
        stats["rounds"] = 0
    if docs is None:
        return lbl
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(
            F.broadcast(lbl.withColumnRenamed("component", "_c")), "doc", "left"
        )
        .select("doc", F.coalesce("_c", "doc").alias("component"))
    )


# -- dedup clustering (connected components) --------------------------------

def dedup_components(
    pairs: DataFrame,
    docs: DataFrame | None = None,
    *,
    a_col: str = "a",
    b_col: str = "b",
    id_col: str = "doc_id",
    max_iter: int = CC_MAX_ITER,
    stats: dict | None = None,
) -> DataFrame:
    """Collapse near-dup pairs into clusters: (doc, component).

    ``component`` is the minimum doc id reachable from ``doc`` through the
    (undirected) pair graph — the canonical keeper of the cluster.  When
    ``docs`` is given, every document appears in the output; docs in no
    pair form singleton clusters (component = own id).

    Hash-to-min label propagation with a pointer-jumping shortcut: each
    round (1) every node's label becomes the min of its own and its
    neighbors' labels, then (2) labels join labels — the large-star
    contraction — so a node inherits its LABEL's label
    (``lbl ← lbl(lbl(doc))``).  Step 2 halves label-chain depth per
    round, cutting convergence from O(diameter) to O(log diameter)
    rounds on chain/star-shaped dup graphs at the cost of one extra
    label-keyed hash join per round (both relations already
    materialized; still exactly one ``localCheckpoint`` + one driver
    scalar per round).  Labels only decrease and always name a node of
    the same component (a neighbor's min or a label's label), so the
    fixpoint is exact: a round with zero changes means neighbor-min
    stability, the hash-to-min convergence condition.  Raises
    ``RuntimeError`` if ``max_iter`` rounds don't converge rather than
    returning partially-merged clusters.

    ``stats``, when given, receives ``{"rounds": n}`` for observability
    (the scale smoke asserts round counts stay flat as the corpus grows).
    """
    from simple_tsdb_spark.functions.adaptive import materialize_small

    fast = _cc_small_lane(
        pairs, docs, a_col=a_col, b_col=b_col, id_col=id_col, stats=stats
    )
    if fast is not None:
        return fast

    a = F.col(a_col).alias("src")
    b = F.col(b_col).alias("dst")
    # Under the adaptive size threshold, materialize the pair plan once
    # BEFORE the direction union: both union legs consume the whole LSH
    # banding join, which would otherwise run twice inside the edges
    # checkpoint below (r14; dedup_clusters 1.53x / keep_best_dedup
    # 1.38x at sf0.1).  No-op at real scale.
    pairs = materialize_small(pairs)
    edges = pairs.select(a, b).unionByName(
        pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
    )
    # Materialize the pair graph once: its lineage (often a full LSH plan)
    # would otherwise be recomputed by every propagation round.  LAZY
    # (r15): the init round's nbr_min aggregation materializes it in the
    # job it already pays for instead of a separate construction job.
    import os

    _eager = os.environ.get("SPARK_GRAFT_MATERIALIZE_EAGER", "") not in ("", "0")
    edges = edges.localCheckpoint(eager=_eager)
    nodes = edges.select(F.col("src").alias("doc"))
    if docs is not None:
        nodes = nodes.unionByName(docs.select(F.col(id_col).alias("doc")))
    nodes = nodes.distinct()  # one distinct over the union, one shuffle
    # Fuse round 1 into initialization: label = min(self, direct
    # neighbors).  Same fixpoint, one fewer propagation round — for the
    # common shallow dup-cluster graphs (diameter ≤ 2) the loop then only
    # runs the convergence-confirming round.
    nbr_min = edges.groupBy(F.col("dst").alias("doc")).agg(F.min("src").alias("nlbl"))
    labels = (
        nodes.join(nbr_min, "doc", "left")
        .select("doc", F.least("doc", F.coalesce("nlbl", "doc")).alias("lbl"))
        .localCheckpoint(eager=False)
    )

    for rounds in range(1, max_iter + 1):
        msg = (
            edges.join(labels, edges["src"] == labels["doc"])
            .groupBy(F.col("dst").alias("doc"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = labels.join(msg, "doc", "left").select(
            "doc",
            F.col("lbl").alias("old"),
            F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"),
        )
        # Large-star contraction: inherit the label's own label.  The
        # left join is belt-and-braces — every label names a node, so a
        # match always exists.  `stepped` is evaluated twice inside this
        # one job (both join sides); the round still materializes once.
        ptr = stepped.select(F.col("doc").alias("_pd"), F.col("lbl").alias("_plbl"))
        jumped = (
            stepped.join(ptr, stepped["lbl"] == ptr["_pd"], "left")
            .select(
                "doc",
                "old",
                F.least("lbl", F.coalesce("_plbl", "lbl")).alias("lbl"),
            )
            # Truncate lineage each round: without this the plan doubles
            # per iteration and analysis time dominates at depth > ~10.
            # LAZY checkpoint: the convergence count below is the round's
            # only action, so it both materializes the round's RDD and
            # counts in ONE job instead of two (r14; the eager form paid
            # a separate checkpoint job per round).
            .localCheckpoint(eager=False)
        )
        changed = jumped.where(F.col("lbl") != F.col("old")).count()
        labels = jumped.select("doc", "lbl")
        if changed == 0:
            if stats is not None:
                stats["rounds"] = rounds
            return labels.select("doc", F.col("lbl").alias("component"))
    raise RuntimeError(
        f"dedup_components: pair graph did not converge in {max_iter} rounds "
        "(pathological dup-chain depth); raise max_iter explicitly"
    )


def dedup_components_oracle(pairs_parts: tuple[str, str], table: str = "documents") -> str:
    """Recursive-CTE twin: min label reachable through the pair graph.

    ``pairs_parts`` is the structured ``(cte_list, final_select)`` pair a
    pairs oracle exposes (e.g.
    :func:`simple_tsdb_spark.pipeline.dedup.minhash_lsh_oracle_parts`);
    the final SELECT must produce columns (a, b[, ...]).  Taking the two
    halves separately — DuckDB allows only one WITH RECURSIVE clause, so
    the pairs CTEs must fold into ours — avoids reverse-parsing assembled
    SQL, which silently corrupts if a pairs oracle ever indents its final
    SELECT or embeds a column-0 SELECT in a subquery.  The recursive
    UNION deduplicates (doc, lbl) states, so the fixpoint is the full
    reach set; MIN over it equals the component min.
    """
    cte_list, final_select = pairs_parts
    return f"""
WITH RECURSIVE {cte_list},
p AS ({final_select}),
e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
cc(doc, lbl) AS (
  SELECT doc_id, doc_id FROM {table}
  UNION
  SELECT e.dst, cc.lbl FROM cc JOIN e ON e.src = cc.doc
)
SELECT doc, MIN(lbl) AS component FROM cc GROUP BY doc
"""


def keep_best_dedup(
    pairs: DataFrame,
    docs: DataFrame,
    *,
    quality_col: str = "n_chars",
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Quality-aware near-dup collapse: per dup cluster keep the BEST
    document, not the lowest-id one — the production dedup rule (keep
    the longest / highest-quality copy, drop the rest).

    Output: (doc_id, component, quality, kept) for EVERY input doc —
    the full decision table, so downstream can both filter
    (``kept``) and audit what was dropped and why.  ``kept`` is true
    for exactly one doc per component: the max ``quality``, ties
    broken by min doc id.  Singletons (no near-dup pair) keep
    themselves.

    Builds on :func:`dedup_components` (hash-to-min + pointer jumping,
    O(log diameter) rounds); the added work is one m:1 join of the
    label table against the doc quality column plus one per-component
    rank window.  Components are dup clusters — bounded fan-in by
    construction (the pair stage already bands/buckets), so the window
    partition never sees corpus-scale groups.
    """
    from pyspark.sql import Window

    comp = dedup_components(pairs, docs, a_col=a_col, b_col=b_col, id_col=id_col)
    j = comp.select(F.col("doc").alias(id_col), "component").join(
        docs.select(id_col, F.col(quality_col).alias("quality")), id_col
    )
    w = Window.partitionBy("component").orderBy(
        F.col("quality").desc(), F.col(id_col)
    )
    return j.withColumn("_rnk", F.row_number().over(w)).select(
        id_col, "component", "quality", (F.col("_rnk") == 1).alias("kept")
    )


def keep_best_dedup_oracle(
    pairs_parts: tuple[str, str],
    table: str = "documents",
    *,
    quality_col: str = "n_chars",
) -> str:
    """Recursive-CTE twin of :func:`keep_best_dedup` — the
    :func:`dedup_components_oracle` reach-set fixpoint plus a
    per-component (quality DESC, doc_id) rank.  Integer comparisons
    only, so the decision table is bit-deterministic cross-engine.
    """
    cte_list, final_select = pairs_parts
    return f"""
WITH RECURSIVE {cte_list},
p AS ({final_select}),
e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
cc(doc, lbl) AS (
  SELECT doc_id, doc_id FROM {table}
  UNION
  SELECT e.dst, cc.lbl FROM cc JOIN e ON e.src = cc.doc
),
comp AS (SELECT doc, MIN(lbl) AS component FROM cc GROUP BY doc),
j AS (
  SELECT c.doc AS doc_id, c.component, d.{quality_col} AS quality
  FROM comp c JOIN {table} d ON d.doc_id = c.doc),
r AS (
  SELECT doc_id, component, quality,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY quality DESC, doc_id) AS rnk
  FROM j)
SELECT doc_id, component, quality, rnk = 1 AS kept FROM r
"""


# -- deterministic splits ---------------------------------------------------

SPLIT_BUCKETS = 100


def hash_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "valid", "test"),
    salt: str = "split-v1",
) -> DataFrame:
    """Reproducible train/valid/test assignment: (doc_id, bucket, split).

    ``bucket`` = md5("salt:id") as a 60-bit int mod 100; ``weights`` are
    percentage points summing to 100.  Pure per-row expression: no
    shuffle, stable under corpus growth and across engines, re-saltable
    for fresh splits.
    """
    if sum(weights) != SPLIT_BUCKETS or len(weights) != len(names):
        raise ValueError("weights must sum to 100 and match names")
    bucket = F.expr(
        f"{_hash60(f'''concat('{salt}:', CAST({id_col} AS STRING))''')} % {SPLIT_BUCKETS}"
    )
    out = df.select(F.col(id_col), bucket.alias("bucket"))
    edge, expr = 0, F.lit(names[-1])
    cums = []
    for w in weights[:-1]:
        edge += w
        cums.append(edge)
    for name, cum in zip(reversed(names[:-1]), reversed(cums)):
        expr = F.when(F.col("bucket") < cum, F.lit(name)).otherwise(expr)
    return out.withColumn("split", expr)


def hash_split_oracle(
    table: str = "documents",
    *,
    id_col: str = "doc_id",
    weights: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "valid", "test"),
    salt: str = "split-v1",
) -> str:
    cases, edge = [], 0
    for name, w in zip(names[:-1], weights[:-1]):
        edge += w
        cases.append(f"WHEN bucket < {edge} THEN '{name}'")
    return f"""
WITH b AS (
  SELECT {id_col},
         {_hash60_duck(f"concat('{salt}:', CAST({id_col} AS VARCHAR))")} % {SPLIT_BUCKETS} AS bucket
  FROM {table})
SELECT {id_col}, bucket,
       CASE {' '.join(cases)} ELSE '{names[-1]}' END AS split
FROM b
"""


# -- stratified per-domain selection ----------------------------------------

def domain_topk(
    df: DataFrame,
    *,
    k: int,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
    salts: int = TOPK_SALTS,
) -> DataFrame:
    """Keep the top-``k`` docs per domain by ``order_col`` (desc, id-asc
    tiebreak): (domain, doc_id, order value, rk).

    Two-stage ranking so a hot domain cannot pin one task: stage 1 ranks
    within (domain, salt) — salt = xxhash64(id) mod ``salts``, so a
    domain's rows spread over ``salts`` tasks and each survives at most
    ``k`` rows; stage 2 ranks the ≤ salts×k survivors per domain exactly.
    Both stages are external-sort windows (spill, not collect_list
    buffers); result is identical to a single global window.
    """
    from pyspark.sql import Window

    order = [F.col(order_col).desc(), F.col(id_col).asc()]
    salted = df.select(
        F.col(domain_col).alias("domain"),
        F.col(id_col),
        F.col(order_col),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salts)).alias("_salt"),
    )
    w1 = Window.partitionBy("domain", "_salt").orderBy(*order)
    survivors = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("domain").orderBy(*order)
    return (
        survivors.withColumn("rk", F.row_number().over(w2))
        .where(F.col("rk") <= k)
        .select("domain", id_col, order_col, "rk")
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, int],
    *,
    default_rate: int = 0,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> DataFrame:
    """Deterministic mixture sampling: keep ``rates[domain]`` percent of
    each domain: (doc_id, domain, bucket).

    The keep decision is md5("salt:id") mod 100 < rate — a pure per-row
    expression (no shuffle, no RNG state), so the sample is reproducible,
    stable under corpus growth, and a superset/subset relation holds when
    a rate is raised/lowered (bucket < 30 ⊂ bucket < 50) — the property
    you need to re-weigh a training mixture without resampling the world.
    Domains absent from ``rates`` fall back to ``default_rate``.
    """
    if not all(0 <= r <= 100 for r in rates.values()) or not 0 <= default_rate <= 100:
        raise ValueError("rates must be percentages in [0, 100]")
    bucket = F.expr(
        f"{_hash60(f'''concat('{salt}:', CAST({id_col} AS STRING))''')} % {SPLIT_BUCKETS}"
    )
    rate = F.lit(default_rate)
    for dom, r in sorted(rates.items()):
        rate = F.when(F.col(domain_col) == dom, F.lit(r)).otherwise(rate)
    return (
        df.select(F.col(id_col), F.col(domain_col).alias("domain"), bucket.alias("bucket"))
        .where(F.col("bucket") < rate)
    )


def mixture_sample_oracle(
    table: str = "documents",
    *,
    rates: dict[str, int],
    default_rate: int = 0,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "mix-v1",
) -> str:
    if rates:
        cases = " ".join(
            f"WHEN {domain_col} = '{dom}' THEN {r}" for dom, r in sorted(rates.items())
        )
        rate_expr = f"CASE {cases} ELSE {default_rate} END"
    else:
        # Mirror the Spark builder, which starts from F.lit(default_rate):
        # an empty rates dict is valid (pure default_rate), but
        # "CASE  ELSE x END" is a DuckDB syntax error.
        rate_expr = str(default_rate)
    return f"""
SELECT {id_col}, domain, bucket FROM (
  SELECT {id_col}, {domain_col} AS domain,
         {_hash60_duck(f"concat('{salt}:', CAST({id_col} AS VARCHAR))")} % {SPLIT_BUCKETS} AS bucket,
         {rate_expr} AS rate
  FROM {table})
WHERE bucket < rate
"""


# -- temperature sampling ---------------------------------------------------

#: integer grid for the per-source weight sqrt(n)·2^20: floor is exact,
#: the power-of-two multiply is exact, and the summed weights stay far
#: below 2^53 (sqrt(10^12 docs)·2^20 ≈ 2^40 per source), so every
#: downstream double is an exactly-represented integer.
TEMP_GRID = 1 << 20


def _temp_thresholds(
    df: DataFrame,
    *,
    target_total: int,
    alpha: float,
    domain_col: str,
) -> DataFrame:
    """(source, n_docs, p_keep, _thr) per-source keep thresholds — the
    shared fit step of batch :func:`temperature_mixture` and the
    streaming twin (same expressions → identical keep decisions)."""
    from pyspark.sql import Window

    if target_total < 0:
        raise ValueError("target_total must be >= 0")
    counts = df.groupBy(F.col(domain_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    nd = F.col("n_docs").cast("double")
    if alpha == 0.5:
        wexpr = F.sqrt(nd)
    elif alpha == 1.0:
        wexpr = nd
    elif alpha == 2.0:
        wexpr = nd * nd
    else:  # engine-dependent libm pow — fine for jobs, not for the gate
        wexpr = F.pow(nd, F.lit(float(alpha)))
    wq = F.floor(wexpr * F.lit(float(TEMP_GRID))).cast("long")
    weights = counts.withColumn("_wq", wq).withColumn(
        "_S", F.sum("_wq").over(Window.partitionBy())
    )
    p = F.least(
        F.lit(1.0),
        F.lit(float(target_total))
        * F.col("_wq").cast("double")
        / F.col("_S").cast("double")
        / nd,
    )
    return weights.withColumn("p_keep", p).withColumn(
        "_thr", F.floor(F.col("p_keep") * F.lit(float(1 << 60))).cast("long")
    )


def temperature_mixture(
    df: DataFrame,
    *,
    target_total: int,
    alpha: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp-v1",
) -> DataFrame:
    """Temperature-weighted mixture sampling (the T5/Pile/XLM-R
    multinomial rule): sample ~``target_total`` docs with per-source
    probability ∝ ``n_source^alpha`` — alpha < 1 up-weights small
    sources, alpha = 1 is natural sampling.  Output: one report row per
    source ``(source, n_docs, n_kept, p_keep_ppm, p_keep)`` —
    ``p_keep_ppm`` is the exact ppm integer quotient computed in
    128-bit arithmetic (decimal in Spark, HUGEINT in DuckDB — verified
    to agree), the gated projection's column; the float ``p_keep``
    stays as the non-gated convenience.

    Per-doc keep probability ``p_s = min(1, target·w_s / (S·n_s))``
    with ``w_s = n_s^alpha``; the keep decision is the stateless
    ``md5(salt:id) < floor(p_s·2^60)`` threshold (same contract as
    :func:`mixture_sample` — reproducible, corpus-growth-stable, no RNG
    state).

    Cross-engine exactness: weights quantize to ``floor(n^alpha·2^20)``
    BIGINTs (IEEE sqrt is correctly rounded for alpha=0.5; alpha=1/2.0
    are exact integer ops), the normalizer ``S`` is an exact BIGINT
    sum, and ``p_s`` is a fixed-order chain of correctly-rounded double
    ops on exactly-represented integers — no libm, no order-dependent
    float sum.  Alphas outside {0.5, 1, 2} fall back to ``pow`` and are
    documented engine-dependent (not used in gated queries).

    At 100 TB: one count aggregation (map-side combined), a ≤ #sources
    row weight table broadcast back, and a stateless per-row threshold
    filter — the corpus is scanned twice and never shuffled.
    """
    tt = int(target_total)
    thr = _temp_thresholds(df, target_total=target_total, alpha=alpha, domain_col=domain_col)
    h = F.expr(_hash60(f"concat('{salt}:', CAST({id_col} AS STRING))"))
    kept = (
        df.select(F.col(domain_col).alias("source"), h.alias("_h"))
        .join(F.broadcast(thr.select("source", "_thr")), "source")
        .where(F.col("_h") < F.col("_thr"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    # numerator AND denominator ride 128-bit (DECIMAL(38,0) / HUGEINT):
    # at the documented 10^12-doc scale _S*n_docs overflows int64
    ppm = F.expr(
        f"least(CAST(1000000 AS BIGINT), "
        f"CAST(1000000 AS DECIMAL(38,0)) * {tt} * _wq "
        f"div (CAST(_S AS DECIMAL(38,0)) * n_docs))"
    )
    return (
        thr.select("source", "n_docs", "_wq", "_S", "p_keep")
        .join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            ppm.alias("p_keep_ppm"),
            "p_keep",
        )
        .orderBy("source")
    )


def temperature_mixture_oracle(
    table: str = "documents",
    *,
    target_total: int,
    alpha: float = 0.5,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp-v1",
) -> str:
    if alpha == 0.5:
        wexpr = "sqrt(CAST(n_docs AS DOUBLE))"
    elif alpha == 1.0:
        wexpr = "CAST(n_docs AS DOUBLE)"
    elif alpha == 2.0:
        wexpr = "CAST(n_docs AS DOUBLE) * CAST(n_docs AS DOUBLE)"
    else:
        raise ValueError("gated oracle supports alpha in {0.5, 1.0, 2.0} only")
    hexpr = _hash60_duck(f"concat('{salt}:', CAST({id_col} AS VARCHAR))")
    return f"""
WITH counts AS (
  SELECT {domain_col} AS source, COUNT(*) AS n_docs FROM {table} GROUP BY 1),
wts AS (
  SELECT source, n_docs,
         CAST(floor({wexpr} * {float(TEMP_GRID)!r}) AS BIGINT) AS wq
  FROM counts),
tot AS (SELECT source, n_docs, wq, SUM(wq) OVER () AS s FROM wts),
p AS (
  SELECT source, n_docs, wq, s,
         LEAST(CAST(1.0 AS DOUBLE),
               CAST({target_total} AS DOUBLE) * CAST(wq AS DOUBLE)
               / CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE)) AS p_keep
  FROM tot),
thr AS (
  SELECT source, n_docs, wq, s, p_keep,
         CAST(floor(p_keep * {float(1 << 60)!r}) AS BIGINT) AS thr
  FROM p),
kept AS (
  SELECT d.{domain_col} AS source, COUNT(*) AS n_kept
  FROM {table} d JOIN thr ON thr.source = d.{domain_col}
  WHERE {hexpr} < thr.thr GROUP BY 1)
SELECT t.source, t.n_docs, COALESCE(k.n_kept, 0) AS n_kept,
       CAST(least(1000000::HUGEINT,
                  (1000000::HUGEINT * {target_total} * t.wq)
                  // (t.s::HUGEINT * t.n_docs)) AS BIGINT)
         AS p_keep_ppm,
       t.p_keep
FROM thr t LEFT JOIN kept k USING (source)
"""


# -- sequence packing -------------------------------------------------------

PACK_GROUPS = 256


def pack_sequences(
    df: DataFrame,
    *,
    budget: int,
    length_col: str = "n_chars",
    id_col: str = "doc_id",
    n_groups: int = PACK_GROUPS,
    salt: str = "pack-v1",
    strict: bool = False,
) -> DataFrame:
    """Assign docs to fixed-budget training packs:
    (doc_id, grp, pack, length).

    Default mode is offset packing, parallelized by hashing docs into
    ``n_groups`` independent streams: within a group (ordered by id) docs
    are conceptually concatenated and the stream is chunked every
    ``budget`` units — a doc belongs to the pack its START offset falls
    in (``pack = floor(cumsum_before / budget)``).  A pack's total can
    therefore exceed the budget by up to its last doc's length (that doc
    straddles the chunk edge; docs are never split) — the invariant is
    "a pack was under budget before its final doc joined", pinned in
    test_curation.  One shuffle keyed by the hash group; packs are
    deterministic because group assignment and intra-group order are both
    pure functions of the id.  ``n_groups`` bounds per-task state: each
    task windows over ~N/n_groups rows with an external sort.

    ``strict=True`` is the never-exceed variant a token-budgeted trainer
    wants: first-fit in id order within the hash group (each doc joins
    the lowest-numbered open pack with enough remaining capacity, else
    opens a new pack) via ``applyInPandas`` — same one shuffle on the
    hash group, Arrow-batched Python per group instead of a window.  A
    doc longer than ``budget`` can never fit a pack and raises
    ``ValueError`` (filter or truncate upstream).  Sequential by nature
    (each placement depends on all prior ones), so there is no
    window-function form; ``n_groups`` is the parallelism dial.

    Note cross-group packs never mix — the price of parallelism is at
    most one under-filled tail pack per group (default) / a few open
    tails (strict).
    """
    grp = F.expr(
        f"{_hash60(f'''concat('{salt}:', CAST({id_col} AS STRING))''')} % {n_groups}"
    )
    base = df.select(F.col(id_col), F.col(length_col).alias("length"), grp.alias("grp"))
    if strict:
        import pandas as pd

        b = int(budget)

        def first_fit(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(id_col, ignore_index=True)
            remaining: list[int] = []  # open-pack capacities, index = pack id
            packs: list[int] = []
            for length in pdf["length"]:
                if length > b:
                    raise ValueError(
                        f"pack_sequences(strict=True): doc length {length} "
                        f"exceeds budget {b}"
                    )
                for i, rem in enumerate(remaining):
                    if rem >= length:
                        remaining[i] = rem - length
                        packs.append(i)
                        break
                else:
                    remaining.append(b - length)
                    packs.append(len(remaining) - 1)
            pdf["pack"] = pd.Series(packs, dtype="int64")
            return pdf[[id_col, "grp", "pack", "length"]]

        return base.groupBy("grp").applyInPandas(
            first_fit, schema=f"{id_col} long, grp long, pack long, length long"
        )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("grp")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        base.withColumn("_cum", F.sum("length").over(w))
        .select(
            id_col,
            "grp",
            F.floor((F.col("_cum") - F.col("length")) / F.lit(budget)).alias("pack"),
            "length",
        )
    )


def pack_sequences_oracle(
    table: str = "documents",
    *,
    budget: int,
    length_col: str = "n_chars",
    id_col: str = "doc_id",
    n_groups: int = PACK_GROUPS,
    salt: str = "pack-v1",
) -> str:
    return f"""
SELECT {id_col}, grp,
       CAST(FLOOR((cum - length) / {budget}) AS BIGINT) AS pack, length
FROM (
  SELECT {id_col},
         {_hash60_duck(f"concat('{salt}:', CAST({id_col} AS VARCHAR))")} % {n_groups} AS grp,
         {length_col} AS length,
         SUM({length_col}) OVER (
           PARTITION BY {_hash60_duck(f"concat('{salt}:', CAST({id_col} AS VARCHAR))")} % {n_groups}
           ORDER BY {id_col}
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM {table})
"""


def domain_topk_oracle(
    table: str = "documents",
    *,
    k: int,
    domain_col: str = "source",
    order_col: str = "n_chars",
    id_col: str = "doc_id",
) -> str:
    return f"""
SELECT domain, {id_col}, {order_col}, rk FROM (
  SELECT {domain_col} AS domain, {id_col}, {order_col},
         ROW_NUMBER() OVER (PARTITION BY {domain_col}
                            ORDER BY {order_col} DESC, {id_col} ASC) AS rk
  FROM {table})
WHERE rk <= {k}
"""


# -- exact-fraction stratified split ----------------------------------------

def stratified_split(
    df: DataFrame,
    *,
    frac: float = 0.1,
    fracs: dict[str, float] | None = None,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat-v1",
    broadcast_labels: bool = True,
    small: bool | None = None,
) -> DataFrame:
    """EXACT-fraction per-stratum split: within every stratum the
    documents with the smallest salted hashes fill each named fraction
    in order — (doc_id, stratum, split).  ``frac`` is the common
    single-holdout form (``floor(frac · n)`` docs → ``eval``, rest
    ``train``); ``fracs`` generalizes to multi-way exact splits, e.g.
    ``{"valid": 0.05, "test": 0.05}`` → first ``floor(0.05·n)`` hashes
    valid, next ``floor(0.10·n) − floor(0.05·n)`` test, rest train.

    ``hash_split`` is probabilistic (a 10% bucket holds ~10% ± noise);
    benchmark holdouts often need the fraction exact per stratum.  The
    naive exact form ranks every row in a per-stratum window — ONE task
    per stratum, a scale-killer for a billion-doc stratum.  Here
    selection is distributed: the 60-bit hash space is cut into 1024
    fixed buckets, a (stratum, bucket) histogram (map-side combined,
    ≤1024 rows per stratum) assigns every bucket that falls entirely
    inside one split segment wholesale via a cumulative sum over that
    tiny histogram, and only segment-straddling buckets —
    ~n_stratum/1024 rows each — are ranked.  No window ever sees more
    than 1/1024 of a stratum; the corpus text never shuffles (only id,
    stratum, hash).  Deterministic, re-saltable, engine-portable (ties
    broken by (hash, id)).

    ``broadcast_labels`` guards the final whole-bucket label join
    (≤1024 rows PER STRATUM, but stratum cardinality is data-dependent):
    True (default) forces a broadcast so the corpus-sized base never
    shuffles there — right for bounded stratum columns (lang, split
    tier, top-level domain bucket).  Pass False for unbounded stratum
    columns (e.g. ``source`` on a web corpus), where a forced broadcast
    could exhaust driver/executor memory: the join degrades to a
    shuffle.  Measured (r12, sf0.1): relying on AQE's runtime
    conversion instead of the hint is ~1.5× slower because the base
    side's shuffle WRITE still happens — AQE only elides the network
    read — so the hint stays the bounded-cardinality default.

    ``small`` (r15, ADVICE r14): the small-lane guard normally asks
    Catalyst for the DERIVED input's size estimate, which for a
    join+window-shaped input (ccnet_curate/curate_corpus survivors) can
    overshoot the threshold by orders of magnitude and silently keep a
    tiny input on the histogram path — whose three consumers of ``base``
    then replicate the caller's whole upstream subtree.  A caller that
    KNOWS its input is a subset of a well-estimated source scan passes
    ``small=is_small(source)`` to base the decision on the accurate
    scan statistic; ``None`` keeps the derived-estimate guard.
    """
    from functools import reduce

    from pyspark.sql import Window

    if fracs is None:
        fracs = {"eval": float(frac)}
    names = list(fracs)
    if not names or any(not (0.0 <= float(v) <= 1.0) for v in fracs.values()):
        raise ValueError("fracs values must be in [0, 1]")
    if sum(float(v) for v in fracs.values()) > 1.0 + 1e-12:
        raise ValueError("fracs must sum to at most 1")
    cumf = []
    acc = 0.0
    for n in names:
        acc += float(fracs[n])
        cumf.append(acc)
    m = len(names)
    label_arr = F.array(*[F.lit(n) for n in names + ["train"]])

    def seg(pos):
        # segment index of 0-based position: #thresholds K_j <= pos
        return reduce(
            lambda a, b: a + b,
            [
                F.when(pos >= F.col(f"_k{j}"), F.lit(1)).otherwise(F.lit(0))
                for j in range(m)
            ],
        )

    h = F.expr(_hash60(f"concat('{salt}:', CAST({id_col} AS STRING))"))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("_st"),
        h.alias("_h"),
    ).withColumn("_b", F.shiftright("_h", 50))

    # SMALL-INPUT fast lane (r14.2): the 1024-bucket histogram exists so
    # no window ever ranks more than 1/1024 of a stratum — a SKEW/scale
    # device.  Under the adaptive threshold, rank each stratum directly
    # (exactly the oracle's own ROW_NUMBER-over-(hash, id) form, so the
    # labels are identical BY CONSTRUCTION), replacing the histogram,
    # cumsum, straddle-rank and two label joins with one window pass.
    from simple_tsdb_spark.functions.adaptive import is_small

    if is_small(base) if small is None else small:
        wst = Window.partitionBy("_st").orderBy(
            F.col("_h").asc(), F.col("doc_id").asc()
        )
        wn = Window.partitionBy("_st")
        lab = F.lit("train")
        for j in reversed(range(m)):
            lab = F.when(
                F.col("_rn")
                <= F.floor(F.lit(cumf[j]) * F.col("_n")).cast("long"),
                F.lit(names[j]),
            ).otherwise(lab)
        return (
            base.withColumn("_rn", F.row_number().over(wst))
            .withColumn("_n", F.count(F.lit(1)).over(wn))
            .select(
                "doc_id", F.col("_st").alias(stratum_col), lab.alias("split")
            )
        )

    # A NULL stratum is a real stratum (docs with an unknown key still
    # split exactly among themselves): every _st equi-join below is
    # null-safe (<=> / IS NOT DISTINCT FROM on the oracle side) — a plain
    # join would silently drop the NULL group that groupBy faithfully
    # keeps, leaving those docs with no split.
    hist = base.groupBy("_st", "_b").agg(F.count(F.lit(1)).alias("_c"))
    k_s = hist.groupBy("_st").agg(
        *[
            F.floor(F.lit(cumf[j]) * F.sum("_c")).cast("long").alias(f"_k{j}")
            for j in range(m)
        ]
    )
    wcum = Window.partitionBy("_st").orderBy("_b")
    cum = (
        hist.withColumn("_cum", F.sum("_c").over(wcum))
        .withColumn("_prev", F.col("_cum") - F.col("_c"))
        .join(
            k_s.withColumnRenamed("_st", "_st2"),
            F.col("_st").eqNullSafe(F.col("_st2")),
        )
        .drop("_st2")
    )
    seg_first = seg(F.col("_prev"))
    seg_last = seg(F.col("_cum") - 1)
    whole = cum.where(seg_first == seg_last).select(
        "_st", "_b", F.element_at(label_arr, seg_first + 1).alias("_wlab")
    )
    whole2 = whole.withColumnRenamed("_st", "_st2").withColumnRenamed("_b", "_b2")
    bound = cum.where(seg_first != seg_last).select(
        "_st", "_b", "_prev", *[f"_k{j}" for j in range(m)]
    )

    # segment-straddling bucket: rank only ~n_stratum/1024 rows
    wr = Window.partitionBy("_st", "_b").orderBy(F.col("_h").asc(), F.col("doc_id").asc())
    bnd = (
        base.join(
            bound.withColumnRenamed("_st", "_st2").withColumnRenamed("_b", "_b2"),
            F.col("_st").eqNullSafe(F.col("_st2")) & (F.col("_b") == F.col("_b2")),
        )
        .withColumn("_pos", F.col("_prev") + F.row_number().over(wr) - 1)
        .select("doc_id", F.element_at(label_arr, seg(F.col("_pos")) + 1).alias("_blab"))
    )

    return (
        base.join(
            # cardinality guard per r11 ADVICE — see docstring
            (F.broadcast(whole2) if broadcast_labels else whole2),
            F.col("_st").eqNullSafe(F.col("_st2")) & (F.col("_b") == F.col("_b2")),
            "left",
        )
        .join(bnd, "doc_id", "left")
        .select(
            "doc_id",
            F.col("_st").alias(stratum_col),
            F.coalesce(F.col("_wlab"), F.col("_blab")).alias("split"),
        )
    )


def stratified_split_oracle(
    table: str = "documents",
    *,
    frac: float = 0.1,
    fracs: dict[str, float] | None = None,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "strat-v1",
) -> str:
    if fracs is None:
        fracs = {"eval": float(frac)}
    names = list(fracs)
    cumf, acc = [], 0.0
    for n in names:
        acc += float(fracs[n])
        cumf.append(acc)
    ks = ",\n         ".join(
        f"CAST(floor({cumf[j]!r} * COUNT(*)) AS BIGINT) AS _k{j}"
        for j in range(len(names))
    )
    cases = " ".join(
        f"WHEN _rn <= _k{j} THEN '{names[j]}'" for j in range(len(names))
    )
    return f"""
WITH base AS (
  SELECT {id_col} AS doc_id, {stratum_col},
         {_hash60_duck(f"concat('{salt}:', CAST({id_col} AS VARCHAR))")} AS _h
  FROM {table}),
k AS (
  SELECT {stratum_col}, {ks}
  FROM base GROUP BY {stratum_col}),
r AS (
  SELECT doc_id, {stratum_col},
         ROW_NUMBER() OVER (PARTITION BY {stratum_col} ORDER BY _h, doc_id) AS _rn
  FROM base)
SELECT doc_id, r.{stratum_col} AS {stratum_col},
       CASE {cases} ELSE 'train' END AS split
FROM r JOIN k ON r.{stratum_col} IS NOT DISTINCT FROM k.{stratum_col}
"""


# -- end-to-end curation chain ----------------------------------------------

def curate_corpus(
    df: DataFrame,
    *,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    frac: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The whole batch curation chain as ONE declarative plan —
    (doc_id, lang, split) for every surviving document:

    1. quality gate: ``quality_score ≥ min_quality`` (pure codegen;
       the score is bit-identical across engines, so the comparison is
       too);
    2. language allowlist;
    3. exact dedup, keep-first: one md5-content groupBy (uniform key),
       min-id keeper;
    4. ``stratified_split`` exact-fraction eval holdout per language
       over the survivors.

    Composes only audited pieces: two corpus-wide shuffles total (the
    dedup groupBy and the split's histogram), the text never broadcasts,
    and no window sees more than 1/1024 of a stratum.  Catalyst fuses
    the quality filter into the scan projection — filtering is free.
    """
    from simple_tsdb_spark.pipeline.text import quality_score

    q = quality_score(df, text_col=text_col, id_col=id_col)
    # Keep-first dedup as ONE window pass over the md5 key, with the
    # split's columns projected before the shuffle (see ccnet_curate —
    # same rewrite, r14.2): one exchange instead of two, text never
    # moves, md5 keys keep the window skew-free at every scale.
    from pyspark.sql import Window

    kept = (
        df.select(F.col(id_col), F.col(lang_col), F.md5(F.col(text_col)).alias("_h"))
        .join(q.where(F.col("quality") >= float(min_quality)).select(id_col), id_col)
        .where(F.col(lang_col).isin(*langs))
    )
    wdup = Window.partitionBy("_h").orderBy(F.col(id_col))
    survivors = (
        kept.withColumn("_rn", F.row_number().over(wdup))
        .where(F.col("_rn") == 1)
        .select(id_col, lang_col)
    )
    # Lane hint from the SOURCE scan (r15, ADVICE r14): survivors ⊆ df
    # rows projected to (id, lang), so the parquet scan's accurate
    # estimate bounds the split input; the derived join+window estimate
    # overshoots and silently kept this split on the histogram path,
    # whose three base consumers replicate the whole dedup subtree.
    from simple_tsdb_spark.functions.adaptive import is_small

    return stratified_split(
        survivors, frac=frac, stratum_col=lang_col, id_col=id_col,
        small=is_small(df),
    )


def curate_corpus_oracle(
    table: str = "documents",
    *,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en", "de", "fr"),
    frac: float = 0.1,
) -> str:
    from simple_tsdb_spark.pipeline.text import quality_score_oracle

    lang_list = ", ".join(f"'{l}'" for l in langs)
    split_sql = stratified_split_oracle(table="survivors", frac=frac).strip()
    assert split_sql.startswith("WITH ")
    return f"""
WITH q AS ({quality_score_oracle(table)}),
kept AS (
  SELECT d.* FROM {table} d JOIN q USING (doc_id)
  WHERE q.quality >= {min_quality!r} AND d.lang IN ({lang_list})),
keeper AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
survivors AS (
  SELECT kept.* FROM kept JOIN keeper USING (doc_id)),
{split_sql[5:]}
"""


def pack_stats(
    df: DataFrame,
    *,
    budget: int,
    length_col: str = "n_chars",
    id_col: str = "doc_id",
    n_groups: int = PACK_GROUPS,
    salt: str = "pack-v1",
) -> DataFrame:
    """Packing-quality report over :func:`pack_sequences`: per (group,
    pack) the doc count, total length, the ppm truncated-BIGINT fill
    ratio vs the budget (round-10 integer-finals doctrine), and the
    straddle flag (offset packing lets the final doc overshoot) — the
    numbers a token-budgeted training run checks before shipping packs.

    Adds one tiny (grp, pack)-keyed aggregation on top of the packer's
    single hash-group shuffle.
    """
    packs = pack_sequences(
        df, budget=budget, length_col=length_col, id_col=id_col,
        n_groups=n_groups, salt=salt,
    )
    b = int(budget)
    return (
        packs.groupBy("grp", "pack")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("length").alias("total_len"))
        .select(
            "grp",
            "pack",
            "n_docs",
            "total_len",
            F.expr(f"(1000000 * total_len) div {b}").alias("fill_ratio_ppm"),
            (F.col("total_len") > b).alias("straddles"),
        )
        .orderBy("grp", "pack")
    )


def pack_stats_oracle(
    table: str = "documents",
    *,
    budget: int,
    length_col: str = "n_chars",
    id_col: str = "doc_id",
    n_groups: int = PACK_GROUPS,
    salt: str = "pack-v1",
) -> str:
    inner = pack_sequences_oracle(
        table, budget=budget, length_col=length_col, id_col=id_col,
        n_groups=n_groups, salt=salt,
    ).strip()
    b = int(budget)
    return f"""
WITH packs AS ({inner})
SELECT grp, pack, COUNT(*) AS n_docs, CAST(SUM(length) AS BIGINT) AS total_len,
       (1000000 * CAST(SUM(length) AS BIGINT)) // {b} AS fill_ratio_ppm,
       SUM(length) > {b} AS straddles
FROM packs GROUP BY grp, pack
"""


def ccnet_curate(
    df: DataFrame,
    *,
    fit_pred: str = "source = 'src0'",
    frac: float = 0.1,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The CCNet curation chain as ONE declarative plan — the LM-driven
    sibling of :func:`curate_corpus`: (doc_id, lang, split) for every
    surviving document.

    1. perplexity gate: bigram-LM head/middle/tail buckets at exact
       tercile cuts (``text.lm_perplexity_buckets``); CCNet's keep rule
       drops the ``tail`` bucket (and NULL-xent no-bigram docs);
    2. exact dedup, keep-first (md5 groupBy, min-id keeper);
    3. exact-fraction stratified eval holdout per language.

    Composes only gated pieces, so every stage's cross-engine
    determinism is already proven; the chain adds no new shuffle shape
    beyond its parts (LM fit/score passes + dedup groupBy + the split's
    1024-bucket histogram).
    """
    from simple_tsdb_spark.pipeline.text import lm_perplexity_buckets

    # sort=False: the bucket frame is filtered to keep_ids and joined
    # away immediately — its presentation orderBy would be a wasted
    # global sort inside this plan (r15; strict win at every scale).
    b = lm_perplexity_buckets(
        df, fit_pred=fit_pred, text_col=text_col, id_col=id_col, cache="local",
        sort=False,
    )
    # (Materializing the bucket frame here to shrink the tail plan was
    # A/B-measured a LOSS at sf0.1 — warm 2.15 s without vs 2.48-2.68 s
    # with, r15: the scores checkpoint already truncates the expensive
    # lineage and the extra checkpoint only adds latency.  Not adopted.)
    keep_ids = b.where(F.col("bucket").isin("head", "middle")).select(id_col)
    # Keep-first dedup as ONE window pass (r14.2 A/B: 1.11×): min-id
    # via row_number over the md5 key is the same keeper set as the
    # groupBy+join-back form, with one exchange instead of two and the
    # split's needed columns projected BEFORE the shuffle — the document
    # text never moves (only id, stratum, digest).  Strictly fewer
    # passes at every scale; md5 keys make the window skew-free.
    from pyspark.sql import Window

    kept = df.select(
        F.col(id_col), F.col(lang_col), F.md5(F.col(text_col)).alias("_h")
    ).join(keep_ids, id_col)
    wdup = Window.partitionBy("_h").orderBy(F.col(id_col))
    survivors = (
        kept.withColumn("_rn", F.row_number().over(wdup))
        .where(F.col("_rn") == 1)
        .select(id_col, lang_col)
    )
    # Lane hint from the SOURCE scan — see curate_corpus (r15).
    from simple_tsdb_spark.functions.adaptive import is_small

    return stratified_split(
        survivors, frac=frac, stratum_col=lang_col, id_col=id_col,
        small=is_small(df),
    )


def ccnet_curate_oracle(
    table: str = "documents",
    *,
    fit_pred: str = "source = 'src0'",
    frac: float = 0.1,
) -> str:
    from simple_tsdb_spark.pipeline.text import lm_perplexity_buckets_oracle

    lm = lm_perplexity_buckets_oracle(table, fit_pred=fit_pred).strip()
    split_sql = stratified_split_oracle(table="survivors", frac=frac).strip()
    assert split_sql.startswith("WITH ")
    return f"""
WITH b AS (SELECT * FROM ({lm}) _lm),
kept AS (
  SELECT d.* FROM {table} d JOIN b USING (doc_id)
  WHERE b.bucket IN ('head', 'middle')),
keeper AS (
  SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(text)),
survivors AS (
  SELECT kept.* FROM kept JOIN keeper USING (doc_id)),
{split_sql[5:]}
"""


# -- training order -----------------------------------------------------------

def training_order(
    df: DataFrame,
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "order-v1",
    seed: str = "epoch0",
) -> DataFrame:
    """Deterministic global training order at shard granularity:
    ``(doc_id, shard, pos)`` — the shuffle every epoch of LLM training
    needs, WITHOUT a global sort: docs hash to ``n_shards`` shards by
    ``md5(salt:seed:id)``, and ``pos`` ranks by the same hash WITHIN
    the shard only.  Readers stream shards in id order and rows in
    ``pos`` order; changing ``seed`` reshuffles everything, same seed
    reproduces the epoch byte-for-byte.

    At 100 TB: one shuffle keyed by shard (uniform by construction —
    md5 bits), per-shard external-sort windows that spill; no stage
    ever orders more than 1/n_shards of the corpus, and no driver-side
    anything.  (A true global ORDER BY would funnel the corpus through
    a single range-partitioned sort — this is the standard shard-local
    alternative with the same statistical properties for training.)

    Ties are impossible in practice (60-bit hash), but ``id`` breaks
    them deterministically anyway.
    """
    from pyspark.sql import Window

    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    h = F.expr(
        _hash60(f"concat('{salt}:', '{seed}', ':', CAST({id_col} AS STRING))")
    )
    x = df.select(F.col(id_col), h.alias("_h")).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(int(n_shards))).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return x.withColumn("pos", F.row_number().over(w)).select(
        id_col, "shard", "pos"
    )


def training_order_oracle(
    table: str = "documents",
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "order-v1",
    seed: str = "epoch0",
) -> str:
    h = _hash60_duck(
        f"concat('{salt}:', '{seed}', ':', CAST({id_col} AS VARCHAR))"
    )
    return f"""
WITH x AS (
  SELECT {id_col}, {h} AS h FROM {table}),
s AS (SELECT {id_col}, h, CAST(h % {int(n_shards)} AS INTEGER) AS shard FROM x)
SELECT {id_col}, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, {id_col}) AS INTEGER) AS pos
FROM s
"""


# -- corpus versioning --------------------------------------------------------

def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot diff between two corpus versions — the dataset-
    versioning primitive (what changed between crawl N and crawl N+1,
    what a re-run of curation added/removed): one row per doc id seen
    in either version with ``status`` ∈ added | removed | changed |
    unchanged (content compared by digest, not bytes moved).

    One full outer join on the uniform doc id (both sides reduced to
    (id, md5) projections first, so the join carries 2 small columns
    no matter how wide the corpus is); everything else is a pure
    expression.  At 100 TB both sides shuffle once on the id — the
    unavoidable minimum for an exact diff; with both snapshots
    bucketed by id the join is co-located and shuffle-free.
    """
    o = old.select(F.col(id_col), F.md5(F.col(text_col)).alias("_oh"))
    n = new.select(F.col(id_col), F.md5(F.col(text_col)).alias("_nh"))
    j = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(F.col(id_col), status.alias("status")).orderBy(id_col)


def corpus_diff_oracle(
    old_sql: str,
    new_sql: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Oracle twin; ``old_sql``/``new_sql`` are SELECTs producing the two
    versions (id + text columns)."""
    return f"""
WITH o AS (SELECT {id_col}, md5({text_col}) AS oh FROM ({old_sql})),
n AS (SELECT {id_col}, md5({text_col}) AS nh FROM ({new_sql})),
j AS (SELECT COALESCE(o.{id_col}, n.{id_col}) AS {id_col}, oh, nh
      FROM o FULL OUTER JOIN n ON o.{id_col} = n.{id_col})
SELECT {id_col},
       CASE WHEN oh IS NULL THEN 'added'
            WHEN nh IS NULL THEN 'removed'
            WHEN oh <> nh THEN 'changed'
            ELSE 'unchanged' END AS status
FROM j
"""
