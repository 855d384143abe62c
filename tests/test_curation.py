"""Curation operators: dedup clustering, hash split, domain top-k.

Model-based: hand-built graphs with known components (chains that need
several propagation rounds, singletons, merges), Python-recomputed split
assignments, and a skewed-domain corpus whose exact top-k is computed in
pandas.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from simple_tsdb_spark.pipeline import (
    dedup_components,
    domain_topk,
    hash_split,
    mixture_sample,
    pack_sequences,
)


def _components(spark, edges, docs=None):
    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    docs_df = None
    if docs is not None:
        docs_df = spark.createDataFrame(pd.DataFrame({"doc_id": docs}))
    out = dedup_components(pairs, docs_df)
    return {r.doc: r.component for r in out.collect()}


def test_cc_chain_needs_multiple_rounds(spark, monkeypatch):
    # 0-1-2-3-4-5-6-7: diameter 7, exercises >1 hash-to-min round.
    # Pin the distributed loop lane (the fast lane has no rounds).
    monkeypatch.setenv("SPARK_GRAFT_CC_COLLECT_EDGES", "0")
    edges = [(i, i + 1) for i in range(7)]
    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    stats = {}
    out = dedup_components(pairs, stats=stats)
    got = {r.doc: r.component for r in out.collect()}
    assert got == {i: 0 for i in range(8)}
    # pointer jumping: O(log diameter) rounds, not O(diameter) — plain
    # hash-to-min would need 7+ rounds on this chain.
    assert stats["rounds"] <= 4


def test_cc_two_components_and_singletons(spark):
    edges = [(10, 11), (11, 12), (20, 21)]
    got = _components(spark, edges, docs=[10, 11, 12, 20, 21, 30, 31])
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 30: 30, 31: 31}


def test_cc_merge_through_shared_node(spark):
    # Two stars sharing one leaf collapse into one component.
    edges = [(1, 5), (2, 5), (3, 6), (4, 6), (5, 6)]
    got = _components(spark, edges)
    assert set(got.values()) == {1}


def test_cc_empty_pairs_all_singletons(spark):
    pairs = spark.createDataFrame([], "a long, b long")
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [7, 8, 9]}))
    out = {r.doc: r.component for r in dedup_components(pairs, docs).collect()}
    assert out == {7: 7, 8: 8, 9: 9}


def test_cc_max_iter_raises(spark, monkeypatch):
    # max_iter is a loop-lane guard; pin the loop (the fast lane is exact
    # and converges without iterating).
    monkeypatch.setenv("SPARK_GRAFT_CC_COLLECT_EDGES", "0")
    edges = [(i, i + 1) for i in range(5)]
    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_components(pairs, max_iter=2)


def test_cc_fast_lane_equals_loop(spark, monkeypatch):
    # The driver union-find lane and the distributed hash-to-min loop
    # must produce IDENTICAL labels on an awkward graph: chains (deep),
    # a star, shared-leaf merges, self-loops, duplicate + reversed
    # edges, and docs-table singletons.
    edges = (
        [(i, i + 1) for i in range(12)]            # chain 0..12
        + [(100, k) for k in (101, 102, 103)]       # star
        + [(103, 12)]                               # merge star into chain
        + [(200, 200), (201, 200), (200, 201)]      # self-loop + dup/reverse
        + [(301, 300)]                              # min arrives via b-side
    )
    docs = list(range(13)) + [100, 101, 102, 103, 200, 201, 300, 301, 400]
    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    docs_df = spark.createDataFrame(pd.DataFrame({"doc_id": docs}))

    monkeypatch.setenv("SPARK_GRAFT_CC_COLLECT_EDGES", "0")
    loop = {r.doc: r.component for r in dedup_components(pairs, docs_df).collect()}
    monkeypatch.delenv("SPARK_GRAFT_CC_COLLECT_EDGES")
    fast = {r.doc: r.component for r in dedup_components(pairs, docs_df).collect()}
    assert fast == loop
    assert fast[400] == 400 and fast[12] == 0 and fast[103] == 0


def _union_find(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for n in nodes:
        r = find(n)
        comp.setdefault(r, []).append(n)
    return {n: min(ms) for r, ms in comp.items() for n in ms}


def test_cc_random_graphs_vs_union_find(spark):
    """Randomized model check: hash-to-min must agree with union-find on
    arbitrary graph shapes (cycles, stars, chains, self-loops, dups)."""
    import random

    rng = random.Random(42)
    for trial in range(4):
        n = rng.randint(5, 40)
        nodes = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(0, 2 * n))
        ]
        want = _union_find(edges, nodes)
        got = _components(spark, edges or [(0, 0)], docs=nodes)
        assert got == want, f"trial {trial}: n={n} edges={edges}"


def _py_bucket(doc_id: int, salt: str = "split-v1") -> int:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % 100


def test_hash_split_matches_python_model(spark):
    ids = list(range(1, 301))
    df = spark.createDataFrame(pd.DataFrame({"doc_id": ids}))
    got = {r.doc_id: (r.bucket, r.split) for r in hash_split(df).collect()}
    for i in ids:
        b = _py_bucket(i)
        want = "train" if b < 80 else ("valid" if b < 90 else "test")
        assert got[i] == (b, want)
    # roughly proportional (loose bound; exact assignment checked above)
    n_train = sum(1 for b, s in got.values() if s == "train")
    assert 200 <= n_train <= 280


def test_hash_split_stable_under_growth(spark):
    """A doc's split must not depend on what else is in the corpus."""
    small = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3]}))
    big = spark.createDataFrame(pd.DataFrame({"doc_id": list(range(1, 100))}))
    s = {r.doc_id: r.split for r in hash_split(small).collect()}
    b = {r.doc_id: r.split for r in hash_split(big).collect()}
    assert all(b[i] == s[i] for i in (1, 2, 3))


def test_hash_split_weights_validated(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1]}))
    with pytest.raises(ValueError):
        hash_split(df, weights=(50, 50, 50))


def _skewed_corpus() -> pd.DataFrame:
    rows = []
    for i in range(400):  # hot domain
        rows.append(("web", i, 1000 + (i * 37) % 500))
    for i in range(10):  # small domains
        rows.append(("books", 1000 + i, 2000 + i))
        rows.append(("wiki", 2000 + i, 50 + i))
    return pd.DataFrame(rows, columns=["source", "doc_id", "n_chars"])


def test_domain_topk_exact_vs_pandas(spark):
    pdf = _skewed_corpus()
    df = spark.createDataFrame(pdf)
    got = (
        domain_topk(df, k=5)
        .toPandas()
        .sort_values(["domain", "rk"])
        .reset_index(drop=True)
    )
    want = (
        pdf.sort_values(["source", "n_chars", "doc_id"], ascending=[True, False, True])
        .groupby("source")
        .head(5)
        .rename(columns={"source": "domain"})
        .assign(rk=lambda d: d.groupby("domain").cumcount() + 1)
        .sort_values(["domain", "rk"])
        .reset_index(drop=True)[["domain", "doc_id", "n_chars", "rk"]]
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_domain_topk_salting_invariant(spark):
    """Result must be identical for any salt fan-out (the two-stage plan
    is an optimization, not a semantics change)."""
    df = spark.createDataFrame(_skewed_corpus())
    base = sorted(map(tuple, domain_topk(df, k=3, salts=1).collect()))
    for s in (4, 64):
        assert sorted(map(tuple, domain_topk(df, k=3, salts=s).collect())) == base


def test_domain_topk_k_larger_than_domain(spark):
    df = spark.createDataFrame(_skewed_corpus())
    out = domain_topk(df, k=100).toPandas()
    assert out.groupby("domain").size().to_dict() == {"web": 100, "books": 10, "wiki": 10}


def _mix_bucket(doc_id: int, salt: str = "mix-v1") -> int:
    h = hashlib.md5(f"{salt}:{doc_id}".encode()).hexdigest()
    return int(h[:15], 16) % 100


def test_mixture_sample_matches_python_model(spark):
    pdf = _skewed_corpus()
    df = spark.createDataFrame(pdf)
    rates = {"web": 20, "wiki": 100}
    got = {r.doc_id for r in mixture_sample(df, rates, default_rate=50).collect()}
    want = set()
    for _, row in pdf.iterrows():
        rate = rates.get(row.source, 50)
        if _mix_bucket(row.doc_id) < rate:
            want.add(row.doc_id)
    assert got == want
    # wiki rate 100 keeps every wiki doc
    assert set(pdf[pdf.source == "wiki"].doc_id) <= got


def test_mixture_sample_monotone_in_rate(spark):
    """Raising a rate must only ADD docs (re-weighting without resampling)."""
    df = spark.createDataFrame(_skewed_corpus())
    lo = {r.doc_id for r in mixture_sample(df, {"web": 20}, default_rate=0).collect()}
    hi = {r.doc_id for r in mixture_sample(df, {"web": 60}, default_rate=0).collect()}
    assert lo <= hi


def test_mixture_sample_rejects_bad_rate(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "source": ["web"]}))
    with pytest.raises(ValueError):
        mixture_sample(df, {"web": 150})


def test_mixture_sample_empty_rates_matches_oracle(spark):
    """Empty rates (pure default_rate) is a valid input for BOTH the
    operator and its oracle — the oracle must emit a plain literal, not a
    clause-less CASE (DuckDB syntax error)."""
    import duckdb

    from simple_tsdb_spark.pipeline.curation import mixture_sample_oracle

    pdf = _skewed_corpus()
    df = spark.createDataFrame(pdf)
    got = sorted(
        (r.doc_id, r.domain, r.bucket)
        for r in mixture_sample(df, {}, default_rate=40).collect()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = sorted(
        map(tuple, con.execute(mixture_sample_oracle(rates={}, default_rate=40)).fetchall())
    )
    assert got == want and len(got) > 0


def _pack_model(pdf: pd.DataFrame, budget: int, n_groups: int, salt: str = "pack-v1"):
    """Python reimplementation: greedy contiguous packing per hash group."""
    out = {}
    grp = {
        i: int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16) % n_groups
        for i in pdf.doc_id
    }
    for g in sorted(set(grp.values())):
        ids = sorted(i for i in pdf.doc_id if grp[i] == g)
        lens = dict(zip(pdf.doc_id, pdf.n_chars))
        cum = 0
        for i in ids:
            out[i] = (g, cum // budget)
            cum += lens[i]
    return out


def test_pack_sequences_matches_python_model(spark):
    pdf = _skewed_corpus()
    df = spark.createDataFrame(pdf)
    got = {r.doc_id: (r.grp, r.pack) for r in pack_sequences(df, budget=900, n_groups=4).collect()}
    assert got == _pack_model(pdf, budget=900, n_groups=4)


def test_pack_sequences_overflow_bounded_by_last_doc(spark):
    """Offset-packing invariant: a pack was under budget before its last
    doc joined — overflow is bounded by one document, never unbounded."""
    budget = 3000
    pdf = _skewed_corpus()
    df = spark.createDataFrame(pdf)
    out = pack_sequences(df, budget=budget, n_groups=2).toPandas()
    last_len = (
        out.sort_values("doc_id").groupby(["grp", "pack"])["length"].last()
    )
    totals = out.groupby(["grp", "pack"])["length"].sum()
    assert ((totals - last_len) < budget).all()
    # packs are contiguous ints per group starting at 0
    for _, g in out.groupby("grp"):
        packs = sorted(g["pack"].unique())
        assert packs == list(range(len(packs)))


def _first_fit_model(pdf: pd.DataFrame, budget: int, n_groups: int, salt: str = "pack-v1"):
    """Python first-fit model: id order within hash group."""
    out = {}
    grp = {
        i: int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16) % n_groups
        for i in pdf.doc_id
    }
    lens = dict(zip(pdf.doc_id, pdf.n_chars))
    for g in sorted(set(grp.values())):
        remaining = []
        for i in sorted(i for i in pdf.doc_id if grp[i] == g):
            for p, rem in enumerate(remaining):
                if rem >= lens[i]:
                    remaining[p] -= lens[i]
                    out[i] = (g, p)
                    break
            else:
                remaining.append(budget - lens[i])
                out[i] = (g, len(remaining) - 1)
    return out


def test_pack_sequences_strict_matches_python_model(spark):
    pdf = _skewed_corpus()
    df = spark.createDataFrame(pdf)
    got = {
        r.doc_id: (r.grp, r.pack)
        for r in pack_sequences(df, budget=2600, n_groups=4, strict=True).collect()
    }
    assert got == _first_fit_model(pdf, budget=2600, n_groups=4)


def test_pack_sequences_strict_never_exceeds_budget(spark):
    budget = 3000
    df = spark.createDataFrame(_skewed_corpus())
    out = pack_sequences(df, budget=budget, strict=True, n_groups=2).toPandas()
    assert (out.groupby(["grp", "pack"])["length"].sum() <= budget).all()
    # every doc still packed exactly once
    assert len(out) == len(_skewed_corpus())
    # packs are contiguous ints per group starting at 0
    for _, g in out.groupby("grp"):
        packs = sorted(g["pack"].unique())
        assert packs == list(range(len(packs)))


def test_pack_sequences_strict_rejects_oversized_doc(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "source": ["web"], "n_chars": [99]})
    )
    with pytest.raises(Exception, match="exceeds budget"):
        pack_sequences(df, budget=50, strict=True).collect()


def test_end_to_end_curation_chain(spark):
    """The full curation composition on real fixture data: decontaminate
    → near-dup cluster → keep representatives → split → sample → pack.
    Pins the cross-operator invariants a training pipeline relies on,
    not any single operator's output."""
    import pyspark.sql.functions as F

    from simple_tsdb_spark.pipeline import (
        dedup_components,
        decontaminate,
        hash_split,
        minhash_lsh_pairs,
        mixture_sample,
        pack_sequences,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where("doc_id % 97 = 0")
    corpus = docs.where("doc_id % 97 <> 0")

    # 1. decontaminate: drop docs sharing 4-grams with the benchmark
    flagged = decontaminate(corpus, bench, n=4)
    clean = corpus.join(flagged, "doc_id", "left_anti").cache()
    n_clean = clean.count()
    assert 0 < n_clean < corpus.count()

    # 2. near-dup pairs -> components -> keep the component representative
    pairs = minhash_lsh_pairs(clean)
    comp = dedup_components(pairs, clean)
    kept = clean.join(
        comp.where(F.col("doc") == F.col("component")).select(
            F.col("doc").alias("doc_id")
        ),
        "doc_id",
    ).cache()
    n_kept = kept.count()
    assert n_kept < n_clean  # fixture plants near-dups, some must collapse
    # no two kept docs may be exact duplicates
    assert kept.select(F.md5("text")).distinct().count() == n_kept

    # 3. reproducible split: partition of kept, nothing lost or invented
    split = hash_split(kept)
    sizes = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(sizes.values()) == n_kept
    assert sizes.get("train", 0) > sizes.get("valid", 0)

    # 4. mixture-sample the train split per source domain
    train = kept.join(split.where("split = 'train'").select("doc_id"), "doc_id")
    sampled = mixture_sample(train.withColumnRenamed("source", "domain"),
                             {"src0": 50}, default_rate=100, domain_col="domain")
    n_train = train.count()
    n_sampled = sampled.count()
    assert n_sampled <= n_train
    # contaminated docs can never reach the sampled train set
    assert sampled.join(flagged, "doc_id").count() == 0

    # 5. pack: every sampled doc appears in exactly one pack, and packs
    # respect the budget up to the documented last-doc overflow
    packs = pack_sequences(sampled.join(docs.select("doc_id", "n_chars"), "doc_id"),
                           budget=4096)
    assert packs.count() == n_sampled
    assert packs.select("doc_id").distinct().count() == n_sampled
    over = (
        packs.groupBy("grp", "pack").agg(F.sum("length").alias("tot"), F.max("length").alias("mx"))
        .where(F.col("tot") - F.col("mx") >= 4096)
    )
    assert over.count() == 0

    # 6. export: the packed corpus lands as balanced deterministic shards
    import tempfile

    from simple_tsdb_spark.pipeline import write_training_shards

    out = tempfile.mkdtemp() + "/shards"
    manifest = write_training_shards(packs, out, n_shards=4)
    assert sum(m["n_rows"] for m in manifest) == n_sampled
    back = spark.read.parquet(out)
    assert back.select("doc_id").distinct().count() == n_sampled


def test_write_training_shards(spark, tmp_path):
    """Shard export: membership is a pure function of the pack key
    (deterministic across rewrites), packs never tear across shards,
    shards balance, and exactly one file lands per non-empty shard."""
    import glob

    import pyspark.sql.functions as F

    from simple_tsdb_spark.pipeline import pack_sequences, write_training_shards

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    packed = pack_sequences(docs, budget=4096).cache()
    n_docs = packed.count()
    path = str(tmp_path / "shards")
    manifest = write_training_shards(packed, path, n_shards=8)

    assert sum(m["n_rows"] for m in manifest) == n_docs
    assert [m["shard"] for m in manifest] == list(range(8))
    # balance: no shard more than 3x the smallest non-empty shard
    sizes = [m["n_rows"] for m in manifest if m["n_rows"]]
    assert max(sizes) <= 3 * min(sizes), sizes
    # one file per non-empty shard
    for m in manifest:
        files = glob.glob(f"{path}/shard={m['shard']}/*.parquet")
        assert len(files) == (1 if m["n_rows"] else 0), (m, files)

    back = spark.read.parquet(path)
    assert back.count() == n_docs
    assert back.select("doc_id").distinct().count() == n_docs
    # packs intact: each (grp, pack) in exactly one shard
    torn = (
        back.groupBy("grp", "pack")
        .agg(F.countDistinct("shard").alias("ns"))
        .where("ns > 1")
    )
    assert torn.count() == 0

    # deterministic membership: a second write yields identical shard sets
    path2 = str(tmp_path / "shards2")
    manifest2 = write_training_shards(packed, path2, n_shards=8)
    assert manifest == manifest2
    back2 = spark.read.parquet(path2)
    a = {(r.doc_id, r.shard) for r in back.select("doc_id", "shard").collect()}
    b = {(r.doc_id, r.shard) for r in back2.select("doc_id", "shard").collect()}
    assert a == b
    packed.unpersist()


def test_write_training_shards_empty_shards_in_manifest(spark, tmp_path):
    """n_shards greater than the number of distinct pack keys: every
    shard id still appears in the manifest (zero counts), so a loader
    assigning one worker per manifest entry never sees a missing id."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import write_training_shards

    pdf = pd.DataFrame(
        {"grp": [0, 0, 1], "pack": [0, 0, 0], "doc_id": ["a", "b", "c"]}
    )
    path = str(tmp_path / "tiny_shards")
    manifest = write_training_shards(spark.createDataFrame(pdf), path, n_shards=16)
    assert [m["shard"] for m in manifest] == list(range(16))
    assert sum(m["n_rows"] for m in manifest) == 3
    assert sum(m["n_packs"] for m in manifest) == 2
    empties = [m for m in manifest if m["n_rows"] == 0]
    assert len(empties) >= 14
    assert all(m["n_packs"] == 0 for m in empties)


def test_pack_stats_consistency(spark):
    """pack_stats recomputes from pack_sequences output: counts/totals
    match a pandas groupby; every non-final pack in a group was under
    budget before its last doc (fill <= 1 + last_len/budget)."""
    from simple_tsdb_spark.pipeline import pack_sequences, pack_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    budget = 600
    packs = pack_sequences(docs, budget=budget).toPandas()
    got = pack_stats(docs, budget=budget).toPandas()
    want = packs.groupby(["grp", "pack"]).agg(
        n_docs=("doc_id", "size"), total_len=("length", "sum")
    )
    assert len(got) == len(want)
    for r in got.itertuples():
        wr = want.loc[(r.grp, r.pack)]
        assert r.n_docs == wr.n_docs and r.total_len == wr.total_len
        assert r.fill_ratio_ppm == (10**6 * r.total_len) // budget
        assert r.straddles == (r.total_len > budget)


def test_ccnet_curate_composes_parts(spark):
    """ccnet_curate == lm-bucket filter -> exact dedup keep-first ->
    stratified split, recomposed from the individually-gated parts."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import ccnet_curate, stratified_split
    from simple_tsdb_spark.pipeline.text import lm_perplexity_buckets

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = ccnet_curate(docs, frac=0.1).toPandas()

    b = lm_perplexity_buckets(docs).toPandas()
    keep_ids = set(b[b.bucket.isin(["head", "middle"])].doc_id)
    pdf = docs.toPandas()
    kept = pdf[pdf.doc_id.isin(keep_ids)]
    keeper_ids = set(kept.groupby(kept.text)["doc_id"].min())
    survivors = kept[kept.doc_id.isin(keeper_ids)]
    sdf = spark.createDataFrame(survivors)
    want = stratified_split(sdf, frac=0.1, stratum_col="lang").toPandas()

    key = ["doc_id"]
    got_s = got.sort_values(key, ignore_index=True)
    want_s = want.sort_values(key, ignore_index=True)
    pd.testing.assert_frame_equal(got_s[["doc_id", "lang", "split"]], want_s[["doc_id", "lang", "split"]])
    # the perplexity gate actually drops something (tail bucket nonempty)
    assert len(got) < len(pdf)


# -- keep_best_dedup ---------------------------------------------------------


def test_keep_best_dedup_picks_max_quality(spark):
    """Per component: kept = max quality, ties -> min doc_id; singletons
    keep themselves; every input doc appears exactly once."""
    edges = [(1, 2), (2, 3), (10, 11)]
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 10, 11, 42], "n_chars": [5, 9, 9, 7, 7, 1]}
    )
    pairs = spark.createDataFrame(pd.DataFrame(edges, columns=["a", "b"]))
    from simple_tsdb_spark.pipeline import keep_best_dedup

    out = keep_best_dedup(pairs, spark.createDataFrame(docs)).toPandas()
    assert len(out) == 6
    by_id = out.set_index("doc_id")
    # cluster {1,2,3}: quality tie 9 between 2 and 3 -> 2 wins
    assert bool(by_id.loc[2, "kept"]) and not bool(by_id.loc[3, "kept"])
    assert not bool(by_id.loc[1, "kept"])
    # cluster {10,11}: tie -> min id
    assert bool(by_id.loc[10, "kept"]) and not bool(by_id.loc[11, "kept"])
    # singleton keeps itself
    assert bool(by_id.loc[42, "kept"])
    # exactly one keeper per component
    assert out.groupby("component")["kept"].sum().eq(1).all()


# -- temperature_mixture -----------------------------------------------------


def _temp_model(pdf, target_total, alpha=0.5, salt="temp-v1"):
    import math

    grid = 1 << 20
    counts = pdf.groupby("source").size().to_dict()
    wq = {
        s: math.floor((n ** alpha) * grid) for s, n in counts.items()
    }
    S = sum(wq.values())
    p = {
        s: min(1.0, float(target_total) * float(wq[s]) / float(S) / float(n))
        for s, n in counts.items()
    }
    thr = {s: math.floor(p[s] * float(1 << 60)) for s in counts}
    kept = {s: 0 for s in counts}
    for _, row in pdf.iterrows():
        h = int(hashlib.md5(f"{salt}:{row.doc_id}".encode()).hexdigest()[:15], 16)
        if h < thr[row.source]:
            kept[row.source] += 1
    return counts, kept, p


def test_temperature_mixture_matches_python_model(spark):
    from simple_tsdb_spark.pipeline import temperature_mixture

    pdf = _skewed_corpus()
    got = temperature_mixture(
        spark.createDataFrame(pdf), target_total=100
    ).toPandas()
    counts, kept, p = _temp_model(pdf, 100)
    assert set(got.source) == set(counts)
    for _, r in got.iterrows():
        assert r.n_docs == counts[r.source]
        assert r.n_kept == kept[r.source], r.source
        assert r.p_keep == p[r.source], r.source


def test_temperature_mixture_upweights_small_sources(spark):
    """alpha = 0.5 keeps a larger FRACTION of small sources than of the
    hot one (the whole point of temperature sampling)."""
    from simple_tsdb_spark.pipeline import temperature_mixture

    pdf = _skewed_corpus()  # web: 400 docs, books/wiki: 10 each
    got = (
        temperature_mixture(spark.createDataFrame(pdf), target_total=100)
        .toPandas()
        .set_index("source")
    )
    assert got.loc["wiki", "p_keep"] > got.loc["web", "p_keep"]
    # natural sampling (alpha=1) keeps fractions equal across sources
    nat = (
        temperature_mixture(
            spark.createDataFrame(pdf), target_total=100, alpha=1.0
        )
        .toPandas()
        .set_index("source")
    )
    assert abs(nat.loc["wiki", "p_keep"] - nat.loc["web", "p_keep"]) < 1e-12


def test_temperature_mixture_rejects_negative_target(spark):
    from simple_tsdb_spark.pipeline import temperature_mixture

    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "source": ["web"]}))
    with pytest.raises(ValueError):
        temperature_mixture(df, target_total=-1)


# -- source_dedup_rate + training_order ---------------------------------------


def test_source_dedup_rate_planted_dups(spark):
    from simple_tsdb_spark.pipeline import source_dedup_rate

    pdf = pd.DataFrame(
        {
            "doc_id": range(10),
            "source": ["web"] * 6 + ["wiki"] * 4,
            "text": ["a", "a", "a", "b", "c", "d", "x", "y", "z", "z"],
        }
    )
    got = (
        source_dedup_rate(spark.createDataFrame(pdf))
        .toPandas()
        .set_index("source")
    )
    assert got.loc["web", "n_docs"] == 6 and got.loc["web", "n_unique"] == 4
    assert got.loc["web", "n_dup"] == 2 and got.loc["web", "dup_rate_ppm"] == 2_000_000 // 6
    assert got.loc["wiki", "n_dup"] == 1 and got.loc["wiki", "dup_rate_ppm"] == 250_000


def test_training_order_is_sharded_permutation(spark):
    from simple_tsdb_spark.pipeline import training_order

    pdf = pd.DataFrame({"doc_id": range(200)})
    df = spark.createDataFrame(pdf)
    got = training_order(df, n_shards=8).toPandas()
    # a permutation: every doc exactly once
    assert sorted(got.doc_id) == list(range(200))
    # contiguous 1..n positions per shard
    for _, g in got.groupby("shard"):
        assert sorted(g.pos) == list(range(1, len(g) + 1))
    # reproducible; a new seed reshuffles
    again = training_order(df, n_shards=8).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values("doc_id", ignore_index=True),
        again.sort_values("doc_id", ignore_index=True),
    )
    other = training_order(df, n_shards=8, seed="epoch1").toPandas()
    merged = got.merge(other, on="doc_id", suffixes=("_a", "_b"))
    assert ((merged.shard_a != merged.shard_b) | (merged.pos_a != merged.pos_b)).any()
    with pytest.raises(ValueError):
        training_order(df, n_shards=0)


def test_near_dup_rate_by_source_planted(spark):
    from simple_tsdb_spark.pipeline import near_dup_rate_by_source

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "source": ["web", "web", "web", "wiki", "wiki", "wiki"],
        }
    )
    # docs 0-1 near-dup pair (web); doc 3 pairs with 4 (wiki); 2,5 clean
    pairs = pd.DataFrame({"a": [0, 3], "b": [1, 4]})
    got = (
        near_dup_rate_by_source(
            spark.createDataFrame(docs), spark.createDataFrame(pairs)
        )
        .toPandas()
        .set_index("source")
    )
    assert got.loc["web", "n_near_dup"] == 2 and got.loc["web", "near_dup_rate_ppm"] == 2_000_000 // 3
    assert got.loc["wiki", "n_near_dup"] == 2
    # a doc in MANY pairs still counts once
    pairs2 = pd.DataFrame({"a": [0, 0, 0], "b": [1, 2, 1]})
    got2 = (
        near_dup_rate_by_source(
            spark.createDataFrame(docs), spark.createDataFrame(pairs2)
        )
        .toPandas()
        .set_index("source")
    )
    assert got2.loc["web", "n_near_dup"] == 3 and got2.loc["wiki", "n_near_dup"] == 0


def test_corpus_diff_all_statuses(spark):
    from simple_tsdb_spark.pipeline import corpus_diff

    old = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": ["a", "b", "c", "d"]}
    )
    new = pd.DataFrame(
        {"doc_id": [2, 3, 4, 5], "text": ["b", "C!", "d", "e"]}
    )
    got = (
        corpus_diff(spark.createDataFrame(old), spark.createDataFrame(new))
        .toPandas()
        .set_index("doc_id")["status"]
    )
    assert got.to_dict() == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged", 5: "added"
    }
