"""Degenerate-quantizer guard (VERDICT r8 #6): a planted mega-cluster
must not generate O(n²) pair work, and the capped keep/drop answer must
match the exact one where the math says it can (identical vectors)."""

import random

import pandas as pd
import pytest


def _vecs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))


def _mega(n, dim=64, seed=4):
    """n near-identical strictly-positive vectors: one coarse cluster,
    one sign bucket — forces the anchor-fallback path."""
    rng = random.Random(seed)
    base = [1.0 + 0.01 * d for d in range(dim)]
    return [
        (i, [b + rng.uniform(0, 1e-4) for b in base])
        for i in range(n)
    ]


@pytest.mark.soak
def test_cap_bounds_pair_work(spark):
    """3000-row mega-cluster: uncapped would emit ~4.5M pairs; the cap
    bounds the build side to 256 anchors → ≤ n·256 pairs."""
    from simple_tsdb_spark.pipeline.dedup import _CAP_ANCHORS, embedding_dup_pairs

    n = 3000
    df = _vecs(spark, _mega(n))
    capped = embedding_dup_pairs(df, threshold=0.9, max_cluster=500)
    cnt = capped.count()
    assert 0 < cnt <= n * _CAP_ANCHORS
    assert cnt < n * (n - 1) // 2 / 2  # far below the quadratic count
    # every non-anchor row still certifies against some anchor
    flagged = {r.a for r in capped.collect()} | {r.b for r in capped.collect()}
    assert len(flagged) == n


def test_cap_noop_below_threshold(spark):
    """Blocks under the cap: guarded output == unguarded output (the
    guard only rewrites oversized blocks)."""
    from simple_tsdb_spark.pipeline.dedup import embedding_dup_pairs

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plain = {
        (r.a, r.b, r.cos)
        for r in embedding_dup_pairs(embs, threshold=0.3).collect()
    }
    guarded = {
        (r.a, r.b, r.cos)
        for r in embedding_dup_pairs(
            embs, threshold=0.3, max_cluster=10_000_000
        ).collect()
    }
    assert plain == guarded


def test_semdedup_mega_cluster_keep_set(spark):
    """Identical-vector mega-cluster: capped semdedup keeps exactly the
    unguarded keeper (the smallest id) and drops the rest — one anchor
    certifies every row."""
    from simple_tsdb_spark.pipeline.dedup import semdedup

    dim = 64
    base = [1.0 + 0.01 * d for d in range(dim)]
    rows = [(i, list(base)) for i in range(800)]  # exactly identical
    df = _vecs(spark, rows)
    exact = {r.vec_id: r.keep for r in semdedup(df, threshold=0.9).collect()}
    capped = {
        r.vec_id: r.keep
        for r in semdedup(df, threshold=0.9, max_cluster=200).collect()
    }
    assert exact == capped
    assert sum(capped.values()) == 1 and capped[0]


def test_cap_rejects_bad_value(spark):
    from simple_tsdb_spark.pipeline.dedup import embedding_dup_pairs

    df = _vecs(spark, _mega(4))
    with pytest.raises(ValueError):
        embedding_dup_pairs(df, max_cluster=1).count()
