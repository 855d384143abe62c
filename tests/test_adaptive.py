"""Adaptive small-input fan-out (functions/adaptive.py, r14 optimization).

Contract: (1) results are IDENTICAL with the fan-out on and off for a
representative operator that uses it; (2) the fan-out is an exact no-op
when the input's size estimate exceeds the threshold (the 100 TB plan is
untouched); (3) when active it spreads the rows over multiple partitions.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

ENV = "SPARK_GRAFT_FAN_OUT_BYTES"


@pytest.fixture()
def docs(spark):
    rows = [
        (i, f"alpha beta gamma delta doc{i} " * (3 + i % 5), "en", f"src{i % 3}", 30)
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _with_env(val):
    if val is None:
        os.environ.pop(ENV, None)
    else:
        os.environ[ENV] = val


def test_fan_out_results_identical(spark, docs):
    from simple_tsdb_spark.pipeline.text import winnowing_fingerprints

    try:
        _with_env("0")
        off = winnowing_fingerprints(docs).toPandas()
        _with_env(None)
        on = winnowing_fingerprints(docs).toPandas()
    finally:
        _with_env(None)
    assert off.equals(on)


def test_fan_out_noop_above_threshold(spark, docs):
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    try:
        _with_env("1")  # threshold below any real input estimate
        out = fan_out_small(docs, "doc_id")
    finally:
        _with_env(None)
    # identical plan object semantics: no exchange added
    assert "Repartition" not in out._jdf.queryExecution().optimizedPlan().toString()


def test_fan_out_disabled_is_noop(spark, docs):
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    try:
        _with_env("0")
        out = fan_out_small(docs, "doc_id")
    finally:
        _with_env(None)
    assert "Repartition" not in out._jdf.queryExecution().optimizedPlan().toString()


def test_fan_out_embedding_ops_identical(spark):
    """r14: the embedding/similarity family gained the same size-guarded
    fan-out before its per-vector quantizer/normalize folds — results
    must be bit-identical with the mechanism on and off."""
    import numpy as np

    from simple_tsdb_spark.pipeline.similarity import knn_ivf_pq, pq_encode

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=64)]) for i in range(300)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    try:
        _with_env("0")
        off_pq = pq_encode(embs).toPandas()
        off_knn = knn_ivf_pq(embs, query_ids=[0, 1, 2], k=5).toPandas()
        _with_env(None)
        on_pq = pq_encode(embs).toPandas()
        on_knn = knn_ivf_pq(embs, query_ids=[0, 1, 2], k=5).toPandas()
    finally:
        _with_env(None)
    def canon(df):
        df = df.copy()
        for c in df.columns:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        return df.sort_values(list(df.columns), ignore_index=True)

    assert canon(off_pq).equals(canon(on_pq))
    assert canon(off_knn).equals(canon(on_knn))


def test_fan_out_active_spreads_partitions(spark, docs):
    from simple_tsdb_spark.functions.adaptive import fan_out_small

    try:
        _with_env(None)
        out = fan_out_small(docs, "doc_id")
        n_nonempty = (
            out.select(F.spark_partition_id().alias("p")).distinct().count()
        )
    finally:
        _with_env(None)
    assert n_nonempty > 1
    # same rows either way
    assert out.count() == docs.count()


def test_stratified_split_small_lane_equals_histogram(spark, docs):
    """The small-input naive-window lane of stratified_split must label
    every doc identically to the 1024-bucket histogram path (r14.2) —
    including NULL strata and multi-way fracs."""
    from simple_tsdb_spark.pipeline.curation import stratified_split

    nulled = docs.withColumn(
        "lang", F.when(F.col("doc_id") % 7 == 0, None).otherwise(F.col("lang"))
    )
    for fracs in (None, {"valid": 0.05, "test": 0.05}):
        kw = {"fracs": fracs} if fracs else {"frac": 0.1}
        try:
            _with_env("0")  # threshold off -> histogram path
            hist = stratified_split(nulled, **kw).toPandas()
            _with_env(None)  # default threshold -> small lane
            lane = stratified_split(nulled, **kw).toPandas()
        finally:
            _with_env(None)
        key = ["doc_id"]
        hist = hist.sort_values(key, ignore_index=True)
        lane = lane.sort_values(key, ignore_index=True)
        assert hist.equals(lane), f"fracs={fracs}"


def test_ngram_lm_small_lane_equals_skew_lanes(spark, docs):
    """The LM scorer's small-input broadcast lane must score every doc
    identically to the hot/tail skew-lane path (VERDICT r14 #7) —
    including docs with <2 tokens (NULL score), an empty fit slice, and
    repeated-bigram ties."""
    from simple_tsdb_spark.pipeline.text import ngram_lm_score

    adversarial = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 11 == 0, F.lit("solo"))  # <2 tokens -> NULL
        .when(F.col("doc_id") % 13 == 0, F.lit("x x x x x x"))  # tied bigrams
        .otherwise(F.col("text")),
    )
    for pred in ("source = 'src0'", "source = 'nope'"):  # empty fit slice too
        try:
            _with_env("0")  # force the skew-lane path
            lanes = ngram_lm_score(adversarial, fit_pred=pred).toPandas()
            _with_env(None)  # default threshold -> small broadcast lane
            small = ngram_lm_score(adversarial, fit_pred=pred).toPandas()
        finally:
            _with_env(None)
        cols = list(lanes.columns)
        lanes = lanes.sort_values(cols, ignore_index=True)
        small = small.sort_values(cols, ignore_index=True)
        assert lanes.equals(small), f"fit_pred={pred}"


def test_dsir_inplan_ratio_lane_equals_collect(spark, docs):
    """dsir_logweights' small-input in-plan broadcast ratio table must
    weight every doc identically to the collect-then-literal fit lane
    (r15)."""
    from simple_tsdb_spark.pipeline.text import dsir_logweights

    try:
        _with_env("0")  # threshold off -> collect lane
        coll = dsir_logweights(docs, target_pred="lang = 'en'").toPandas()
        _with_env(None)  # default threshold -> in-plan broadcast lane
        inpl = dsir_logweights(docs, target_pred="lang = 'en'").toPandas()
    finally:
        _with_env(None)
    coll = coll.sort_values(["doc_id"], ignore_index=True)
    inpl = inpl.sort_values(["doc_id"], ignore_index=True)
    assert coll.equals(inpl)


def test_tfidf_small_lane_equals_hot_tail(spark, docs):
    """tfidf_topk's small-input single-join lane must rank identically
    to the hot/tail skew-lane path (r14.2)."""
    from simple_tsdb_spark.pipeline.text import tfidf_topk

    try:
        _with_env("0")  # threshold off -> hot/tail lanes
        lanes = tfidf_topk(docs).toPandas()
        _with_env(None)  # default threshold -> single-join lane
        lane = tfidf_topk(docs).toPandas()
    finally:
        _with_env(None)
    cols = list(lanes.columns)
    lanes = lanes.sort_values(cols, ignore_index=True)
    lane = lane.sort_values(cols, ignore_index=True)
    assert lanes.equals(lane)
