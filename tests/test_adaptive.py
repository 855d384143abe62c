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
