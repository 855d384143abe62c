"""The driver-fixture dtype contract, pinned in-repo.

Round 3 post-mortem: the driver regenerated ``events.parquet`` with ``ts``
as plain ``timestamp[us]`` (Spark TIMESTAMP_NTZ) where it had been
INT64(TIMESTAMP(NANOS)) (read as a raw ns long under ``nanosAsLong``),
and 26 driver queries erred while pytest stayed green — because no test
read a µs/NTZ events parquet.  These tests write the *same* logical events
data in all three physical dtypes the driver has shipped (or could ship)
and assert ``events_measurement`` + a ranged operator give identical
answers on each, so fixture drift fails here first.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from simple_tsdb_spark.operators import count_points
from simple_tsdb_spark.sources import events_measurement
from simple_tsdb_spark.sources.measurement import adapt_raw_ts

N = 400
BASE_NS = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z


def _events_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    # µs-aligned plus a sub-µs tail on the ns variant (exercises truncation)
    ts_ns = BASE_NS + rng.integers(0, 30 * 86_400_000_000_000, size=N) // 1000 * 1000
    ts_ns[: N // 4] += rng.integers(1, 1000, size=N // 4)  # ns tails
    return pd.DataFrame(
        {
            "event_id": np.arange(N, dtype=np.int64),
            "ts_ns": np.sort(ts_ns),
            "user_id": rng.integers(0, 40, size=N),
            "event_type": rng.choice(["click", "error", "view"], size=N),
            "value": rng.random(N) * 100,
            "props": "{}",
        }
    )


def _write_variant(pdf: pd.DataFrame, path: str, variant: str) -> None:
    cols = {c: pa.array(pdf[c]) for c in ("event_id", "user_id", "event_type", "value", "props")}
    ns = pa.array(pdf["ts_ns"], type=pa.int64())
    if variant == "ns":
        ts = ns.cast(pa.timestamp("ns"))  # INT64(TIMESTAMP(NANOS)) → bigint under nanosAsLong
    elif variant == "us_ntz":
        ts = pa.compute.divide(ns, 1000).cast(pa.timestamp("us"))  # → TIMESTAMP_NTZ
    elif variant == "us_ltz":
        ts = pa.compute.divide(ns, 1000).cast(pa.timestamp("us", tz="UTC"))  # → TIMESTAMP
    else:  # pragma: no cover
        raise ValueError(variant)
    table = pa.table({"event_id": cols["event_id"], "ts": ts, **{k: cols[k] for k in ("user_id", "event_type", "value", "props")}})
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def variant_dirs(tmp_path_factory):
    pdf = _events_pdf()
    dirs = {}
    for v in ("ns", "us_ntz", "us_ltz"):
        d = tmp_path_factory.mktemp(f"events_{v}")
        _write_variant(pdf, str(d / "events.parquet"), v)
        dirs[v] = str(d)
    return pdf, dirs


def _spark_dtype(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return dict(df.dtypes)["ts"]


def test_variants_have_distinct_spark_dtypes(spark, variant_dirs):
    _, dirs = variant_dirs
    assert _spark_dtype(spark, dirs["ns"]) == "bigint"  # nanosAsLong
    assert _spark_dtype(spark, dirs["us_ntz"]) == "timestamp_ntz"
    assert _spark_dtype(spark, dirs["us_ltz"]) == "timestamp"


def test_events_measurement_identical_across_dtypes(spark, variant_dirs):
    pdf, dirs = variant_dirs
    expected = sorted((pdf["ts_ns"] // 1000 * 1000).tolist())
    results = {}
    for v, d in dirs.items():
        rows = events_measurement(spark, d).select("time_ns").collect()
        results[v] = sorted(r.time_ns for r in rows)
    for v, got in results.items():
        assert got == expected, f"variant {v}: time_ns drifted from µs-truncated ns"


def test_ranged_count_identical_across_dtypes(spark, variant_dirs):
    pdf, dirs = variant_dirs
    us_ns = pdf["ts_ns"] // 1000 * 1000
    t0, t1 = int(us_ns.quantile(0.25)), int(us_ns.quantile(0.75))
    expected = int(((us_ns >= t0) & (us_ns <= t1)).sum())
    for v, d in dirs.items():
        ev = events_measurement(spark, d, t0=t0, t1=t1)
        got = count_points(ev, t0=t0, t1=t1).agg({"npoints": "sum"}).collect()[0][0]
        assert got == expected, f"variant {v}: ranged count mismatch"


def test_timestamp_branch_pushes_raw_predicate(spark, variant_dirs):
    """The t0/t1 hint must land in PushedFilters on the raw ts column in
    every dtype branch — at 100 TB an un-pushed time predicate is a full
    scan (reference clamps before I/O, select_op.cc:18-19)."""
    pdf, dirs = variant_dirs
    t0 = int(pdf["ts_ns"].median())
    for v, d in dirs.items():
        ev = events_measurement(spark, d, t0=t0, t1=t0 + 10**12)
        plan = ev._jdf.queryExecution().executedPlan().toString()
        assert "GreaterThanOrEqual(ts" in plan, f"variant {v}: no pushed lower bound\n{plan}"
        assert "LessThanOrEqual(ts" in plan, f"variant {v}: no pushed upper bound\n{plan}"


def test_normalize_fixture_noop_when_conforming(spark):
    """On a contract-conforming table the reader must not add cast nodes
    (casts on scan columns can defeat parquet filter pushdown)."""
    from simple_tsdb_spark.sources.fixtures import normalize_fixture, read_fixture

    df = read_fixture(spark, "/root/testdata/sf0.001", "documents")
    assert normalize_fixture(df, "documents") is df


def test_normalize_fixture_widens_but_never_narrows(spark, tmp_path):
    """A regenerated fixture with drifted dtypes: lossless widenings are
    normalized back to the contract (the round-3 failure class); drifts
    WIDER than the contract stay as shipped — the DuckDB oracles read the
    raw parquet, so a narrowing cast (double→float) would silently
    diverge the engines (VERDICT #5, refined)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from simple_tsdb_spark.sources.fixtures import read_fixture

    drifted = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int32()),  # contract: bigint — widen
            "text": pa.array(["a", "b"]),
            "lang": pa.array(["en", "de"]),
            "source": pa.array(["web", "web"]),
            "n_chars": pa.array([1, 1], type=pa.int32()),  # contract: bigint — widen
        }
    )
    pq.write_table(drifted, str(tmp_path / "documents.parquet"))
    emb = pa.table(
        {
            "vec_id": pa.array([1, 2], type=pa.int64()),
            # contract array<float>: narrowing — must stay double
            "embedding": pa.array([[0.1, 0.2], [0.3, 0.4]], type=pa.list_(pa.float64())),
            # contract int: narrowing — must stay bigint
            "label": pa.array([0, 1], type=pa.int64()),
        }
    )
    pq.write_table(emb, str(tmp_path / "embeddings.parquet"))

    docs = read_fixture(spark, str(tmp_path), "documents")
    assert dict(docs.dtypes)["doc_id"] == "bigint"
    assert dict(docs.dtypes)["n_chars"] == "bigint"
    embs = read_fixture(spark, str(tmp_path), "embeddings")
    assert dict(embs.dtypes)["embedding"] == "array<double>"  # untouched
    assert dict(embs.dtypes)["label"] == "bigint"  # untouched


def test_widening_classifier():
    from simple_tsdb_spark.sources.fixtures import _widening

    assert _widening("int", "bigint")
    assert _widening("float", "double")
    assert _widening("array<float>", "array<double>")
    assert _widening("int", "double")
    assert not _widening("bigint", "int")
    assert not _widening("double", "float")
    assert not _widening("array<double>", "array<float>")
    assert not _widening("bigint", "double")  # 2^63 doesn't fit a double
    assert not _widening("string", "timestamp_ntz")


def test_adapt_raw_ts_rejects_unknown_dtype(spark):
    df = spark.range(3).withColumnRenamed("id", "ts").selectExpr("cast(ts as string) ts")
    with pytest.raises(TypeError):
        adapt_raw_ts(df)
