"""Sharded mark-sidecar tests (marks.py) — migration above the
threshold, touched-bucket-only rewrites, crash-mid-migration fallback,
and end-to-end write_points over a sharded ``time_last`` store.

Reference shape: one tiny metadata record per series
(doc/LOCKING.txt:50-72, wal.cc:87-110); the sharded store keeps our
sidecar's per-publish cost O(touched + marks/buckets) at ultra-high
series cardinality instead of O(marks)."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import types as T

import simple_tsdb_spark.marks as marks_mod
from simple_tsdb_spark.marks import MarkStore

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("time_ns", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
    ]
)


@pytest.fixture()
def small_shards(monkeypatch):
    monkeypatch.setattr(marks_mod, "SHARD_THRESHOLD", 8)
    monkeypatch.setattr(marks_mod, "SHARD_BUCKETS", 4)


def test_unsharded_roundtrip(tmp_path):
    p = str(tmp_path / "m")
    st = MarkStore(p, "time_last")
    st._advance({"a": 10, "b": 20}, floor=0)
    st2 = MarkStore(p, "time_last")
    assert st2._marks.get("a") == 10 and st2._marks.get("b") == 20
    assert os.path.exists(f"{p}/_tsdb_meta/time_last.json")
    assert not os.path.exists(f"{p}/_tsdb_meta/time_last_shards/_meta.json")


def test_monotone_never_regresses(tmp_path, small_shards):
    p = str(tmp_path / "m")
    st = MarkStore(p, "time_last")
    st._advance({"s": 100}, floor=0)
    st._advance({"s": 50}, floor=0)
    assert st._marks.get("s") == 100
    # same across the migration boundary
    st._advance({f"x{i}": i for i in range(20)}, floor=0)
    st._advance({"s": 60, "x5": 1}, floor=0)
    st2 = MarkStore(p, "time_last")
    assert st2._marks.get("s") == 100 and st2._marks.get("x5") == 5


def test_migration_preserves_all_marks(tmp_path, small_shards):
    p = str(tmp_path / "m")
    st = MarkStore(p, "time_last")
    st._advance({f"s{i}": i * 10 for i in range(5)}, floor=0)  # unsharded
    assert st._shards is None
    st._advance({f"s{i}": i * 10 for i in range(5, 30)}, floor=0)  # crosses 8
    assert st._shards is not None
    meta = f"{p}/_tsdb_meta/time_last_shards/_meta.json"
    assert json.loads(open(meta).read())["buckets"] == 4
    st2 = MarkStore(p, "time_last")
    assert st2._shards is not None
    assert len(st2._marks) == 30
    for i in range(30):
        assert st2._marks.get(f"s{i}") == i * 10
    # mapping facade supports the call-site operations
    assert "s3" in st2._marks and "zz" not in st2._marks
    assert bool(st2._marks) and sorted(st2._marks) == sorted(f"s{i}" for i in range(30))
    assert dict(st2._marks.items())["s7"] == 70


def test_sharded_publish_touches_only_hit_buckets(tmp_path, small_shards):
    p = str(tmp_path / "m")
    st = MarkStore(p, "time_last")
    st._advance({f"s{i}": 1 for i in range(20)}, floor=0)
    shard_dir = f"{p}/_tsdb_meta/time_last_shards"
    before = {
        f: open(f"{shard_dir}/{f}").read()
        for f in os.listdir(shard_dir)
        if f.startswith("b_")
    }
    st._advance({"s0": 999}, floor=0)
    after = {
        f: open(f"{shard_dir}/{f}").read()
        for f in os.listdir(shard_dir)
        if f.startswith("b_")
    }
    changed = [f for f in after if before.get(f) != after[f]]
    assert len(changed) == 1  # only s0's bucket rewrote
    assert json.loads(after[changed[0]])["s0"] == 999


def test_crash_mid_migration_falls_back_to_legacy(tmp_path, small_shards):
    p = str(tmp_path / "m")
    st = MarkStore(p, "time_last")
    st._advance({"a": 1, "b": 2}, floor=0)
    # simulate a crashed migration: bucket files exist, marker does not
    shard_dir = f"{p}/_tsdb_meta/time_last_shards"
    os.makedirs(shard_dir, exist_ok=True)
    with open(f"{shard_dir}/b_0000.json", "w") as fh:
        fh.write(json.dumps({"a": 999}))  # torn, must be ignored
    st2 = MarkStore(p, "time_last")
    assert st2._shards is None and st2._marks.get("a") == 1


def test_write_points_over_sharded_time_last(spark, tmp_path, small_shards):
    """End-to-end: the ingest path's monotone short-circuit and overlap
    verify work unchanged once time_last has migrated to shards."""
    from simple_tsdb_spark.operators import select_points
    from simple_tsdb_spark.sources.writer import OverwriteMismatch, write_points

    path = str(tmp_path / "m")
    rows = [(f"s{i}", 10, float(i)) for i in range(20)]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])
    write_points(spark, path, spark.createDataFrame(pdf, SCHEMA))
    assert os.path.exists(f"{path}/_tsdb_meta/time_last_shards/_meta.json")
    # monotone append over the sharded sidecar
    rows2 = [(f"s{i}", 20, float(i)) for i in range(20)]
    pdf2 = pd.DataFrame(rows2, columns=["series", "time_ns", "v"])
    r = write_points(spark, path, spark.createDataFrame(pdf2, SCHEMA))
    assert r["appended"] == 20
    got = select_points(spark.read.parquet(path)).toPandas()
    assert len(got) == 40
    # retransmit mismatch still rejected (verify path reads sharded marks)
    bad = pd.DataFrame([("s0", 20, 123.0)], columns=["series", "time_ns", "v"])
    with pytest.raises(OverwriteMismatch):
        write_points(spark, path, spark.createDataFrame(bad, SCHEMA))


def test_retention_watermarks_sharded(spark, tmp_path, small_shards):
    """RetentionWatermarks rides the same store: advance past the
    threshold, reload, and the read-path filter still hides rows."""
    from simple_tsdb_spark.operators.delete import RetentionWatermarks

    p = str(tmp_path / "m")
    w = RetentionWatermarks(p)
    w.advance_many({f"s{i}": 100 for i in range(20)})
    w2 = RetentionWatermarks(p)
    assert w2.get("s3") == 100 and w2.get("unknown") == 0
    pdf = pd.DataFrame(
        [("s3", 50, 1.0), ("s3", 150, 2.0)], columns=["series", "time_ns", "v"]
    )
    out = w2.apply(spark.createDataFrame(pdf, SCHEMA)).toPandas()
    assert list(out["time_ns"]) == [150]


def test_markstore_hypothesis_model(tmp_path, monkeypatch):
    """Randomized interleavings of advance/reload vs a plain dict model,
    across the shard-migration boundary (threshold 6, 4 buckets)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import simple_tsdb_spark.marks as marks_mod

    monkeypatch.setattr(marks_mod, "SHARD_THRESHOLD", 6)
    monkeypatch.setattr(marks_mod, "SHARD_BUCKETS", 4)

    series = [f"s{i}" for i in range(12)]
    step = st.tuples(
        st.sampled_from(series), st.integers(min_value=-5, max_value=1000)
    )

    counter = [0]

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(st.tuples(st.lists(step, max_size=5), st.booleans()), max_size=8))
    def run(script):
        counter[0] += 1
        p = str(tmp_path / f"m{counter[0]}")
        st_ = MarkStore(p, "time_last")
        model: dict[str, int] = {}
        for batch, reload_after in script:
            updates = {}
            for s, t in batch:
                updates[s] = max(updates.get(s, t), t)
            if updates:
                st_._advance(updates, floor=0)
                for s, t in updates.items():
                    model[s] = max(model.get(s, 0), int(t))
            if reload_after:
                st_ = MarkStore(p, "time_last")
            assert dict(st_._marks.items()) == model
            assert len(st_._marks) == len(model)
            for s in series:
                assert st_._marks.get(s) == model.get(s)

    run()
