"""Hashed-series layout (series_buckets=B): the ≥10⁵-series answer.

Directory count is B × #time_buckets — independent of series cardinality —
while single-series reads still prune partitions through the
constant-folded bucket predicate, and every operator returns results
identical to the directory-per-series layout.
"""

from __future__ import annotations

import os
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from simple_tsdb_spark.operators import (
    advance_rollup,
    delete_points,
    hybrid_sum_points,
    materialize_rollup,
    select_last_points,
    select_last_points_probed,
    sum_points,
    tail_bucket_cutoff,
)
from simple_tsdb_spark.sources.measurement import read_measurement
from simple_tsdb_spark.sources.writer import (
    _layout,
    compact_measurement,
    data_root,
    write_points,
)

HOUR = 3_600_000_000_000
N_SERIES = 40
PTS = 30  # per series, 10-min cadence → 5 one-hour buckets
B = 8


def _mk_batch(spark, seq0, seqn, n_series=N_SERIES):
    # jitter/value keyed on (series_idx, seq) so any [seq0, seqn) slice
    # reproduces exactly the same points (retransmit tests rely on it)
    cad = 600_000_000_000
    base = 1_700_000_000_000_000_000
    n = n_series * (seqn - seq0)
    sidx = F.col("id") % n_series
    seq = F.lit(seq0) + (F.col("id") / n_series).cast("long")
    return spark.range(n).select(
        F.concat(F.lit("dev-"), sidx.cast("string")).alias("series"),
        (F.lit(base) + seq * F.lit(cad) + F.pmod(F.hash(sidx, seq), F.lit(997))).alias(
            "time_ns"
        ),
        (F.pmod(F.hash(sidx, seq, F.lit(3)), F.lit(10_000)) / 100.0).alias("v"),
    )


@pytest.fixture(scope="module")
def hashed(spark, tmp_path_factory):
    """One hashed-layout measurement + its directory-layout twin."""
    hpath = str(tmp_path_factory.mktemp("hl")) + "/m_hashed"
    dpath = str(tmp_path_factory.mktemp("hl")) + "/m_dirs"
    batch = _mk_batch(spark, 0, PTS)
    write_points(spark, hpath, batch, time_bucket_ns=HOUR, series_buckets=B)
    write_points(spark, dpath, batch, time_bucket_ns=HOUR)
    return hpath, dpath


def test_layout_recorded_and_dirs_bounded(spark, hashed):
    hpath, _ = hashed
    lay = _layout(hpath)
    assert lay["series_buckets"] == B and lay["time_bucket_ns"] == HOUR
    top = [e for e in os.listdir(data_root(hpath)) if e.startswith("series_bucket=")]
    assert 0 < len(top) <= B  # bounded by B, NOT by #series
    df = read_measurement(spark, hpath)
    assert set(df.columns) == {"series", "time_ns", "v"}
    assert df.count() == N_SERIES * PTS


def test_single_series_read_prunes_partitions(spark, hashed):
    hpath, dpath = hashed
    df = read_measurement(spark, hpath, series="dev-3").where(F.col("series") == "dev-3")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the folded bucket predicate must reach the scan's PartitionFilters
    i = plan.find("PartitionFilters:")
    assert i >= 0 and "series_bucket" in plan[i : i + 300], plan[i : i + 300]
    want = read_measurement(spark, dpath).where(F.col("series") == "dev-3").count()
    assert df.count() == want == PTS


def test_equivalence_sum_and_last(spark, hashed):
    hpath, dpath = hashed
    h = read_measurement(spark, hpath)
    d = read_measurement(spark, dpath)
    a = sum_points(h, fields=["v"], window_ns=HOUR).toPandas().sort_values(
        ["series", "wstart"], ignore_index=True
    )
    b = sum_points(d, fields=["v"], window_ns=HOUR).toPandas().sort_values(
        ["series", "wstart"], ignore_index=True
    )
    pd.testing.assert_frame_equal(a, b)
    a = select_last_points(h, last=7, per_series=True).toPandas().reset_index(drop=True)
    b = select_last_points(d, last=7, per_series=True).toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_probed_last_matches_plain(spark, hashed):
    hpath, _ = hashed
    # single series
    got = select_last_points_probed(spark, hpath, series="dev-5", last=4).toPandas()
    want = (
        select_last_points(read_measurement(spark, hpath), series="dev-5", last=4)
        .toPandas()
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want.reset_index(drop=True))
    # per-series across all
    got = (
        select_last_points_probed(spark, hpath, last=3, per_series=True)
        .toPandas().reset_index(drop=True)
    )
    want = (
        select_last_points(read_measurement(spark, hpath), last=3, per_series=True)
        .toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == N_SERIES * 3


def test_probe_cutoff_skips_old_buckets(spark, hashed):
    hpath, _ = hashed
    cutoff = tail_bucket_cutoff(spark, hpath, last=3, per_series=True)
    base = 1_700_000_000_000_000_000
    first_bucket = base - (base % HOUR)
    assert cutoff is not None and cutoff > first_bucket


def test_strict_validation_on_hashed(spark, tmp_path):
    # own measurement — this test appends, and the module fixture is shared
    hpath = str(tmp_path) + "/m"
    write_points(spark, hpath, _mk_batch(spark, 0, PTS), time_bucket_ns=HOUR, series_buckets=B)
    from simple_tsdb_spark.errors import OutOfOrderTimestamps, OverwriteMismatch

    # exact retransmit of the tail: dropped as overlap, nothing appended
    tail = _mk_batch(spark, PTS - 2, PTS)
    res = write_points(spark, hpath, tail)
    assert res["appended"] == 0 and res["dropped_overlap"] == N_SERIES * 2
    # value-mismatched retransmit rejects
    with pytest.raises(OverwriteMismatch):
        write_points(spark, hpath, tail.withColumn("v", F.col("v") + 1))
    # stale new timestamp rejects (before committed time_last, not a dup)
    stale = tail.withColumn("time_ns", F.col("time_ns") - 1)
    with pytest.raises(OutOfOrderTimestamps):
        write_points(spark, hpath, stale)
    # fresh append lands
    res = write_points(spark, hpath, _mk_batch(spark, PTS, PTS + 2))
    assert res["appended"] == N_SERIES * 2


def test_delete_on_hashed_layout(spark, tmp_path):
    path = str(tmp_path) + "/m"
    write_points(spark, path, _mk_batch(spark, 0, PTS), time_bucket_ns=HOUR, series_buckets=B)
    base = 1_700_000_000_000_000_000
    t_cut = base + 12 * 600_000_000_000 - 1  # first 12 points of dev-1
    marks = delete_points(spark, path, series="dev-1", t=t_cut)
    assert marks.get("dev-1") == t_cut + 1
    df = marks.apply(read_measurement(spark, path))
    counts = {r["series"]: r["n"] for r in df.groupBy("series").agg(F.count("*").alias("n")).collect()}
    assert counts["dev-1"] == PTS - 12
    assert counts["dev-2"] == PTS  # co-bucketed series untouched
    # physical rewrite really removed the rows (read without watermark filter)
    raw = read_measurement(spark, path).where(F.col("series") == "dev-1")
    assert raw.count() == PTS - 12


def test_compact_preserves_hashed_layout(spark, tmp_path):
    path = str(tmp_path) + "/m"
    write_points(spark, path, _mk_batch(spark, 0, 10), time_bucket_ns=HOUR, series_buckets=B)
    write_points(spark, path, _mk_batch(spark, 10, 20))
    before = read_measurement(spark, path).toPandas().sort_values(
        ["series", "time_ns"], ignore_index=True
    )
    compact_measurement(spark, path)
    lay = _layout(path)
    assert lay["generation"] == 1 and lay["series_buckets"] == B
    assert any(e.startswith("series_bucket=") for e in os.listdir(data_root(path)))
    after = read_measurement(spark, path).toPandas().sort_values(
        ["series", "time_ns"], ignore_index=True
    )
    pd.testing.assert_frame_equal(before, after)
    # appends after compaction keep the layout
    write_points(spark, path, _mk_batch(spark, 20, 22))
    assert read_measurement(spark, path).count() == N_SERIES * 22


def test_rollup_hashed(spark, hashed, tmp_path):
    hpath, dpath = hashed
    raw = read_measurement(spark, hpath)
    rpath = str(tmp_path) + "/r"
    base = 1_700_000_000_000_000_000
    bnd = base - (base % HOUR) + 2 * HOUR  # bucket-aligned: only finalized buckets
    materialize_rollup(
        spark, raw.where(F.col("time_ns") < bnd), rpath,
        fields=["v"], base_window_ns=HOUR, series_buckets=B,
    )
    assert _layout(rpath)["series_buckets"] == B
    assert any(e.startswith("series_bucket=") for e in os.listdir(rpath))
    n = advance_rollup(spark, raw, rpath, fields=["v"], base_window_ns=HOUR)
    assert n > 0
    got = (
        hybrid_sum_points(spark, raw, rpath, fields=["v"], base_window_ns=HOUR, window_ns=HOUR)
        .toPandas().sort_values(["series", "wstart"], ignore_index=True)
    )
    want = (
        sum_points(read_measurement(spark, dpath), fields=["v"], window_ns=HOUR, emit_empty=False)
        .toPandas().sort_values(["series", "wstart"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_catalog_list_series_hashed(spark, tmp_path):
    from simple_tsdb_spark.catalog import TsdbCatalog

    cat = TsdbCatalog(spark, str(tmp_path) + "/wh")
    cat.create_database("db")
    cat.create_measurement("db", "m", {"v": "f64"})
    write_points(
        spark, cat.measurement_path("db", "m"), _mk_batch(spark, 0, 3, n_series=6),
        series_buckets=4,
    )
    assert cat.list_series("db", "m") == [f"dev-{i}" for i in range(6)]
    assert cat.read("db", "m").count() == 18
