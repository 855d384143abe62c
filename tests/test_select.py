"""S1/S2 operator tests — reference test shapes from
``select_op_test.cc`` (sliding ranges, gap probes, LIMIT/LAST edges)."""

from __future__ import annotations

import pandas as pd
import pytest

from simple_tsdb_spark.operators import select_points, select_last_points


def model_range(pdf: pd.DataFrame, t0: int, t1: int) -> pd.DataFrame:
    out = pdf[(pdf.time_ns >= t0) & (pdf.time_ns <= t1)]
    return out.sort_values("time_ns", ignore_index=True)


def test_sliding_ranges(spark, f1, f1_pdf):
    # select_op_test.cc:63-107 — probe ranges incl. gaps between samples
    # (t ≡ 1 mod 10) and endpoints outside the live range.
    for t0, t1 in [(0, 10**6), (100, 540), (101, 539), (95, 105), (541, 543),
                   (0, 99), (10241, 10**5), (255, 255), (250, 250)]:
        got = select_points(f1, series="series1", t0=t0, t1=t1).toPandas()
        want = model_range(f1_pdf, t0, t1)
        assert len(got) == len(want), (t0, t1)
        assert list(got.time_ns) == list(want.time_ns)


def test_limit_edges(spark, f1, f1_pdf):
    # LIMIT 0 / exact / beyond available (tsdbtest/main.cc:392-426).
    total = len(model_range(f1_pdf, 100, 1000))
    for limit in [0, 1, total, total + 50]:
        got = select_points(f1, series="series1", t0=100, t1=1000, limit=limit).toPandas()
        assert len(got) == min(limit, total)
        want = model_range(f1_pdf, 100, 1000).head(limit)
        assert list(got.time_ns) == list(want.time_ns)


def test_projection(spark, f1):
    got = select_points(f1, series="series1", fields=["field2"], t0=0, t1=10**6)
    assert got.columns == ["series", "time_ns", "field2"]
    # empty projection = all fields in schema order (measurement.h:116-150)
    got = select_points(f1, series="series1", t0=0, t1=10**6)
    assert got.columns == ["series", "time_ns", "field1", "field2", "field3"]


def test_unknown_and_duplicate_fields(f1):
    import pytest

    with pytest.raises(KeyError):
        select_points(f1, fields=["nope"])
    with pytest.raises(ValueError):
        select_points(f1, fields=["field1", "field1"])


def test_last_n(spark, f1, f1_pdf):
    # select_op_test.cc:294-443 — LAST windows sliding across chunk bounds.
    for t0, t1, n in [(0, 10**6, 10), (100, 540, 5), (100, 540, 1000), (300, 301, 3)]:
        got = select_last_points(f1, series="series1", t0=t0, t1=t1, last=n).toPandas()
        want = model_range(f1_pdf, t0, t1).tail(n).reset_index(drop=True)
        assert list(got.time_ns) == list(want.time_ns)
        # ascending output order
        assert list(got.time_ns) == sorted(got.time_ns)


def test_last_n_per_series(spark, f2, f2_pdf):
    got = select_last_points(f2, t0=0, t1=2**62, last=7, per_series=True).toPandas()
    for s, grp in f2_pdf.groupby("series"):
        want = grp.sort_values("time_ns").tail(7)
        sub = got[got.series == s]
        assert list(sub.time_ns) == list(want.time_ns)


def test_nulls_preserved(spark, f1, f1_pdf):
    got = select_points(f1, series="series1", t0=0, t1=10**6).toPandas()
    want = model_range(f1_pdf, 0, 10**6)
    assert got.field2.isna().sum() == want.field2.isna().sum() > 0


# ---- LAST-N recent-bucket probing (select_op.cc:294-345 analog) ----------

DAY = 86_400 * 1_000_000_000


def _bucketed_measurement(spark, tmp_path, *, days=30, per_day=4, n_series=3):
    """Native measurement: time_bucket_ns=1d, points every day/per_day."""
    import pandas as pd

    from simple_tsdb_spark.sources.writer import write_points

    path = str(tmp_path / "probed_m")
    rows = []
    for s in range(n_series):
        for d in range(days):
            for i in range(per_day):
                rows.append((f"s{s}", d * DAY + (i + 1) * (DAY // (per_day + 1)), float(d * 100 + i)))
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "value"])
    batch = spark.createDataFrame(pdf)
    write_points(spark, path, batch, time_bucket_ns=DAY)
    return path, pdf


def test_probed_last_n_matches_plain(spark, tmp_path):
    from simple_tsdb_spark.operators import select_last_points, select_last_points_probed
    from simple_tsdb_spark.sources.measurement import read_measurement

    path, pdf = _bucketed_measurement(spark, tmp_path)
    full = read_measurement(spark, path)
    for kwargs in [
        dict(last=5),                                  # spans 2 tail buckets
        dict(last=1, series="s1"),
        dict(last=9, per_series=True),                 # 3 buckets per series
        dict(last=10_000),                             # more than total: all buckets
        dict(last=3, t0=5 * DAY, t1=20 * DAY - 1),     # interior range
        dict(last=4, series=["s0", "s2"], per_series=True),
    ]:
        got = select_last_points_probed(
            spark, path, fields=["value"], tiebreak=("series",), **kwargs
        ).toPandas()
        want = select_last_points(
            full, fields=["value"], tiebreak=("series",), **kwargs
        ).toPandas()
        assert got.equals(want), f"probed != plain for {kwargs}"


def test_probed_last_n_reads_only_tail_partitions(spark, tmp_path):
    from simple_tsdb_spark.operators import select_last_points_probed, tail_bucket_cutoff

    path, pdf = _bucketed_measurement(spark, tmp_path, days=30, per_day=4)
    # 12 points/bucket (4/day x 3 series): LAST 5 needs only the newest
    # bucket; LAST 20 needs exactly the newest 2.
    assert tail_bucket_cutoff(spark, path, last=5) == 29 * DAY
    assert tail_bucket_cutoff(spark, path, last=20) == 28 * DAY
    # per-series: LAST 9 per series needs 3 buckets (4 pts/series/bucket);
    # geometric widening (1, 2, 4) probes the newest 4 — the documented
    # <= 2x overshoot, still a tail read.
    cutoff_ps = tail_bucket_cutoff(spark, path, last=9, per_series=True)
    assert cutoff_ps == 26 * DAY
    # The physical scan carries the cutoff as a partition filter — pruning
    # happens at directory level, before any parquet footer is read.
    df = select_last_points_probed(spark, path, fields=["value"], last=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "time_bucket" in plan


def test_probed_last_n_unbucketed_fallback(spark, tmp_path):
    import pandas as pd

    from simple_tsdb_spark.operators import select_last_points_probed, tail_bucket_cutoff
    from simple_tsdb_spark.sources.writer import write_points

    path = str(tmp_path / "flat_m")
    pdf = pd.DataFrame(
        {"series": "a", "time_ns": [10, 20, 30, 40], "value": [1.0, 2.0, 3.0, 4.0]}
    )
    write_points(spark, path, spark.createDataFrame(pdf))  # no time bucketing
    assert tail_bucket_cutoff(spark, path, last=2) is None
    got = select_last_points_probed(spark, path, fields=["value"], last=2).toPandas()
    assert list(got.time_ns) == [30, 40]


@pytest.mark.soak
def test_probed_cutoff_driver_light_at_high_series_cardinality(spark, tmp_path, monkeypatch):
    """The per-series probe must ship ONE scalar per round to the driver,
    not an O(#series) row set (select_op.cc:294-345 seeks per series
    server-side; our analog reduces cluster-side)."""
    from pyspark.sql import DataFrame

    from simple_tsdb_spark.operators import (
        select_last_points,
        select_last_points_probed,
        tail_bucket_cutoff,
    )
    from simple_tsdb_spark.sources.measurement import read_measurement

    path, pdf = _bucketed_measurement(spark, tmp_path, days=2, per_day=2, n_series=1000)

    collected: list[int] = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    # 2 pts/series/bucket: LAST 2 per series = newest bucket; LAST 3 widens
    # past the insufficient first probe to the full extent.
    assert tail_bucket_cutoff(spark, path, last=2, per_series=True) == DAY
    assert tail_bucket_cutoff(spark, path, last=3, per_series=True) == 0
    assert max(collected, default=0) <= 1, f"O(#series) collect: {collected}"
    monkeypatch.setattr(DataFrame, "collect", orig)

    got = select_last_points_probed(
        spark, path, fields=["value"], last=2, per_series=True, tiebreak=("series",)
    ).toPandas()
    want = select_last_points(
        read_measurement(spark, path),
        fields=["value"],
        last=2,
        per_series=True,
        tiebreak=("series",),
    ).toPandas()
    assert got.equals(want)
