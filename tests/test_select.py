"""S1/S2 operator tests — reference test shapes from
``select_op_test.cc`` (sliding ranges, gap probes, LIMIT/LAST edges)."""

from __future__ import annotations

import pandas as pd

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
