"""A1 count_points — exhaustive sliding-range checks in the style of
``count_test.cc:160-225`` (every (t0,t1) pair at a stride, vs brute force)."""

from __future__ import annotations

import pytest


from simple_tsdb_spark.operators import count_points


@pytest.mark.soak
def test_sliding_count(spark, f1, f1_pdf):
    # stride-5 grid over the live range edges (reference uses stride 5 over
    # the whole range; we cover the boundary-rich region + spot checks).
    pts = f1_pdf.time_ns
    cases = [(t0, t1) for t0 in range(90, 161, 5) for t1 in range(500, 561, 5)]
    cases += [(0, 10**9), (0, 99), (10241, 10**9), (255, 255), (250, 250)]
    rows = count_points(f1, series="series1", t0=0, t1=0, per_series=False)  # warm plan
    for t0, t1 in cases:
        got = count_points(f1, series="series1", t0=t0, t1=t1, per_series=False).first()
        sel = pts[(pts >= t0) & (pts <= t1)]
        assert got["npoints"] == len(sel), (t0, t1)
        if len(sel):
            assert got["time_first"] == sel.min()
            assert got["time_last"] == sel.max()
        else:
            assert got["time_first"] is None and got["time_last"] is None


def test_count_per_series(spark, f2, f2_pdf):
    got = count_points(f2, t0=0, t1=2**62).toPandas().set_index("series")
    for s, grp in f2_pdf.groupby("series"):
        assert got.loc[s, "npoints"] == len(grp)
        assert got.loc[s, "time_first"] == grp.time_ns.min()
        assert got.loc[s, "time_last"] == grp.time_ns.max()
