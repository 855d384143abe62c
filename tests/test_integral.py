"""A4 trapezoidal integral vs a direct model of integral_op.cc, including
NULL poisoning, the single-point rule and empty ranges."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from simple_tsdb_spark.operators import integrate_points


def model_integral(pdf: pd.DataFrame, field: str, t0: int, t1: int):
    sel = pdf[(pdf.time_ns >= t0) & (pdf.time_ns <= t1)].sort_values("time_ns")
    if sel.empty:
        return None  # no row emitted
    vals = sel[field].astype(float).to_numpy()
    ts = sel.time_ns.to_numpy()
    poisoned = pd.isna(sel[field]).any()
    if poisoned:
        return (ts[0], ts[-1], len(sel), None)
    if len(sel) == 1:
        return (ts[0], ts[-1], 1, float(vals[0]))
    total = 0.0
    for i in range(1, len(ts)):
        total += 0.5 * (vals[i] + vals[i - 1]) * (ts[i] - ts[i - 1]) / 1e9
    return (ts[0], ts[-1], len(sel), total)


@pytest.mark.parametrize("t0,t1", [(0, 10**6), (100, 540), (255, 265), (250, 250)])
def test_integral_f2(spark, f2, f2_pdf, t0, t1):
    # f2 has p=0.001 nulls → some series poisoned over wide ranges, fine.
    got = integrate_points(f2, fields=["value"], t0=t0 * 1000, t1=t1 * 10**9).toPandas()
    for s, grp in f2_pdf.groupby("series"):
        want = model_integral(grp, "value", t0 * 1000, t1 * 10**9)
        sub = got[got.series == s]
        if want is None:
            assert sub.empty
            continue
        assert len(sub) == 1
        row = sub.iloc[0]
        assert row.t0_ns == want[0] and row.t1_ns == want[1] and row.npoints == want[2]
        if want[3] is None:
            assert pd.isna(row.value_integral)
        else:
            assert abs(row.value_integral - want[3]) < 1e-9 * max(1.0, abs(want[3]))


def test_poisoning(spark, f1, f1_pdf):
    # f1 has 25% nulls ⇒ any wide range is poisoned for every field.
    got = integrate_points(f1, fields=["field2"], t0=0, t1=10**6).toPandas()
    assert len(got) == 1
    assert pd.isna(got.iloc[0].field2_integral)


def test_single_point(spark, f1, f1_pdf):
    # Range covering exactly one point: integral = value (integral_op.cc:96-102).
    row = f1_pdf[f1_pdf.field2.notna()].iloc[3]
    t = int(row.time_ns)
    got = integrate_points(f1, fields=["field2"], t0=t, t1=t).toPandas()
    assert len(got) == 1
    assert got.iloc[0].npoints == 1
    assert abs(got.iloc[0].field2_integral - row.field2) < 1e-12


def test_empty_range(spark, f1):
    got = integrate_points(f1, fields=["field2"], t0=10**7, t1=10**8)
    assert got.count() == 0


def test_exact_mode(spark, f2, f2_pdf):
    got = integrate_points(f2, fields=["value"], t0=0, t1=2**62, exact=True).toPandas()
    for s, grp in f2_pdf.groupby("series"):
        want = model_integral(grp, "value", 0, 2**62)
        row = got[got.series == s].iloc[0]
        if want[3] is None:
            assert pd.isna(row.value_integral)
        else:
            # exact mode rounds values to 1e-6 units → small tolerance vs model
            assert abs(row.value_integral - want[3]) < 1e-4 * max(1.0, abs(want[3]))


def model_twa(pdf: pd.DataFrame, field: str, t0: int, t1: int, w: int):
    """Python model of time_weighted_avg: per (series, window) trapezoid
    integral / covered duration, single-point and poisoning conventions."""
    sel = pdf[(pdf.time_ns >= t0) & (pdf.time_ns <= t1)].copy()
    sel["wstart"] = sel.time_ns - (sel.time_ns % w)
    out = {}
    for (s, ws), grp in sel.groupby(["series", "wstart"]):
        grp = grp.sort_values("time_ns")
        ts = grp.time_ns.to_numpy()
        vals = grp[field].astype(float).to_numpy()
        if pd.isna(grp[field]).any():
            out[(s, ws)] = (len(grp), None)
        elif len(grp) == 1:
            out[(s, ws)] = (1, float(vals[0]))
        else:
            num = 0.0
            for i in range(1, len(ts)):
                num += 0.5 * (vals[i] + vals[i - 1]) * (ts[i] - ts[i - 1])
            out[(s, ws)] = (len(grp), num / (ts[-1] - ts[0]))
    return out


def test_time_weighted_avg_model(spark, f2, f2_pdf):
    from simple_tsdb_spark.operators import time_weighted_avg

    w = 50 * 10**9
    got = time_weighted_avg(f2, field="value", t0=0, t1=2**62, window_ns=w).toPandas()
    want = model_twa(f2_pdf, "value", 0, 2**62, w)
    assert len(got) == len(want)
    for row in got.itertuples():
        n, twa = want[(row.series, row.wstart)]
        assert row.npoints == n
        if twa is None:
            assert pd.isna(row.value_twa)
        else:
            # exact mode quantizes values to 1e-6 units → tiny tolerance
            assert abs(row.value_twa - twa) < 1e-4 * max(1.0, abs(twa))


def test_time_weighted_avg_constant_series(spark):
    # A constant gauge's time-weighted average is that constant in every
    # window, regardless of sampling irregularity.
    import pandas as pd

    rows = [("s", t * 10**9, 7.5) for t in [0, 1, 5, 17, 40, 41, 99]]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "value"])
    df = spark.createDataFrame(pdf)
    got = (
        __import__("simple_tsdb_spark.operators", fromlist=["time_weighted_avg"])
        .time_weighted_avg(df, field="value", t0=0, t1=2**62, window_ns=50 * 10**9)
        .toPandas()
    )
    assert (got.value_twa == 7.5).all()
