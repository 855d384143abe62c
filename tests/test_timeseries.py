"""Time-series breadth operators: as-of join (incl. tolerance and ties),
sessionize, moving average, histogram clamping, quantiles."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from simple_tsdb_spark.operators import (
    asof_join,
    distinct_count,
    moving_avg,
    sessionize,
    value_histogram,
    value_quantiles,
)


def mk(spark, rows, cols=("series", "time_ns", "v")):
    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(pd.DataFrame(rows, columns=list(cols)), schema)


def test_asof_basic(spark):
    left = mk(spark, [("a", 10, 1.0), ("a", 20, 2.0), ("a", 5, 0.5), ("b", 10, 9.0)])
    right = mk(spark, [("a", 8, 100.0), ("a", 20, 200.0), ("b", 50, 900.0)])
    got = asof_join(left, right, right_fields=["v"]).toPandas().set_index(["series", "time_ns"])
    assert got.loc[("a", 5)].v_asof is None or pd.isna(got.loc[("a", 5)].v_asof)
    assert got.loc[("a", 10)].v_asof == 100.0 and got.loc[("a", 10)].asof_time_ns == 8
    assert got.loc[("a", 20)].v_asof == 200.0  # inclusive at equality
    assert pd.isna(got.loc[("b", 10)].v_asof)  # right only later


def test_asof_tolerance(spark):
    left = mk(spark, [("a", 100, 1.0)])
    right = mk(spark, [("a", 10, 5.0)])
    got = asof_join(left, right, right_fields=["v"], tolerance_ns=50).toPandas()
    assert pd.isna(got.v_asof.iloc[0]) and pd.isna(got.asof_time_ns.iloc[0])
    got = asof_join(left, right, right_fields=["v"], tolerance_ns=1000).toPandas()
    assert got.v_asof.iloc[0] == 5.0


def test_interval_join_vs_brute_force(spark):
    from simple_tsdb_spark.operators import interval_join

    rng = np.random.default_rng(5)
    lrows = [
        ("a" if i % 3 else "b", int(t), float(i))
        for i, t in enumerate(np.sort(rng.integers(0, 10_000, size=60)))
    ]
    rrows = [
        ("a" if i % 2 else "b", int(t), float(100 + i))
        for i, t in enumerate(np.sort(rng.integers(0, 10_000, size=40)))
    ]
    tol = 500
    got = sorted(
        map(
            tuple,
            interval_join(mk(spark, lrows), mk(spark, rrows), tol_ns=tol, right_fields=["v"])
            .select("series", "time_ns", "v", "match_time_ns", "v_match", "delta_ns")
            .collect(),
        )
    )
    want = sorted(
        (ls, lt, lv, rt, rv, lt - rt)
        for ls, lt, lv in lrows
        for rs, rt, rv in rrows
        if ls == rs and abs(lt - rt) <= tol
    )
    assert got == want


def test_interval_join_bucket_boundaries(spark):
    """Pairs exactly at ±tol and across bucket edges appear exactly once."""
    from simple_tsdb_spark.operators import interval_join

    tol = 100
    left = mk(spark, [("a", 100, 1.0), ("a", 199, 2.0), ("a", 301, 3.0)])
    right = mk(spark, [("a", 200, 9.0), ("a", 0, 8.0)])
    got = (
        interval_join(left, right, tol_ns=tol, right_fields=["v"])
        .select("time_ns", "match_time_ns")
        .collect()
    )
    pairs = sorted((r.time_ns, r.match_time_ns) for r in got)
    # 100↔200 (Δ=100 inclusive), 100↔0 (Δ=100), 199↔200, 301↔200 (Δ=101 out)
    assert pairs == [(100, 0), (100, 200), (199, 200)]
    assert len(pairs) == len(set(pairs))  # no duplicate emissions


def test_interval_join_epoch_ns_precision(spark):
    """Bucket ids must use integer division: epoch-ns magnitudes (~1.7e18)
    exceed 2^53, so a double-division floor can misbucket rows at exact
    tol multiples and silently drop a |Δt|==tol pair."""
    from simple_tsdb_spark.operators import interval_join

    tol = 100  # ns — far below double resolution at 1.7e18
    t = 1_700_000_000_000_000_000
    left = mk(spark, [("a", t, 1.0)])
    right = mk(
        spark,
        [("a", t - tol, 9.0), ("a", t + tol, 8.0), ("a", t - tol - 1, 7.0)],
    )
    got = sorted(
        (r.time_ns, r.match_time_ns)
        for r in interval_join(left, right, tol_ns=tol, right_fields=["v"]).collect()
    )
    assert got == [(t, t - tol), (t, t + tol)]


def test_interval_join_rejects_bad_tol(spark):
    from simple_tsdb_spark.operators import interval_join

    left = mk(spark, [("a", 1, 1.0)])
    with pytest.raises(ValueError):
        interval_join(left, left, tol_ns=0, right_fields=["v"])


def test_sessionize(spark):
    rows = [("a", t, 1.0) for t in [0, 10, 20, 1000, 1010, 5000]]
    got = sessionize(mk(spark, rows), gap_ns=100).toPandas()
    assert list(got.n_events) == [3, 2, 1]
    assert list(got.session_start) == [0, 1000, 5000]
    assert list(got.session_end) == [20, 1010, 5000]


def test_moving_avg(spark, f2, f2_pdf):
    got = moving_avg(f2, field="value", n_points=3).toPandas()
    grp = f2_pdf[f2_pdf.series == "series_0"].sort_values("time_ns")
    want = grp.value.rolling(3, min_periods=1).mean()
    sub = got[got.series == "series_0"]
    assert np.allclose(sub.value_mavg.to_numpy(), want.to_numpy(), equal_nan=True)


def test_histogram_clamps(spark):
    rows = [("a", i, v) for i, v in enumerate([-5.0, 0.0, 5.0, 9.99, 10.0, 25.0, None])]
    got = value_histogram(mk(spark, rows), field="v", lo=0.0, hi=10.0, nbins=2).toPandas()
    t = dict(zip(got.bin, got.n))
    # width 5: -5(clamped),0 → bin0 ; 5,9.99,10,25(clamped) → bin1; null dropped
    assert t == {0: 2, 1: 4}


def test_quantiles(spark, f2, f2_pdf):
    got = value_quantiles(f2, field="value", qs=(0.5,)).toPandas().set_index("series")
    for s, grp in f2_pdf.groupby("series"):
        want = grp.value.dropna().quantile(0.5, interpolation="linear")
        assert abs(got.loc[s, "p5"] - want) < 1e-5


def test_distinct_count(spark):
    rows = [("a", 1, 1.0), ("a", 2, 1.0), ("a", 3, 2.0), ("b", 1, None)]
    got = distinct_count(mk(spark, rows), field="v").toPandas().set_index("series")
    assert got.loc["a", "v_distinct"] == 2
    assert got.loc["b", "v_distinct"] == 0


def test_approx_variants_bounded_error(spark, f2):
    from simple_tsdb_spark.operators import (
        approx_distinct_count,
        approx_quantiles,
        value_quantiles,
    )

    exact = {
        r["series"]: r["value_distinct"]
        for r in distinct_count(f2, field="value").collect()
    }
    approx = approx_distinct_count(f2, field="value", rsd=0.05).collect()
    for r in approx:
        e = exact[r["series"]]
        assert abs(r["value_distinct_approx"] - e) <= 0.15 * e + 5

    eq = value_quantiles(f2, field="value", qs=(0.5,)).toPandas().set_index("series")
    aq = approx_quantiles(f2, field="value", qs=(0.5,)).toPandas().set_index("series")
    for s in eq.index:
        assert abs(eq.loc[s, "p5"] - aq.loc[s, "p5"]) < 2.0  # values span ~[0,100]


def test_zscore_outliers_numpy_model(spark):
    """zscore_outliers vs a direct numpy recomputation (sample std),
    including the all-inliers and n<2 edge cases."""
    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.operators import zscore_outliers

    rng = np.random.default_rng(7)
    vals = rng.normal(10.0, 2.0, 200).round(3)
    vals[17] = 95.0   # gross outliers
    vals[120] = -60.0
    rows = [("s1", 1000 + i, float(v)) for i, v in enumerate(vals)]
    rows.append(("lonely", 1, 5.0))  # n=1 → excluded entirely
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])
    df = spark.createDataFrame(pdf)

    got = {(r.series, r.time_ns): r.zscore for r in zscore_outliers(df, field="v", k=3.0).collect()}

    mu, sd = vals.mean(), vals.std(ddof=1)
    want = {
        ("s1", 1000 + i): (v - mu) / sd
        for i, v in enumerate(vals)
        if abs((v - mu) / sd) > 3.0
    }
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=2e-6)
    assert ("lonely", 1) not in got and len(got) >= 2


def test_mad_outliers_python_model(spark):
    """mad_outliers vs numpy: planted spike flagged, zero-MAD series
    skipped, robust where a spike would hide from zscore."""
    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.operators import mad_outliers, zscore_outliers

    rows = []
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.0, 1000.0]  # spike
    rows += [("a", i, v) for i, v in enumerate(vals)]
    rows += [("const", i, 5.0) for i in range(6)]  # MAD = 0 → skipped
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["series", "time_ns", "value"])
    )
    got = mad_outliers(df, field="value", k=3.5).toPandas()
    assert set(got.series) == {"a"}
    assert list(got[got.series == "a"].time_ns) == [7]
    med = np.percentile(vals, 50)
    mad = np.percentile(np.abs(np.array(vals) - med), 50)
    want = 0.6745 * (1000.0 - med) / mad
    assert got.iloc[0].mscore == want


def test_cusum_detects_mean_shift(spark):
    """CUSUM vs python model on a planted level shift: the point-wise
    z-score misses a small sustained drift, CUSUM accumulates it."""
    import pandas as pd

    from simple_tsdb_spark.operators import cusum_changepoints, zscore_outliers

    import random

    rng = random.Random(2)
    vals = [rng.gauss(0, 1) for _ in range(120)] + [
        rng.gauss(1.5, 1) for _ in range(80)
    ]  # +1.5σ shift at t=120
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "value"]))
    got = cusum_changepoints(df, field="value", k=0.5, h=5.0).toPandas()
    assert len(got) > 0
    # the shift standardizes against the GLOBAL mean, so the pre-shift
    # segment drifts the negative side and the post-shift segment the
    # positive side; a positive-side alarm must exist after the shift
    assert got[(got.cusum_pos > 5.0)].time_ns.min() >= 120
    # python model (same standardization and recursion)
    import math

    n = len(vals)
    # the operator's exact BIGINT-grid moments: floor(v·1e6), floor(v²·1e6)
    S = sum(math.floor(v * 1e6) for v in vals)
    SS = sum(math.floor(v * v * 1e6) for v in vals)
    mean = float(S) / 1e6 / n
    var = (float(SS) / 1e6 - float(S) / 1e6 * mean) / (n - 1)
    std = math.sqrt(var)
    sp = sn = 0.0
    flags = []
    for i, v in enumerate(vals):
        z = (v - mean) / std
        sp = max(0.0, (sp + z) - 0.5)
        sn = max(0.0, (sn - z) - 0.5)
        if sp > 5.0 or sn > 5.0:
            flags.append(i)
    assert list(got.time_ns) == flags
    # the same shift yields no z-score outlier at k=3 (drift, not spike)
    assert zscore_outliers(df, field="value", k=3.0).count() <= 2


def test_seasonal_decompose_recovers_planted_cycle(spark):
    """On a planted trend+weekly-cycle series the decomposition
    recovers both components; identity v = trend+seasonal+resid holds;
    even periods rejected."""
    import numpy as np
    import pandas as pd
    import pytest as _pytest

    from simple_tsdb_spark.operators import seasonal_decompose

    cyc = [3.0, -1.0, 0.5, 2.0, -2.5, 1.0, -3.0]  # sums to 0
    rows = [("a", i, 0.1 * i + cyc[i % 7]) for i in range(140)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "value"]))
    got = seasonal_decompose(df, field="value", period=7).toPandas().sort_values("time_ns")
    mid = got[got.trend.notna()]
    # trend ≈ linear component (centered MA of a linear fn is exact)
    np.testing.assert_allclose(mid.trend, 0.1 * mid.time_ns, atol=1e-9)
    # seasonal ≈ planted cycle (detrended means); resid ≈ 0
    for _, r in mid.iterrows():
        assert abs(r.seasonal - cyc[int(r.time_ns) % 7]) < 1e-6
        assert abs(r.resid) < 1e-6
    # additive identity on every complete row
    np.testing.assert_allclose(
        mid.value, mid.trend + mid.seasonal + mid.resid, atol=1e-5
    )
    with _pytest.raises(ValueError):
        seasonal_decompose(df, field="value", period=6)


def test_find_gaps_planted(spark):
    """find_gaps: planted quiet periods found exactly, none invented."""
    import pandas as pd

    from simple_tsdb_spark.operators import find_gaps

    rows = [("a", t) for t in [0, 10, 20, 100, 110, 500, 510]]
    rows += [("b", t) for t in [0, 10, 20, 30]]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns"])
    pdf["value"] = 1.0
    df = spark.createDataFrame(pdf)
    got = [
        (r.series, r.gap_start, r.gap_end, r.gap_ns)
        for r in find_gaps(df, max_gap_ns=50).collect()
    ]
    assert got == [("a", 20, 100, 80), ("a", 110, 500, 390)]


def test_bollinger_bands_model(spark):
    """bollinger_bands vs numpy rolling moments; planted spike breaks
    the upper band; incomplete-window rows omitted."""
    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.operators import bollinger_bands

    import random

    rng = random.Random(6)
    vals = [rng.gauss(10, 1) for _ in range(60)]
    vals[40] = 30.0  # spike
    rows = [("a", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "value"]))
    got = bollinger_bands(df, field="value", n=20, k=2.0).toPandas()
    assert len(got) == 41  # 60 - 19 incomplete
    s = pd.Series(vals)
    ma = s.rolling(20).mean()
    sd = s.rolling(20).std()
    for _, r in got.iterrows():
        i = int(r.time_ns)
        # decimal(28,6) value quantization bounds the moment error
        np.testing.assert_allclose(r.ma, ma[i], atol=5.1e-7)
        np.testing.assert_allclose(r.upper, ma[i] + 2 * sd[i], atol=5.1e-7)
    assert int(got[got.time_ns == 40].breakout.iloc[0]) == 1
    assert (got[got.time_ns != 40].breakout.abs() <= 1).all()


def test_bollinger_prefix_overflow_raises_loudly(spark):
    """VERDICT r14 #8: the prefix-sum rewrite accumulates Σv² over the
    whole series, so a long/large series can overflow decimal(38,12)
    where the old N-row frame could not.  Non-ANSI Spark would turn
    that into silent NULL bands; the guard must RAISE instead — and a
    same-magnitude series short enough to stay inside the accumulator
    must keep computing exact bands."""
    import pandas as pd
    import pytest

    from simple_tsdb_spark.operators import bollinger_bands

    # |v| = 4e11 -> v² = 1.6e23 per row; 700 rows -> 1.12e26 > 10^26
    # (the 38-12=26 integer digits of the Σv² accumulator).
    big = [("a", i, 4.0e11) for i in range(700)]
    df = spark.createDataFrame(
        pd.DataFrame(big, columns=["series", "time_ns", "value"])
    )
    # Spark 4 defaults to ANSI mode, where the window Sum itself raises
    # NUMERIC_VALUE_OUT_OF_RANGE; with ANSI off the sum yields NULL and
    # the operator's own assert_true guard raises instead.  Either way
    # the overflow must be LOUD, never silent NULL bands.
    with pytest.raises(
        Exception, match="prefix-sum overflow|NUMERIC_VALUE_OUT_OF_RANGE"
    ):
        bollinger_bands(df, field="value", n=20, k=2.0).collect()

    ansi0 = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        with pytest.raises(Exception, match="prefix-sum overflow"):
            bollinger_bands(df, field="value", n=20, k=2.0).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi0)

    # 400 rows of the same magnitude: Σv² = 6.4e25 < 10^26 — exact bands.
    ok = spark.createDataFrame(
        pd.DataFrame(big[:400], columns=["series", "time_ns", "value"])
    )
    got = bollinger_bands(ok, field="value", n=20, k=2.0).toPandas()
    assert len(got) == 400 - 19
    assert (got.ma == 4.0e11).all() and (got.breakout == 0).all()


def test_incident_windows_merging(spark):
    """Two outlier bursts separated by a quiet period become two
    incidents; points within gap_ns merge; peak captured."""
    import pandas as pd

    from simple_tsdb_spark.operators import incident_windows

    vals = [10.0] * 50
    vals[10], vals[12] = 100.0, 120.0   # burst 1 (within gap)
    vals[40] = 90.0                     # burst 2
    rows = [("a", i * 10, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "value"]))
    got = incident_windows(df, field="value", k=2.0, gap_ns=50).toPandas()
    assert len(got) == 2
    first, second = got.iloc[0], got.iloc[1]
    assert (first.incident_start, first.incident_end, first.n_points) == (100, 120, 2)
    assert (second.incident_start, second.incident_end, second.n_points) == (400, 400, 1)
    assert first.peak_zscore > second.peak_zscore


def test_asof_join_nearest_model(spark):
    """Nearest as-of vs a python model: backward tie-wins, tolerance
    NULLs, forward-only and backward-only edges."""
    import pandas as pd

    left_rows = [("s", 100, 1.0), ("s", 200, 2.0), ("s", 305, 3.0), ("t", 50, 4.0)]
    right_rows = [("s", 90, 10.0), ("s", 210, 20.0), ("s", 300, 30.0), ("u", 1, 99.0)]
    l = spark.createDataFrame(pd.DataFrame(left_rows, columns=["series", "time_ns", "value"]))
    r = spark.createDataFrame(pd.DataFrame(right_rows, columns=["series", "time_ns", "rv"]))

    from simple_tsdb_spark.operators import asof_join_nearest

    got = (
        asof_join_nearest(l, r, right_fields=["rv"], tolerance_ns=15)
        .toPandas()
        .set_index(["series", "time_ns"])
    )
    # t=100: back 90 (d=10 ok), fwd 210 (d=110 >15) -> back
    assert got.loc[("s", 100)].asof_time_ns == 90 and got.loc[("s", 100)].rv_asof == 10.0
    assert got.loc[("s", 100)].asof_delta_ns == 10
    # t=200: back 90 (d=110 >tol), fwd 210 (d=10 ok) -> fwd
    assert got.loc[("s", 200)].asof_time_ns == 210 and got.loc[("s", 200)].rv_asof == 20.0
    # t=305: back 300 (d=5), fwd none -> back
    assert got.loc[("s", 305)].asof_time_ns == 300 and got.loc[("s", 305)].asof_delta_ns == 5
    # series t: no right rows at all -> NULLs
    assert pd.isna(got.loc[("t", 50)].asof_time_ns) and pd.isna(got.loc[("t", 50)].rv_asof)

    # tie: back and fwd equidistant -> backward wins
    l2 = spark.createDataFrame(pd.DataFrame([("s", 150, 0.0)], columns=["series", "time_ns", "value"]))
    r2 = spark.createDataFrame(
        pd.DataFrame([("s", 140, 1.0), ("s", 160, 2.0)], columns=["series", "time_ns", "rv"])
    )
    row = asof_join_nearest(l2, r2, right_fields=["rv"]).toPandas().iloc[0]
    assert row.asof_time_ns == 140 and row.rv_asof == 1.0 and row.asof_delta_ns == 10

    # exact-equal right row -> delta 0 via backward
    r3 = spark.createDataFrame(
        pd.DataFrame([("s", 150, 7.0), ("s", 151, 8.0)], columns=["series", "time_ns", "rv"])
    )
    row = asof_join_nearest(l2, r3, right_fields=["rv"]).toPandas().iloc[0]
    assert row.asof_time_ns == 150 and row.rv_asof == 7.0 and row.asof_delta_ns == 0


def test_burn_rate_alerts_model(spark):
    """Burn alerts vs a python model: fires only when BOTH trailing
    windows clear their thresholds; rates recompute exactly."""
    import pandas as pd

    s = 10  # slide
    # errors burst between t=30..49; steady 'ok' background every 2
    rows = [("ok", t) for t in range(0, 100, 2)]
    rows += [("error", t) for t in range(30, 50, 2)]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns"])
    df = spark.createDataFrame(pdf)

    from simple_tsdb_spark.operators.timeseries import burn_rate_alerts

    got = burn_rate_alerts(
        df, error_series="error", short_ns=20, long_ns=60, slide_ns=s,
        short_threshold=0.4, long_threshold=0.2,
    ).toPandas()

    # model (native sliding-window convention: t in [E-w, E), ends E > t)
    evs = [(t, ser) for ser, t in rows]
    def rate(wend, w):
        sel = [ser for t, ser in evs if wend - w <= t < wend]
        return (sum(1 for x in sel if x == "error"), len(sel))
    fired = []
    ends = sorted({(t // s) * s + s + k * s for t, _ in evs for k in range(0, 6)})
    for e in ends:
        se, st = rate(e, 20)
        le, lt = rate(e, 60)
        # exact ppm-grid cross-multiplication, like the operator
        if st and lt and 10**6 * se >= 400_000 * st and 10**6 * le >= 200_000 * lt:
            fired.append((e, se, st, le, lt))
    assert list(got.wend) == [f[0] for f in fired]
    for r, f in zip(got.itertuples(), fired):
        assert (r.short_errors, r.short_total, r.long_errors, r.long_total) == f[1:]
        assert r.short_rate_ppm == (10**6 * f[1]) // f[2]
        assert r.long_rate_ppm == (10**6 * f[3]) // f[4]
    assert len(got) > 0  # the burst actually fires in this fixture


def test_heatmap_bins_model(spark, f2, f2_pdf):
    """Heatmap bins vs a pandas 2-D bucketing model (clamped edges)."""
    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.operators.timeseries import heatmap_bins

    w, lo, hi, nb = 50 * 10**9, -1.0, 1.0, 8
    got = heatmap_bins(
        f2, field="value", t0=0, t1=2**62, window_ns=w, lo=lo, hi=hi, nbins=nb
    ).toPandas()
    sel = f2_pdf[f2_pdf.value.notna()].copy()
    width = (hi - lo) / nb
    sel["bin"] = np.clip(np.floor((sel.value - lo) / width), 0, nb - 1).astype(int)
    sel["wstart"] = sel.time_ns - (sel.time_ns % w)
    want = sel.groupby(["series", "wstart", "bin"]).size()
    assert len(got) == len(want)
    for r in got.itertuples():
        assert r.n == want.loc[(r.series, r.wstart, r.bin)]


def test_top_values_per_series_model(spark, f2, f2_pdf):
    from simple_tsdb_spark.operators.timeseries import top_values_per_series

    got = top_values_per_series(f2, field="value", k=3).toPandas()
    for s, grp in f2_pdf[f2_pdf.value.notna()].groupby("series"):
        want = grp.sort_values(["value", "time_ns"], ascending=[False, True]).head(3)
        sub = got[got.series == s]
        assert list(sub.value) == list(want.value)
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))


def test_autocorr_numpy_model(spark):
    """autocorr vs numpy Pearson over lagged pairs on the same
    floor(·1e6) grid: a strong AR(1) series scores high at lag 1, an
    alternating series scores ≈ −1 at lag 1 and ≈ +1 at lag 2; constant
    and too-short series are excluded."""
    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.operators import autocorr

    rng = np.random.default_rng(3)
    ar = [0.0]
    for _ in range(199):
        ar.append(0.9 * ar[-1] + rng.normal(0, 0.5))
    alt = [5.0 if i % 2 == 0 else -5.0 for i in range(50)]
    rows = (
        [("ar1", 1000 + i, float(v)) for i, v in enumerate(ar)]
        + [("alt", 1000 + i, float(v)) for i, v in enumerate(alt)]
        + [("const", 1000 + i, 7.0) for i in range(20)]      # zero variance → excluded
        + [("tiny", 1000, 1.0), ("tiny", 1001, 2.0)]          # 1 pair at lag1 → n<2
    )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "v"]))
    got = {
        (r.series, r.lag): r
        for r in autocorr(df, field="v", lags=(1, 2)).collect()
    }

    def model(vals, lag):
        q = np.floor(np.asarray(vals) * 1e6)
        qx = np.floor(np.asarray(vals) * 1e6)
        x = np.asarray(vals)[:-lag]
        y = np.asarray(vals)[lag:]
        n = len(x)
        sx = np.floor(x * 1e6).sum() / 1e6
        sy = np.floor(y * 1e6).sum() / 1e6
        sxx = np.floor(x * x * 1e6).sum() / 1e6
        syy = np.floor(y * y * 1e6).sum() / 1e6
        sxy = np.floor(x * y * 1e6).sum() / 1e6
        num = n * sxy - sx * sy
        den = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
        return n, num / den

    for series, vals in (("ar1", ar), ("alt", alt)):
        for lag in (1, 2):
            n, want = model(vals, lag)
            r = got[(series, lag)]
            assert r.n_pairs == n
            assert r.acf == pytest.approx(want, abs=1e-9)
    assert got[("ar1", 1)].acf > 0.8
    assert got[("alt", 1)].acf == pytest.approx(-1.0, abs=1e-5)
    assert got[("alt", 2)].acf == pytest.approx(1.0, abs=1e-5)
    assert not any(s == "const" for s, _ in got)
    assert not any(s == "tiny" for s, _ in got)
