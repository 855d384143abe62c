"""Rollup exactness, gap-fill modes, EWMA vs pandas."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from simple_tsdb_spark.operators import (
    ewma,
    fill_windows,
    materialize_rollup,
    rollup_sum_points,
    sum_points,
)


def test_rollup_exact(spark, f2, tmp_path):
    # coarse windows from the rollup == recomputed from raw, exactly
    base, coarse = 10_000, 100_000
    out = str(tmp_path / "rollup")
    materialize_rollup(spark, f2, out, fields=["value"], base_window_ns=base)
    got = rollup_sum_points(
        spark, out, fields=["value"], base_window_ns=base, window_ns=coarse
    ).toPandas()
    want = sum_points(f2, fields=["value"], window_ns=coarse, emit_empty=False).toPandas()
    got = got.sort_values(["series", "wstart"], ignore_index=True)
    want = want.sort_values(["series", "wstart"], ignore_index=True)[got.columns]
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-12)


def test_rollup_rejects_non_multiple(spark, f2, tmp_path):
    out = str(tmp_path / "r2")
    materialize_rollup(spark, f2, out, fields=["value"], base_window_ns=10_000)
    with pytest.raises(ValueError):
        rollup_sum_points(spark, out, fields=["value"], base_window_ns=10_000, window_ns=15_000)


@pytest.fixture()
def gappy(spark):
    from pyspark.sql import types as T

    pdf = pd.DataFrame(
        {
            "series": "s",
            "wstart": [0, 100, 200, 300, 400, 500],
            "v": [10.0, None, None, 40.0, None, 20.0],
        }
    )
    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("wstart", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    return spark.createDataFrame(pdf, schema)


def test_fill_modes(spark, gappy):
    lin = fill_windows(gappy, value_col="v", mode="linear").toPandas().sort_values("wstart")
    assert list(lin.v) == [10.0, 20.0, 30.0, 40.0, 30.0, 20.0]
    prev = fill_windows(gappy, value_col="v", mode="previous").toPandas().sort_values("wstart")
    assert list(prev.v) == [10.0, 10.0, 10.0, 40.0, 40.0, 20.0]
    zero = fill_windows(gappy, value_col="v", mode="zero").toPandas().sort_values("wstart")
    assert list(zero.v) == [10.0, 0.0, 0.0, 40.0, 0.0, 20.0]


def test_fill_exterior_gaps_stay_null(spark):
    from pyspark.sql import types as T

    pdf = pd.DataFrame({"series": "s", "wstart": [0, 100, 200], "v": [None, 5.0, None]})
    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("wstart", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    df = spark.createDataFrame(pdf, schema)
    lin = fill_windows(df, value_col="v", mode="linear").toPandas().sort_values("wstart")
    assert pd.isna(lin.v.iloc[0]) and lin.v.iloc[1] == 5.0 and pd.isna(lin.v.iloc[2])


def test_ewma_matches_pandas(spark, f2, f2_pdf):
    got = ewma(f2, field="value", alpha=0.3).toPandas()
    for s, grp in f2_pdf.groupby("series"):
        want = (
            grp.sort_values("time_ns").value.ewm(alpha=0.3, adjust=False, ignore_na=True).mean()
        )
        sub = got[got.series == s].sort_values("time_ns")
        np.testing.assert_allclose(
            sub.value_ewma.to_numpy(), want.to_numpy(), rtol=1e-12, equal_nan=True
        )


def test_hybrid_rollup_plus_tail(spark, f2, f2_pdf, tmp_path):
    from pyspark.sql import functions as F

    from simple_tsdb_spark.operators import hybrid_sum_points

    base, coarse = 10_000, 100_000
    # materialize the rollup over only the first 70% of time — the rest is
    # the "unfinalized" tail served from raw
    cut = int(f2_pdf.time_ns.quantile(0.7))
    cut_aligned = (cut // base) * base - 1
    out = str(tmp_path / "hybrid_rollup")
    materialize_rollup(
        spark,
        f2.where(F.col("time_ns") <= cut_aligned),
        out,
        fields=["value"],
        base_window_ns=base,
    )
    got = hybrid_sum_points(
        spark, f2, out, fields=["value"], base_window_ns=base, window_ns=coarse
    ).toPandas()
    want = sum_points(f2, fields=["value"], window_ns=coarse, emit_empty=False).toPandas()
    got = got.sort_values(["series", "wstart"], ignore_index=True)
    want = want.sort_values(["series", "wstart"], ignore_index=True)[got.columns]
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-9)


def test_advance_rollup_incremental(spark, f2, f2_pdf, tmp_path):
    from pyspark.sql import functions as F

    from simple_tsdb_spark.operators import advance_rollup, hybrid_sum_points

    base, coarse = 10_000, 100_000
    out = str(tmp_path / "adv_rollup")
    cut = int(f2_pdf.time_ns.quantile(0.5))
    phase1 = f2.where(F.col("time_ns") <= cut)

    n1 = advance_rollup(spark, phase1, out, fields=["value"], base_window_ns=base)
    assert n1 > 0
    # idempotent: nothing new without new data
    assert advance_rollup(spark, phase1, out, fields=["value"], base_window_ns=base) == 0
    # more data arrives → only newly finalized buckets appended
    n2 = advance_rollup(spark, f2, out, fields=["value"], base_window_ns=base)
    assert n2 > 0
    # no duplicate buckets ever
    r = spark.read.parquet(out)
    assert r.groupBy("series", "wstart").count().where("count > 1").count() == 0
    # hybrid read over the maintained rollup equals direct aggregation
    got = hybrid_sum_points(
        spark, f2, out, fields=["value"], base_window_ns=base, window_ns=coarse
    ).toPandas()
    want = sum_points(f2, fields=["value"], window_ns=coarse, emit_empty=False).toPandas()
    got = got.sort_values(["series", "wstart"], ignore_index=True)
    want = want.sort_values(["series", "wstart"], ignore_index=True)[got.columns]
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-9)


def test_hybrid_with_late_new_series(spark, tmp_path):
    """A series that first appears below other series' marks is served
    entirely from raw — no buckets lost."""
    from pyspark.sql import types as T

    from simple_tsdb_spark.operators import advance_rollup, hybrid_sum_points

    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
            T.StructField("value", T.DoubleType(), True),
        ]
    )

    def mk(rows):
        return spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "value"]), schema)

    out = str(tmp_path / "late_series_rollup")
    old = mk([("a", t, 1.0) for t in range(0, 10_000, 10)])
    advance_rollup(spark, old, out, fields=["value"], base_window_ns=100)
    # new series "b" appears with timestamps far below a's watermark
    both = mk(
        [("a", t, 1.0) for t in range(0, 10_000, 10)]
        + [("b", t, 2.0) for t in range(0, 3_000, 10)]
    )
    got = hybrid_sum_points(
        spark, both, out, fields=["value"], base_window_ns=100, window_ns=1000
    ).toPandas()
    want = sum_points(both, fields=["value"], window_ns=1000, emit_empty=False).toPandas()
    got = got.sort_values(["series", "wstart"], ignore_index=True)
    want = want.sort_values(["series", "wstart"], ignore_index=True)[got.columns]
    pd.testing.assert_frame_equal(got, want)
    # and advance picks the new series up from zero
    n = advance_rollup(spark, both, out, fields=["value"], base_window_ns=100)
    assert n > 0
    r = spark.read.parquet(out)
    assert r.where("series = 'b'").count() > 0
    assert r.groupBy("series", "wstart").count().where("count > 1").count() == 0


@pytest.mark.soak
@pytest.mark.parametrize("seed", [7, 1234])
def test_advance_rollup_random_interleavings(spark, tmp_path, seed):
    """Property test (ROADMAP #5): under ANY per-series-ordered arrival
    interleaving, incremental maintenance never duplicates or drops a
    bucket, and the final rollup + hybrid read equal the batch oracle."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.operators import advance_rollup, hybrid_sum_points

    base, coarse = 1_000, 4_000
    rng = np.random.default_rng(seed)
    n_series, n_pts = 3, 40
    series_pts = {}
    for s in range(n_series):
        t = np.cumsum(rng.integers(50, 900, size=n_pts)).astype("int64")
        series_pts[f"s{s}"] = list(zip(t, rng.random(n_pts) * 100))
    all_rows = [
        (s, int(t), float(v)) for s, pts in series_pts.items() for t, v in pts
    ]
    full_pdf = pd.DataFrame(all_rows, columns=["series", "time_ns", "value"])

    out = str(tmp_path / f"prop_rollup_{seed}")
    taken = {s: 0 for s in series_pts}
    arrived: list[tuple[str, int, float]] = []
    step = 0
    while any(taken[s] < len(series_pts[s]) for s in series_pts):
        # adversarial batch: a random (possibly zero) prefix chunk per
        # series — preserves per-series order, interleaves everything else
        batch = []
        for s, pts in series_pts.items():
            k = int(rng.integers(0, 9))
            chunk = pts[taken[s] : taken[s] + k]
            batch += [(s, int(t), float(v)) for t, v in chunk]
            taken[s] += len(chunk)
        if not batch:
            continue
        arrived += batch
        cum = spark.createDataFrame(
            pd.DataFrame(arrived, columns=["series", "time_ns", "value"])
        )
        advance_rollup(spark, cum, out, fields=["value"], base_window_ns=base)
        step += 1
        # invariant: never a duplicate (series, wstart) bucket
        r = spark.read.parquet(out)
        assert r.groupBy("series", "wstart").count().where("count > 1").count() == 0

    # final rollup equals the batch oracle over finalized buckets
    full = spark.createDataFrame(full_pdf)
    r = spark.read.parquet(out).toPandas()
    oracle = sum_points(full, fields=["value"], window_ns=base, emit_empty=False).toPandas()
    fin = {
        s: (max(t for t, _ in pts) // base) * base - 1 for s, pts in series_pts.items()
    }
    oracle = oracle[[w <= fin[s] for s, w in zip(oracle.series, oracle.wstart)]]
    r = r.sort_values(["series", "wstart"], ignore_index=True)[list(oracle.columns)]
    oracle = oracle.sort_values(["series", "wstart"], ignore_index=True)
    r = r.astype(oracle.dtypes.to_dict())
    pd.testing.assert_frame_equal(r, oracle, check_exact=False, rtol=1e-9)

    # hybrid read at a coarse multiple equals direct aggregation
    got = hybrid_sum_points(
        spark, full, out, fields=["value"], base_window_ns=base, window_ns=coarse
    ).toPandas()
    want = sum_points(full, fields=["value"], window_ns=coarse, emit_empty=False).toPandas()
    got = got.sort_values(["series", "wstart"], ignore_index=True)[list(want.columns)]
    want = want.sort_values(["series", "wstart"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_exact=False, rtol=1e-9)


def test_advance_rollup_raises_on_corrupt_rollup(spark, f2, tmp_path):
    """A transient/corrupt read must RAISE, not silently reset the
    high-water mark and double-append (ADVICE rollup.py:93)."""
    import os

    from simple_tsdb_spark.operators import advance_rollup

    out = str(tmp_path / "corrupt_rollup")
    os.makedirs(out)
    with open(os.path.join(out, "part-00000.parquet"), "w") as fh:
        fh.write("this is not a parquet file")
    with pytest.raises(Exception) as ei:
        advance_rollup(spark, f2, out, fields=["value"], base_window_ns=10_000)
    assert "not a parquet file" in str(ei.value).lower() or "footer" in str(ei.value).lower()


def test_advance_rollup_empty_dir_is_no_rollup(spark, f2, tmp_path):
    import os

    from simple_tsdb_spark.operators import advance_rollup

    out = str(tmp_path / "empty_rollup")
    os.makedirs(out)  # exists but holds no files: legitimately "no rollup yet"
    assert advance_rollup(spark, f2, out, fields=["value"], base_window_ns=10_000) > 0


def test_holt_linear_python_model_and_oracle(spark):
    """holt_linear vs a direct python recursion AND the recursive-CTE
    oracle on the same randomized data — all three bit-equal; trend
    locks onto a planted linear drift."""
    import duckdb
    import pandas as pd

    from simple_tsdb_spark.operators import holt_linear
    from simple_tsdb_spark.operators.fill import holt_linear_oracle

    import random

    rng = random.Random(11)
    rows = []
    for s in ("ramp", "noisy"):
        for i in range(60):
            v = 2.0 * i + 5.0 if s == "ramp" else rng.uniform(-50, 50)
            if s == "noisy" and i % 9 == 0:
                v = None  # dropped by the operator
            rows.append((s, i * 10, v))
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "value"])
    df = spark.createDataFrame(pdf)
    got = (
        holt_linear(df, field="value", alpha=0.5, beta=0.3)
        .toPandas()
        .sort_values(["series", "time_ns"], ignore_index=True)
    )

    # python model (same op order)
    a, b1m, bt, bt1m = 0.5, 0.5, 0.3, 0.7
    want_rows = []
    for s in ("noisy", "ramp"):
        lvl = trd = None
        for _, r in pdf[(pdf.series == s) & pdf.value.notna()].iterrows():
            v = float(r.value)
            if lvl is None:
                lvl, trd = v, 0.0
            else:
                nl = (a * v) + (b1m * (lvl + trd))
                trd = (bt * (nl - lvl)) + (bt1m * trd)
                lvl = nl
            want_rows.append((s, int(r.time_ns), v, lvl, trd))
    want = pd.DataFrame(
        want_rows, columns=["series", "time_ns", "value", "level", "trend"]
    ).sort_values(["series", "time_ns"], ignore_index=True)
    pd.testing.assert_frame_equal(got, want)

    # the ramp's trend converges to the true slope (2 per step)
    ramp_tail = got[(got.series == "ramp")].trend.iloc[-1]
    assert abs(ramp_tail - 2.0) < 1e-6

    # DuckDB oracle on the same frame — exact value equality
    con = duckdb.connect()
    con.register("m", pdf)
    duck = (
        con.execute(holt_linear_oracle("SELECT * FROM m", field="value"))
        .df()
        .sort_values(["series", "time_ns"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, duck)
