"""Randomized model-based testing — the reference's tsdbtest layer
(``/root/reference/src/tsdbtest/main.cc:324-498``): keep a full in-memory
golden model of a measurement, hammer it with random range SELECTs
(first/LIMIT/LAST, endpoints before/inside/after the live range), COUNT
consistency, and rotate cycles (DELETE from the front + re-append with a
deliberate identical-overwrite overlap), revalidating against the model.

Deterministic seeds; sized to run in seconds on local[32].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from simple_tsdb_spark.operators import count_points, delete_points, select_last_points, select_points
from simple_tsdb_spark.sources.writer import write_points

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("time_ns", T.LongType(), False),
        T.StructField("v", T.DoubleType(), True),
    ]
)


def gen_model(seed: int, n: int = 3000) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    t = 1_000_000 + np.cumsum(rng.integers(1, 1000, size=n)).astype("int64")
    v = rng.random(n) * 1000
    pdf = pd.DataFrame({"series": "s", "time_ns": t, "v": v})
    pdf.loc[rng.random(n) < 0.001, "v"] = None
    return pdf


@pytest.mark.parametrize("seed", [7, 21])
def test_random_selects_match_model(spark, tmp_path, seed):
    model = gen_model(seed)
    path = str(tmp_path / f"m{seed}")
    write_points(spark, path, spark.createDataFrame(model, SCHEMA))
    df = spark.read.parquet(path)
    rng = np.random.default_rng(seed + 1)
    lo, hi = int(model.time_ns.min()), int(model.time_ns.max())
    span = hi - lo
    for _ in range(25):
        # endpoints drawn before/inside/after the live range (main.cc:337-357)
        t0 = int(lo + rng.integers(-span // 4, span))
        t1 = int(t0 + rng.integers(0, span // 2))
        sel = model[(model.time_ns >= t0) & (model.time_ns <= t1)]
        kind = rng.integers(0, 3)
        if kind == 0:
            got = select_points(df, series="s", t0=t0, t1=t1).toPandas()
            want = sel
        elif kind == 1:
            n = int(rng.integers(0, len(sel) + 10))
            got = select_points(df, series="s", t0=t0, t1=t1, limit=n).toPandas()
            want = sel.head(n)
        else:
            n = int(rng.integers(1, len(sel) + 10))
            got = select_last_points(df, series="s", t0=t0, t1=t1, last=n).toPandas()
            want = sel.tail(n)
        assert list(got.time_ns) == list(want.time_ns), (t0, t1, kind)
        np.testing.assert_allclose(
            got.v.to_numpy(dtype=float), want.v.to_numpy(dtype=float), equal_nan=True
        )
        # COUNT consistency (npoints + actual bounds of matched rows)
        c = count_points(df, series="s", t0=t0, t1=t1, per_series=False).first()
        assert c["npoints"] == len(sel)
        if len(sel):
            assert c["time_first"] == sel.time_ns.min() and c["time_last"] == sel.time_ns.max()


def test_rotate_cycle(spark, tmp_path):
    # DELETE from the front + re-append with a 100-point identical-overwrite
    # overlap, then full revalidation (main.cc:438-498).
    seed = 99
    model = gen_model(seed, n=2000)
    path = str(tmp_path / "rot")
    write_points(spark, path, spark.createDataFrame(model, SCHEMA))

    cut = int(model.time_ns.iloc[500])
    delete_points(spark, path, series="s", t=cut)
    model = model[model.time_ns > cut].reset_index(drop=True)

    # retransmit the last 100 points (identical) + 200 new ones
    rng = np.random.default_rng(seed + 5)
    tail = model.tail(100)
    t_new = model.time_ns.iloc[-1] + np.cumsum(rng.integers(1, 1000, size=200)).astype("int64")
    new = pd.DataFrame({"series": "s", "time_ns": t_new, "v": rng.random(200) * 1000})
    batch = pd.concat([tail, new], ignore_index=True)
    r = write_points(spark, path, spark.createDataFrame(batch, SCHEMA))
    assert r["dropped_overlap"] == 100 and r["appended"] == 200
    model = pd.concat([model, new], ignore_index=True)

    from simple_tsdb_spark.operators import RetentionWatermarks

    df = RetentionWatermarks(path).apply(spark.read.parquet(path))
    got = select_points(df, series="s").toPandas()
    assert list(got.time_ns) == list(model.time_ns)
    np.testing.assert_allclose(
        got.v.to_numpy(dtype=float), model.v.to_numpy(dtype=float), equal_nan=True
    )
    c = count_points(df, series="s", per_series=False).first()
    assert c["npoints"] == len(model)
