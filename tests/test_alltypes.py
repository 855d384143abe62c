"""Operators across all 7 reference field types (FIXTURES.md F2 schema):
bool aggregates as numeric (sum_op.cc:121-127), u32/u64 widen to long,
f32/f64/i32/i64 native."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import types as T

from simple_tsdb_spark.operators import (
    count_points,
    integrate_points,
    select_points,
    sum_points,
)

SCHEMA = T.StructType(
    [
        T.StructField("series", T.StringType(), False),
        T.StructField("time_ns", T.LongType(), False),
        T.StructField("field_bool", T.BooleanType(), True),
        T.StructField("field_u32", T.LongType(), True),
        T.StructField("field_u64", T.LongType(), True),
        T.StructField("field_f32", T.FloatType(), True),
        T.StructField("field_f64", T.DoubleType(), True),
        T.StructField("field_i32", T.IntegerType(), True),
        T.StructField("field_i64", T.LongType(), True),
    ]
)

FIELDS = [f.name for f in SCHEMA.fields[2:]]


@pytest.fixture(scope="module")
def alltypes(spark):
    rng = np.random.default_rng(4242)
    n = 500
    pdf = pd.DataFrame(
        {
            "series": "s",
            "time_ns": 1000 + 10 * np.arange(n, dtype=np.int64),
            "field_bool": rng.integers(0, 2, n).astype(bool),
            "field_u32": pd.array(rng.integers(0, 2**32, n), dtype="Int64"),
            "field_u64": pd.array(rng.integers(0, 2**62, n), dtype="Int64"),
            "field_f32": pd.array(rng.random(n, dtype=np.float32), dtype="Float32"),
            "field_f64": rng.random(n),
            "field_i32": pd.array(rng.integers(-(2**31), 2**31, n), dtype="Int32"),
            "field_i64": pd.array(rng.integers(-(2**62), 2**62, n), dtype="Int64"),
        }
    )
    for f in FIELDS:
        pdf.loc[rng.random(n) < 0.05, f] = None
    return pdf, spark.createDataFrame(pdf, SCHEMA).cache()


def test_select_preserves_types(alltypes):
    pdf, df = alltypes
    out = select_points(df, series="s", t0=0, t1=10**9)
    assert dict(out.dtypes)["field_bool"] == "boolean"
    assert dict(out.dtypes)["field_f32"] == "float"
    assert dict(out.dtypes)["field_i32"] == "int"
    assert out.count() == len(pdf)


def test_sum_all_types(alltypes):
    pdf, df = alltypes
    got = sum_points(df, fields=FIELDS, series="s", t0=0, t1=10**9, window_ns=1000).toPandas()
    sel = pdf.copy()
    sel["w"] = (sel.time_ns // 1000) * 1000
    for f in FIELDS:
        if f == "field_bool":
            col = sel[f].astype(float)
        else:
            # arbitrary-precision python objects: a window of i64/u64
            # values can exceed int64, which pandas would silently wrap —
            # the engine (like the reference's field_vector<double> sums)
            # accumulates in double and must win that comparison.
            col = sel[f].astype(object)
        grp = sel.assign(v=col).groupby("w")["v"]
        want_sum = grp.apply(lambda s: s.dropna().sum() if s.notna().any() else None)
        want_cnt = grp.count()
        g = got.set_index("wstart")
        for w in want_sum.index:
            assert g.loc[w, f"{f}_count"] == want_cnt[w]
            if want_cnt[w]:
                # engine sums in double (reference: field_vector<double>)
                assert np.isclose(g.loc[w, f"{f}_sum"], float(want_sum[w]), rtol=1e-9), (f, w)
    # bool min/max come back as booleans (false<true ordering, u8 analog)
    assert set(got["field_bool_min"].dropna()) <= {False, True}


def test_integrate_numeric_types(alltypes):
    pdf, df = alltypes
    got = integrate_points(df, fields=["field_f64", "field_i32"], series="s", t0=0, t1=10**9)
    row = got.first()
    assert row["npoints"] == len(pdf)
    # 5% nulls ⇒ poisoned integrals are NULL per the reference rule
    assert row["field_f64_integral"] is None or isinstance(row["field_f64_integral"], float)


def test_count_unaffected_by_field_types(alltypes):
    pdf, df = alltypes
    c = count_points(df, series="s", t0=0, t1=10**9, per_series=False).first()
    assert c["npoints"] == len(pdf)


def test_u64_full_range_variant(spark, tmp_path):
    """u64f (DECIMAL(20,0)) round-trips values above 2^63 exactly and
    window-sums them without overflow in exact mode."""
    from decimal import Decimal

    from simple_tsdb_spark.client import TsdbClient
    from simple_tsdb_spark.operators import select_points, sum_points

    c = TsdbClient(spark, str(tmp_path / "wh_u64"))
    c.create_database("db")
    c.create_measurement("db", "m", {"big": "u64f"})
    schema = c.catalog.spark_schema("db", "m")
    assert schema["big"].dataType.simpleString() == "decimal(20,0)"

    vals = [2**64 - 1, 2**63 + 12345, 2**62, 7]
    rows = [("s", 100 + 10 * i, Decimal(v)) for i, v in enumerate(vals)]
    import pandas as pd

    c.write_points("db", "m", spark.createDataFrame(rows, schema))
    got = select_points(c.catalog.read("db", "m"), series="s").toPandas()
    assert [int(v) for v in got.big] == vals  # exact, incl. > 2^63

    agg = sum_points(
        c.catalog.read("db", "m"), fields=["big"], window_ns=1000, exact=True
    ).toPandas()
    # one bucket holds everything; exact decimal accumulation then double
    assert len(agg) == 1
    true_sum = sum(vals)
    assert agg.big_sum[0] == float(true_sum)  # correctly-rounded double
    assert int(agg.big_min[0]) == min(vals) and int(agg.big_max[0]) == max(vals)
    assert agg.big_count[0] == 4
