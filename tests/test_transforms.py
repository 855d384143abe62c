"""W1-W3 transforms vs pandas models (datasource.go:1946-2095 semantics)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from simple_tsdb_spark.operators import tare, difference, derivative


def test_tare(spark, f1, f1_pdf):
    got = tare(f1, fields=["field2"], series="series1", t0=0, t1=10**6).toPandas()
    vals = f1_pdf.sort_values("time_ns").field2
    first = vals.dropna().iloc[0]
    want = vals - first
    assert np.allclose(got.field2_tare.to_numpy(), want.to_numpy(), equal_nan=True)


def test_tare_leading_nulls(spark):
    import pandas as pd
    from pyspark.sql import types as T

    pdf = pd.DataFrame(
        {
            "series": "s",
            "time_ns": [1, 2, 3, 4],
            "v": [None, None, 10.0, 7.0],
        }
    )
    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    df = spark.createDataFrame(pdf, schema)
    got = tare(df, fields=["v"]).toPandas()
    assert pd.isna(got.v_tare.iloc[0]) and pd.isna(got.v_tare.iloc[1])
    assert got.v_tare.iloc[2] == 0.0 and got.v_tare.iloc[3] == -3.0


def test_difference(spark, f1, f1_pdf):
    got = difference(f1, fields=["field2"], series="series1", t0=0, t1=10**6).toPandas()
    want = f1_pdf.sort_values("time_ns").field2.diff()
    assert np.allclose(got.field2_diff.to_numpy(), want.to_numpy(), equal_nan=True)


def test_derivative(spark, f2, f2_pdf):
    for period in (1.0, 60.0, 3600.0):
        got = derivative(f2, fields=["value"], series="series_0", period_sec=period).toPandas()
        grp = f2_pdf[f2_pdf.series == "series_0"].sort_values("time_ns")
        dv = grp.value.diff().to_numpy()
        dt = grp.time_ns.diff().to_numpy() / 1e9
        want = period * dv / dt
        assert np.allclose(got.value_rate.to_numpy(), want, equal_nan=True)
