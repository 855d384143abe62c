"""Catalog (D1-D8, D11) tests — create/list/idempotency semantics from
root.cc and measurement.cc."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import types as T

from simple_tsdb_spark.catalog import MeasurementExists, TsdbCatalog
from simple_tsdb_spark.sources.writer import write_points


def test_database_lifecycle(spark, tmp_path):
    cat = TsdbCatalog(spark, str(tmp_path / "wh"))
    cat.create_database("db1")
    cat.create_database("db2")
    cat.create_database("db1")  # idempotent mkdir
    assert cat.list_databases() == ["db1", "db2"]


def test_measurement_schema_idempotency(spark, tmp_path):
    cat = TsdbCatalog(spark, str(tmp_path / "wh"))
    cat.create_database("db")
    fields = {"pressure_psi": "f64", "temp_c": "f32"}
    cat.create_measurement("db", "xtalx_data", fields)
    cat.create_measurement("db", "xtalx_data", fields)  # identical → ok
    with pytest.raises(MeasurementExists):  # different → error
        cat.create_measurement("db", "xtalx_data", {"pressure_psi": "f64"})
    with pytest.raises(MeasurementExists):  # reordered fields → error too
        # (measurement.cc:120-151 compares the ordered field list)
        cat.create_measurement(
            "db", "xtalx_data", {"temp_c": "f32", "pressure_psi": "f64"}
        )
    from simple_tsdb_spark.errors import NoSuchDatabase

    with pytest.raises(NoSuchDatabase):  # no implicit database creation
        cat.create_measurement("nope", "m", fields)
    assert cat.get_schema("db", "xtalx_data") == [
        ("pressure_psi", "f64"), ("temp_c", "f32")
    ]
    st = cat.spark_schema("db", "xtalx_data")
    assert [f.dataType.simpleString() for f in st.fields] == [
        "string", "bigint", "double", "float"
    ]


def test_bad_names_and_types(spark, tmp_path):
    cat = TsdbCatalog(spark, str(tmp_path / "wh"))
    with pytest.raises(ValueError):
        cat.create_database("bad/name")
    cat.create_database("db")
    with pytest.raises(ValueError):
        cat.create_measurement("db", "m", {"x": "f128"})
    with pytest.raises(ValueError):
        cat.create_measurement("db", "m", {f"f{i}": "f64" for i in range(65)})


def test_series_listing_and_read(spark, tmp_path):
    cat = TsdbCatalog(spark, str(tmp_path / "wh"))
    cat.create_database("db")
    cat.create_measurement("db", "m", {"v": "f64"})
    path = cat.measurement_path("db", "m")
    pdf = pd.DataFrame(
        [("s2", 10, 1.0), ("s1", 20, 2.0)], columns=["series", "time_ns", "v"]
    )
    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    write_points(spark, path, spark.createDataFrame(pdf, schema))
    assert cat.list_series("db", "m") == ["s1", "s2"]
    assert cat.list_measurements("db") == ["m"]
    df = cat.read("db", "m")
    assert df.columns == ["series", "time_ns", "v"]
    assert df.count() == 2
    assert cat.nop()

    # D10 schema evolution: new field reads as NULL for pre-existing files
    cat.add_field("db", "m", "w", "f32")
    cat.add_field("db", "m", "w", "f32")  # idempotent for same type
    with pytest.raises(MeasurementExists):
        cat.add_field("db", "m", "w", "f64")
    df2 = cat.read("db", "m")
    assert df2.columns == ["series", "time_ns", "v", "w"]
    assert df2.where(df2.w.isNull()).count() == 2
