"""Error taxonomy — codes mirror the reference status codes (exception.h)."""

from __future__ import annotations

import pytest

from simple_tsdb_spark.errors import (
    DuplicateField,
    InvalidName,
    MeasurementExists,
    NoSuchDatabase,
    NoSuchField,
    NoSuchMeasurement,
    OutOfOrderTimestamps,
    OverwriteMismatch,
    TooManyFields,
    TsdbError,
)


def test_codes_match_reference():
    assert OutOfOrderTimestamps.code == -10
    assert OverwriteMismatch.code == -11
    assert NoSuchField.code == -7
    assert DuplicateField.code == -24
    assert TooManyFields.code == -25
    assert NoSuchDatabase.code == -18
    assert NoSuchMeasurement.code == -19
    assert MeasurementExists.code == -20
    assert InvalidName.code == -4


def test_hierarchy_keeps_builtin_compatibility():
    # existing call sites catching ValueError/KeyError/FileNotFoundError
    # keep working
    assert issubclass(OutOfOrderTimestamps, ValueError)
    assert issubclass(NoSuchField, KeyError)
    assert issubclass(NoSuchDatabase, FileNotFoundError)
    assert all(
        issubclass(e, TsdbError)
        for e in (OutOfOrderTimestamps, MeasurementExists, InvalidName)
    )


def test_raised_from_engine(spark, tmp_path):
    from simple_tsdb_spark.catalog import TsdbCatalog
    from simple_tsdb_spark.operators import select_points

    cat = TsdbCatalog(spark, str(tmp_path / "wh"))
    with pytest.raises(NoSuchDatabase):
        cat.list_measurements("ghost")
    with pytest.raises(NoSuchMeasurement):
        cat.get_schema("ghost", "ghost")
    cat.create_database("db")
    with pytest.raises(TooManyFields):
        cat.create_measurement("db", "m", {f"f{i}": "f64" for i in range(65)})
