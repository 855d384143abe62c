"""FS shim: all sidecar/listing metadata I/O goes through one seam that
also works on object-store URIs (here exercised via file:// through the
JVM Hadoop FileSystem — the same connector stack s3a/gs/abfss use)."""

import json

import pandas as pd
import pytest

from simple_tsdb_spark.fs import HadoopFS, LocalFS, get_fs


def test_get_fs_dispatch(spark):
    assert isinstance(get_fs("/tmp/x"), LocalFS)
    assert isinstance(get_fs("file:///tmp/x"), HadoopFS)
    assert isinstance(get_fs("s3a://bucket/key"), HadoopFS)


def test_localfs_roundtrip(tmp_path):
    fs = LocalFS()
    p = str(tmp_path / "meta" / "layout.json")
    assert not fs.exists(p)
    fs.write_text_atomic(p, json.dumps({"generation": 3}))
    assert fs.exists(p) and json.loads(fs.read_text(p)) == {"generation": 3}
    fs.write_text_atomic(p, "{}")  # atomic replace
    assert fs.read_text(p) == "{}"
    assert fs.isdir(str(tmp_path / "meta")) and not fs.isdir(p)
    assert fs.listdir(str(tmp_path)) == ["meta"]
    fs.remove_tree(str(tmp_path / "meta"))
    assert not fs.exists(p)


def test_hadoopfs_roundtrip_file_uri(spark, tmp_path):
    fs = HadoopFS(spark)
    p = f"file://{tmp_path}/meta/marks.json"
    assert not fs.exists(p)
    fs.write_text_atomic(p, json.dumps({"s1": 100}))
    assert fs.exists(p) and json.loads(fs.read_text(p)) == {"s1": 100}
    fs.write_text_atomic(p, json.dumps({"s1": 200}))  # replace
    assert json.loads(fs.read_text(p)) == {"s1": 200}
    assert fs.isdir(f"file://{tmp_path}/meta") and not fs.isdir(p)
    assert "marks.json" in fs.listdir(f"file://{tmp_path}/meta")
    # LocalFS sees the same bytes at the plain path (same filesystem)
    assert json.loads(LocalFS().read_text(str(tmp_path / "meta" / "marks.json"))) == {
        "s1": 200
    }
    fs.remove_tree(f"file://{tmp_path}/meta")
    assert not fs.exists(p)


def test_measurement_lifecycle_on_file_uri(spark, tmp_path):
    """write → probe metadata → retention delete, all on a file:// URI:
    every sidecar/listing op runs through HadoopFS, the data plane through
    Spark's own Hadoop connector — the object-store deployment shape."""
    from simple_tsdb_spark.operators.delete import RetentionWatermarks, delete_points
    from simple_tsdb_spark.operators.select import tail_bucket_cutoff
    from simple_tsdb_spark.sources.writer import _layout, write_points

    path = f"file://{tmp_path}/m"
    day = 86_400 * 1_000_000_000
    pdf = pd.DataFrame(
        [("a", d * day + i, float(i)) for d in range(3) for i in range(1, 5)]
        + [("b", d * day + i, 1.0) for d in range(3) for i in range(1, 5)],
        columns=["series", "time_ns", "value"],
    )
    res = write_points(spark, path, spark.createDataFrame(pdf), time_bucket_ns=day)
    assert res["appended"] == 24
    assert _layout(path)["time_bucket_ns"] == day

    # LAST-N probe lists partitions through the shim
    assert tail_bucket_cutoff(spark, path, last=4, per_series=True) == 2 * day

    # retention delete: watermark sidecar + fully-covered-bucket unlink
    delete_points(spark, path, series="a", t=day - 1)
    marks = RetentionWatermarks(path)
    assert marks.get("a") == day
    rows = spark.read.parquet(path).where("series = 'a'").count()
    assert rows == 8  # first day's 4 points gone


def test_hadoopfs_requires_session_or_spark_arg(spark):
    # with an active session the default constructor resolves it
    assert HadoopFS() is not None


def test_catalog_on_file_uri(spark, tmp_path):
    """The whole catalog/admin surface (D1-D8, auth, add_field) on a
    file:// warehouse — all sidecar I/O through HadoopFS."""
    from simple_tsdb_spark.catalog import TsdbCatalog
    from simple_tsdb_spark.errors import MeasurementExists, NoSuchMeasurement

    cat = TsdbCatalog(spark, f"file://{tmp_path}/wh")
    cat.create_database("db1")
    assert cat.list_databases() == ["db1"]
    cat.create_measurement("db1", "m1", {"temp": "f64", "count": "u32"})
    cat.create_measurement("db1", "m1", {"temp": "f64", "count": "u32"})  # idempotent
    with pytest.raises(MeasurementExists):
        cat.create_measurement("db1", "m1", {"count": "u32", "temp": "f64"})
    assert cat.list_measurements("db1") == ["m1"]
    assert cat.get_schema("db1", "m1") == [("temp", "f64"), ("count", "u32")]
    cat.add_field("db1", "m1", "hum", "f32")
    assert cat.get_schema("db1", "m1")[-1] == ("hum", "f32")
    with pytest.raises(NoSuchMeasurement):
        cat.add_field("db1", "nope", "x", "f64")
    cat.add_user("alice", "pw")
    assert cat.verify_user("alice", "pw") and not cat.verify_user("alice", "no")

    # write + read back through the catalog path on the URI
    pdf = pd.DataFrame(
        {"series": ["s1"] * 3, "time_ns": [1, 2, 3], "temp": [1.0, 2.0, 3.0],
         "count": [1, 2, 3], "hum": [0.5, 0.5, 0.5]}
    )
    from simple_tsdb_spark.sources.writer import write_points

    write_points(spark, cat.measurement_path("db1", "m1"), spark.createDataFrame(pdf))
    assert cat.list_series("db1", "m1") == ["s1"]
    assert cat.read("db1", "m1").count() == 3
