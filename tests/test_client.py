"""TsdbClient facade — all 16 wire commands reachable (SURVEY §2.11)."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import types as T

from simple_tsdb_spark.client import TsdbClient


@pytest.fixture()
def client(spark, tmp_path):
    c = TsdbClient(spark, str(tmp_path / "wh"))
    c.create_database("db")
    c.create_measurement("db", "m", {"v": "f64", "flag": "bool"})
    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
            T.StructField("flag", T.BooleanType(), True),
        ]
    )
    rows = [("s1", 1000 + i * 100, math.sin(i / 10), i % 2 == 0) for i in range(200)]
    c.write_points("db", "m", spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "v", "flag"]), schema))
    return c


def test_all_commands(client):
    assert client.list_databases() == ["db"]
    assert client.list_measurements("db") == ["m"]
    assert client.get_schema("db", "m") == [("v", "f64"), ("flag", "bool")]
    assert client.list_series("db", "m") == ["s1"]
    assert client.nop()
    assert client.active_series("db", "m") == ["s1"]

    sel = client.select_points_limit("db", "m", "s1", ["v"], limit=10).toPandas()
    assert len(sel) == 10 and list(sel.columns) == ["series", "time_ns", "v"]
    last = client.select_points_last("db", "m", "s1", ["v"], last=5).toPandas()
    assert list(last.time_ns) == [1000 + i * 100 for i in range(195, 200)]

    cnt = client.count_points("db", "m", "s1").first()
    assert cnt["npoints"] == 200

    # open upper bound 2^64-1 accepted and clamped
    assert client.count_points("db", "m", "s1", t1=2**64 - 1).first()["npoints"] == 200

    agg = client.sum_points("db", "m", "s1", window_ns=5000).toPandas()
    assert agg.window_npoints.sum() == 200
    mean = client.mean_points("db", "m", "s1", window_ns=5000).toPandas()
    assert len(mean) == len(agg) and "v_mean" in mean.columns
    integ = client.integrate_points("db", "m", "s1").first()
    assert integ["npoints"] == 200

    client.delete_points("db", "m", "s1", t=1000 + 99 * 100)
    assert client.count_points("db", "m", "s1").first()["npoints"] == 100

    # AUTHENTICATE against the PBKDF2 passwd file (root.cc:94-145)
    from simple_tsdb_spark.errors import NoSuchUser, UserExists

    client.add_user("root", "pw")
    assert client.authenticate("root", "pw") is True
    assert client.authenticate("root", "wrong") is False
    with pytest.raises(UserExists):
        client.add_user("root", "again")
    with pytest.raises(NoSuchUser):
        client.authenticate("ghost", "pw")


def test_require_auth_gates_all_commands(spark, tmp_path):
    """Authenticated-listener behavior (server.cc:1021-1035): every
    command before a successful AUTHENTICATE is rejected."""
    from simple_tsdb_spark.errors import NotAuthenticated

    wh = str(tmp_path / "wh_auth")
    TsdbClient(spark, wh).add_user("alice", "s3cret")  # offline root op
    c = TsdbClient(spark, wh, require_auth=True)
    for call in [
        lambda: c.list_databases(),
        lambda: c.create_database("db"),
        lambda: c.nop(),
    ]:
        with pytest.raises(NotAuthenticated):
            call()
    assert c.authenticate("alice", "wrong") is False
    with pytest.raises(NotAuthenticated):
        c.list_databases()  # failed auth does not unlock
    assert c.authenticate("alice", "s3cret") is True
    c.create_database("db")
    assert c.list_databases() == ["db"]


def test_pbkdf2_matches_reference_kdf(spark, tmp_path):
    """The passwd hash is PBKDF2-SHA512(password, username+'tsdb75D8',
    10000) — byte-compatible with the reference's passwd file
    (root.cc:97), verified against an independent hashlib computation."""
    import hashlib

    c = TsdbClient(spark, str(tmp_path / "wh_kdf"))
    c.add_user("bob", "hunter2")
    line = open(f"{tmp_path}/wh_kdf/passwd").read().split()
    want = hashlib.pbkdf2_hmac("sha512", b"hunter2", b"bobtsdb75D8", 10000).hex()
    assert line == ["bob", want]


def test_arrow_streaming(client):
    batches = list(client.to_arrow_batches(client.select_points_limit("db", "m", "s1", limit=50)))
    assert sum(b.num_rows for b in batches) == 50
    assert batches[0].schema.names == ["series", "time_ns", "v", "flag"]


def test_auto_downsample(spark, f2):
    from simple_tsdb_spark.operators import auto_downsample

    raw = auto_downsample(f2, field="value", series="series_0", interval_ns=10_000, max_points=10**6)
    assert "value" in raw.columns  # under threshold → raw select
    agg = auto_downsample(f2, field="value", series="series_0", interval_ns=100_000, max_points=10)
    assert "value_mean" in agg.columns  # over threshold → windowed mean
