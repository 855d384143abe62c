"""tsdbcli grammar tests (reference tsdbcli2 surface, parse_types.cc)."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo/scripts")

from tsdbcli import MAXT, execute, parse_where  # noqa: E402


def test_parse_where_forms():
    assert parse_where("WHERE 10 <= time_ns <= 20".split(), 0) == (10, 20, 6)
    assert parse_where("WHERE 10 < time_ns < 20".split(), 0) == (11, 19, 6)
    assert parse_where("WHERE time_ns == 15".split(), 0) == (15, 15, 4)
    assert parse_where("WHERE time_ns < 15".split(), 0) == (0, 14, 4)
    assert parse_where("WHERE time_ns >= 15".split(), 0) == (15, MAXT, 4)
    assert parse_where([], 0) == (0, MAXT, 0)
    with pytest.raises(ValueError):
        parse_where("WHERE 10 >= time_ns <= 20".split(), 0)


def test_parse_where_ref_compat_upper_bound():
    """--ref-compat reproduces tsdbcli2's t1+1 widening of '< t1'
    (parse_types.cc:176-177) for behavior-diff testing."""
    import tsdbcli

    tsdbcli.REF_COMPAT = True
    try:
        assert parse_where("WHERE 10 < time_ns < 20".split(), 0) == (11, 21, 6)
        # the 4-arg form is unaffected (the reference bug is 6-arg only)
        assert parse_where("WHERE time_ns < 15".split(), 0) == (0, 14, 4)
    finally:
        tsdbcli.REF_COMPAT = False


def test_cli_end_to_end(spark, tmp_path, capsys):
    from pyspark.sql import types as T

    from simple_tsdb_spark.client import TsdbClient

    client = TsdbClient(spark, str(tmp_path / "wh"))
    execute(client, "CREATE DATABASE db")
    execute(client, "CREATE MEASUREMENT db/m WITH FIELDS v/f64")
    schema = client.catalog.spark_schema("db", "m")
    rows = [("s", 100 + 10 * i, float(i)) for i in range(20)]
    client.write_points(
        "db", "m", spark.createDataFrame(pd.DataFrame(rows, columns=["series", "time_ns", "v"]), schema)
    )
    execute(client, "LIST SERIES db/m")
    execute(client, "SELECT v FROM db/m/s WHERE 100 <= time_ns < 150 LIMIT 3")
    execute(client, "COUNT db/m/s WHERE time_ns >= 200")
    execute(client, "MEAN v FROM db/m/s WHERE 100 <= time_ns <= 290 WINDOW_NS 50")
    execute(client, "INTEGRATE v FROM db/m/s")
    execute(client, "LIST ACTIVE SERIES db/m WHERE time_ns >= 150")
    execute(client, "DELETE db/m/s WHERE time_ns <= 150")
    execute(client, "COUNT db/m/s")
    out = capsys.readouterr().out
    assert "s" in out and "npoints" in out
    assert client.count_points("db", "m", "s").first()["npoints"] == 14


def test_cli_network_mode(spark, tmp_path, capsys):
    """The SAME grammar over the wire backend (tsdbcli2's deployment
    shape): every execute() branch that is a wire command runs against
    a live TsdbServer through WireCli; ADD USER (warehouse-only)
    errors out with a pointer."""
    from simple_tsdb_spark.client import TsdbClient
    from simple_tsdb_spark.server import TsdbServer
    from tsdbcli import WireCli

    wh = str(tmp_path / "whn")
    seed = TsdbClient(spark, wh)
    seed.create_database("db")
    seed.create_measurement("db", "m", {"v": "f64"})
    rows = [("s", 100 + 10 * i, float(i)) for i in range(20)]
    seed.write_points(
        "db", "m",
        spark.createDataFrame(
            pd.DataFrame(rows, columns=["series", "time_ns", "v"]),
            seed.catalog.spark_schema("db", "m"),
        ),
    )
    with TsdbServer(spark, wh, port=0) as s:
        client = WireCli("127.0.0.1", s.address[1])
        execute(client, "CREATE DATABASE db2")
        execute(client, "CREATE MEASUREMENT db2/m2 WITH FIELDS a/i64")
        execute(client, "LIST DATABASES")
        execute(client, "LIST SCHEMA db/m")
        execute(client, "LIST SERIES db/m")
        execute(client, "LIST ACTIVE SERIES db/m WHERE time_ns >= 150")
        execute(client, "SELECT v FROM db/m/s WHERE 100 <= time_ns < 150 LIMIT 3")
        execute(client, "SELECT FROM db/m/s LAST 2")
        execute(client, "COUNT db/m/s WHERE time_ns >= 200")
        execute(client, "MEAN v FROM db/m/s WHERE 100 <= time_ns <= 290 WINDOW_NS 50")
        execute(client, "INTEGRATE v FROM db/m/s")
        execute(client, "DELETE db/m/s WHERE time_ns <= 150")
        execute(client, "COUNT db/m/s")
        with pytest.raises(ValueError):
            execute(client, "ADD USER mallory pw")
        out = capsys.readouterr().out
        assert "db2" in out and "npoints" in out and "v_mean" in out
        # post-delete count over the wire
        assert client._wc.count_points("db", "m", "s", 0, 2**64 - 1)["npoints"] == 14
        client._wc.close()


def test_cli_errors(spark, tmp_path):
    from simple_tsdb_spark.client import TsdbClient

    client = TsdbClient(spark, str(tmp_path / "wh2"))
    with pytest.raises(ValueError):
        execute(client, "FROBNICATE everything")
    with pytest.raises(ValueError):
        execute(client, "CREATE MEASUREMENT notslashed WITH FIELDS v/f64")


def test_cli_add_user(spark, tmp_path, capsys):
    from simple_tsdb_spark.client import TsdbClient

    client = TsdbClient(spark, str(tmp_path / "wh_cli_auth"))
    execute(client, "ADD USER carol pw123")
    assert "ok" in capsys.readouterr().out
    assert client.authenticate("carol", "pw123") is True
    with pytest.raises(ValueError):
        execute(client, "ADD USER carol")  # wrong arity
