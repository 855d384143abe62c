"""WireClient + flask extension — our native side of the wire protocol.

test_server proves the SERVER byte-compatible by driving the reference's
own client against it; these tests prove our own :class:`WireClient`
speaks the same frames (catalog surface, scalar count, error codes,
TLS AUTHENTICATE-first), and that the modern-flask extension
(:mod:`simple_tsdb_spark.flask_ext`) reproduces the reference
``flask_simple_tsdb`` lifecycle (flask_simple_tsdb.py:15-48) on
flask >= 2.3, where the reference module itself no longer imports.
"""

from __future__ import annotations

import pandas as pd
import pytest

from simple_tsdb_spark.client import TsdbClient
from simple_tsdb_spark.errors import (
    NoSuchDatabase,
    NoSuchMeasurement,
    NotAuthenticated,
    TsdbError,
    error_for_code,
)
from simple_tsdb_spark.server import TsdbServer
from simple_tsdb_spark.wire_client import WireClient


def _mkwh(spark, tmp_path):
    wh = str(tmp_path / "wh")
    c = TsdbClient(spark, wh)
    c.create_database("db")
    c.create_measurement("db", "m", {"v": "f64", "n": "u32"})
    return wh, c


@pytest.fixture()
def served(spark, tmp_path):
    wh, c = _mkwh(spark, tmp_path)
    with TsdbServer(spark, wh, port=0) as s:
        yield s, c


def _connect(server) -> WireClient:
    return WireClient("127.0.0.1", server.address[1])


def test_catalog_roundtrip(served):
    server, _ = served
    with _connect(server) as wc:
        assert wc.nop() is True
        assert wc.list_databases() == ["db"]
        wc.create_database("db2")
        assert sorted(wc.list_databases()) == ["db", "db2"]
        wc.create_measurement("db2", "m2", {"a": "i64", "b": "f32"})
        assert wc.list_measurements("db2") == ["m2"]
        assert wc.get_schema("db2", "m2") == [("a", "i64"), ("b", "f32")]


def test_series_count_delete(served, spark):
    server, c = served
    batch = pd.DataFrame(
        {
            "series": ["s1"] * 3,
            "time_ns": [10, 20, 30],
            "v": [1.0, 2.0, 3.0],
            "n": [1, 2, 3],
        }
    )
    c.write_points_pandas("db", "m", batch)
    with _connect(server) as wc:
        assert wc.list_series("db", "m") == ["s1"]
        assert wc.active_series("db", "m", 0, 2**64 - 1) == ["s1"]
        got = wc.count_points("db", "m", "s1", 0, 2**64 - 1)
        assert got == {"time_first": 10, "time_last": 30, "npoints": 3}
        wc.delete_points("db", "m", "s1", 15)  # delete t <= 15
        got = wc.count_points("db", "m", "s1", 0, 2**64 - 1)
        assert got["npoints"] == 2 and got["time_first"] == 20


def test_error_codes_roundtrip(served):
    server, _ = served
    with _connect(server) as wc:
        with pytest.raises(NoSuchDatabase):
            wc.list_measurements("nope")
        with pytest.raises(NoSuchMeasurement):
            wc.get_schema("db", "nope")
        # the connection survives engine errors (status frame, not a drop)
        assert wc.list_databases() == ["db"]


def test_error_for_code_unknown_preserved():
    e = error_for_code(-99, "storage-internal")
    assert isinstance(e, TsdbError) and e.code == -99


def test_authenticate_against_plain_listener(served, spark, tmp_path):
    server, c = served
    c.add_user("alice", "pw")
    with WireClient(
        "127.0.0.1", server.address[1], credentials=("alice", "pw")
    ) as wc:
        assert wc.list_databases() == ["db"]
    with pytest.raises((NotAuthenticated, TsdbError)):
        WireClient("127.0.0.1", server.address[1], credentials=("alice", "bad"))


# -- flask extension ----------------------------------------------------


def test_flask_ext_lifecycle(served):
    flask = pytest.importorskip("flask")
    from simple_tsdb_spark.flask_ext import SimpleTSDB

    server, _ = served
    app = flask.Flask("t")
    app.config["STSDB_HOST"] = "127.0.0.1"
    app.config["STSDB_PORT"] = str(server.address[1])
    ext = SimpleTSDB()
    ext.init_app(app)
    # reference-parity defaults land in config
    assert app.config["STSDB_USERNAME"] is None

    with app.app_context():
        c1 = ext.client
        assert c1.list_databases() == ["db"]
        # cached: same client within one app context
        assert ext.client is c1
    # teardown closed it
    assert c1._sock is None

    # a new context gets a fresh connection
    with app.app_context():
        c2 = ext.client
        assert c2 is not c1
        assert c2.nop() is True
    assert c2._sock is None


def test_flask_ext_outside_context_raises(served):
    flask = pytest.importorskip("flask")
    from simple_tsdb_spark.flask_ext import SimpleTSDB

    server, _ = served
    app = flask.Flask("t")
    app.config["STSDB_PORT"] = str(server.address[1])
    ext = SimpleTSDB(app)
    with pytest.raises(RuntimeError):
        ext.client


def test_flask_ext_custom_factory(served):
    flask = pytest.importorskip("flask")
    from simple_tsdb_spark.flask_ext import SimpleTSDB

    server, _ = served
    made = []

    def factory(host, port, credentials):
        wc = WireClient(host, port)
        made.append((host, port, credentials, wc))
        return wc

    app = flask.Flask("t")
    app.config["STSDB_HOST"] = "127.0.0.1"
    app.config["STSDB_PORT"] = str(server.address[1])
    app.config["STSDB_USERNAME"] = "u"
    app.config["STSDB_PASSWORD"] = "p"
    ext = SimpleTSDB(app, client_factory=factory)
    with app.app_context():
        assert ext.client.list_databases() == ["db"]
    (host, port, creds, wc) = made[0]
    assert (host, port, creds) == ("127.0.0.1", server.address[1], ("u", "p"))
    assert wc._sock is None
