"""Grafana bridge — the reference plugin's query negotiation
(datasource.go:197-275) over TsdbClient: series fan-out, $series alias
templating, the COUNT-vs-MaxDataPoints handshake, zoom selection and
the display transforms."""

from __future__ import annotations

import pandas as pd
import pytest

from simple_tsdb_spark.client import TsdbClient
from simple_tsdb_spark.grafana import grafana_query, resolve_series, series_alias


@pytest.fixture()
def client(spark, tmp_path):
    c = TsdbClient(spark, str(tmp_path / "wh"))
    c.create_database("db")
    c.create_measurement("db", "m", {"v": "f64"})
    rows = []
    for s, base in (("s1", 0.0), ("s2", 100.0)):
        rows += [(s, 1_000_000_000 * i, base + i) for i in range(50)]
    rows += [("quiet", 10**18, 1.0)]  # outside every queried range
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])
    c.write_points("db", "m", c.spark.createDataFrame(pdf, c.catalog.spark_schema("db", "m")))
    return c


def test_series_resolution_and_alias(client):
    t0, t1 = 0, 60_000_000_000
    assert resolve_series(client, "db", "m", "All", t0, t1) == ["s1", "s2"]
    assert resolve_series(client, "db", "m", "s2 + s1", t0, t1) == ["s2", "s1"]
    # $series replaced once, default <series>.<field> (datasource.go:221-224)
    assert series_alias(None, "s1", "v") == "s1.v"
    assert series_alias("$series rpm ($series)", "s1", "v") == "s1 rpm ($series)"


def test_raw_select_under_max_points(client):
    frames = grafana_query(
        client, "db", "m", field="v", t0=0, t1=60_000_000_000,
        max_data_points=1000,
    )
    assert [a for a, _ in frames] == ["s1.v", "s2.v"]
    f1 = frames[0][1].orderBy("time_ns").collect()
    assert len(f1) == 50 and f1[0]["v"] == 0.0 and f1[-1]["v"] == 49.0


def test_empty_series_skipped(client):
    # 'quiet' has no points in range → no frame (datasource.go:232-234)
    frames = grafana_query(
        client, "db", "m", field="v", series="s1 + quiet",
        t0=0, t1=60_000_000_000, max_data_points=1000,
    )
    assert [a for a, _ in frames] == ["s1.v"]


def test_max_data_points_mean_handshake(client):
    # 50 points > 10 → downsample with window = interval_ms * 1e6
    frames = grafana_query(
        client, "db", "m", field="v", series="s1", t0=0, t1=60_000_000_000,
        max_data_points=10, interval_ms=10_000, zoom="Mean",
    )
    (alias, frame), = frames
    got = frame.orderBy("time_ns").collect()
    assert len(got) == 5  # 50s of data / 10s windows
    assert got[0]["v"] == pytest.approx(sum(range(10)) / 10)
    assert got[4]["v"] == pytest.approx(sum(range(40, 50)) / 10)


def test_max_data_points_minmax_envelope(client):
    frames = grafana_query(
        client, "db", "m", field="v", series="s1", t0=0, t1=60_000_000_000,
        max_data_points=10, interval_ms=10_000, zoom="Min/Max",
    )
    (_, frame), = frames
    got = frame.orderBy("time_ns").collect()
    assert [r["min"] for r in got] == [0.0, 10.0, 20.0, 30.0, 40.0]
    assert [r["max"] for r in got] == [9.0, 19.0, 29.0, 39.0, 49.0]
    assert got[0]["mean"] == pytest.approx(4.5)


def test_unknown_zoom_emits_no_frame(client):
    frames = grafana_query(
        client, "db", "m", field="v", series="s1", t0=0, t1=60_000_000_000,
        max_data_points=10, interval_ms=10_000, zoom="Median",
    )
    assert frames == []


def test_transforms(client):
    # Tare on the raw path: first value subtracted
    frames = grafana_query(
        client, "db", "m", field="v", series="s2", t0=0, t1=60_000_000_000,
        max_data_points=1000, transform="Tare",
    )
    got = frames[0][1].orderBy("time_ns").collect()
    assert got[0]["v"] == 0.0 and got[-1]["v"] == 49.0

    # Derivative (min): slope 1/s → 60/min
    frames = grafana_query(
        client, "db", "m", field="v", series="s1", t0=0, t1=60_000_000_000,
        max_data_points=1000, transform="Derivative (min)",
    )
    got = frames[0][1].orderBy("time_ns").collect()
    assert got[0]["v"] is None
    assert got[1]["v"] == pytest.approx(60.0)

    # Difference applies to every envelope column on the Min/Max path
    frames = grafana_query(
        client, "db", "m", field="v", series="s1", t0=0, t1=60_000_000_000,
        max_data_points=10, interval_ms=10_000, zoom="Min/Max",
        transform="Difference",
    )
    got = frames[0][1].orderBy("time_ns").collect()
    assert got[0]["min"] is None and got[1]["min"] == 10.0 and got[1]["max"] == 10.0

    with pytest.raises(ValueError):
        grafana_query(
            client, "db", "m", field="v", series="s1", t0=0, t1=60_000_000_000,
            transform="Smooth",
        )


def test_grafana_lttb_zoom(client):
    """EXTENSION zoom 'LTTB': downsampled frame has exactly
    max_data_points rows per series, keeps first/last timestamps, and
    equals the operator run directly."""
    from simple_tsdb_spark.grafana import ZOOM_LTTB, grafana_query
    from simple_tsdb_spark.operators import lttb_downsample, select_points

    db, m, t0, t1 = "db", "m", 0, 60_000_000_000
    frames = grafana_query(
        client, db, m, field="v", t0=t0, t1=t1, series="All",
        max_data_points=10, zoom=ZOOM_LTTB,
    )
    assert frames
    for alias, frame in frames:
        pdf = frame.toPandas().sort_values("time_ns")
        s = pdf.series.iloc[0]
        raw = (
            select_points(client._df(db, m), series=s, fields=["v"], t0=t0, t1=t1)
            .toPandas()
            .sort_values("time_ns")
        )
        assert len(pdf) == min(10, len(raw))
        assert pdf.time_ns.iloc[0] == raw.time_ns.iloc[0]
        assert pdf.time_ns.iloc[-1] == raw.time_ns.iloc[-1]
        direct = (
            lttb_downsample(
                client._df(db, m).where(f"series = '{s}'"), field="v", n_out=10,
                t0=t0, t1=t1,
            )
            .toPandas()
            .sort_values("time_ns", ignore_index=True)
        )
        assert list(pdf.time_ns) == list(direct.time_ns)


# -- health / settings / resource endpoints ---------------------------------


def test_load_datasource_settings_password_gate():
    from simple_tsdb_spark.grafana import load_datasource_settings

    s = load_datasource_settings(
        {"Database": "db", "Hostname": "h:4000", "Username": "u"},
        {"password": "pw"},
    )
    assert s == {
        "database": "db", "hostname": "h:4000", "username": "u", "password": "pw",
    }
    # zero values for absent JSONData keys, like the Go struct
    assert load_datasource_settings({}, {"password": ""})["hostname"] == ""
    with pytest.raises(ValueError, match="Missing password"):
        load_datasource_settings({"Database": "db"}, {})


def test_check_health_three_outcomes(client):
    from simple_tsdb_spark.grafana import check_health

    # healthy: the facade handles NOP
    assert check_health(lambda: client) == ("ok", "Data source is working")

    def no_connect():
        raise ConnectionRefusedError

    assert check_health(no_connect) == (
        "error", "Unable to connect to TSDB server",
    )

    class BadNop:
        def nop(self):
            raise RuntimeError("boom")

    assert check_health(lambda: BadNop()) == (
        "error", "TSDB server didn't handle NOP command",
    )


def test_call_resource_endpoints(client):
    from simple_tsdb_spark.grafana import call_resource

    assert call_resource(client, "/databases") == {"databases": ["db"]}
    assert call_resource(client, "/measurements", {"database": "db"}) == {
        "measurements": ["m"]
    }
    got = call_resource(client, "/series", {"database": "db", "measurement": "m"})
    assert sorted(got["series"]) == ["quiet", "s1", "s2"]
    assert call_resource(client, "/fields", {"database": "db", "measurement": "m"}) == {
        "fields": ["v"]
    }
    # missing params → no body, like the Go handlers' bare returns
    assert call_resource(client, "/measurements", {}) is None
    assert call_resource(client, "/series", {"database": "db"}) is None
    assert call_resource(client, "/fields", {"measurement": "m"}) is None
    with pytest.raises(KeyError):
        call_resource(client, "/nope")
