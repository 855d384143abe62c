"""Grafana datasource bridge — the reference plugin's per-query
negotiation re-expressed over :class:`TsdbClient`.

The reference's Grafana plugin (``grafana/tgree-simpletsdb-datasource/
pkg/plugin/datasource.go:197-275``) does, per dashboard query:

1. resolve the series selector — ``"All"`` fans out to the active
   series in the time range, otherwise split on ``" + "``;
2. template the display alias — ``$series`` in the user alias is
   replaced (first occurrence) by the series name, default
   ``<series>.<field>``;
3. probe COUNT per series, skipping series with no points in range;
4. the MaxDataPoints handshake: when the count exceeds Grafana's
   ``maxDataPoints``, downsample with ``window = IntervalMs·10⁶`` —
   zoom ``"Mean"`` → windowed mean, ``"Min/Max"`` → min/max envelope —
   otherwise return the raw points;
5. apply the display transform (Tare / Difference / Derivative per
   sec/min/hour) to every value column of the frame.

Everything here is driver-side policy around the already-gated W1-W5
operators; each returned frame is a DataFrame in measurement shape
(``series, time_ns, <value columns>``), so the same operators compose.

Divergence note: for the Min/Max zoom the reference plugin draws a
single zig-zag column alternating max/min per bucket (a plotting trick,
``datasource.go:384-441``); this bridge returns the explicit wide
envelope (``min, max, mean`` columns) and applies transforms to each
column independently — the same information, in a shape other tools can
consume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.client import TsdbClient

__all__ = [
    "resolve_series",
    "series_alias",
    "grafana_query",
    "load_datasource_settings",
    "check_health",
    "call_resource",
]

ZOOM_MEAN = "Mean"
ZOOM_LTTB = "LTTB"  # extension: not in the reference plugin
ZOOM_MINMAX = "Min/Max"

_DERIVATIVE_PERIODS = {
    "Derivative (sec)": 1.0,
    "Derivative (min)": 60.0,
    "Derivative (hour)": 3600.0,
}


def resolve_series(
    client: TsdbClient, database: str, measurement: str, series: str, t0: int, t1: int
) -> list[str]:
    """``"All"`` → active series in range; else split on ``" + "``
    (datasource.go:209-217)."""
    if series == "All":
        return client.active_series(database, measurement, t0, t1)
    return series.split(" + ")


def series_alias(alias: str | None, series: str, field: str) -> str:
    """``$series`` templating, first occurrence only, default
    ``<series>.<field>`` (datasource.go:221-224)."""
    if alias:
        return alias.replace("$series", series, 1)
    return f"{series}.{field}"


def _apply_transform(frame: DataFrame, fields: list[str], transform: str | None) -> DataFrame:
    from simple_tsdb_spark.operators import derivative, difference, tare

    if not transform:
        return frame
    if transform == "Tare":
        out, suffix = tare(frame, fields=fields), "_tare"
    elif transform == "Difference":
        out, suffix = difference(frame, fields=fields), "_diff"
    elif transform in _DERIVATIVE_PERIODS:
        out, suffix = (
            derivative(frame, fields=fields, period_sec=_DERIVATIVE_PERIODS[transform]),
            "_rate",
        )
    else:
        raise ValueError(f"unknown transform {transform!r}")
    # the plugin transforms columns in place (datasource.go:1946-2100) —
    # keep the frame's value-column names stable across transforms
    for f in fields:
        out = out.withColumnRenamed(f"{f}{suffix}", f)
    return out


def _series_frame(table, s, field, t0, t1):
    from simple_tsdb_spark.operators import select_points

    return select_points(table, series=s, fields=[field], t0=t0, t1=t1)


def grafana_query(
    client: TsdbClient,
    database: str,
    measurement: str,
    *,
    field: str,
    t0: int,
    t1: int,
    series: str = "All",
    alias: str | None = None,
    max_data_points: int | None = None,
    interval_ms: int = 1000,
    zoom: str = ZOOM_MEAN,
    transform: str | None = None,
) -> list[tuple[str, DataFrame]]:
    """One dashboard query → ``[(alias, frame), ...]``, one frame per
    matching non-empty series, mirroring the reference plugin's
    ``query`` loop (datasource.go:197-275)."""
    from simple_tsdb_spark.operators import select_points, sum_points

    frames: list[tuple[str, DataFrame]] = []
    table = client._df(database, measurement)
    for s in resolve_series(client, database, measurement, series, t0, t1):
        a = series_alias(alias, s, field)
        n = client.count_points(database, measurement, s, t0, t1).first()["npoints"]
        if n == 0:
            continue  # datasource.go:232-234
        if max_data_points is not None and n > max_data_points and zoom == ZOOM_LTTB:
            # EXTENSION beyond the reference plugin: shape-preserving
            # LTTB downsample to exactly max_data_points (the Grafana
            # ecosystem's standard visual mode; the reference offers
            # Mean / Min-Max only)
            from simple_tsdb_spark.operators import lttb_downsample

            frame = lttb_downsample(
                _series_frame(table, s, field, t0, t1),
                field=field,
                n_out=int(max_data_points),
                t0=t0,
                t1=t1,
            )
            value_cols = [field]
        elif max_data_points is not None and n > max_data_points:
            window_ns = int(interval_ms) * 1_000_000
            agg = sum_points(
                table, fields=[field], series=s, t0=t0, t1=t1, window_ns=window_ns
            )
            mean = F.when(
                F.col(f"{field}_count") > 0,
                F.col(f"{field}_sum") / F.col(f"{field}_count"),
            )
            if zoom == ZOOM_MINMAX:
                frame = agg.select(
                    "series",
                    F.col("wstart").alias("time_ns"),
                    F.col(f"{field}_min").cast("double").alias("min"),
                    F.col(f"{field}_max").cast("double").alias("max"),
                    mean.alias("mean"),
                )
                value_cols = ["min", "max", "mean"]
            elif zoom == ZOOM_MEAN:
                frame = agg.select(
                    "series", F.col("wstart").alias("time_ns"), mean.alias(field)
                )
                value_cols = [field]
            else:  # unknown zoom: the reference emits no frame
                continue
        else:
            frame = select_points(table, series=s, fields=[field], t0=t0, t1=t1)
            value_cols = [field]
        frames.append((a, _apply_transform(frame, value_cols, transform)))
    return frames


# -- instance settings / health / resource endpoints ------------------------
#
# The plugin's non-query surface (datasource.go:93-138, 443-487,
# 494-650): instance-settings parsing with the missing-password reject,
# the CheckHealth connect+NOP probe with its three exact result
# messages, and the four CallResource JSON endpoints the query editor
# uses to populate its dropdowns.

HEALTH_OK = "ok"
HEALTH_ERROR = "error"


def load_datasource_settings(json_data: dict, secure_json_data: dict) -> dict:
    """Mirror ``NewDatasource`` (datasource.go:93-108) + models/settings.go:
    the JSONData carries ``Database``/``Hostname``/``Username`` (absent
    keys default to empty, like Go's zero values) and the password comes
    ONLY from the decrypted secure store — a missing password rejects
    instance creation."""
    if "password" not in secure_json_data:
        raise ValueError("Missing password")
    return {
        "database": json_data.get("Database", json_data.get("database", "")),
        "hostname": json_data.get("Hostname", json_data.get("hostname", "")),
        "username": json_data.get("Username", json_data.get("username", "")),
        "password": secure_json_data["password"],
    }


def check_health(connect) -> tuple[str, str]:
    """The CheckHealth probe (datasource.go:447-487): open a connection,
    issue NOP, and return the plugin's exact (status, message) pairs.
    ``connect`` is a zero-arg callable returning an object with
    ``nop()`` and ``close()`` — the TLS-wire client in production, the
    session facade in tests."""
    try:
        tc = connect()
    except Exception:
        return (HEALTH_ERROR, "Unable to connect to TSDB server")
    try:
        try:
            ok = tc.nop()
        except Exception:
            ok = False
        if not ok:
            return (HEALTH_ERROR, "TSDB server didn't handle NOP command")
        return (HEALTH_OK, "Data source is working")
    finally:
        close = getattr(tc, "close", None)
        if close is not None:
            try:
                close()
            except Exception:
                pass


def call_resource(client: TsdbClient, path: str, params: dict | None = None):
    """The query editor's dropdown endpoints (datasource.go:498-650),
    same paths and same JSON key per response:

    - ``/databases``    → ``{"databases": [...]}``
    - ``/measurements`` → ``{"measurements": [...]}`` (needs ``database``)
    - ``/series``       → ``{"series": [...]}`` (needs ``database`` +
      ``measurement``)
    - ``/fields``       → ``{"fields": [...]}`` (schema field names, in
      schema order — needs ``database`` + ``measurement``)

    A missing required parameter returns ``None`` (the Go handlers
    silently return with no body); an unknown path raises KeyError."""
    p = params or {}
    if path == "/databases":
        return {"databases": client.list_databases()}
    if path == "/measurements":
        if not p.get("database"):
            return None
        return {"measurements": client.list_measurements(p["database"])}
    if path == "/series":
        if not p.get("database") or not p.get("measurement"):
            return None
        return {"series": client.list_series(p["database"], p["measurement"])}
    if path == "/fields":
        if not p.get("database") or not p.get("measurement"):
            return None
        schema = client.get_schema(p["database"], p["measurement"])
        return {"fields": [f for f, _t in schema]}
    raise KeyError(f"unknown resource path {path!r}")
