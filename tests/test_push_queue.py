"""Reference PushQueue / flask_simple_tsdb parity.

Loads the reference's OWN ``simple_tsdb`` Python package read-only
(``/root/reference/python/simple_tsdb``) and drives its asynchronous
``PushQueue`` (push_queue.py:1-118) against TsdbServer: async append +
flush, cookie callbacks, write-throttle, and buffer-and-reconnect across
a server restart.  Both layers are thin wrappers over ``Client``, whose
wire behavior test_server already proves byte-compatible — these tests
close the loop by exercising the wrappers themselves end-to-end.
"""

from __future__ import annotations

import importlib
import os
import sys
import time

import pandas as pd
import pytest

from simple_tsdb_spark.client import TsdbClient
from simple_tsdb_spark.server import TsdbServer

REF_PKG_DIR = "/root/reference/python/simple_tsdb"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PKG_DIR), reason="reference tree absent"
)


@pytest.fixture()
def ref_tsdb():
    """The reference ``simple_tsdb`` package, imported read-only."""
    sys.path.insert(0, REF_PKG_DIR)
    try:
        for m in [m for m in sys.modules if m.startswith("simple_tsdb")]:
            # our package is ``simple_tsdb_spark`` — only a stale ref
            # import would collide here
            if m == "simple_tsdb" or m.startswith("simple_tsdb."):
                del sys.modules[m]
        yield importlib.import_module("simple_tsdb")
    finally:
        sys.path.remove(REF_PKG_DIR)
        for m in [m for m in sys.modules if m == "simple_tsdb" or m.startswith("simple_tsdb.")]:
            del sys.modules[m]


@pytest.fixture()
def fast_retry(monkeypatch):
    """Cap sleeps so PushQueue's hard-coded 30 s retry backoff
    (push_queue.py:108-111) doesn't stall the test; capping only ever
    shortens sleeps, so semantics are unchanged."""
    real_sleep = time.sleep
    monkeypatch.setattr(time, "sleep", lambda s: real_sleep(min(s, 0.05)))


def _mkwh(spark, tmp_path):
    wh = str(tmp_path / "wh")
    c = TsdbClient(spark, wh)
    c.create_database("db")
    c.create_measurement("db", "m", {"v": "f64", "n": "u32"})
    return wh, c


def _wait_for(cond, timeout=30.0):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        if cond():
            return True
        time.sleep(0.05)
    return False


def test_push_queue_async_append_and_flush(spark, tmp_path, ref_tsdb, fast_retry):
    wh, c = _mkwh(spark, tmp_path)
    with TsdbServer(spark, wh, port=0) as s:
        pq = ref_tsdb.PushQueue("127.0.0.1", s.address[1])
        try:
            for i in range(20):
                pq.append({"time_ns": 1000 + 10 * i, "v": float(i), "n": i}, "db/m/s1")
            pq.append_list(
                [{"time_ns": 2000 + 10 * i, "v": -1.0, "n": 0} for i in range(5)],
                "db/m/s1",
            )
            pq.flush()
        finally:
            pq.running = False
            with pq.queue_cond:
                pq.queue_cond.notify()
        got = (
            c.select_points_limit("db", "m", "s1", ["v", "n"], 0, 2**64 - 1, None)
            .orderBy("time_ns")
            .collect()
        )
        assert len(got) == 25
        assert [r["v"] for r in got[:20]] == [float(i) for i in range(20)]
        assert all(r["v"] == -1.0 for r in got[20:])


def test_push_queue_cookie_callback_and_throttle(spark, tmp_path, ref_tsdb, fast_retry):
    wh, c = _mkwh(spark, tmp_path)
    seen = []
    with TsdbServer(spark, wh, port=0) as s:
        pq = ref_tsdb.PushQueue(
            "127.0.0.1",
            s.address[1],
            push_cb=lambda p, cookie: seen.append((p["time_ns"], cookie)),
            throttle_secs=0.01,
        )
        try:
            pq.append({"time_ns": 100, "v": 1.0, "n": 1}, "db/m/s2", cookie="first")
            pq.append({"time_ns": 200, "v": 2.0, "n": 2}, "db/m/s2", cookie="second")
            pq.flush()
        finally:
            pq.running = False
            with pq.queue_cond:
                pq.queue_cond.notify()
        assert sorted(seen) == [(100, "first"), (200, "second")]
        assert c.count_points("db", "m", "s2", 0, 2**64 - 1).first()["npoints"] == 2


def test_push_queue_buffers_and_reconnects_across_restart(
    spark, tmp_path, ref_tsdb, fast_retry
):
    """Server goes away mid-stream: PushQueue buffers, retries, and
    drains once a server is listening again on the same port."""
    wh, c = _mkwh(spark, tmp_path)
    s1 = TsdbServer(spark, wh, port=0).start()
    port = s1.address[1]
    pq = ref_tsdb.PushQueue("127.0.0.1", port)
    try:
        pq.append({"time_ns": 100, "v": 1.0, "n": 1}, "db/m/s3")
        assert _wait_for(lambda: not pq.queue)
        s1.stop()

        # queue while unreachable — the push loop must buffer + retry
        pq.append({"time_ns": 200, "v": 2.0, "n": 2}, "db/m/s3")
        pq.append({"time_ns": 300, "v": 3.0, "n": 3}, "db/m/s3")
        time.sleep(0.3)  # let at least one failed attempt happen

        s2 = TsdbServer(spark, wh, port=port).start()
        try:
            assert _wait_for(lambda: not pq.queue)
            ok = _wait_for(
                lambda: c.count_points("db", "m", "s3", 0, 2**64 - 1).first()["npoints"] == 3
            )
            assert ok, "queued points never drained after reconnect"
        finally:
            s2.stop()
    finally:
        pq.running = False
        with pq.queue_cond:
            pq.queue_cond.notify()


def test_flask_extension_if_importable(spark, tmp_path, ref_tsdb):
    """flask_simple_tsdb smoke: the extension is Client-over-config plus
    app-context teardown.  The reference module imports
    ``flask.globals._app_ctx_stack``, which flask >= 2.3 removed — on
    modern flask this skips with that finding recorded."""
    flask = pytest.importorskip("flask")
    sys.path.insert(0, "/root/reference/python/flask_simple_tsdb")
    try:
        try:
            fst = importlib.import_module("flask_simple_tsdb")
        except ImportError as e:
            pytest.skip(
                f"reference flask_simple_tsdb needs flask<2.3 (_app_ctx_stack): {e}"
            )
        wh, c = _mkwh(spark, tmp_path)
        with TsdbServer(spark, wh, port=0) as s:
            app = flask.Flask("t")
            app.config["STSDB_HOST"] = "127.0.0.1"
            app.config["STSDB_PORT"] = str(s.address[1])
            ext = fst.SimpleTSDB()
            ext.init_app(app)
            with app.app_context():
                assert ext.client.list_databases() == ["db"]
    finally:
        sys.path.remove("/root/reference/python/flask_simple_tsdb")
        sys.modules.pop("flask_simple_tsdb", None)
