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


def test_write_then_select_roundtrip(served):
    """Full data-path loop with OUR client on both ends of the wire:
    write under the credit handshake, read back via chunked SELECT."""
    server, _ = served
    with _connect(server) as wc:
        batch = pd.DataFrame(
            {
                "time_ns": [100, 200, 300, 400],
                "v": [1.5, None, 3.5, 4.5],
                "n": pd.array([10, 20, None, 40], dtype="UInt32"),
            }
        )
        wc.write_points("db", "m", "sw", batch)
        got = wc.select_points_limit("db", "m", "sw")
        assert list(got["time_ns"]) == [100, 200, 300, 400]
        assert got["v"][0] == 1.5 and pd.isna(got["v"][1])
        assert got["n"][1] == 20 and pd.isna(got["n"][2])
        # LAST N comes back in time order, last n points
        last = wc.select_points_last("db", "m", "sw", n=2)
        assert list(last["time_ns"]) == [300, 400]
        # field projection
        only_v = wc.select_points_limit("db", "m", "sw", fields=["v"])
        assert list(only_v.columns) == ["time_ns", "v"]


def test_select_against_embedded_writer(served, spark):
    """Wire SELECT agrees with what the embedded client wrote."""
    server, c = served
    batch = pd.DataFrame(
        {"series": ["sx"] * 3, "time_ns": [1, 2, 3], "v": [9.0, 8.0, 7.0], "n": [1, 2, 3]}
    )
    c.write_points_pandas("db", "m", batch)
    with _connect(server) as wc:
        got = wc.select_points_limit("db", "m", "sx", t0=2, t1=3)
        assert list(got["time_ns"]) == [2, 3]
        assert list(got["v"]) == [8.0, 7.0]


def test_sum_points_roundtrip(served):
    server, _ = served
    with _connect(server) as wc:
        batch = pd.DataFrame(
            {
                "time_ns": [0, 5, 10, 15, 25],
                "v": [1.0, 2.0, 3.0, 4.0, 5.0],
                "n": pd.array([1, 1, 1, 1, 1], dtype="UInt32"),
            }
        )
        wc.write_points("db", "m", "ss", batch)
        got = wc.sum_points("db", "m", "ss", window_ns=10, fields=["v"], t0=0, t1=29)
        assert list(got["wstart"]) == [0, 10, 20]
        assert list(got["v_sum"]) == [3.0, 7.0, 5.0]
        assert list(got["v_min"]) == [1.0, 3.0, 5.0]
        assert list(got["v_max"]) == [2.0, 4.0, 5.0]
        assert list(got["v_count"]) == [2, 2, 1]


def test_integrate_points_roundtrip(served):
    server, _ = served
    with _connect(server) as wc:
        wc.write_points(
            "db", "m", "si",
            pd.DataFrame({"time_ns": [0, 10, 20], "v": [0.0, 2.0, 0.0],
                          "n": pd.array([None, None, None], dtype="UInt32")}),
        )
        got = wc.integrate_points("db", "m", "si", ["v", "n"], 0, 20)
        # trapezoid over (0,0)->(10,2)->(20,0) in ns: 2 * 10e-9 = 2e-8
        assert got["t0_ns"] == 0 and got["t1_ns"] == 20
        assert abs(got["v_integral"] - 2.0e-8) < 1e-18
        assert got["n_integral"] is None  # all-NULL field: poisoned


def test_write_points_rejects_below_committed(served):
    """S4 semantics over OUR wire client: a new timestamp at/below the
    committed time_last that isn't a byte-identical retransmit rejects
    with the reference's OUT_OF_ORDER code — delivered as a status
    frame, so the connection survives (batch ORDER itself is
    canonicalized by the store; see test_ingest for the full matrix)."""
    from simple_tsdb_spark.errors import OutOfOrderTimestamps

    server, _ = served
    with _connect(server) as wc:
        wc.write_points(
            "db", "m", "so",
            pd.DataFrame({"time_ns": [10, 30], "v": [1.0, 3.0], "n": [1, 3]}),
        )
        with pytest.raises(OutOfOrderTimestamps):
            wc.write_points(
                "db", "m", "so",
                pd.DataFrame({"time_ns": [20], "v": [2.0], "n": [2]}),
            )
        # connection survives the engine error
        assert wc.nop() is True


def test_all_types_random_roundtrip(served, spark, tmp_path):
    """Seeded-random write→select round-trip over EVERY wire type
    (bool/u32/u64/u64f/f32/f64/i32/i64) with ~20% NULLs — the codec
    seams: validity bitmaps per type width, pad8 alignment, u64f
    Decimals on the u64 lane, full-range u64 values."""
    import numpy as np
    from decimal import Decimal

    server, c = served
    fields = {
        "b": "bool", "c32": "u32", "c64": "u64", "big": "u64f",
        "x32": "f32", "x64": "f64", "s32": "i32", "s64": "i64",
    }
    c.create_measurement("db", "all_t", fields)
    rng = np.random.default_rng(7)
    n = 257  # odd size: exercises bitmap word padding
    def mask():
        return rng.random(n) < 0.2

    pdf = pd.DataFrame({
        "time_ns": np.arange(1, n + 1) * 1000,
        "b": pd.array(rng.integers(0, 2, n).astype(bool), dtype="boolean"),
        "c32": pd.array(rng.integers(0, 2**32, n, dtype=np.uint64), dtype="UInt32").astype("UInt32"),
        "c64": pd.array(rng.integers(0, 2**63, n, dtype=np.uint64), dtype="UInt64"),
        "big": [Decimal(int(v)) for v in rng.integers(0, 2**63, n, dtype=np.uint64)],
        "x32": pd.array(rng.normal(size=n).astype(np.float32), dtype="Float32"),
        "x64": pd.array(rng.normal(size=n), dtype="Float64"),
        "s32": pd.array(rng.integers(-(2**31), 2**31, n, dtype=np.int64), dtype="Int32").astype("Int32"),
        "s64": pd.array(rng.integers(-(2**62), 2**62, n, dtype=np.int64), dtype="Int64"),
    })
    # ~20% NULLs per field; u64f full-range spot values
    for f in fields:
        m = mask()
        pdf.loc[m, f] = None
    pdf.loc[0, "big"] = Decimal(2**64 - 1)
    pdf.loc[1, "big"] = Decimal(0)

    with _connect(server) as wc:
        wc.write_points("db", "all_t", "sr", pdf)
        got = wc.select_points_limit("db", "all_t", "sr")
    assert list(got["time_ns"]) == list(pdf["time_ns"])
    for f, ftype in fields.items():
        want_na = pdf[f].isna()
        assert list(got[f].isna()) == list(want_na), f
        gv = got[f][~want_na.to_numpy()]
        wv = pdf[f][~want_na]
        if ftype in ("f32", "f64"):
            assert np.allclose(
                gv.to_numpy(dtype=float), wv.to_numpy(dtype=float), rtol=0, atol=0
            ), f
        else:
            assert [int(a) for a in gv] == [int(b) for b in wv], f
    assert int(got["big"][0]) == 2**64 - 1  # full-range u64f survived


def test_empty_select_carries_typed_columns(served):
    """SELECT over an empty range returns zero rows but EVERY requested
    column with its nullable dtype — no KeyError special-casing."""
    server, _ = served
    with _connect(server) as wc:
        wc.write_points("db", "m", "se", pd.DataFrame({"time_ns": [5], "v": [1.0], "n": [1]}))
        got = wc.select_points_limit("db", "m", "se", t0=100, t1=200)
        assert len(got) == 0
        assert list(got.columns) == ["time_ns", "v", "n"]
        assert str(got["v"].dtype) == "Float64" and str(got["n"].dtype) == "UInt32"


def test_multichunk_select(served):
    """>16384 rows forces multiple DT_CHUNK frames on the SELECT reply;
    the write side splits by the server's credit as needed."""
    import numpy as np

    server, _ = served
    n = 17000
    batch = pd.DataFrame({
        "time_ns": np.arange(1, n + 1, dtype=np.int64),
        "v": np.arange(n, dtype=np.float64),
        "n": pd.array(np.arange(n) % 1000, dtype="UInt32"),
    })
    with _connect(server) as wc:
        wc.write_points("db", "m", "mc", batch)
        got = wc.select_points_limit("db", "m", "mc")
        assert len(got) == n
        assert got["time_ns"].iloc[-1] == n
        assert got["v"].iloc[16384] == 16384.0  # first row of chunk 2
        last = wc.select_points_last("db", "m", "mc", n=3)
        assert list(last["time_ns"]) == [n - 2, n - 1, n]


def test_server_drops_malformed_frames(served):
    """Protocol robustness (tokens.h:241-248 teardown semantics): an
    unknown command, an oversized string token, and raw garbage each
    tear the connection down promptly — no hang, no stray reply — and
    the listener stays healthy for the next client."""
    import socket as sock_mod
    import struct as st

    server, _ = served
    host, port = "127.0.0.1", server.address[1]

    def probe(payload: bytes) -> bytes:
        s = sock_mod.create_connection((host, port), timeout=10)
        try:
            s.sendall(payload)
            s.settimeout(10)
            chunks = b""
            while True:
                try:
                    part = s.recv(4096)
                except ConnectionResetError:
                    break  # RST: server tore down with unread bytes — fine
                if not part:
                    break  # FIN: server closed — expected
                chunks += part
            return chunks
        finally:
            s.close()

    from simple_tsdb_spark.server import CT_LIST_MEASUREMENTS, DT_DATABASE

    # unknown command token: dropped without a status frame
    assert probe(st.pack("<I", 0xDEADBEEF)) == b""
    # oversized string token (len >= 1024): protocol teardown
    assert probe(
        st.pack("<I", CT_LIST_MEASUREMENTS)
        + st.pack("<IH", DT_DATABASE, 5000) + b"x" * 5000
    ) == b""
    # raw garbage
    assert probe(b"\x00" * 64) == b""
    # listener still healthy afterwards
    with _connect(server) as wc:
        assert wc.list_databases() == ["db"]


def test_tls_authenticate_first(spark, tmp_path):
    """WireClient over the TLS + require_auth listener: AUTHENTICATE
    must be the first command; bad credentials surface as
    NotAuthenticated (the server closes without a status frame)."""
    import ssl
    import subprocess

    cert, key = tmp_path / "cert.pem", tmp_path / "key.pem"
    subprocess.run(
        ["openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
         "-keyout", str(key), "-out", str(cert), "-days", "1",
         "-subj", "/CN=localhost"],
        check=True, capture_output=True,
    )
    wh, c = _mkwh(spark, tmp_path)
    c.add_user("alice", "sekrit")
    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(str(cert), str(key))
    cli_ctx = ssl.create_default_context(cafile=str(cert))
    cli_ctx.check_hostname = False

    with TsdbServer(spark, wh, port=0, require_auth=True, ssl_context=srv_ctx) as s:
        with WireClient(
            "127.0.0.1", s.address[1],
            credentials=("alice", "sekrit"), ssl_context=cli_ctx,
        ) as wc:
            assert wc.list_databases() == ["db"]
            assert wc.get_schema("db", "m") == [("v", "f64"), ("n", "u32")]
        with pytest.raises((NotAuthenticated, OSError)):
            WireClient(
                "127.0.0.1", s.address[1],
                credentials=("alice", "wrong"), ssl_context=cli_ctx,
            )


# -- native PushQueue -----------------------------------------------------


def test_push_queue_async_append_and_cookies(served):
    """Native PushQueue parity with the reference's: async append from
    the 'measurement loop', per-point cookie callbacks after the push,
    flush() blocking until drained."""
    from simple_tsdb_spark.push_queue import PushQueue

    server, _ = served
    seen = []
    pq = PushQueue(
        "127.0.0.1", server.address[1],
        push_cb=lambda p, c: seen.append((p["time_ns"], c)),
        retry_secs=0.05,
    )
    try:
        for i in range(5):
            pq.append({"time_ns": 100 + i, "v": float(i), "n": i}, "db/m/pq1", cookie=i * 10)
        pq.append_list(
            [{"time_ns": 200, "v": 9.0}, {"time_ns": 201, "v": 9.5}],
            "db/m/pq1",
            cookies=["a", "b"],
        )
        assert pq.flush(timeout=60)
        assert sorted(seen) == [(100, 0), (101, 10), (102, 20), (103, 30), (104, 40),
                                (200, "a"), (201, "b")]
        with _connect(server) as wc:
            got = wc.count_points("db", "m", "pq1", 0, 2**64 - 1)
            assert got["npoints"] == 7
            sel = wc.select_points_limit("db", "m", "pq1", fields=["n"], t0=200)
            assert list(sel["n"].isna()) == [True, True]  # missing field -> NULL
    finally:
        pq.stop()


def test_push_queue_buffers_until_server_appears(served, spark, tmp_path):
    """Unreachable server: the queue buffers and retries with a fresh
    connection each time, then drains once a server starts listening —
    the reference's buffer-and-reconnect contract.  (A live TsdbServer's
    established connections survive stop(), so the cleanest way to force
    the failure path is a port nobody is listening on yet.)"""
    import socket as sock_mod
    import time as time_mod

    from simple_tsdb_spark.push_queue import PushQueue
    from simple_tsdb_spark.server import TsdbServer

    server, c = served
    warehouse = server.warehouse
    # reserve a port, then leave it closed until the server starts
    probe = sock_mod.socket()
    probe.bind(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()

    pq = PushQueue("127.0.0.1", port, retry_secs=0.1)
    try:
        pq.append({"time_ns": 10, "v": 1.0, "n": 1}, "db/m/pq2")
        deadline = time_mod.monotonic() + 30
        while pq.n_retries < 2 and time_mod.monotonic() < deadline:
            time_mod.sleep(0.05)
        assert pq.n_retries >= 2, "no retries despite unreachable server"
        s2 = TsdbServer(spark, warehouse, port=port).start()
        try:
            pq.append({"time_ns": 20, "v": 2.0, "n": 2}, "db/m/pq2")
            assert pq.flush(timeout=60)
            with WireClient("127.0.0.1", port) as wc:
                assert wc.count_points("db", "m", "pq2", 0, 2**64 - 1)["npoints"] == 2
        finally:
            s2.stop()
    finally:
        pq.running = False
        with pq.queue_cond:
            pq.queue_cond.notify()


def test_push_queue_concurrent_producers(served):
    """Many measurement threads appending to different series while the
    single drain thread pushes: nothing lost, per-series time order
    preserved (each producer appends monotonically)."""
    import threading

    from simple_tsdb_spark.push_queue import PushQueue

    server, _ = served
    pq = PushQueue("127.0.0.1", server.address[1], retry_secs=0.05)
    n_threads, n_points = 4, 25

    def produce(t):
        for i in range(n_points):
            pq.append({"time_ns": 1 + i, "v": float(t)}, f"db/m/pqc{t}")

    try:
        threads = [threading.Thread(target=produce, args=(t,)) for t in range(n_threads)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert pq.flush(timeout=120)
        with _connect(server) as wc:
            for t in range(n_threads):
                got = wc.count_points("db", "m", f"pqc{t}", 0, 2**64 - 1)
                assert got["npoints"] == n_points, f"series pqc{t}"
    finally:
        pq.stop()


def test_push_queue_throttle(served):
    """throttle_secs paces drain batches without losing points."""
    from simple_tsdb_spark.push_queue import PushQueue

    server, _ = served
    pq = PushQueue("127.0.0.1", server.address[1], throttle_secs=0.05, retry_secs=0.05)
    try:
        for i in range(3):
            pq.append({"time_ns": 1000 + i, "v": 0.5}, "db/m/pq3")
        assert pq.flush(timeout=60)
        with _connect(server) as wc:
            assert wc.count_points("db", "m", "pq3", 0, 2**64 - 1)["npoints"] == 3
    finally:
        pq.stop()


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


# -- r13 ADVICE regressions: write-path robustness --------------------------


def _scripted_write_server(script):
    """A socketpair 'server' for exercising WireClient.write_points
    framing without a full TsdbServer: returns (client, server_thread,
    chunks) where `script(srv_sock, chunks)` runs in the thread."""
    import socket as sock_mod
    import threading

    a, b = sock_mod.socketpair()
    wc = WireClient.__new__(WireClient)
    wc._sock = a
    chunks: list[tuple[int, bytes]] = []
    t = threading.Thread(target=script, args=(b, chunks), daemon=True)
    t.start()
    return wc, t, chunks


def _read_exact(s, n):
    buf = bytearray()
    while len(buf) < n:
        part = s.recv(n - len(buf))
        if not part:
            raise ConnectionError("peer closed")
        buf.extend(part)
    return bytes(buf)


def _drain_write_header(s):
    """Consume CT_WRITE_POINTS + the three string tokens."""
    import struct

    _read_exact(s, 4)  # command
    for _ in range(3):
        _dt, ln = struct.unpack("<IH", _read_exact(s, 6))
        _read_exact(s, ln)


def test_write_points_midstream_status_maps_error(monkeypatch):
    """A DT_STATUS_CODE arriving where READY_FOR_CHUNK is expected (the
    reference server aborts mid-stream after a flushed chunk group,
    tsdbserver write path) must surface the REAL status — the reference
    client maps this to StatusException (client.py _write_points_chunk) —
    not a generic ProtocolError with the i32 left unread."""
    import struct

    from simple_tsdb_spark.errors import OutOfOrderTimestamps
    from simple_tsdb_spark.server import (
        DT_CHUNK,
        DT_READY_FOR_CHUNK,
        DT_STATUS_CODE,
    )

    def script(s, chunks):
        _drain_write_header(s)
        # grant one chunk, accept it, then abort with a real status
        s.sendall(struct.pack("<II", DT_READY_FOR_CHUNK, 10 * 1024 * 1024))
        dt, n, _fl, ln = struct.unpack("<IIII", _read_exact(s, 16))
        assert dt == DT_CHUNK
        chunks.append((n, _read_exact(s, ln)))
        s.sendall(struct.pack("<Ii", DT_STATUS_CODE, -10))
        s.close()

    wc, t, chunks = _scripted_write_server(script)
    monkeypatch.setattr(wc, "get_schema", lambda db, m: [("v", "f64")], raising=False)
    pdf = pd.DataFrame({"time_ns": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    with pytest.raises(OutOfOrderTimestamps):
        wc.write_points("db", "m", "s1", pdf)
    t.join(timeout=5)
    assert chunks and chunks[0][0] == 3


def test_write_points_shrinks_chunk_to_tiny_credit(monkeypatch):
    """With a credit smaller than the 1-byte/row estimate admits (bitmap
    words + pad8 cost 8-15 bytes per field regardless of n), the client
    must split smaller instead of raising 'chunk exceeds server credit'.
    credit=39 with one f64 field: estimate picks n=2 (40 bytes) — must
    shrink to n=1 (24 bytes) and deliver all rows across chunks."""
    import struct

    from simple_tsdb_spark.server import (
        DT_CHUNK,
        DT_END,
        DT_READY_FOR_CHUNK,
        DT_STATUS_CODE,
    )

    def script(s, chunks):
        _drain_write_header(s)
        while True:
            s.sendall(struct.pack("<II", DT_READY_FOR_CHUNK, 39))
            dt = struct.unpack("<I", _read_exact(s, 4))[0]
            if dt == DT_END:
                s.sendall(struct.pack("<Ii", DT_STATUS_CODE, 0))
                s.close()
                return
            n, _fl, ln = struct.unpack("<III", _read_exact(s, 12))
            assert dt == DT_CHUNK and ln <= 39
            chunks.append((n, _read_exact(s, ln)))

    wc, t, chunks = _scripted_write_server(script)
    monkeypatch.setattr(wc, "get_schema", lambda db, m: [("v", "f64")], raising=False)
    pdf = pd.DataFrame({"time_ns": [1, 2, 3], "v": [1.0, 2.0, 3.0]})
    wc.write_points("db", "m", "s1", pdf)
    t.join(timeout=5)
    assert sum(n for n, _ in chunks) == 3
    assert all(n == 1 for n, _ in chunks)
    # row payloads survive the split: ts + full bitmap word + f64 + no pad
    ts = [struct.unpack("<Q", body[:8])[0] for _n, body in chunks]
    assert ts == [1, 2, 3]


def test_failed_authenticate_closes_socket(monkeypatch):
    """WireClient.__init__ must not leak the connected socket when the
    initial authenticate() raises (server closes an auth-required
    connection without a status frame on bad credentials)."""
    import socket as sock_mod
    import threading

    lst = sock_mod.socket()
    lst.bind(("127.0.0.1", 0))
    lst.listen(1)
    port = lst.getsockname()[1]

    def refuse():
        conn, _ = lst.accept()
        _read_exact(conn, 4)  # CT_AUTHENTICATE
        conn.close()  # reference server: close without status frame

    t = threading.Thread(target=refuse, daemon=True)
    t.start()

    created = []
    real_cc = __import__("socket").create_connection

    def spy_cc(*a, **kw):
        s = real_cc(*a, **kw)
        created.append(s)
        return s

    monkeypatch.setattr("socket.create_connection", spy_cc)
    with pytest.raises(Exception):
        WireClient("127.0.0.1", port, credentials=("u", "pw"))
    assert len(created) == 1
    assert created[0].fileno() == -1  # closed, not leaked
    t.join(timeout=5)
    lst.close()


def test_push_queue_rejects_malformed_path_at_append(served):
    """A path without exactly two '/' raises to the CALLER at append()
    time instead of killing the daemon drain thread (which would strand
    queued points and make flush() block forever)."""
    from simple_tsdb_spark.push_queue import PushQueue

    server, _ = served
    pq = PushQueue("127.0.0.1", server.address[1], retry_secs=0.05)
    try:
        for bad in ("db/m", "db/m/s/extra", "db//s", "", "dbm"):
            with pytest.raises(ValueError):
                pq.append({"time_ns": 1, "v": 1.0}, bad)
        assert pq.flush(timeout=5)  # queue stayed empty and alive
    finally:
        pq.stop()


def test_push_queue_survives_raising_callback(served):
    """A push_cb that raises must not kill the drain thread: the points
    ARE pushed, later batches still drain, flush() still returns."""
    from simple_tsdb_spark.push_queue import PushQueue

    server, c = served
    calls = []

    def bad_cb(p, cookie):
        calls.append(cookie)
        raise RuntimeError("boom")

    pq = PushQueue("127.0.0.1", server.address[1], push_cb=bad_cb, retry_secs=0.05)
    try:
        pq.append({"time_ns": 100, "v": 1.0, "n": 1}, "db/m/scb", cookie="a")
        assert pq.flush(timeout=10)
        pq.append({"time_ns": 200, "v": 2.0, "n": 2}, "db/m/scb", cookie="b")
        assert pq.flush(timeout=10)
    finally:
        pq.stop()
    assert calls == ["a", "b"]
    got = c.select_points_limit("db", "m", "scb", t0=0, t1=2**63 - 1).toPandas()
    assert sorted(got.time_ns) == [100, 200]
