"""PushQueue — asynchronous buffered point pusher over the wire client.

Parity with the reference's ``simple_tsdb.PushQueue``
(python/simple_tsdb/simple_tsdb/push_queue.py:9-118): a measurement
loop appends points without blocking on the network; a daemon thread
drains the queue, transparently riding out write-throttling and server
unavailability (buffer + retry), with an optional per-point callback
carrying a caller cookie after each successful push.

Deliberate engineering differences (same observable semantics):

* ``flush()`` waits on the queue condition instead of the reference's
  busy-spin ``while self.queue: pass`` loop, and does NOT tear down and
  restart the thread.
* On a push failure the wire connection is explicitly closed and
  reopened before the retry — the reference retries on the same client
  object and relies on its internal reconnect.
* ``retry_secs`` is a constructor parameter (the reference hard-codes
  30 s), so tests exercise the retry path without monkeypatching sleep.

Points are dicts ``{"time_ns": int, <field>: value, ...}``; missing or
None fields write as NULL.  ``path`` is ``"db/measurement/series"``
exactly like the reference.
"""

from __future__ import annotations

import threading
import time


class PushQueue:
    def __init__(
        self,
        host: str,
        port: int,
        username: str | None = None,
        password: str | None = None,
        push_cb=None,
        throttle_secs: float = 0,
        retry_secs: float = 30,
    ):
        self.push_cb = push_cb
        self._host, self._port = host, port
        self._creds = (
            (username, password) if username is not None and password is not None
            else None
        )
        self._wc = None
        self.queue_cond = threading.Condition()
        self.queue: dict[str, list] = {}
        self.cookie_queue: dict[str, list] = {}
        self.schemas: dict[tuple[str, str], list] = {}
        self.thread: threading.Thread | None = None
        self.running = False
        self.throttle_secs = float(throttle_secs)
        self.retry_secs = float(retry_secs)
        #: count of push exceptions survived (observability for tests/ops)
        self.n_retries = 0
        self._inflight = False
        self.start()

    # -- lifecycle --------------------------------------------------------
    def start(self) -> None:
        assert not self.thread
        self.running = True
        self.thread = threading.Thread(target=self._push_loop, daemon=True)
        self.thread.start()

    def stop(self) -> None:
        """Drain, then stop the worker and close the connection."""
        self.flush()
        with self.queue_cond:
            self.running = False
            self.queue_cond.notify()
        self.thread.join()
        self.thread = None
        if self._wc is not None:
            self._wc.close()
            self._wc = None

    # -- producers ----------------------------------------------------------
    @staticmethod
    def _split_path(path: str) -> tuple[str, str, str]:
        """Validate and split ``"db/measurement/series"``.  Checked at
        append() time so a malformed path raises to the CALLER instead of
        killing the daemon drain thread later (which would silently
        strand every queued point and make ``flush()`` block forever)."""
        parts = path.split("/")
        if len(parts) != 3 or not all(parts):
            raise ValueError(
                f"path must be 'database/measurement/series', got {path!r}"
            )
        return parts[0], parts[1], parts[2]

    def append(self, p: dict, path: str, cookie=None) -> None:
        """Queue one point for ``path`` ("db/meas/series")."""
        self._split_path(path)
        with self.queue_cond:
            self.queue.setdefault(path, []).append(p)
            self.cookie_queue.setdefault(path, []).append(cookie)
            self.queue_cond.notify()

    def append_list(self, ps: list, path: str, cookies: list | None = None) -> None:
        self._split_path(path)
        if cookies is None:
            cookies = [None] * len(ps)
        with self.queue_cond:
            self.queue.setdefault(path, []).extend(ps)
            self.cookie_queue.setdefault(path, []).extend(cookies)
            self.queue_cond.notify()

    def flush(self, timeout: float | None = None) -> bool:
        """Block until every queued point (including any batch currently
        being pushed) has been written; returns False on timeout."""
        with self.queue_cond:
            return self.queue_cond.wait_for(
                lambda: not self.queue and not self._inflight, timeout=timeout
            )

    # -- worker -------------------------------------------------------------
    def _client(self):
        if self._wc is None:
            from simple_tsdb_spark.wire_client import WireClient

            self._wc = WireClient(self._host, self._port, credentials=self._creds)
        return self._wc

    def _push_loop(self) -> None:
        while True:
            if self.throttle_secs:
                time.sleep(self.throttle_secs)
            with self.queue_cond:
                while not self.queue and self.running:
                    self.queue_cond.wait()
                if not self.queue and not self.running:
                    return
                queue, cookies = self.queue, self.cookie_queue
                self.queue, self.cookie_queue = {}, {}
                self._inflight = True
            try:
                for path, points in queue.items():
                    try:
                        database, measurement, series = self._split_path(path)
                    except ValueError as e:
                        # append() validates, so this is belt-and-braces
                        # (e.g. state restored from elsewhere): drop the
                        # bad path, keep the drain thread alive.
                        print(f"TSDB push: dropping malformed path: {e}")
                        continue
                    while True:
                        try:
                            self._write(database, measurement, series, points)
                            break
                        except Exception as e:  # buffer-and-reconnect
                            self.n_retries += 1
                            print(f"TSDB push exception: {e}")
                            print(f"Retrying in {self.retry_secs} seconds...")
                            if self._wc is not None:
                                try:
                                    self._wc.close()
                                finally:
                                    self._wc = None
                            time.sleep(self.retry_secs)
                    if self.push_cb:
                        for p, c in zip(points, cookies[path]):
                            try:
                                self.push_cb(p, c)
                            except Exception as e:
                                # A raising callback must not kill the
                                # drain thread — the point IS pushed;
                                # only the notification is lost.
                                print(f"TSDB push callback raised: {e!r}")
            finally:
                with self.queue_cond:
                    self._inflight = False
                    self.queue_cond.notify_all()

    def _write(self, database: str, measurement: str, series: str, points: list) -> None:
        import pandas as pd

        wc = self._client()
        key = (database, measurement)
        if key not in self.schemas:
            self.schemas[key] = wc.get_schema(database, measurement)
        fields = [f for f, _ in self.schemas[key]]
        pdf = pd.DataFrame(
            {
                "time_ns": [int(p["time_ns"]) for p in points],
                **{f: [p.get(f) for p in points] for f in fields},
            }
        )
        wc.write_points(database, measurement, series, pdf)
