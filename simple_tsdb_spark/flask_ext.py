"""Flask extension — per-app-context connection lifecycle.

Parity with the reference's ``flask_simple_tsdb``
(python/flask_simple_tsdb/flask_simple_tsdb.py:15-48): the same config
keys (``STSDB_HOST``/``STSDB_PORT``/``STSDB_USERNAME``/``STSDB_PASSWORD``),
the same lazy one-client-per-app-context caching, the same teardown
close.  The reference module requires flask < 2.3 (it imports the
removed ``flask.globals._app_ctx_stack``); this one uses the supported
``flask.g`` application-context proxy, so it runs on modern flask.

The connected client is :class:`simple_tsdb_spark.wire_client.WireClient`
by default — our native speaker of the same wire protocol — but any
factory with the ``(host, port, credentials)`` signature plugs in (e.g.
the reference's own ``simple_tsdb.Client``, proven compatible by
tests/test_server.py).

flask itself is imported lazily inside the methods: the engine never
depends on flask unless the extension is actually used.
"""

from __future__ import annotations

_G_KEY = "_stsdb_client"

_NO_CLIENT_MSG = """\
No SimpleTSDB connection is present.

This means that something has overwritten g.%s.
""" % _G_KEY


def _default_factory(host: str, port: int, credentials):
    from simple_tsdb_spark.wire_client import WireClient

    creds = credentials if credentials and credentials[0] is not None else None
    return WireClient(host, port, credentials=creds)


class SimpleTSDB:
    """``ext = SimpleTSDB(); ext.init_app(app)``; then ``ext.client``
    inside any app context is a connected client, closed automatically
    at app-context teardown."""

    def __init__(self, app=None, *, client_factory=_default_factory):
        self._factory = client_factory
        if app is not None:
            self.init_app(app)

    def init_app(self, app) -> None:
        app.config.setdefault("STSDB_HOST", "localhost")
        app.config.setdefault("STSDB_PORT", "4000")
        app.config.setdefault("STSDB_USERNAME", None)
        app.config.setdefault("STSDB_PASSWORD", None)
        app.teardown_appcontext(self.teardown)

    def connect(self):
        from flask import current_app

        return self._factory(
            current_app.config["STSDB_HOST"],
            int(current_app.config["STSDB_PORT"]),
            (
                current_app.config["STSDB_USERNAME"],
                current_app.config["STSDB_PASSWORD"],
            ),
        )

    @staticmethod
    def teardown(_exc) -> None:
        from flask import g

        db = g.pop(_G_KEY, None)
        if db is not None:
            db.close()

    @property
    def client(self):
        from flask import g, has_app_context

        if not has_app_context():
            raise RuntimeError(
                "Working outside of application context. client is only "
                "available inside an app context (with app.app_context(): ...)."
            )
        if _G_KEY not in g:
            setattr(g, _G_KEY, self.connect())
        db = getattr(g, _G_KEY)
        if db is None:
            raise RuntimeError(_NO_CLIENT_MSG)
        return db
