"""Driver-contract guards for __spark_entry__ — cheap wiring checks
that catch gate mistakes (a queries() entry without its oracle, a
stale oracle key, an oracle that DuckDB can't even parse) before the
driver does."""

from __future__ import annotations

import importlib.util

import duckdb
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "entry_contract", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_queries_and_oracles_align(entry_mod):
    q, o = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(q) == set(o), (
        f"missing oracles: {set(q) - set(o)}; stale oracles: {set(o) - set(q)}"
    )
    assert all(callable(f) for f in q.values())
    assert all(isinstance(s, str) and s.strip() for s in o.values())


def test_every_oracle_parses_in_duckdb(entry_mod):
    """EXPLAIN every oracle against empty views with the real fixture
    schemas — catches SQL syntax/binder errors without executing."""
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    tables = (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings".split()
    )
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet' WHERE 1=0"
        )
    bad = []
    for name, sql in entry_mod.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # noqa: BLE001 - report all failures at once
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_integer_division_truncates_toward_zero_cross_engine(spark):
    """The integer-finals doctrine rests on Spark ``div`` == DuckDB
    ``//`` for EVERY signed case (DIVERGENCES §12) — pin it, including
    the 128-bit lanes (DECIMAL(38,0) / HUGEINT) and ``%``."""
    s = spark.sql(
        "SELECT -7 div 2 AS a, 7 div -2 AS b, -7 div -2 AS c, 7 div 2 AS d, "
        "CAST(-7 AS DECIMAL(38,0)) div 2 AS e, CAST(7 AS DECIMAL(38,0)) div -2 AS f, "
        "-7 % 2 AS g, 7 % -2 AS h"
    ).first()
    d = duckdb.connect().execute(
        "SELECT (-7) // 2, 7 // -2, (-7) // -2, 7 // 2, "
        "(-7)::HUGEINT // 2, 7::HUGEINT // -2, (-7) % 2, 7 % -2"
    ).fetchone()
    assert tuple(s) == tuple(d) == (-3, -3, 3, 3, -3, -3, -1, 1)
