"""Oracle output-type doctrine, pinned as a fast DuckDB-only sweep.

Round-11 closed root cause (DIVERGENCES.md §14): DuckDB promotes
SUM(BIGINT) and BIGINT ``//`` quotients to HUGEINT, which pandas fetches
as float64 while Spark emits int64 — the driver's value hash then sees
``123.0 != 123`` even though a float-coerced compare passes.  Rounds
7–10 each burned a rotation slot rediscovering this.  This test resolves
every ``oracle_sql()`` statement's output types through DuckDB's binder
(no Spark, no data scan — sf0.001 views, LIMIT-0 semantics via
``con.sql(...).types``) and fails on any HUGEINT/UHUGEINT/DECIMAL
column, so a new oracle with an uncast SUM final fails in pytest before
it ever reaches the driver.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

BANNED = ("HUGEINT", "UHUGEINT")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_no_hugeint_or_decimal_in_any_oracle(con):
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR
    bad = {}
    for name, sql in entry_mod.oracle_sql().items():
        rel = con.sql(sql)
        offenders = [
            (col, str(t))
            for col, t in zip(rel.columns, rel.types)
            if str(t) in BANNED or str(t).startswith("DECIMAL")
        ]
        if offenders:
            bad[name] = offenders
    assert not bad, (
        "oracle finals must be BIGINT/INTEGER/DOUBLE/VARCHAR/BOOLEAN — "
        f"CAST these to BIGINT (DIVERGENCES.md §14): {bad}"
    )
