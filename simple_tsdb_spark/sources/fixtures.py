"""Driver-fixture readers with a pinned dtype contract.

Round 3 shipped a 26-query regression because one fixture column changed
physical dtype under us (``events.ts``: ns-INT64 → ``timestamp[us]``) and
every reader assumed the old type.  This module is the single place that
owns the fixture dtype contract: ``read_fixture`` loads a driver table and
casts any drifted column back to the dtypes the engine (and its DuckDB
oracles) were validated against — so a future regeneration of
``/root/testdata`` is a no-op for every downstream operator.

``events.ts`` is deliberately *not* in the contract: it is the one column
whose drift carries semantics (epoch-ns long vs µs timestamp vs NTZ wall
time), and :func:`simple_tsdb_spark.sources.measurement.adapt_raw_ts`
dispatches on its actual dtype instead of forcing one.

Casts are emitted only for columns that actually drifted, so on a
contract-conforming fixture the plan is untouched (no cast nodes, parquet
filter pushdown intact).  Columns the driver adds that we don't know about
pass through unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Spark dtypes each fixture table was green against (CORRECTNESS r2/r4).
FIXTURE_CONTRACTS: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint",
        "c_name": "string",
        "c_nationkey": "int",
        "c_acctbal": "double",
        "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint",
        "s_name": "string",
        "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint",
        "p_name": "string",
        "p_brand": "string",
        "p_type": "string",
        "p_size": "int",
        "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_orderstatus": "string",
        "o_totalprice": "double",
        "o_orderdate": "timestamp_ntz",
        "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint",
        "l_partkey": "bigint",
        "l_suppkey": "bigint",
        "l_linenumber": "int",
        "l_quantity": "double",
        "l_extendedprice": "double",
        "l_discount": "double",
        "l_tax": "double",
        "l_returnflag": "string",
        "l_linestatus": "string",
        "l_shipdate": "timestamp_ntz",
    },
    # ts intentionally absent — adapt_raw_ts dispatches on its real dtype.
    "events": {
        "event_id": "bigint",
        "user_id": "bigint",
        "event_type": "string",
        "value": "double",
        "props": "string",
    },
    "documents": {
        "doc_id": "bigint",
        "text": "string",
        "lang": "string",
        "source": "string",
        "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint",
        "embedding": "array<float>",
        "label": "int",
    },
}


def normalize_fixture(df: DataFrame, name: str) -> DataFrame:
    """Cast drifted columns back to the contract; no-op when conforming."""
    contract = FIXTURE_CONTRACTS.get(name)
    if not contract:
        return df
    dtypes = dict(df.dtypes)
    drifted = {c: want for c, want in contract.items() if c in dtypes and dtypes[c] != want}
    if not drifted:
        return df
    return df.select(
        *[
            F.col(c).cast(drifted[c]).alias(c) if c in drifted else F.col(c)
            for c in df.columns
        ]
    )


def read_fixture(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read a driver fixture table, normalized to the pinned contract."""
    from simple_tsdb_spark.session import ensure_engine_confs

    return normalize_fixture(
        ensure_engine_confs(spark).read.parquet(f"{sf_dir}/{name}.parquet"), name
    )
