"""Driver-fixture readers with a pinned dtype contract.

Round 3 shipped a 26-query regression because one fixture column changed
physical dtype under us (``events.ts``: ns-INT64 → ``timestamp[us]``) and
every reader assumed the old type.  This module is the single place that
owns the fixture dtype contract: ``read_fixture`` loads a driver table and
losslessly WIDENS any drifted column back to the dtypes the engine (and
its DuckDB oracles) were validated against.  Narrowing casts are
deliberately NOT applied: the oracles read the raw parquet, so a
value-changing cast on the Spark side (double→float) would diverge the
engines; drifted-wide columns stay as shipped and engine expressions are
written dtype-tolerant (explicit CAST-to-double in similarity/dedup,
integer-width-independent string renders in the hash operators).

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


#: numeric widening ranks — a cast is applied only when it is lossless
#: (smaller rank → larger rank within a class).
_NUM_RANK = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
_FLT_RANK = {"float": 0, "double": 1}


def _widening(src: str, dst: str) -> bool:
    """True iff casting src → dst cannot change any value.

    The DuckDB oracles read the RAW parquet, so a value-changing cast on
    the Spark side (e.g. array<double> → array<float>) would silently
    diverge the two engines — worse than leaving the drifted dtype in
    place (engine expressions are written dtype-tolerant: explicit
    CAST-to-double in similarity/dedup, string renders identical for any
    int width).  Only lossless widenings are normalized.
    """
    if src.startswith("array<") and dst.startswith("array<"):
        return _widening(src[6:-1], dst[6:-1])
    if src in _NUM_RANK and dst in _NUM_RANK:
        return _NUM_RANK[src] < _NUM_RANK[dst]
    if src in _FLT_RANK and dst in _FLT_RANK:
        return _FLT_RANK[src] < _FLT_RANK[dst]
    if src in _NUM_RANK and dst == "double":
        return _NUM_RANK[src] <= 2  # int32 and below fit a double exactly
    return False


def normalize_fixture(df: DataFrame, name: str) -> DataFrame:
    """Widen drifted columns back to the contract; no-op when conforming.

    Narrowing or cross-class drifts are left as shipped (see
    :func:`_widening`); semantic drifts — like ``events.ts`` changing
    physical type — need a dispatching adapter (``adapt_raw_ts``), not a
    cast.
    """
    contract = FIXTURE_CONTRACTS.get(name)
    if not contract:
        return df
    dtypes = dict(df.dtypes)
    drifted = {
        c: want
        for c, want in contract.items()
        if c in dtypes and dtypes[c] != want and _widening(dtypes[c], want)
    }
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
