"""Strict-gate coverage for exactly the queries the DRIVER won't gate
this round (VERDICT r11 #7).

The driver's correctness sample is the FIRST 50 ``queries()`` entries;
the head is rotated each round so evidence stays fresh, but between
rotations the other ~88 declared queries ride on old driver rows while
the code under them keeps moving.  This marker runs the local replica
of the driver's compare (``scripts/check_oracle.py``, dtype-KIND aware)
at sf0.01 over the TAIL — head-50 excluded, since the driver itself
covers those — so the local loop plus the driver together gate all 138
every round.

Cost is ~10 min of Spark jobs, so it carries its own ``stale_gate``
marker (off by default like ``soak``):

    python -m pytest tests/test_stale_gate.py -m stale_gate -q
"""

from __future__ import annotations

import importlib.util
import os
import sys

import pytest

spec = importlib.util.spec_from_file_location(
    "check_oracle", "/root/repo/scripts/check_oracle.py"
)
gate = importlib.util.module_from_spec(spec)
sys.modules["check_oracle"] = gate
spec.loader.exec_module(gate)

SF_DIR = "/root/testdata/sf0.01"


def _tail_names() -> list[str]:
    import __spark_entry__ as entry_mod

    return list(entry_mod.queries())[50:]


@pytest.fixture(scope="module")
def oracle_con():
    # data-dependent oracle builders (knn_*_trained) fit at the sf under
    # test — same env contract as check_oracle.main()
    os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR
    con = gate.duck_con(SF_DIR)
    yield con
    con.close()


@pytest.mark.stale_gate
# ALSO marked soak so the fast per-commit loop's `-m "not soak"` (which
# overrides the addopts-level `-m "not stale_gate"`) keeps excluding it
@pytest.mark.soak
@pytest.mark.parametrize("name", _tail_names())
def test_tail_query_matches_oracle(spark, oracle_con, name):
    import __spark_entry__ as entry_mod

    os.environ["SPARK_GRAFT_ORACLE_SF"] = SF_DIR
    sdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    odf = oracle_con.sql(entry_mod.oracle_sql()[name]).df()
    assert gate.compare(name, sdf, odf), f"{name}: engines disagree at {SF_DIR}"
