"""Cross-engine pathological-corpus fuzz, wired into pytest.

Thin wrapper over scripts/fuzz_corpus.py (see its docstring for the bug
class and the round-11 finds).  The full corpus sweep (documents/events/
embeddings plus the TPC-H-side lineitem/orders/customer/supplier/part
pathologies) is several minutes of Spark jobs, so it carries the ``soak``
marker like the other slow model tests; the per-commit loop keeps one
cheap corpus per table family as a tripwire.
"""

from __future__ import annotations

import importlib.util
import sys

import pytest

spec = importlib.util.spec_from_file_location(
    "fuzz_corpus", "/root/repo/scripts/fuzz_corpus.py"
)
fuzz = importlib.util.module_from_spec(spec)
sys.modules["fuzz_corpus"] = fuzz
spec.loader.exec_module(fuzz)


def _run(spark, cname: str) -> list[str]:
    """Run one corpus through every query/oracle pair for its table;
    return failure descriptions (the script's main() inlined without
    its own SparkSession)."""
    import os
    import shutil
    import tempfile

    import __spark_entry__ as entry_mod

    table, builder = fuzz.CORPORA[cname]
    tmp = tempfile.mkdtemp(prefix=f"fuzz_{cname}_")
    failures: list[str] = []
    try:
        sf = fuzz.build_sf_dir(tmp, table, builder())
        # env BEFORE table_queries(): it calls oracle_sql(), whose
        # data-dependent builders read SPARK_GRAFT_ORACLE_SF — the
        # previous test's corpus dir is already deleted.
        os.environ["SPARK_GRAFT_ORACLE_SF"] = sf
        names = fuzz.table_queries(table)
        con = fuzz.duck_con(sf)
        qs = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
        for name in names:
            try:
                sdf = qs[name](spark, sf).toPandas()
                odf = con.sql(oracles[name]).df()
            except Exception as exc:
                if fuzz.EXPECTED_ERRORS.get(name, "\x00") in str(exc) and (
                    len(con.sql(oracles[name]).df()) == 0
                ):
                    continue
                failures.append(f"{cname}/{name}: {type(exc).__name__}: {exc}")
                continue
            if not fuzz.compare(f"{cname}/{name}", sdf, odf):
                failures.append(f"{cname}/{name}: engines disagree")
        con.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return failures


@pytest.mark.parametrize("cname", ["degenerate", "ev_minimal", "emb_zero", "li_single"])
def test_fuzz_tripwire(spark, cname):
    """One pathological corpus per table in the fast loop — the cheapest
    member of each family that historically caught a divergence."""
    assert _run(spark, cname) == []


@pytest.mark.soak
@pytest.mark.parametrize(
    "cname",
    [c for c in fuzz.CORPORA if c not in ("degenerate", "ev_minimal", "emb_zero", "li_single")],
)
def test_fuzz_full_sweep(spark, cname):
    assert _run(spark, cname) == []
