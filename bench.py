"""Benchmark: run every declared query at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]; print ONE JSON line.

Timing excludes session startup and includes full execution + result
collection (results are small: aggregates or LIMITed scans).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def fit_result_line(times: dict[str, float], sf: float, limit: int = 1800) -> str:
    """The ONE-line JSON result, guaranteed under ``limit`` chars.

    The driver keeps only the last 2000 chars of output and json-parses
    them; a line carrying all declared queries at 4 decimals overflows
    that buffer (rounds 8-10 recorded parsed=null and lost the headline
    metric).  Headline first, per-query times at centisecond precision
    sorted slowest-first, fastest entries dropped until the line fits —
    the full map is always on stderr.
    """
    total = round(sum(times.values()), 4)
    payload = {
        "metric": "total_declared_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries_total": len(times),
        "queries_omitted": 0,
        "queries": {
            k: round(v, 2) for k, v in sorted(times.items(), key=lambda kv: -kv[1])
        },
    }
    line = json.dumps(payload, separators=(",", ":"))
    while len(line) > limit and payload["queries"]:
        fastest = min(payload["queries"], key=payload["queries"].get)
        payload["queries"].pop(fastest)
        payload["queries_omitted"] = payload["queries_total"] - len(payload["queries"])
        line = json.dumps(payload, separators=(",", ":"))
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    import __spark_entry__ as entry_mod
    from simple_tsdb_spark import get_spark

    spark = get_spark("tsdb-bench")
    # Warm the JVM + parquet footer caches with a trivial action.
    spark.read.parquet(f"{sf_dir}/events.parquet").limit(1).collect()

    def run_once(fn) -> float:
        t0 = time.time()
        df = fn(spark, sf_dir)
        len(df.toPandas())  # Arrow transfer — the realistic fast path
        return time.time() - t0

    # Best-of-N per query (N=2 by default), bounded by a wall-clock
    # budget: co-tenant CPU noise swings single runs by 2-8x, and the min
    # is the honest cost of the plan.  The first pass always completes;
    # repeats stop once the budget is spent.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "600"))
    wall0 = time.time()
    times: dict[str, float] = {}
    qs = entry_mod.queries()
    for name, fn in qs.items():
        times[name] = run_once(fn)
    for _ in range(repeats - 1):
        for name, fn in qs.items():
            if time.time() - wall0 > budget_s:
                break
            times[name] = min(times[name], run_once(fn))
    times = {k: round(v, 4) for k, v in times.items()}
    for name, t in times.items():
        print(f"# {name}: {t:.3f}s", file=sys.stderr)

    print(fit_result_line(times, sf))


if __name__ == "__main__":
    main()
