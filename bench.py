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

    times: dict[str, float] = {}
    for name, fn in entry_mod.queries().items():
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = len(df.toPandas())  # Arrow transfer — the realistic fast path
        times[name] = round(time.time() - t0, 4)
        print(f"# {name}: {times[name]:.3f}s rows={n}", file=sys.stderr)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_declared_query_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
