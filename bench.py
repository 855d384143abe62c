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


def fit_result_line(
    times: dict[str, float],
    sf: float,
    limit: int = 1800,
    itemize: str = "slowest",
    calib: float | None = None,
    load: float | None = None,
    extra: dict | None = None,
) -> str:
    """The ONE-line JSON result, guaranteed under ``limit`` chars.

    The driver keeps only the last 2000 chars of output and json-parses
    them; a line carrying all declared queries at 4 decimals overflows
    that buffer (rounds 8-10 recorded parsed=null and lost the headline
    metric).  Headline first, per-query times at centisecond precision;
    ``itemize`` picks which half survives the trim: "slowest" (sorted
    slowest-first, fastest dropped until the line fits) or "fastest"
    (the reverse) — the caller alternates per round so that across two
    consecutive rounds EVERY query has a recorded driver timing (the
    r11 blind spot: slowest-only itemization hid regressions in the
    fast half until they outgrew the cutoff).  The full map is always
    on stderr either way.
    """
    if itemize not in ("slowest", "fastest"):
        raise ValueError("itemize must be 'slowest' or 'fastest'")
    # ONE total order — (time, name), name breaking centisecond ties —
    # traversed from opposite ends by the two modes, so their kept
    # prefixes are exact complements: as long as the two prefixes sum
    # to >= len(times) (they keep ~77 of 138 each), every query is
    # itemized in at least one of two consecutive rounds.  Value-based
    # trimming can't guarantee that: rounded times tie constantly and
    # both modes could drop the same tied middle entries.
    order = sorted(times.items(), key=lambda kv: (-kv[1], kv[0]))
    if itemize == "fastest":
        order.reverse()
    total = round(sum(times.values()), 4)
    payload = {
        "metric": "total_declared_query_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "queries_total": len(times),
        "queries_omitted": 0,
        "itemized": itemize,
        "queries": {k: round(v, 2) for k, v in order},
    }
    # Machine-drift self-attribution (VERDICT r12 #4): `calib` times a
    # fixed data-independent probe, `load` is the 1-min load average.
    # If a round's numbers inflate uniformly AND calib/load moved with
    # them, it's co-tenant noise, not a regression.
    if calib is not None:
        payload["calib"] = round(calib, 2)
    if load is not None:
        payload["load"] = round(load, 1)
    # Scaling attestation (r15, VERDICT r14 #2): the session's actual
    # master + defaultParallelism prove $SPARK_GRAFT_CPUS reached the
    # session, and ``calibp`` times a CPU-bound 128-task probe whose
    # 8c/32c wall-clock ratio ≈ the core ratio — a scaling witness the
    # per-query times (dominated by a fixed planning floor at sf0.1)
    # cannot provide.
    if extra:
        payload.update(extra)
    line = json.dumps(payload, separators=(",", ":"))
    while len(line) > limit and payload["queries"]:
        payload["queries"].pop(next(reversed(payload["queries"])))
        payload["queries_omitted"] = payload["queries_total"] - len(payload["queries"])
        line = json.dumps(payload, separators=(",", ":"))
    return line


def round_parity_itemize(repo_dir: str) -> str:
    """Pick the itemized half from the CURRENT round's parity: the
    driver records BENCH_r{N}.json per round, so max(N)+1 is the round
    this bench run belongs to.  Even rounds itemize slowest-first, odd
    rounds fastest-first (VERDICT r11 #2) — deterministic, observable,
    and alternating without any state of its own."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for f in glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", f))
    ]
    current = (max(rounds) + 1) if rounds else 1
    return "slowest" if current % 2 == 0 else "fastest"


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
    # repeats stop once the budget is spent.  Budget raised 600->1500 s
    # (r14): on a noisy box the cold first pass alone can exceed 600 s,
    # which silently dropped the warm pass and recorded cold-only times
    # for every query (measured: a contended run recorded 1187 s total
    # vs 255 s with the warm pass completing) - the min-of-N methodology
    # is unchanged, the budget just no longer starves it.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "1500"))
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

    # Constant-work calibration probe: a fixed JVM-side aggregation with
    # no data dependence (same cost at every sf).  Best-of-2, same as the
    # queries; round-to-round drift here is machine noise by definition.
    def calib_once() -> float:
        t0 = time.time()
        spark.range(0, 512_000_000, 1, 32).selectExpr(
            "sum(id * 3 % 7) AS s"
        ).collect()
        return time.time() - t0

    calib = min(calib_once(), calib_once())

    # Compute-bound parallel probe (r15, VERDICT r14 #2): 128 identical
    # CPU-heavy tasks (4x the 32-core parallelism), so wall-clock scales
    # with usable cores regardless of the data's size — at 8 cores the
    # same probe reads several times slower, attesting that
    # $SPARK_GRAFT_CPUS actually changes execution parallelism (the
    # per-query times cannot: they sit on a fixed planning floor at
    # sf0.1).  Sized so per-task compute (~0.3 s) dwarfs scheduling
    # overhead; measured 1.35 s at local[32] vs 3.81 s at local[8] on
    # this box — ratio 2.8, the box's true 8->32-vCPU compute scaling
    # (SMT), not the 1.0x a serial engine would show.  The original
    # ``calib`` probe stays for round-over-round drift continuity.
    def calibp_once() -> float:
        t0 = time.time()
        spark.range(0, 5_120_000_000, 1, 128).selectExpr(
            "sum(xxhash64(id) % 1001) AS s"
        ).collect()
        return time.time() - t0

    calibp = min(calibp_once(), calibp_once())
    try:
        load = os.getloadavg()[0]
    except OSError:
        load = None

    sc = spark.sparkContext
    extra = {
        "calibp": round(calibp, 2),
        "master": sc.master,
        "parallelism": sc.defaultParallelism,
    }
    itemize = round_parity_itemize(os.path.dirname(os.path.abspath(__file__)))
    print(
        fit_result_line(
            times, sf, itemize=itemize, calib=calib, load=load, extra=extra
        )
    )


if __name__ == "__main__":
    main()
