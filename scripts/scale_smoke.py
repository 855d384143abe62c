"""Scale smoke: (1) a 10M-point native measurement (200 series) queried
with the core operator set, and (2) a 100k-series measurement driving the
validated write path, the probed LAST-N, and the rollup maintenance +
hybrid read — evidence the plans hold beyond the driver's sf0.1 in BOTH
the point-count and the series-cardinality dimension, with no driver-side
O(#series) step anywhere (probe reductions ship one scalar; rollup
advance collects one row).

Run: python scripts/scale_smoke.py [n_points] [n_series] [hc_series] [n_docs]

Phase 3 (corpus_phase) adds the corpus dimension: 1M docs through the
curation operators (CC clustering, hot-domain top-k, mixture sampling,
budget packing).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def high_cardinality_phase(spark, n_series: int = 100_000, pts_per_series: int = 20) -> None:
    """100k-series smoke: validated writes, probed LAST-N, rollup hybrid.

    Uses the hashed-series layout (``series_buckets=64``) — the engine's
    ≥10⁵-series answer: directory count 64 × #time_buckets regardless of
    series cardinality (a directory-per-series layout at this cardinality
    spends minutes per write on partition-namespace churn alone; measured
    ~12 ms/dir locally).  Also demonstrates that no engine step collects
    O(#series) rows to the driver: probe rounds and rollup advance each
    ship one scalar.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from simple_tsdb_spark.operators import (
        advance_rollup,
        hybrid_sum_points,
        materialize_rollup,
        select_last_points_probed,
        tail_bucket_cutoff,
    )
    from simple_tsdb_spark.sources.bucketed import save_bucketed_measurement
    from simple_tsdb_spark.sources.writer import write_points

    S = int(n_series)
    hour = 3_600_000_000_000
    base = 1_700_000_000_000_000_000
    cadence = 6 * 60 * 1_000_000_000  # 6 min → 10 pts/series/hour bucket

    def batch(seq0, seqn):
        n = S * (seqn - seq0)
        return spark.range(n).select(
            F.concat(F.lit("s"), (F.col("id") % S).cast("string")).alias("series"),
            (
                F.lit(base)
                + (F.lit(seq0) + (F.col("id") / S).cast("long")) * F.lit(cadence)
                + (F.pmod(F.hash("id"), F.lit(1000)))
            ).alias("time_ns"),
            (F.hash("id", F.lit(7)) % 10_000 / 100.0).alias("v"),
        )

    path = tempfile.mkdtemp() + "/hc"
    t = time.time()
    r1 = write_points(
        spark, path, batch(0, pts_per_series), time_bucket_ns=hour, series_buckets=64
    )
    print(
        f"HC write_points batch1 {r1['appended']:,} pts / {S:,} series "
        f"(validated, hashed layout 64 buckets x 1h): {time.time()-t:.1f}s"
    )
    # second batch exercises the committed-tail overlap/ordering checks
    t = time.time()
    r2 = write_points(spark, path, batch(pts_per_series, pts_per_series + 5))
    print(f"HC write_points batch2 +{r2['appended']:,} pts (tail-checked): {time.time()-t:.1f}s")

    last = 10
    t = time.time()
    cutoff = tail_bucket_cutoff(spark, path, last=last, per_series=True)
    t_probe = time.time() - t
    t = time.time()
    got = select_last_points_probed(spark, path, last=last, per_series=True).count()
    span_ns = (pts_per_series + 5) * cadence
    n_buckets = span_ns // hour + 1
    probed = (base + span_ns - cutoff) // hour + 1
    print(
        f"HC probed LAST-{last}/series: probe {t_probe:.1f}s + query {time.time()-t:.1f}s "
        f"rows={got:,} probed {probed}/{n_buckets} buckets (one scalar per probe round)"
    )

    from simple_tsdb_spark.sources.measurement import read_measurement

    raw = read_measurement(spark, path)
    rpath = tempfile.mkdtemp() + "/hcr"
    t = time.time()
    bnd = base - (base % hour) + hour  # finalized buckets only
    materialize_rollup(spark, raw.where(F.col("time_ns") < bnd), rpath,
                       fields=["v"], base_window_ns=hour, series_buckets=64)
    n_adv = advance_rollup(spark, raw, rpath, fields=["v"], base_window_ns=hour)
    print(f"HC rollup materialize+advance ({n_adv:,} buckets appended, "
          f"driver-light): {time.time()-t:.1f}s")
    t = time.time()
    nh = hybrid_sum_points(spark, raw, rpath, fields=["v"], base_window_ns=hour,
                           window_ns=2 * hour).count()
    print(f"HC hybrid 2h read (rollup history + raw tail): {time.time()-t:.1f}s rows={nh:,}")

    # The ≥10⁶-series answer: one bucketed table, 32 files total, series-
    # keyed work exchange-free — versus 10⁵ partition directories.
    t = time.time()
    save_bucketed_measurement(spark, raw, "hc_bucketed", buckets=32)
    agg = (
        spark.table("hc_bucketed").groupBy("series").agg(F.avg("v").alias("m")).count()
    )
    print(f"HC bucketed table write + exchange-free per-series agg: "
          f"{time.time()-t:.1f}s groups={agg:,}")
    spark.sql("DROP TABLE IF EXISTS hc_bucketed")
    shutil.rmtree(path, ignore_errors=True)
    shutil.rmtree(rpath, ignore_errors=True)


def corpus_phase(spark, n_docs: int = 1_000_000) -> None:
    """1M-doc curation smoke: the training-pipeline ops in the corpus
    dimension — CC clustering over a synthetic pair graph, top-k on a
    hot-domain distribution (90% of docs in one domain), mixture
    sampling, and budget packing.  Demonstrates: CC rounds stay
    O(diameter) with one doc-keyed shuffle each (no edge/vertex collect),
    the salted two-stage top-k spreads the hot domain over tasks, and
    sampling/packing are single-pass.
    """
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import (
        dedup_components,
        domain_topk,
        mixture_sample,
        pack_sequences,
    )

    N = int(n_docs)
    docs = spark.range(N).select(
        F.col("id").alias("doc_id"),
        # 90% web (hot), rest across 10 small domains
        F.when(F.pmod(F.hash("id"), F.lit(10)) < 9, F.lit("web"))
        .otherwise(F.concat(F.lit("niche"), F.pmod(F.hash("id", F.lit(3)), F.lit(10)).cast("string")))
        .alias("source"),
        (F.pmod(F.hash("id", F.lit(7)), F.lit(4000)) + 100).alias("n_chars"),
    ).localCheckpoint(eager=True)

    # Pair graph: ~5% of docs form dup chains of length 4 (diameter 3) —
    # shape-typical near-dup output at corpus scale.
    chains = N // 80
    pairs = (
        spark.range(chains * 3)
        .select(
            (F.col("id") / 3).cast("long").alias("c"),
            F.pmod(F.col("id"), F.lit(3)).alias("k"),
        )
        .select(
            (F.col("c") * 4 + F.col("k")).alias("a"),
            (F.col("c") * 4 + F.col("k") + 1).alias("b"),
        )
    )
    t = time.time()
    cc = dedup_components(pairs, docs)
    n_clustered = cc.where(F.col("doc") != F.col("component")).count()
    print(
        f"CORPUS dedup_components {N:,} docs, {chains*3:,} pair edges "
        f"(chains of 4): {time.time()-t:.1f}s non-keeper rows={n_clustered:,}"
    )
    assert n_clustered == chains * 3

    t = time.time()
    k = domain_topk(docs, k=100).count()
    print(f"CORPUS domain_topk k=100, 90%-hot domain: {time.time()-t:.1f}s rows={k:,}")

    t = time.time()
    kept = mixture_sample(docs, {"web": 30}, default_rate=100).count()
    print(f"CORPUS mixture_sample web@30%: {time.time()-t:.1f}s kept={kept:,}")

    t = time.time()
    packs = pack_sequences(docs, budget=8192).agg(F.max("pack")).first()[0]
    print(f"CORPUS pack_sequences budget=8192: {time.time()-t:.1f}s max_pack/grp={packs:,}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_series = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    import tempfile

    from pyspark.sql import functions as F

    from simple_tsdb_spark import get_spark
    from simple_tsdb_spark.operators import (
        count_points,
        integrate_points,
        select_last_points,
        select_points,
        sum_points,
        tare,
    )

    spark = get_spark("scale_smoke")
    path = tempfile.mkdtemp() + "/m"

    t0 = time.time()
    # ~1s cadence per series, jittered; value = noisy sine; 1% nulls.
    base = 1_700_000_000_000_000_000
    df = (
        spark.range(n)
        .select(
            F.concat(F.lit("sensor-"), (F.col("id") % n_series).cast("string")).alias("series"),
            (
                F.lit(base)
                + (F.col("id") / n_series).cast("long") * F.lit(1_000_000_000)
                + (F.hash("id") % 1_000_000)
            ).alias("time_ns"),
            F.when(
                (F.hash("id", F.lit(1)) % 100) != 0,
                F.sin(F.col("id") / 1000.0) * 100 + (F.hash("id", F.lit(2)) % 1000) / 100.0,
            ).alias("v"),
        )
    )
    (
        df.repartition("series")
        .sortWithinPartitions("time_ns")
        .write.mode("overwrite")
        .partitionBy("series")
        .parquet(path)
    )
    print(f"write {n:,} pts / {n_series} series: {time.time()-t0:.1f}s")

    m = spark.read.parquet(path)
    span = n // n_series * 1_000_000_000
    t_mid0 = base + span // 4
    t_mid1 = base + span // 2

    def bench(label, dfq):
        t = time.time()
        r = dfq.toPandas()
        print(f"{label}: {time.time()-t:.2f}s rows={len(r)}")

    bench("S1 range+limit (1 series)", select_points(m, series="sensor-7", t0=t_mid0, t1=t_mid1, limit=1000))
    bench("S2 last-100 (1 series)", select_last_points(m, series="sensor-7", t0=t_mid0, t1=t_mid1, last=100))
    bench("A1 count (all series)", count_points(m, t0=t_mid0, t1=t_mid1))
    bench(
        "A2 windowed sum 1h (all series)",
        sum_points(m, fields=["v"], t0=t_mid0, t1=t_mid1, window_ns=3_600_000_000_000),
    )
    bench("A4 integral (all series)", integrate_points(m, fields=["v"], t0=t_mid0, t1=t_mid1))
    bench("W1 tare (1 series)", tare(m, fields=["v"], series="sensor-3", t0=t_mid0, t1=t_mid1))

    # Probed LAST-N on a time-bucketed layout: write the same data with a
    # 1h bucket, then LAST-100 over the full retention — the probe must
    # touch only tail partitions, independent of history length.
    import shutil

    from simple_tsdb_spark.operators import select_last_points_probed, tail_bucket_cutoff
    from simple_tsdb_spark.sources.writer import _save_layout

    bpath = tempfile.mkdtemp() + "/mb"
    bucket_ns = 3_600_000_000_000
    (
        df.withColumn("time_bucket", F.col("time_ns") - (F.col("time_ns") % F.lit(bucket_ns)))
        .repartition("series")
        .sortWithinPartitions("time_ns")
        .write.mode("overwrite")
        .partitionBy("series", "time_bucket")
        .parquet(bpath)
    )
    _save_layout(bpath, {"time_bucket_ns": bucket_ns})
    t = time.time()
    cutoff = tail_bucket_cutoff(spark, bpath, series="sensor-7", last=100)
    r = select_last_points_probed(spark, bpath, series="sensor-7", last=100).toPandas()
    n_buckets = (span // bucket_ns) + 1
    probed = (base + span - cutoff) // bucket_ns + 1
    print(
        f"S2 probed last-100 (bucketed, 1 series): {time.time()-t:.2f}s "
        f"rows={len(r)} probed {probed}/{n_buckets} buckets"
    )
    shutil.rmtree(bpath, ignore_errors=True)

    # Continuous-aggregate read: materialize a 1h rollup once, then the
    # 6h windowed read comes from ~10^4x fewer rows than raw.
    from simple_tsdb_spark.operators import hybrid_sum_points, materialize_rollup

    rpath = tempfile.mkdtemp() + "/r"
    t = time.time()
    materialize_rollup(spark, m, rpath, fields=["v"], base_window_ns=bucket_ns)
    print(f"rollup materialize 1h buckets: {time.time()-t:.1f}s")
    bench(
        "A2 6h windows from rollup+tail (all series)",
        hybrid_sum_points(
            spark, m, rpath, fields=["v"], base_window_ns=bucket_ns,
            window_ns=6 * bucket_ns,
        ),
    )
    shutil.rmtree(rpath, ignore_errors=True)

    hc = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    if hc:
        high_cardinality_phase(spark, n_series=hc)

    nd = int(sys.argv[4]) if len(sys.argv) > 4 else 1_000_000
    if nd:
        corpus_phase(spark, n_docs=nd)


if __name__ == "__main__":
    main()
