"""Scale smoke: a 10M-point native measurement (200 series), generated
distributed, written in the engine's layout, and queried with the core
operator set — evidence the plans hold beyond the driver's sf0.1.

Run: python scripts/scale_smoke.py [n_points] [n_series]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


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


if __name__ == "__main__":
    main()
