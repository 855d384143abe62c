"""SparkSession factory tuned for this engine.

Local test/bench runs use ``local[$SPARK_GRAFT_CPUS]``; on a real cluster the
same configs apply minus the master override.  Key choices, each of which
matters at 100 TB:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a
  cluster this should be ~2-3x total executor cores (AQE coalesces down).
- UTC session timezone so timestamp arithmetic matches the DuckDB oracle.
- Arrow enabled for every pandas_udf / toPandas boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def ensure_engine_confs(spark: SparkSession) -> SparkSession:
    """Set the runtime-settable confs this engine depends on, on a session
    we didn't create (e.g. the driver's): ns-parquet reads as longs, UTC
    timestamp semantics.  Safe to call repeatedly."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark


def get_spark(
    app_name: str = "simple_tsdb_spark",
    *,
    shuffle_partitions: int | None = None,
    ui: bool = False,
) -> SparkSession:
    """``ui=True`` keeps the Spark UI (REST API) up — scale_smoke reads
    per-stage shuffle bytes from it; everything else runs UI-less."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE coalescing floor (r14 optimization): with the default 1m
        # floor, every post-shuffle stage whose total data is a few MB
        # coalesces to 1-2 tasks, serializing window/aggregate stages
        # (bollinger's decimal sliding-window pass ran on ONE core of
        # 32).  64k keeps small stages parallel; at 100 TB post-shuffle
        # partitions are hundreds of MB, the floor never binds, and the
        # plan is identical — a scale-adaptive setting, not a local
        # tune.  Interleaved A/B at sf0.1: bollinger 1.7x,
        # range_moving_avg 1.4-1.8x, ngram_jaccard 1.6x,
        # simhash_band_dedup 1.4x, ngram_containment 1.4x; worst
        # regression tfidf_topk ~0.8x (small absolute cost).
        # Env-overridable; unset SPARK_GRAFT_AQE_MIN_PARTITION ("") to
        # fall back to Spark's default.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Read INT64(TIMESTAMP(NANOS)) parquet columns as raw nanosecond
        # longs — exactly the canonical time_ns representation (the driver's
        # events table is nanosecond-precision; Spark TimestampType is µs).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # Shuffle/spill compression codec.  lz4 (Spark default) optimizes
    # CPU; zstd halves shuffle bytes on text-heavy corpora — at 100 TB
    # (or on a scratch-disk-bound box) the byte reduction is usually the
    # better trade.  The 100M-doc growth run sets this to zstd; default
    # stays lz4 so bench numbers remain comparable across rounds.
    codec = os.environ.get("SPARK_GRAFT_IO_CODEC")
    if codec:
        builder = builder.config("spark.io.compression.codec", codec)
    # Whole-stage-codegen compile cache (r15 optimization): Spark caches
    # Janino-compiled generated classes in an LRU keyed on source text,
    # default 100 entries.  A workload of many DISTINCT repeated queries
    # (this engine is a query server: 141 declared queries, dashboards
    # re-issue them) generates ~10+ codegen units per query, so at the
    # default size every re-run recompiles every stage — measured 26.8 s
    # -> 19.0 s (1.41x) for a 16-query repeated pass at sf0.1 just from
    # raising the cap.  This is workload-adaptive, not a local[32] tune:
    # the right value is ~(distinct queries x codegen units per query)
    # on any deployment, and memory cost is bounded (compiled classes,
    # tens of KB each; 5000 entries is well under driver headroom).
    # Env-overridable; set SPARK_GRAFT_CODEGEN_CACHE="" for Spark's
    # default.
    cg_cache = os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "5000")
    if cg_cache:
        builder = builder.config("spark.sql.codegen.cache.maxEntries", cg_cache)
    min_part = os.environ.get("SPARK_GRAFT_AQE_MIN_PARTITION", "64k")
    if min_part:
        builder = builder.config(
            "spark.sql.adaptive.coalescePartitions.minPartitionSize", min_part
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
