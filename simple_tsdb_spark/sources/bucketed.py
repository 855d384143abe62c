"""Bucketed measurement tables — co-located series-keyed work.

At 100 TB, measurements that are routinely joined, unioned, or
re-aggregated on ``series`` should share a bucketing layout:
``bucketBy(N, series)`` pins each series to a bucket file, recorded in
the table catalog, so Catalyst plans series-keyed aggregations and
equi-joins over such tables with NO Exchange on the bucketed side —
the shuffle happened once, at write time, instead of once per query.
This is the cluster answer to the reference's directory-per-series
layout (which likewise fixes placement at write time) and the standard
remedy for the dynamic-partitioning namespace explosion at ≥10⁶ series
(see SCALE.md "very high series cardinality").

Sorted buckets (``sortBy(series, time_ns)``) additionally let
sort-merge operators skip their sort.  pytest: tests/test_bucketed.py
asserts a series-keyed aggregate-join plan over two co-bucketed tables
contains no Exchange and returns results identical to the plain path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from simple_tsdb_spark.sources.measurement import validate_measurement


def save_bucketed_measurement(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    *,
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist a measurement as a bucketed, sorted table.

    ``buckets`` must match across tables meant to be joined co-located
    (Spark only elides the exchange when both sides agree).  ``path``
    makes it an external table (data at ``path``, metadata in the
    session catalog).
    """
    validate_measurement(df)
    w = (
        df.repartition(int(buckets), "series")  # one file per bucket
        .sortWithinPartitions("series", "time_ns")
        .write.mode("overwrite")
        .bucketBy(int(buckets), "series")
        .sortBy("series", "time_ns")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed_measurement(spark: SparkSession, table: str) -> DataFrame:
    """Open a bucketed measurement; the bucket spec rides along in the
    catalog so downstream series-keyed plans skip their exchanges."""
    return validate_measurement(spark.table(table))
