"""A5/D7 — series listings.

- ``list_series`` (D7): every series of the measurement, sorted — the
  reference lists series directories (``measurement.h:72-77``).
- ``list_active_series`` (A5): series with ≥1 point in ``[t0, t1]`` — the
  reference loops count_points over all series
  (``measurement.cc:49-63``).

Spark-first: distinct on the (partition) ``series`` column.  When the
measurement is written partitioned by series, listing series is satisfied
from partition directories / metadata without touching data; the active
variant is a pushed-down time filter + partial-distinct (map-side dedup)
shuffle of series strings only — bytes shuffled ≈ #series, not #points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.timeutil import clamp_time_range


def list_series(df: DataFrame) -> DataFrame:
    return df.select("series").distinct().orderBy("series")


def list_active_series(df: DataFrame, *, t0: int = 0, t1: int = 2**63 - 1) -> DataFrame:
    t0, t1 = clamp_time_range(t0, t1)
    return (
        df.where(F.col("time_ns").between(t0, t1))
        .select("series")
        .distinct()
        .orderBy("series")
    )
