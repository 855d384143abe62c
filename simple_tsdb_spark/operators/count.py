"""A1 — count_points: (npoints, time_first, time_last) over a range.

Reference (``/root/reference/src/libtsdb/count.cc:8-112``): counts points in
``[t0, t1]`` *from the chunk index alone* — two binary searches plus
arithmetic, no data pages — and returns the actual first/last matched
timestamps.

Spark-first: ``count(*)``, ``min(time_ns)``, ``max(time_ns)`` after the
pushed-down time filter.  With Parquet this is near-metadata-only too:
row-group pruning drops groups outside ``[t0,t1]`` and only ``time_ns``
pages of boundary groups are decoded (column pruning removes every other
column from the scan).  ``spark.sql.parquet.aggregatePushdown`` serves
unfiltered count/min/max straight from footer statistics.

Edge semantics (count.cc:16-23): an empty result reports npoints=0 with
NULL bounds here; the reference returns its clamp internals
(time_first/t0/t1 oddities) which exist only to seed its iterator — the
observable CLI/client surface is (count, first, last) of matched data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.timeutil import clamp_time_range


def count_points(
    df: DataFrame,
    *,
    series: str | Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    per_series: bool = True,
) -> DataFrame:
    """Count points and actual time bounds in ``[t0, t1]``.

    ``per_series=True`` returns one row per series (reference: one call per
    series); ``False`` aggregates the whole measurement into one row.
    """
    t0, t1 = clamp_time_range(t0, t1)
    out = df.where(F.col("time_ns").between(t0, t1))
    if series is not None:
        if isinstance(series, str):
            out = out.where(F.col("series") == series)
        else:
            out = out.where(F.col("series").isin(list(series)))
    aggs = [
        F.count(F.lit(1)).alias("npoints"),
        F.min("time_ns").alias("time_first"),
        F.max("time_ns").alias("time_last"),
    ]
    if per_series:
        return out.groupBy("series").agg(*aggs).orderBy("series")
    return out.agg(*aggs)
