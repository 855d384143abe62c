"""Streaming z-score anomaly detection — fit-once moments, score the
firehose.

Batch twin: ``operators.timeseries.zscore_outliers``.  The per-series
moments come from :func:`operators.timeseries.zscore_stats` over a
trusted snapshot (the LM-twin fit-then-score shape: the baseline is a
STABLE reference distribution, exactly what an alerting pipeline wants
— a live-updating baseline would let a slow drift normalize itself).
The stream then stream-static broadcast-joins the one-row-per-series
stats table and emits points with ``|z| > k`` — STATELESS, so any
output mode works and no watermark is required; a point's score is
identical to the batch operator's under the same fitted stats because
the z derivation repeats the same exact-BIGINT-grid arithmetic
(``floor(x·1e6)`` moments → identical IEEE op order).

At 100 TB the stats table is one row per series; beyond broadcast
size, drop the hint — stream-static equi-joins also run shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["streaming_zscore_outliers"]


def streaming_zscore_outliers(
    stream: DataFrame,
    stats: DataFrame,
    *,
    field: str,
    k: float = 3.0,
) -> DataFrame:
    """(series, time_ns, <field>, zscore) stream of points whose
    fitted-baseline z-score exceeds ``k`` in magnitude; values identical
    to the batch operator under the same ``zscore_stats`` table.
    Series absent from the fit (or with n < 2 / zero variance) emit
    nothing — there is no baseline to score against."""
    j = (
        stream.where(F.col(field).isNotNull())
        .join(F.broadcast(stats), "series")
        .where(F.col("_n") >= 2)
    )
    mean = F.col("_s").cast("double") / F.lit(1e6) / F.col("_n")
    var = (
        F.col("_ss").cast("double") / F.lit(1e6)
        - F.col("_s").cast("double") / F.lit(1e6) * mean
    ) / (F.col("_n") - 1)
    z = (F.col(field).cast("double") - mean) / F.sqrt(var)
    return (
        j.where(var > 0)
        .withColumn("zscore", z)
        .where(F.abs(F.col("zscore")) > float(k))
        .select(
            "series",
            "time_ns",
            F.col(field).cast("double").alias(field),
            "zscore",
        )
    )
