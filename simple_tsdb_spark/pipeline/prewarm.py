"""Codegen pre-warm for the literal-heavy ANN / semantic-dedup plans.

The IVF quantizer, PQ codebook encoder and SemDeDup pair-generator embed
their centroid/codebook constants as expression literals (that is what
keeps their DuckDB oracles bit-exact).  The first query that uses a
given literal table pays Janino whole-stage-codegen compilation of the
generated source — ~8 s cold for the 16×64 default quantizer on this
box.  The JVM caches compiled classes by generated source, so running
the same expressions once over a 1-row frame compiles everything a
deployment will need; every later query on real data is a cache hit.

Call :func:`prewarm` at session start in deployments where first-query
latency matters (dashboards, interactive services).  It is pure
warm-up: no state, no files, results discarded; skipping it changes
nothing but the first query's latency.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import SparkSession

__all__ = ["prewarm"]


def prewarm(
    spark: SparkSession,
    *,
    dim: int = 64,
    centroids: Sequence[Sequence[float]] | None = None,
    codebooks=None,
) -> int:
    """Compile the quantizer/codebook codegen on a 1-row frame.

    Pass the SAME ``centroids`` / ``codebooks`` the real queries will
    use (trained or default) — the codegen cache is keyed by the
    generated source, which embeds the literals, so warming the default
    table does not warm a trained one.  Returns the number of plans
    warmed.
    """
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline.dedup import semdedup
    from simple_tsdb_spark.pipeline.similarity import knn_ivf, pq_encode

    one = spark.range(1).select(
        F.col("id").cast("int").alias("vec_id"),
        F.expr(
            f"transform(sequence(1, {int(dim)}), x -> CAST(x AS FLOAT))"
        ).alias("embedding"),
    )
    n = 0
    knn_ivf(one, query_ids=(0,), k=1, dim=dim, centroids=centroids).count()
    n += 1
    pq_encode(one, dim=dim, codebooks=codebooks).count()
    n += 1
    semdedup(one, dim=dim, centroids=centroids).count()
    n += 1
    return n
