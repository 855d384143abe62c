"""simple_tsdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of tgree/simple_tsdb.

The reference (studied at /root/reference, simple_tsdb v1.0.4) is an
append-only time-series store with a fixed operator set: time-range scans
with LIMIT / LAST-N, metadata count, tumbling-window sum/min/max/count
aggregation with empty-bucket emission, trapezoidal integration, active
series listing, and client-side tare/difference/derivative transforms.

This package re-expresses those semantics Spark-first:

- a *measurement* is a DataFrame with columns
  ``series: string, time_ns: long`` plus nullable primitive field columns
  (SURVEY.md §1.4);
- every operator is a declarative DataFrame transformation so Catalyst does
  predicate pushdown, column pruning and limit pushdown (the reference's
  hand-written chunk-index binary searches, SURVEY.md §4.1);
- ingest is batch/streaming append with the reference's WAL validation
  semantics (ordering, retention watermark, idempotent retransmit) in
  ``foreachBatch`` (see streaming/ingest.py);
- extension operators for large-scale training-data pipelines (dedup,
  similarity search, text analysis, multimodal) live in ``pipeline/``.
"""

from simple_tsdb_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]
