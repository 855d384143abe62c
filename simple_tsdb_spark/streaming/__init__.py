from simple_tsdb_spark.streaming.ingest import start_ingest, start_ingest_with_rollup

__all__ = ["start_ingest", "start_ingest_with_rollup"]
