from simple_tsdb_spark.streaming.ingest import start_ingest

__all__ = ["start_ingest"]
