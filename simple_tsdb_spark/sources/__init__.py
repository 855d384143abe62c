from simple_tsdb_spark.sources.bucketed import (
    read_bucketed_measurement,
    save_bucketed_measurement,
)
from simple_tsdb_spark.sources.measurement import (
    META_COLUMNS,
    events_measurement,
    field_columns,
    read_measurement,
    validate_measurement,
)

__all__ = [
    "META_COLUMNS",
    "read_bucketed_measurement",
    "save_bucketed_measurement",
    "events_measurement",
    "field_columns",
    "read_measurement",
    "validate_measurement",
]
