from simple_tsdb_spark.sources.bucketed import (
    read_bucketed_measurement,
    save_bucketed_measurement,
)
from simple_tsdb_spark.sources.fixtures import (
    FIXTURE_CONTRACTS,
    normalize_fixture,
    read_fixture,
)
from simple_tsdb_spark.sources.layout import (
    file_overlap_fraction,
    write_zordered,
    zvalue,
)
from simple_tsdb_spark.sources.measurement import (
    META_COLUMNS,
    adapt_raw_ts,
    events_measurement,
    field_columns,
    read_measurement,
    validate_measurement,
)

__all__ = [
    "FIXTURE_CONTRACTS",
    "META_COLUMNS",
    "adapt_raw_ts",
    "events_measurement",
    "file_overlap_fraction",
    "write_zordered",
    "zvalue",
    "field_columns",
    "normalize_fixture",
    "read_bucketed_measurement",
    "read_fixture",
    "read_measurement",
    "save_bucketed_measurement",
    "validate_measurement",
]
