from simple_tsdb_spark.functions.timeutil import (
    MAX_TIME_NS,
    bucket_start,
    clamp_time_range,
    round_down_ns,
    round_up_ns,
    ts_to_ns,
)

__all__ = [
    "MAX_TIME_NS",
    "bucket_start",
    "clamp_time_range",
    "round_down_ns",
    "round_up_ns",
    "ts_to_ns",
]
