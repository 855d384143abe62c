from simple_tsdb_spark.operators.select import (
    select_points,
    select_last_points,
    select_last_points_probed,
    tail_bucket_cutoff,
)
from simple_tsdb_spark.operators.count import count_points
from simple_tsdb_spark.operators.windowed import (
    sum_points,
    mean_points,
    minmax_downsample,
    auto_downsample,
    lttb_downsample,
    quantile_points,
)
from simple_tsdb_spark.operators.integral import integrate_points
from simple_tsdb_spark.operators.series import list_active_series, list_series
from simple_tsdb_spark.operators.transforms import tare, difference, derivative, counter_rate
from simple_tsdb_spark.operators.delete import delete_points, RetentionWatermarks
from simple_tsdb_spark.operators.rollup import (
    materialize_rollup,
    rollup_sum_points,
    hybrid_sum_points,
    advance_rollup,
)
from simple_tsdb_spark.operators.fill import ewma, fill_windows, holt_linear
from simple_tsdb_spark.operators.segmented import ewma_segmented, holt_segmented
from simple_tsdb_spark.operators.timeseries import (
    asof_join,
    interval_join,
    sessionize,
    moving_avg,
    value_histogram,
    zscore_outliers,
    mad_outliers,
    cusum_changepoints,
    seasonal_decompose,
    find_gaps,
    bollinger_bands,
    incident_windows,
    value_quantiles,
    distinct_count,
    approx_distinct_count,
    approx_quantiles,
)

__all__ = [
    "select_points",
    "select_last_points",
    "select_last_points_probed",
    "tail_bucket_cutoff",
    "count_points",
    "sum_points",
    "mean_points",
    "minmax_downsample",
    "lttb_downsample",
    "quantile_points",
    "auto_downsample",
    "integrate_points",
    "list_active_series",
    "list_series",
    "tare",
    "difference",
    "derivative",
    "counter_rate",
    "delete_points",
    "RetentionWatermarks",
    "materialize_rollup",
    "rollup_sum_points",
    "hybrid_sum_points",
    "advance_rollup",
    "fill_windows",
    "ewma",
    "ewma_segmented",
    "holt_linear",
    "holt_segmented",
    "asof_join",
    "interval_join",
    "sessionize",
    "moving_avg",
    "value_histogram",
    "value_quantiles",
    "zscore_outliers",
    "mad_outliers",
    "cusum_changepoints",
    "seasonal_decompose",
    "find_gaps",
    "bollinger_bands",
    "incident_windows",
    "distinct_count",
    "approx_distinct_count",
    "approx_quantiles",
]
