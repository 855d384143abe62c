from simple_tsdb_spark.streaming.curate import streaming_curate, streaming_temperature_sample
from simple_tsdb_spark.streaming.decontam import (
    streaming_decontaminate_flags,
    streaming_ngram_novelty,
)
from simple_tsdb_spark.streaming.dedup import streaming_dedup_against_index, streaming_source_dedup_rate
from simple_tsdb_spark.streaming.lm import streaming_ngram_lm_scores
from simple_tsdb_spark.streaming.scores import streaming_dsir_scores
from simple_tsdb_spark.streaming.dedup import streaming_exact_dedup, streaming_simhash_dedup
from simple_tsdb_spark.streaming.aggregate import (
    streaming_burn_rate,
    streaming_heatmap,
    streaming_hopping_mean,
    streaming_sessionize,
    streaming_sum_points,
)
from simple_tsdb_spark.streaming.ingest import start_ingest, start_ingest_with_rollup
from simple_tsdb_spark.streaming.join import streaming_interval_join
from simple_tsdb_spark.streaming.stateful import (
    streaming_ewma,
    streaming_holt,
    streaming_time_weighted_avg,
    streaming_active_users,
)

__all__ = [
    "start_ingest",
    "streaming_burn_rate",
    "streaming_heatmap",
    "streaming_hopping_mean",
    "streaming_sessionize",
    "streaming_sum_points",
    "start_ingest_with_rollup",
    "streaming_ewma",
    "streaming_holt",
    "streaming_time_weighted_avg",
    "streaming_active_users",
    "streaming_curate",
    "streaming_temperature_sample",
    "streaming_decontaminate_flags",
    "streaming_ngram_novelty",
    "streaming_dsir_scores",
    "streaming_ngram_lm_scores",
    "streaming_dedup_against_index",
    "streaming_exact_dedup",
    "streaming_source_dedup_rate",
    "streaming_simhash_dedup",
    "streaming_interval_join",
]
