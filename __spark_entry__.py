"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from SURVEY.md §2
(IDs in comments), each runnable on the driver's testdata; ``oracle_sql()``
gives the DuckDB-equivalent SQL.  The driver's ``events`` table plays the
measurement: ``event_type`` → series, ``epoch_ns(ts)`` → time_ns,
``value``/``user_id`` → fields (FIXTURES.md "Mapping onto the driver's
testdata").

Float determinism: every order-dependent float aggregation (sums, integral)
runs in exact decimal/integer accumulation on BOTH sides so hashes match
bit-for-bit; single-op window arithmetic (difference/derivative/tare) is
IEEE-deterministic as-is.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Fixed query window: 2024-01-05 .. 2024-01-25 UTC (events span Jan 2024).
T0 = 1_704_412_800 * 1_000_000_000
T1 = 1_706_140_800 * 1_000_000_000
DAY_NS = 86_400 * 1_000_000_000
W = DAY_NS  # tumbling window for A2/A3/W4


def _events(
    spark: SparkSession, sf_dir: str, t0: int | None = T0, t1: int | None = T1
) -> DataFrame:
    """events adapter with the query range passed through so the raw-ts
    predicate reaches parquet row-group pruning (see events_measurement)."""
    from simple_tsdb_spark.sources import events_measurement

    return events_measurement(spark, sf_dir, t0=t0, t1=t1)


# DuckDB view of the events table as a measurement (shared CTE prefix).
_M = "SELECT event_type AS series, epoch_ns(ts) AS time_ns, value, user_id, event_id FROM events"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: windowed sum/min/max/count with empty-bucket emission (A2)."""
    from simple_tsdb_spark.operators import sum_points

    df = _events(spark, "/root/testdata/sf0.001")
    return sum_points(df, fields=["value"], t0=T0, t1=T1, window_ns=W, exact=True)


# --------------------------------------------------------------------------
# queries(): (spark, sf_dir) -> DataFrame, one per operator
# --------------------------------------------------------------------------

def _q_select_points(spark: SparkSession, sf_dir: str) -> DataFrame:  # S1/P1/P2/P3
    from simple_tsdb_spark.operators import select_points

    return select_points(
        _events(spark, sf_dir),
        series="click",
        fields=["value", "user_id", "event_id"],
        t0=T0,
        t1=T1,
        limit=200,
        tiebreak=["event_id"],
    )


def _q_select_last(spark: SparkSession, sf_dir: str) -> DataFrame:  # S2
    from simple_tsdb_spark.operators import select_last_points

    return select_last_points(
        _events(spark, sf_dir),
        series="purchase",
        fields=["value", "user_id", "event_id"],
        t0=T0,
        t1=T1,
        last=100,
        tiebreak=["event_id"],
    )


def _q_select_last_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:  # S2 (per-series)
    from simple_tsdb_spark.operators import select_last_points

    return select_last_points(
        _events(spark, sf_dir),
        fields=["value", "user_id", "event_id"],
        t0=T0,
        t1=T1,
        last=25,
        per_series=True,
        tiebreak=["event_id"],
    )


def _q_count_points(spark: SparkSession, sf_dir: str) -> DataFrame:  # A1
    from simple_tsdb_spark.operators import count_points

    return count_points(_events(spark, sf_dir), t0=T0, t1=T1, per_series=True)


def _q_sum_points(spark: SparkSession, sf_dir: str) -> DataFrame:  # A2
    from simple_tsdb_spark.operators import sum_points

    return sum_points(
        _events(spark, sf_dir, t0=None, t1=T1), fields=["value", "user_id"], t0=T0, t1=T1, window_ns=W, exact=True
    )


def _q_u64_decimal_sum(spark: SparkSession, sf_dir: str) -> DataFrame:  # u64f
    """Full-range u64 (``u64f`` → DECIMAL(20,0), measurement.h:22-31)
    through the real A2 windowed engine: every derived value sits ABOVE
    2^63 (outside int64), accumulates in decimal(38,0)
    (windowed.py:163), and the gated finals render as strings — int64
    cannot carry u64 and DIVERGENCES §14 bans DECIMAL/HUGEINT in gated
    output."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.operators import sum_points

    big = (
        "CAST(CAST('9223372036854775808' AS DECIMAL(20,0))"
        " + CAST(user_id AS DECIMAL(20,0)) * 1000000000000000"
        " + CAST(event_id AS DECIMAL(20,0)) AS DECIMAL(20,0))"
    )
    df = _events(spark, sf_dir, t0=None, t1=T1).withColumn("big", F.expr(big))
    agg = sum_points(
        df, fields=["big"], t0=T0, t1=T1, window_ns=W, exact=True, decimal_sums=True
    )
    return agg.select(
        "series",
        "wstart",
        "window_npoints",
        F.col("big_sum").cast("string").alias("big_sum"),
        F.col("big_min").cast("string").alias("big_min"),
        F.col("big_max").cast("string").alias("big_max"),
        "big_count",
    )


def _q_mean_points(spark: SparkSession, sf_dir: str) -> DataFrame:  # A3
    from simple_tsdb_spark.operators import mean_points

    return mean_points(
        _events(spark, sf_dir, t0=None, t1=T1), fields=["value"], t0=T0, t1=T1, window_ns=W, exact=True
    )


def _q_minmax_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:  # W4
    from simple_tsdb_spark.operators import minmax_downsample

    return minmax_downsample(
        _events(spark, sf_dir, t0=None, t1=T1), field="value", t0=T0, t1=T1, window_ns=W, exact=True
    )


def _q_integrate(spark: SparkSession, sf_dir: str) -> DataFrame:  # A4
    from simple_tsdb_spark.operators import integrate_points

    return integrate_points(_events(spark, sf_dir), fields=["value"], t0=T0, t1=T1, exact=True)


HOP_SLIDE_NS = 6 * 3600 * 1_000_000_000  # 1-day windows hopping every 6h


def _q_hopping_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window mean: 1-day windows every 6 h (overlap factor 4)."""
    from simple_tsdb_spark.operators import hopping_mean

    return hopping_mean(
        _events(spark, sf_dir), field="value", t0=T0, t1=T1, window_ns=W, slide_ns=HOP_SLIDE_NS
    )


def _q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per series per day — linear time_weight of
    hypertable rollups (trapezoid integral / covered duration)."""
    from simple_tsdb_spark.operators import time_weighted_avg

    return time_weighted_avg(_events(spark, sf_dir), field="value", t0=T0, t1=T1, window_ns=W)


def _q_active_series(spark: SparkSession, sf_dir: str) -> DataFrame:  # A5
    from simple_tsdb_spark.operators import list_active_series

    return list_active_series(_events(spark, sf_dir), t0=T0, t1=T1)


def _q_list_series(spark: SparkSession, sf_dir: str) -> DataFrame:  # D7
    from simple_tsdb_spark.operators import list_series

    return list_series(_events(spark, sf_dir, t0=None, t1=None))  # whole table


def _q_tare(spark: SparkSession, sf_dir: str) -> DataFrame:  # W1
    from simple_tsdb_spark.operators import tare

    return tare(_events(spark, sf_dir), fields=["value"], series="purchase", t0=T0, t1=T1)


def _q_difference(spark: SparkSession, sf_dir: str) -> DataFrame:  # W2
    from simple_tsdb_spark.operators import difference

    return difference(_events(spark, sf_dir), fields=["value"], t0=T0, t1=T1)


def _q_derivative(spark: SparkSession, sf_dir: str) -> DataFrame:  # W3
    from simple_tsdb_spark.operators import derivative

    return derivative(
        _events(spark, sf_dir), fields=["value"], t0=T0, t1=T1, period_sec=1.0
    )


def _q_incidents(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import incident_windows

    return incident_windows(
        _events(spark, sf_dir, t0=None, t1=None), field="value", k=2.0,
        gap_ns=60_000_000_000,
    )


def _q_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import bollinger_bands

    return bollinger_bands(
        _events(spark, sf_dir, t0=None, t1=None), field="value", n=20, k=2.0
    )


def _q_quantile_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import quantile_points

    return quantile_points(
        _events(spark, sf_dir, t0=None, t1=None), field="value",
        window_ns=W * 8,
    )


def _q_find_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import find_gaps

    return find_gaps(
        _events(spark, sf_dir, t0=None, t1=None), max_gap_ns=30_000_000_000
    )


def _q_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import seasonal_decompose

    return seasonal_decompose(
        _events(spark, sf_dir, t0=None, t1=None), field="value", period=7
    )


def _q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import cusum_changepoints

    return cusum_changepoints(
        _events(spark, sf_dir, t0=None, t1=None), field="value", k=0.5, h=3.0
    )


def _q_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import lttb_downsample

    return lttb_downsample(_events(spark, sf_dir, t0=None, t1=None), field="value", n_out=50)


def _q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import mad_outliers

    return mad_outliers(_events(spark, sf_dir), field="value", k=3.5, t0=T0, t1=T1)


def _q_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.operators import zscore_outliers

    return zscore_outliers(_events(spark, sf_dir), field="value", k=2.0, t0=T0, t1=T1)


def _q_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:  # W3+resets
    from simple_tsdb_spark.operators import counter_rate

    return counter_rate(_events(spark, sf_dir), fields=["value"], t0=T0, t1=T1)


# ---- time-series breadth operators (operators/timeseries.py) -------------

SESSION_GAP_NS = 3600 * 1_000_000_000  # 1 hour
RMAVG_W_NS = 3_600_000_000_000  # 1h RANGE frame
MAVG_N = 5
HIST_LO, HIST_HI, HIST_BINS = 0.0, 200.0, 20

#: user-keyed measurement views for the as-of join (align each user's
#: clicks with their most recent error).
_M_CLICKS = (
    "SELECT CAST(user_id AS VARCHAR) AS series, epoch_ns(ts) AS time_ns, value "
    "FROM events WHERE event_type = 'click'"
)
_M_ERRORS = (
    "SELECT CAST(user_id AS VARCHAR) AS series, epoch_ns(ts) AS time_ns, value "
    "FROM events WHERE event_type = 'error'"
)


def _user_series(spark: SparkSession, sf_dir: str, event_type: str) -> DataFrame:
    from pyspark.sql import functions as F

    from simple_tsdb_spark.sources.fixtures import read_fixture
    from simple_tsdb_spark.sources.measurement import adapt_raw_ts

    df = read_fixture(spark, sf_dir, "events")
    df, time_ns = adapt_raw_ts(df)
    return (
        df.where(F.col("event_type") == event_type)
        .select(
            F.col("user_id").cast("string").alias("series"),
            time_ns.alias("time_ns"),
            F.col("value"),
        )
    )


def _q_asof_join(spark, sf_dir):
    from simple_tsdb_spark.operators import asof_join

    return asof_join(
        _user_series(spark, sf_dir, "click"),
        _user_series(spark, sf_dir, "error"),
        right_fields=["value"],
    )


NEAREST_TOL_NS = 3600 * 1_000_000_000  # 1 h nearest-match budget


def _q_asof_join_nearest(spark, sf_dir):
    """Bidirectional nearest as-of join (backward wins ties, 1h tolerance)."""
    from simple_tsdb_spark.operators import asof_join_nearest

    return asof_join_nearest(
        _user_series(spark, sf_dir, "click"),
        _user_series(spark, sf_dir, "error"),
        right_fields=["value"],
        tolerance_ns=NEAREST_TOL_NS,
    )


INTERVAL_TOL_NS = 3600 * 1_000_000_000  # 1 h: clicks near an error


def _q_interval_join(spark, sf_dir):
    from simple_tsdb_spark.operators import interval_join

    return interval_join(
        _user_series(spark, sf_dir, "click"),
        _user_series(spark, sf_dir, "error"),
        tol_ns=INTERVAL_TOL_NS,
        right_fields=["value"],
    )


def _q_sessionize(spark, sf_dir):
    from simple_tsdb_spark.operators import sessionize

    return sessionize(_events(spark, sf_dir, t0=None, t1=None), gap_ns=SESSION_GAP_NS)


def _q_session_stats(spark, sf_dir):
    from simple_tsdb_spark.operators import session_stats

    return session_stats(_events(spark, sf_dir, t0=None, t1=None), gap_ns=SESSION_GAP_NS)


def _q_moving_avg(spark, sf_dir):
    from simple_tsdb_spark.operators import moving_avg

    return moving_avg(_events(spark, sf_dir), field="value", n_points=MAVG_N)


def _q_heatmap(spark, sf_dir):
    """2-D heatmap bins: per (day, value bin) counts — the Grafana
    heatmap panel readout."""
    from simple_tsdb_spark.operators.timeseries import heatmap_bins

    return heatmap_bins(
        _events(spark, sf_dir), field="value", t0=T0, t1=T1, window_ns=W,
        lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS,
    )


def _q_top_values_per_series(spark, sf_dir):
    """Top-10 points by value per series — the worst-offenders readout."""
    from simple_tsdb_spark.operators.timeseries import top_values_per_series

    return top_values_per_series(
        _events(spark, sf_dir), field="value", k=10, t0=T0, t1=T1, tiebreak="event_id"
    )


def _q_histogram(spark, sf_dir):
    from simple_tsdb_spark.operators import value_histogram

    return value_histogram(
        _events(spark, sf_dir, t0=None, t1=None),
        field="value", lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS,
    )


def _q_quantiles(spark, sf_dir):
    from simple_tsdb_spark.operators import value_quantiles

    return value_quantiles(_events(spark, sf_dir, t0=None, t1=None), field="value")


def _q_distinct_users(spark, sf_dir):
    from simple_tsdb_spark.operators import distinct_count

    return distinct_count(_events(spark, sf_dir, t0=None, t1=None), field="user_id")


def _q_mean_fill_linear(spark, sf_dir):
    from simple_tsdb_spark.operators import fill_windows, mean_points

    agg = mean_points(
        _events(spark, sf_dir, t0=None, t1=T1), fields=["value"],
        t0=T0, t1=T1, window_ns=W, exact=True,
    )
    return fill_windows(agg, value_col="value_mean", mode="linear")


def _q_mean_fill_previous(spark, sf_dir):  # LOCF fill mode
    from simple_tsdb_spark.operators import fill_windows, mean_points

    agg = mean_points(
        _events(spark, sf_dir, t0=None, t1=T1), fields=["value"],
        t0=T0, t1=T1, window_ns=W, exact=True,
    )
    return fill_windows(agg, value_col="value_mean", mode="previous")


EWMA_ALPHA = 0.3


def _q_holt_linear(spark, sf_dir):  # applyInPandas custom op (level+trend)
    from simple_tsdb_spark.operators import holt_linear

    return holt_linear(_events(spark, sf_dir, t0=None, t1=None), field="value")


def _q_ewma(spark, sf_dir):  # applyInPandas custom op (recursive ewma)
    from simple_tsdb_spark.operators import ewma

    return ewma(_events(spark, sf_dir, t0=None, t1=None), field="value", alpha=EWMA_ALPHA)


# ---- pipeline extension operators (SURVEY §2.12) -------------------------

KNN_QUERY_IDS = (0, 1, 2, 3, 4)
JACCARD_THRESHOLD = 0.5
SIMHASH_MAX_HAMMING = 3
EMB_COS_THRESHOLD = 0.3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.sources.fixtures import read_fixture

    return read_fixture(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from simple_tsdb_spark.sources.fixtures import read_fixture

    return read_fixture(spark, sf_dir, "embeddings")


_BPE_MERGES = 60
_BPE_TOPM = 512


def _q_bpe_merges(spark, sf_dir):
    """BPE tokenizer TRAINING, hash-gated (the knn_ivf_trained
    doctrine): merges fit from the top-512 word types by (count DESC,
    word ASC) — one map-side-combined shuffle plus a bounded
    TakeOrdered to the driver; the oracle refits the identical table in
    DuckDB and runs the SAME deterministic merge loop, so the whole
    training path sits inside the hash gate."""
    from simple_tsdb_spark.pipeline import bpe_train_sampled

    ms = bpe_train_sampled(_docs(spark, sf_dir), n_merges=_BPE_MERGES, top_m=_BPE_TOPM)
    return spark.createDataFrame(
        [(i, l, r) for i, (l, r) in enumerate(ms)],
        "mrank int, lhs string, rhs string",
    )


def _q_bpe_token_counts(spark, sf_dir):
    """Distributed BPE ENCODE (fit + mapInPandas apply with per-batch
    word-type memoization) over a fixed doc slice.  The encode rewrite
    is non-SQL, so the oracle follows the trained-literal doctrine one
    step further: DuckDB reads the same slice, refits the merges on its
    own word table, applies the SHARED encode loop, and emits the
    expected rows as literals — gating the whole distributed path
    (scan, filter pushdown, Arrow batching, ordering) around the shared
    loop.  Encode-loop correctness itself is pinned by tests/test_bpe
    against an independent rank-order model of the reference bpe()."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import bpe_encode_counts, bpe_train_sampled

    docs = _docs(spark, sf_dir)
    ms = bpe_train_sampled(docs, n_merges=_BPE_MERGES, top_m=_BPE_TOPM)
    # fit is corpus-wide; the gated encode covers a fixed doc slice (the
    # filter pushes to the scan) — full-corpus encode is exercised by
    # tests/test_bpe.py and costed in scale_smoke, not the bench line
    return (
        bpe_encode_counts(docs.where(F.col("doc_id") < 200), ms)
        .orderBy("doc_id")
    )


def _q_token_counts(spark, sf_dir):
    from simple_tsdb_spark.pipeline import token_counts

    return token_counts(_docs(spark, sf_dir))


def _q_quality_score(spark, sf_dir):
    """Gated projection = integer finals (quality_ppm); the float
    quality column stays a non-gated convenience."""
    from simple_tsdb_spark.pipeline import quality_score

    return quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens", "quality_ppm"
    )


def _q_lang_id(spark, sf_dir):
    from simple_tsdb_spark.pipeline import lang_id

    return lang_id(_docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    from simple_tsdb_spark.pipeline import fingerprint

    return fingerprint(_docs(spark, sf_dir))


def _q_pii_scrub(spark, sf_dir):
    from simple_tsdb_spark.pipeline import pii_scrub

    return pii_scrub(_docs(spark, sf_dir))


def _q_tfidf_topk(spark, sf_dir):
    from simple_tsdb_spark.pipeline import tfidf_topk

    return tfidf_topk(_docs(spark, sf_dir), k=5)


def _q_ngram_lm(spark, sf_dir):
    """Gated projection = integer finals only (doc_id, n_bigrams,
    nll_munat, xent_munat) — the float ``xent`` convenience column is
    deliberately dropped (round-10 doctrine: no DOUBLE under the
    driver's hasher; r7–r9 hash-fails were all float/decimal finals
    that were bit-exact locally)."""
    from simple_tsdb_spark.pipeline import ngram_lm_score

    return ngram_lm_score(_docs(spark, sf_dir)).select(
        "doc_id", "n_bigrams", "nll_munat", "xent_munat"
    )


def _q_dsir_resample(spark, sf_dir):
    from simple_tsdb_spark.pipeline import dsir_resample

    return dsir_resample(_docs(spark, sf_dir), target_pred="lang = 'en'", k=50)


def _q_stratified_split3(spark, sf_dir):
    from simple_tsdb_spark.pipeline import stratified_split

    return stratified_split(
        _docs(spark, sf_dir), fracs={"valid": 0.05, "test": 0.05}
    )


def _q_char_entropy(spark, sf_dir):
    """Gated projection = integer finals only (the float ``entropy``
    convenience column is dropped — round-10 no-DOUBLE doctrine)."""
    from simple_tsdb_spark.pipeline import char_entropy

    return char_entropy(_docs(spark, sf_dir)).select(
        "doc_id", "n_chars", "entropy_munat_num", "entropy_munat"
    )


def _q_dup_ngram_chars(spark, sf_dir):
    from simple_tsdb_spark.pipeline import dup_ngram_chars

    return dup_ngram_chars(_docs(spark, sf_dir))


def _q_gopher_rules(spark, sf_dir):
    from simple_tsdb_spark.pipeline import gopher_rules

    return gopher_rules(_docs(spark, sf_dir), min_words=20)


def _q_knn_rp(spark, sf_dir):
    from simple_tsdb_spark.pipeline import knn_rp

    return knn_rp(_embs(spark, sf_dir), query_ids=list(range(8)), k=10)


def _q_rp_project(spark, sf_dir):
    from simple_tsdb_spark.pipeline import rp_project

    return rp_project(_embs(spark, sf_dir))


def _q_curate_corpus(spark, sf_dir):
    from simple_tsdb_spark.pipeline import curate_corpus

    return curate_corpus(_docs(spark, sf_dir))


def _q_stratified_split(spark, sf_dir):
    from simple_tsdb_spark.pipeline import stratified_split

    return stratified_split(_docs(spark, sf_dir), frac=0.1)


def _q_topk_ngrams(spark, sf_dir):
    from simple_tsdb_spark.pipeline import topk_ngrams

    return topk_ngrams(_docs(spark, sf_dir), n=3, k=100)


def _q_winnowing(spark, sf_dir):
    from simple_tsdb_spark.pipeline import winnowing_fingerprints

    return winnowing_fingerprints(_docs(spark, sf_dir), n=4, w=5)


def _q_winnowing_matches(spark, sf_dir):
    from simple_tsdb_spark.pipeline import winnowing_matches

    return winnowing_matches(_docs(spark, sf_dir), n=4, w=5, min_shared=2)


def _q_kmeans_clusters(spark, sf_dir):
    from simple_tsdb_spark.pipeline import kmeans_clusters

    return kmeans_clusters(_embs(spark, sf_dir))


CLUSTER_PRUNE_K = 50


def _q_cluster_prune(spark, sf_dir):
    from simple_tsdb_spark.pipeline import cluster_prune

    return cluster_prune(_embs(spark, sf_dir), k=CLUSTER_PRUNE_K)


def _q_dsir_weights(spark, sf_dir):
    from simple_tsdb_spark.pipeline import dsir_logweights

    return dsir_logweights(_docs(spark, sf_dir), target_pred="lang = 'en'")


def _q_repetition_stats(spark, sf_dir):
    from simple_tsdb_spark.pipeline import repetition_stats

    return repetition_stats(_docs(spark, sf_dir))


#: decontamination benchmark carve-out: ~1% of docs play the eval set.
DECONTAM_BENCH_FILTER = "doc_id % 97 = 0"


def _q_ngram_novelty(spark, sf_dir):
    """Per-doc n-gram novelty vs the reference slice (diversity /
    copy-paste signal; broadcast reference grams)."""
    from simple_tsdb_spark.pipeline import ngram_novelty

    docs = _docs(spark, sf_dir)
    ref = docs.where(DECONTAM_BENCH_FILTER)
    corpus = docs.where(f"NOT ({DECONTAM_BENCH_FILTER})")
    return ngram_novelty(corpus, ref)


def _q_decontaminate(spark, sf_dir):
    from simple_tsdb_spark.pipeline import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.where(DECONTAM_BENCH_FILTER)
    corpus = docs.where(f"NOT ({DECONTAM_BENCH_FILTER})")
    return decontaminate(corpus, bench)


def _q_decontaminate_pairs(spark, sf_dir):
    from simple_tsdb_spark.pipeline import decontaminate_pairs

    docs = _docs(spark, sf_dir)
    bench = docs.where(DECONTAM_BENCH_FILTER)
    corpus = docs.where(f"NOT ({DECONTAM_BENCH_FILTER})")
    return decontaminate_pairs(corpus, bench)


def _q_exact_substr_spans(spark, sf_dir):
    from simple_tsdb_spark.pipeline import exact_substr_spans

    return exact_substr_spans(_docs(spark, sf_dir))


def _q_boilerplate_spans(spark, sf_dir):
    from simple_tsdb_spark.pipeline import boilerplate_spans

    return boilerplate_spans(_docs(spark, sf_dir))


def _q_dedup_exact(spark, sf_dir):
    from simple_tsdb_spark.pipeline import exact_dedup

    return exact_dedup(_docs(spark, sf_dir))


def _q_ngram_jaccard(spark, sf_dir):
    from simple_tsdb_spark.pipeline import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=JACCARD_THRESHOLD)


def _q_minhash_lsh(spark, sf_dir):
    from simple_tsdb_spark.pipeline import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(spark, sf_dir))


def _q_corpus_stats(spark, sf_dir):
    """Per-(lang, source) corpus report: counts, token totals, exact median."""
    from simple_tsdb_spark.pipeline import corpus_stats

    return corpus_stats(_docs(spark, sf_dir))


def _q_normalize_text(spark, sf_dir):
    """Canonical normalization (lowercase, whitespace collapse, trim)."""
    from simple_tsdb_spark.pipeline import normalize_text

    return normalize_text(_docs(spark, sf_dir))


def _q_lm_perplexity_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity split at exact tercile cuts."""
    from simple_tsdb_spark.pipeline import lm_perplexity_buckets

    return lm_perplexity_buckets(_docs(spark, sf_dir), cache="local")


def _q_quality_filter_pct(spark, sf_dir):
    """Corpus-adaptive quality gate: drop the bottom decile of quality."""
    from simple_tsdb_spark.pipeline import quality_filter_pct

    return quality_filter_pct(_docs(spark, sf_dir), pct=0.1)


def _q_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: unshipped-order revenue top-10 for one segment."""
    from simple_tsdb_spark.plans.analytics import shipping_priority

    return shipping_priority(spark, sf_dir)


def _q_pmi_topk(spark, sf_dir):
    """Top-100 adjacent-word collocations by integer-munat PMI."""
    from simple_tsdb_spark.pipeline import pmi_topk

    return pmi_topk(_docs(spark, sf_dir), k=100, min_count=5)


def _q_block_dedup(spark, sf_dir):
    """Sub-document exact dedup: C4's repeated-line rule at 16-word-block
    granularity (keep first occurrence corpus-wide, reassemble docs)."""
    from simple_tsdb_spark.pipeline import block_dedup

    return block_dedup(_docs(spark, sf_dir))


BM25_TERMS = ("spark", "vector", "merge")


def _q_bm25_topk(spark, sf_dir):
    """BM25 keyword retrieval: top-20 docs for a 3-term query.  Gated
    final is the 128-bit-exact integer ``bm25_munat`` (round-10
    integer-finals doctrine); the float ``bm25`` convenience column is
    dropped from the gate."""
    from simple_tsdb_spark.pipeline import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), query_terms=BM25_TERMS, k=20).drop("bm25")


CONTAINMENT_THRESHOLD = 0.7


def _q_ngram_containment(spark, sf_dir):
    """Asymmetric shingle containment |A∩B|/min(|A|,|B|): short-doc-inside-
    long-doc pairs that Jaccard dilutes."""
    from simple_tsdb_spark.pipeline import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=CONTAINMENT_THRESHOLD, metric="containment"
    )


def _q_minhash_est_jaccard(spark, sf_dir):
    """LSH accuracy audit: estimated vs exact Jaccard per candidate pair."""
    from simple_tsdb_spark.pipeline import minhash_est_jaccard

    return minhash_est_jaccard(_docs(spark, sf_dir))


def _q_simhash_pairs(spark, sf_dir):
    from simple_tsdb_spark.pipeline import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), max_hamming=SIMHASH_MAX_HAMMING)


SEMDEDUP_THRESHOLD = 0.8


def _q_semdedup(spark, sf_dir):
    from simple_tsdb_spark.pipeline import semdedup

    return semdedup(_embs(spark, sf_dir), threshold=SEMDEDUP_THRESHOLD)


def _q_embedding_dup(spark, sf_dir):
    from simple_tsdb_spark.pipeline import embedding_dup_pairs

    return embedding_dup_pairs(_embs(spark, sf_dir), threshold=EMB_COS_THRESHOLD)


DOMAIN_TOPK_K = 25
MIXTURE_RATES = {"web": 30, "wiki": 100, "books": 80}
PACK_BUDGET = 4096  # chars per pack (n_chars as the token proxy)
TEMP_TARGET = 300  # temperature-mixture sampled-docs target (alpha = 0.5)


def _q_dedup_clusters(spark, sf_dir):
    """Connected components over the minhash near-dup pair graph; every
    doc gets a cluster id (the min reachable doc_id — the keeper)."""
    from simple_tsdb_spark.pipeline import dedup_components, minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    return dedup_components(minhash_lsh_pairs(docs), docs)


def _q_hash_split(spark, sf_dir):
    from simple_tsdb_spark.pipeline import hash_split

    return hash_split(_docs(spark, sf_dir))


def _q_domain_topk(spark, sf_dir):
    from simple_tsdb_spark.pipeline import domain_topk

    return domain_topk(_docs(spark, sf_dir), k=DOMAIN_TOPK_K)


def _q_mixture_sample(spark, sf_dir):
    from simple_tsdb_spark.pipeline import mixture_sample

    return mixture_sample(_docs(spark, sf_dir), MIXTURE_RATES, default_rate=50)


def _q_ivf_stats(spark, sf_dir):
    """IVF list-balance audit (hot/empty quantizer lists) over the same
    assignment projection knn_ivf and the materialized index use."""
    from simple_tsdb_spark.pipeline import ivf_stats

    return ivf_stats(_embs(spark, sf_dir))


def _q_quantize_int8(spark, sf_dir):
    """Symmetric per-dim int8 quantization (vector-index export)."""
    from simple_tsdb_spark.pipeline import quantize_embeddings_int8

    return quantize_embeddings_int8(_embs(spark, sf_dir))


def _q_embedding_moments(spark, sf_dir):
    """Exact integer-grid second moments of the embedding corpus (the
    covariance/PCA input): mapInPandas partial Grams, decimal-sum agg.
    Gated with ``bigint_finals=True`` — guarded decimal→int64 casts
    (round-10 doctrine: r9 proved the driver hasher canonicalizes
    DECIMAL(38,0) engine-specifically; gate-scale sums fit int64 with
    ~5 decimal digits of headroom, and both engines raise rather than
    truncate on overflow)."""
    from simple_tsdb_spark.pipeline import embedding_moments

    return embedding_moments(_embs(spark, sf_dir), bigint_finals=True)


def _q_corpus_diff(spark, sf_dir):
    """Snapshot diff: version B is derived deterministically from the
    corpus (drop bucket >= 90, append ' v2' to bucket < 10), so the
    diff exercises all four statuses with an exact oracle."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import corpus_diff
    from simple_tsdb_spark.pipeline.curation import SPLIT_BUCKETS, _hash60

    docs = _docs(spark, sf_dir)
    bucket = F.expr(
        _hash60("concat('diff-v1:', CAST(doc_id AS STRING))") + f" % {SPLIT_BUCKETS}"
    )
    new = (
        docs.withColumn("_b", bucket)
        .where(F.col("_b") < 90)
        .withColumn(
            "text",
            F.when(F.col("_b") < 10, F.concat(F.col("text"), F.lit(" v2"))).otherwise(
                F.col("text")
            ),
        )
    )
    return corpus_diff(docs, new)


def _q_temperature_mixture(spark, sf_dir):
    """T5/Pile temperature sampling report: n^alpha source weighting,
    stateless hash-threshold keeps, exact integer-grid weights."""
    from simple_tsdb_spark.pipeline import temperature_mixture

    return temperature_mixture(_docs(spark, sf_dir), target_total=TEMP_TARGET).select(
        "source", "n_docs", "n_kept", "p_keep_ppm"
    )


def _q_near_dup_rate_by_source(spark, sf_dir):
    """Per-source LSH near-dup involvement (templating vs syndication)."""
    from simple_tsdb_spark.pipeline import minhash_lsh_pairs, near_dup_rate_by_source

    docs = _docs(spark, sf_dir)
    return near_dup_rate_by_source(docs, minhash_lsh_pairs(docs))


def _q_source_dedup_rate(spark, sf_dir):
    """Per-source duplication diagnostic (which feeds are redundant)."""
    from simple_tsdb_spark.pipeline import source_dedup_rate

    return source_dedup_rate(_docs(spark, sf_dir))


def _q_training_order(spark, sf_dir):
    """Deterministic epoch shuffle: shard + in-shard position, no
    global sort (per-shard windows only)."""
    from simple_tsdb_spark.pipeline import training_order

    return training_order(_docs(spark, sf_dir))


def _q_keep_best_dedup(spark, sf_dir):
    """Quality-aware near-dup collapse: per minhash cluster keep the
    longest copy (ties -> min doc_id); full decision table out."""
    from simple_tsdb_spark.pipeline import keep_best_dedup, minhash_lsh_pairs

    docs = _docs(spark, sf_dir)
    return keep_best_dedup(minhash_lsh_pairs(docs), docs)


def _q_pack_sequences(spark, sf_dir):
    from simple_tsdb_spark.pipeline import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), budget=PACK_BUDGET)


def _q_ccnet_curate(spark, sf_dir):
    """CCNet chain: LM perplexity gate (drop tail) -> exact dedup ->
    exact stratified holdout, one lazy plan."""
    from simple_tsdb_spark.pipeline import ccnet_curate

    return ccnet_curate(_docs(spark, sf_dir), frac=0.1)


def _q_pack_stats(spark, sf_dir):
    """Packing-quality report: per-pack fill ratios and straddle flags."""
    from simple_tsdb_spark.pipeline import pack_stats

    return pack_stats(_docs(spark, sf_dir), budget=PACK_BUDGET)


def _q_knn_brute(spark, sf_dir):
    from simple_tsdb_spark.pipeline import knn_brute

    return knn_brute(_embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, k=10)


RANGE_TAU = 0.3


def _q_knn_range(spark, sf_dir):
    """Radius search: all corpus vectors within cosine >= tau of each
    query vector — the fixed-threshold companion to knn_brute."""
    from simple_tsdb_spark.pipeline import range_search

    return range_search(_embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, tau=RANGE_TAU)


def _q_label_centroids(spark, sf_dir):
    """Per-label embedding centroids (class prototypes), long format."""
    from simple_tsdb_spark.pipeline import label_centroids

    return label_centroids(_embs(spark, sf_dir))


def _q_knn_lsh(spark, sf_dir):
    from simple_tsdb_spark.pipeline import knn_lsh

    return knn_lsh(_embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, k=10)


def _q_knn_ivf(spark, sf_dir):
    from simple_tsdb_spark.pipeline import knn_ivf

    return knn_ivf(_embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, k=10)


TRAIN_IVF_ITERS = 2


def _q_knn_ivf_trained(spark, sf_dir):
    """IVF search behind a quantizer TRAINED on a bounded hash-rank
    sample of the corpus (FAISS doctrine: one corpus scan to sample,
    driver-local Lloyd over ≤16k vectors — fit cost independent of
    corpus size).  The oracle independently draws the identical sample
    in DuckDB and runs the same local fit, so the training path itself
    sits inside the hash gate."""
    from simple_tsdb_spark.pipeline import knn_ivf, train_ivf_centroids_sampled

    cs = train_ivf_centroids_sampled(_embs(spark, sf_dir), iters=TRAIN_IVF_ITERS)
    return knn_ivf(_embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, k=10, centroids=cs)


def _q_knn_ivf_pq(spark, sf_dir):
    """IVF-PQ: coarse lists bound candidates, product-quantized codes +
    per-query LUT give O(M) asymmetric distances — the memory-resident
    index shape for 10⁹-vector corpora.  Gate uses the deterministic
    default codebooks; the TRAINED path is gated separately
    (`knn_ivf_pq_trained`)."""
    from simple_tsdb_spark.pipeline import knn_ivf_pq

    return knn_ivf_pq(_embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, k=10)


TRAIN_PQ_ITERS = 2


def _q_knn_ivf_pq_trained(spark, sf_dir):
    """IVF-PQ behind codebooks TRAINED on a bounded hash-rank sample
    (per-subspace driver-local Lloyd over ≤16k vectors; one corpus scan
    to sample — the knn_ivf_trained pattern).  The oracle independently
    draws the identical sample in DuckDB and refits bit-identical
    codebook literals, so the PQ training path itself sits inside the
    hash gate."""
    from simple_tsdb_spark.pipeline import knn_ivf_pq, train_pq_codebooks_sampled

    cbs = train_pq_codebooks_sampled(_embs(spark, sf_dir), iters=TRAIN_PQ_ITERS)
    return knn_ivf_pq(
        _embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, k=10, codebooks=cbs
    )


def _q_pq_encode(spark, sf_dir):
    """PQ index build as a first-class gate query: codes as a joined
    string (the driver's value hash can't compare raw array columns)."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import pq_encode

    return pq_encode(_embs(spark, sf_dir)).select(
        "vec_id", F.concat_ws(",", F.col("codes")).alias("pq_code")
    )


def _q_simhash_band_dedup(spark, sf_dir):
    """Batch twin of the streaming near-dup filter, in the hash gate:
    greedy band-ownership keep/drop per doc."""
    from simple_tsdb_spark.pipeline import simhash_band_dedup

    return simhash_band_dedup(
        _docs(spark, sf_dir), max_hamming=SIMHASH_MAX_HAMMING, order_col="doc_id"
    )


def _q_multimodal_meta(spark, sf_dir):
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import attach_blob

    return attach_blob(_docs(spark, sf_dir)).select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def _q_blob_features(spark, sf_dir):
    """Gated final is the exact-integer ``mean_sample_ppm``; the float
    ``mean_sample`` convenience column is dropped from the gate
    (round-10 integer-finals doctrine)."""
    from simple_tsdb_spark.pipeline import attach_blob, extract_blob_features

    return extract_blob_features(attach_blob(_docs(spark, sf_dir))).drop("mean_sample")


def _q_supplier_balance_quartiles(spark, sf_dir):
    """Per-nation supplier balance quartiles (exact interpolated)."""
    from simple_tsdb_spark.plans import supplier_balance_quartiles

    return supplier_balance_quartiles(spark, sf_dir)


def _q_min_cost_parts(spark, sf_dir):
    """TPC-H Q2 correlated-subquery shape, decorrelated to a window min."""
    from simple_tsdb_spark.plans import min_cost_parts

    return min_cost_parts(spark, sf_dir)


def _q_nation_balance_share(spark, sf_dir):
    """TPC-H Q11 group-vs-global-share shape (broadcast scalar)."""
    from simple_tsdb_spark.plans import nation_balance_share

    return nation_balance_share(spark, sf_dir)


def _q_revenue_cube(spark, sf_dir):
    """ROLLUP grouping sets: (nation, year) + subtotals + grand total in
    one shared-shuffle aggregation pass."""
    from simple_tsdb_spark.plans import revenue_cube

    return revenue_cube(spark, sf_dir)


def _q_zorder_key(spark, sf_dir):
    """Morton clustering key over (series, time_ns) — the layout
    write's exact expression behind the hash gate."""
    from simple_tsdb_spark.sources.layout import zorder_key_frame

    return zorder_key_frame(
        _events(spark, sf_dir), ("series", "time_ns"), id_cols=("event_id",)
    )


def _q_range_moving_avg(spark, sf_dir):
    """Trailing 1h TIME-window mean (RANGE frame on the ns ordering)."""
    from simple_tsdb_spark.operators import range_moving_avg

    return range_moving_avg(_events(spark, sf_dir), field="value", window_ns=RMAVG_W_NS)


def _q_order_priority_counts(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS as a LEFT SEMI join on the uniform orderkey."""
    from simple_tsdb_spark.plans import order_priority_counts

    return order_priority_counts(spark, sf_dir)


def _q_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: agg-first group-HAVING, broadcast customer dim."""
    from simple_tsdb_spark.plans import large_volume_customers

    return large_volume_customers(spark, sf_dir)


def _q_pricing_summary(spark, sf_dir):
    from simple_tsdb_spark.plans import pricing_summary

    return pricing_summary(spark, sf_dir)


def _q_revenue_by_nation(spark, sf_dir):
    from simple_tsdb_spark.plans import revenue_by_nation

    return revenue_by_nation(spark, sf_dir)


def _q_top_customers(spark, sf_dir):
    from simple_tsdb_spark.plans import top_customers_per_nation

    return top_customers_per_nation(spark, sf_dir)


DAY_NS = 24 * 3600 * 1_000_000_000
FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_NS = 24 * 3600 * 1_000_000_000  # 24 h from first view


def _q_cohort_retention(spark, sf_dir):
    """Daily cohort retention matrix over the events stream — first-
    activity-day cohorts × day offsets, distinct active users."""
    from simple_tsdb_spark.operators.behavior import cohort_retention

    return cohort_retention(
        _events(spark, sf_dir, t0=None, t1=None), period_ns=DAY_NS
    )


def _q_active_users(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness per day over the events
    stream (unrounded DAU/WAU quotient)."""
    from simple_tsdb_spark.operators.behavior import active_users

    return active_users(_events(spark, sf_dir, t0=None, t1=None), period_ns=DAY_NS)


def _q_event_funnel(spark, sf_dir):
    """Strictly-ordered view→click→purchase funnel, each step within
    24 h of the user's first view — the classic product-analytics
    readout (150 → 60 → 14 users at sf0.01, a real drop-off at every
    level)."""
    from simple_tsdb_spark.operators.behavior import event_funnel

    return event_funnel(
        _events(spark, sf_dir, t0=None, t1=None),
        steps=list(FUNNEL_STEPS),
        window_ns=FUNNEL_WINDOW_NS,
    )


BURN_SLIDE_NS = 900 * 1_000_000_000          # 15 m
BURN_SHORT_NS = 3600 * 1_000_000_000         # 1 h
BURN_LONG_NS = 6 * 3600 * 1_000_000_000      # 6 h


def _q_burn_rate_alerts(spark, sf_dir):
    """Multi-window error-budget burn alerts (1h AND 6h trailing error
    fractions over thresholds, 15m hops)."""
    from simple_tsdb_spark.operators.timeseries import burn_rate_alerts

    return burn_rate_alerts(
        _events(spark, sf_dir, t0=None, t1=None),
        error_series="error",
        short_ns=BURN_SHORT_NS,
        long_ns=BURN_LONG_NS,
        slide_ns=BURN_SLIDE_NS,
        short_threshold=0.27,
        long_threshold=0.225,
    )


def _q_funnel_conversion_time(spark, sf_dir):
    """Conversion-latency distribution for full-funnel completers
    (exact BIGINT bounds, unrounded mean, interpolated p50/p90)."""
    from simple_tsdb_spark.operators.behavior import funnel_conversion_time

    return funnel_conversion_time(
        _events(spark, sf_dir, t0=None, t1=None),
        steps=list(FUNNEL_STEPS),
        window_ns=FUNNEL_WINDOW_NS,
    )


def _q_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: discount-band revenue per ship year (scan-pushdown audit)."""
    from simple_tsdb_spark.plans import forecast_revenue

    return forecast_revenue(spark, sf_dir)


def _q_event_transitions(spark, sf_dir):
    """First-order Markov transition counts + probabilities over user event paths."""
    from simple_tsdb_spark.plans import event_transitions

    return event_transitions(spark, sf_dir)


def _q_doc_chunks(spark, sf_dir):
    """RAG chunking: tail-aligned 64-token windows every 48 tokens."""
    from simple_tsdb_spark.pipeline import doc_chunks

    return doc_chunks(_docs(spark, sf_dir), window=64, stride=48)


def _q_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining: top-10 cross-label cosine neighbors."""
    from simple_tsdb_spark.pipeline import hard_negatives

    return hard_negatives(_embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, k=10)


def _q_ann_recall(spark, sf_dir):
    """Recall@10 audit of the LSH ANN path against exact brute force."""
    from simple_tsdb_spark.pipeline import ann_recall

    return ann_recall(_embs(spark, sf_dir), query_ids=KNN_QUERY_IDS, k=10)


AUTOCORR_LAGS = (1, 2, 3)


def _q_autocorr(spark, sf_dir):
    """Per-series lag-k autocorrelation (exact BIGINT-grid pair moments)."""
    from simple_tsdb_spark.operators import autocorr

    return autocorr(_events(spark, sf_dir), field="value", lags=AUTOCORR_LAGS, t0=T0, t1=T1)


def _q_daily_pivot(spark, sf_dir):
    from simple_tsdb_spark.plans import daily_event_pivot

    return daily_event_pivot(spark, sf_dir)


def _q_revenue_rollup(spark, sf_dir):
    from simple_tsdb_spark.plans import revenue_rollup

    return revenue_rollup(spark, sf_dir)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Rotation (round 14): the driver gates the FIRST 50 entries in
        # dict order.  Head-50 this round (VERDICT r13 "Next round" #1):
        #   1. u64_decimal_sum — NEW this round (no evidence yet);
        #   2. all 40 queries whose newest driver evidence is r11
        #      (integrate_points .. burn_rate_alerts);
        #   3. the 9 oldest r12-evidence queries (asof_join .. token_counts).
        # Tail: the remaining r12 block, then the r13-green block.
        # After r14 no query's newest driver evidence is older than r12.
        "u64_decimal_sum": _q_u64_decimal_sum,  # NEW r14: full-range u64 (DECIMAL(20,0)) windowed sum
        "integrate_points": _q_integrate,
        "tare": _q_tare,
        "difference": _q_difference,
        "derivative": _q_derivative,
        "counter_rate": _q_counter_rate,
        "repetition_stats": _q_repetition_stats,  # Gopher-style repetition signals
        "boilerplate_spans": _q_boilerplate_spans,  # C4-style span df profile
        "knn_ivf_pq": _q_knn_ivf_pq,  # product-quantized ADC search
        "pq_encode": _q_pq_encode,  # PQ index build (codes as string)
        "tfidf_topk": _q_tfidf_topk,  # per-doc top-k TF-IDF terms
        "pii_scrub": _q_pii_scrub,  # email/IP/phone redaction
        "semdedup": _q_semdedup,  # semantic dedup, within-cluster cosine
        "zscore_outliers": _q_zscore_outliers,  # exact-moment anomaly flags
        "exact_substr_spans": _q_exact_substr_spans,  # ExactSubstr dup regions
        "dsir_weights": _q_dsir_weights,  # DSIR hashed-ngram importance weights
        "simhash_band_dedup": _q_simhash_band_dedup,  # streaming twin, batch form
        "ngram_lm_score": _q_ngram_lm,  # bigram-LM xent quality filter (CCNet shape)
        "dup_ngram_chars": _q_dup_ngram_chars,  # Gopher repetition rule (dup n-gram chars)
        "char_entropy": _q_char_entropy,  # Shannon char entropy (gibberish signal)
        "winnowing": _q_winnowing,  # MOSS winnowing fingerprints
        "winnowing_matches": _q_winnowing_matches,  # MOSS cross-doc report
        "kmeans_clusters": _q_kmeans_clusters,  # quantizer cluster profile
        "cluster_prune": _q_cluster_prune,  # SSL-prototype coreset keep-k
        "mad_outliers": _q_mad_outliers,  # robust MAD anomaly flags
        "lttb": _q_lttb,  # LTTB visual downsample — recursive-CTE oracle
        "cusum": _q_cusum,  # two-sided CUSUM drift detection
        "seasonal": _q_seasonal,  # classical additive decomposition
        "find_gaps": _q_find_gaps,  # missing-data gap detection
        "quantile_points": _q_quantile_points,  # windowed SLO percentiles
        "bollinger": _q_bollinger,  # exact-moment Bollinger bands + breakouts
        "incidents": _q_incidents,  # outlier points -> merged incident intervals
        "holt_linear": _q_holt_linear,  # Holt level+trend — recursive-CTE oracle
        "ivf_stats": _q_ivf_stats,  # IVF list-balance skew audit
        "source_dedup_rate": _q_source_dedup_rate,  # per-source duplication report
        "ngram_novelty": _q_ngram_novelty,  # per-doc novelty vs reference grams
        "event_transitions": _q_event_transitions,  # Markov path analytics
        "session_stats": _q_session_stats,  # per-series session summary (e6/ns integer means)
        "lm_perplexity_buckets": _q_lm_perplexity_buckets,  # CCNet head/middle/tail split
        "funnel_conversion_time": _q_funnel_conversion_time,  # funnel latency distribution
        "burn_rate_alerts": _q_burn_rate_alerts,  # SRE multi-window burn alerts
        "asof_join": _q_asof_join,
        "sessionize": _q_sessionize,
        "moving_avg": _q_moving_avg,
        "histogram": _q_histogram,
        "quantiles": _q_quantiles,
        "distinct_users": _q_distinct_users,
        "mean_fill_linear": _q_mean_fill_linear,
        "ewma": _q_ewma,  # recursive stateful op — recursive-CTE oracle
        "token_counts": _q_token_counts,
        "asof_join_nearest": _q_asof_join_nearest,  # bidirectional nearest sensor fusion
        "active_users": _q_active_users,  # DAU/WAU/stickiness engagement
        "ann_recall": _q_ann_recall,  # recall@k audit: LSH vs exact brute force
        "blob_features": _q_blob_features,  # fake-decoder features, ppm gated final
        "bm25_topk": _q_bm25_topk,  # BM25 keyword retrieval (bm25_munat gated)
        "ccnet_curate": _q_ccnet_curate,  # LM-driven curation chain (CCNet shape)
        "corpus_stats": _q_corpus_stats,  # per-stratum corpus report
        "curate_corpus": _q_curate_corpus,  # end-to-end chain: quality+lang+dedup+split
        "dedup_clusters": _q_dedup_clusters,  # iterative CC — recursive-CTE oracle
        "domain_topk": _q_domain_topk,
        "embedding_dup": _q_embedding_dup,
        "embedding_moments": _q_embedding_moments,  # exact PCA-input moment sums
        "gopher_rules": _q_gopher_rules,  # Gopher A1.1 quality rules + audit stats
        "hash_split": _q_hash_split,
        "knn_brute": _q_knn_brute,
        "knn_ivf": _q_knn_ivf,
        "knn_ivf_trained": _q_knn_ivf_trained,  # trained quantizer, duck-refit oracle
        "knn_lsh": _q_knn_lsh,
        "label_centroids": _q_label_centroids,  # exact class prototypes (2^30 grid)
        "minhash_est_jaccard": _q_minhash_est_jaccard,  # LSH accuracy audit (est vs exact)
        "minhash_lsh": _q_minhash_lsh,
        "mixture_sample": _q_mixture_sample,
        "multimodal_meta": _q_multimodal_meta,
        "nation_balance_share": _q_nation_balance_share,  # Q11 share_ppm + cents
        "near_dup_rate_by_source": _q_near_dup_rate_by_source,  # per-source LSH involvement
        "ngram_containment": _q_ngram_containment,  # asymmetric shingle containment
        "ngram_jaccard": _q_ngram_jaccard,
        "pack_sequences": _q_pack_sequences,
        "pack_stats": _q_pack_stats,  # packing fill-ratio report
        "pmi_topk": _q_pmi_topk,  # collocation mining (integer-µnat PMI)
        "pricing_summary": _q_pricing_summary,
        "quality_filter_pct": _q_quality_filter_pct,  # corpus-adaptive quality gate
        "quality_score": _q_quality_score,
        "revenue_by_nation": _q_revenue_by_nation,
        "simhash_pairs": _q_simhash_pairs,
        "supplier_balance_quartiles": _q_supplier_balance_quartiles,  # cents-x4 exact quartiles
        "temperature_mixture": _q_temperature_mixture,  # n^alpha source-balance sampler
        "top_customers": _q_top_customers,
        "sum_points": _q_sum_points,
        "mean_points": _q_mean_points,
        "minmax_downsample": _q_minmax_downsample,
        "auto_downsample": _q_auto_downsample,  # W5 policy
        "select_points": _q_select_points,
        "select_last": _q_select_last,
        "select_last_per_series": _q_select_last_per_series,
        "count_points": _q_count_points,
        "active_series": _q_active_series,
        "list_series": _q_list_series,
        "bpe_merges": _q_bpe_merges,  # NEW r13: trained tokenizer, duck-refit oracle
        "bpe_token_counts": _q_bpe_token_counts,  # NEW r13: distributed encode (rows-only)
        "knn_ivf_pq_trained": _q_knn_ivf_pq_trained,  # trained PQ codebooks, duck-refit oracle
        "daily_pivot": _q_daily_pivot,
        "revenue_rollup": _q_revenue_rollup,
        "interval_join": _q_interval_join,
        "hybrid_rollup_sum": _q_hybrid_rollup_sum,  # continuous-aggregate read
        "mean_fill_previous": _q_mean_fill_previous,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "decontaminate": _q_decontaminate,  # benchmark n-gram overlap
        "decontaminate_pairs": _q_decontaminate_pairs,  # leak attribution
        "dedup_exact": _q_dedup_exact,
        "topk_ngrams": _q_topk_ngrams,  # corpus top-k word n-grams
        "stratified_split": _q_stratified_split,  # exact-fraction per-stratum holdout
        "dsir_resample": _q_dsir_resample,  # DSIR Gumbel top-k selection step
        "stratified_split3": _q_stratified_split3,  # exact 3-way (valid/test/train)
        "rp_project": _q_rp_project,  # JL sign projection (bit-identical fold)
        "knn_rp": _q_knn_rp,  # two-stage ANN: coarse JL search + exact re-rank
        "quantize_int8": _q_quantize_int8,  # per-dim int8 export quantization
        "keep_best_dedup": _q_keep_best_dedup,  # per-cluster best-copy keeper
        "training_order": _q_training_order,  # epoch shuffle (shard + pos, no global sort)
        "order_priority_counts": _q_order_priority_counts,  # TPC-H Q4 EXISTS semi-join
        "large_volume_customers": _q_large_volume_customers,  # TPC-H Q18 group-HAVING
        "revenue_cube": _q_revenue_cube,  # ROLLUP grouping sets, one shared pass
        "range_moving_avg": _q_range_moving_avg,  # RANGE time-window frame
        "zorder_key": _q_zorder_key,  # Morton layout key (data-skipping write)
        "min_cost_parts": _q_min_cost_parts,  # Q2 correlated-subquery decorrelation
        "corpus_diff": _q_corpus_diff,  # snapshot diff (dataset versioning)
        "doc_chunks": _q_doc_chunks,  # RAG chunking (tail-aligned token windows)
        "hard_negatives": _q_hard_negatives,  # contrastive cross-label neighbor mining
        "autocorr": _q_autocorr,  # per-series lag-k ACF (exact pair moments)
        "forecast_revenue": _q_forecast_revenue,  # TPC-H Q6 scan-pushdown shape
        "cohort_retention": _q_cohort_retention,  # daily cohort × offset matrix
        "event_funnel": _q_event_funnel,  # ordered view→click→purchase funnel
        "knn_range": _q_knn_range,  # cosine radius search (fixed-threshold ANN audit)
        "time_weighted_avg": _q_time_weighted_avg,  # trapezoid time_weight per window
        "hopping_mean": _q_hopping_mean,  # sliding 1d/6h window mean (overlap agg)
        "block_dedup": _q_block_dedup,  # C4-style sub-document block dedup
        "shipping_priority": _q_shipping_priority,  # TPC-H Q3 revenue ranking
        "heatmap": _q_heatmap,  # 2-D time x value-bin heatmap
        "top_values_per_series": _q_top_values_per_series,  # per-series worst offenders
        "normalize_text": _q_normalize_text,  # canonical pre-dedup normalization
    }


# --------------------------------------------------------------------------
# oracle_sql(): DuckDB equivalents
# --------------------------------------------------------------------------

def _sum_cte(w: int) -> str:
    """Windowed-aggregate oracle CTE prefix, parameterized by window."""
    # round_up(T0, w) — precomputed so both engines see the same literal.
    t0a_floor = -(-T0 // w) * w
    return f"""
WITH m AS ({_M}),
tf AS (SELECT series, MIN(time_ns) AS tfirst FROM m GROUP BY series),
starts AS (SELECT series, GREATEST({t0a_floor}, tfirst - tfirst % {w}) AS t0a FROM tf),
data AS (
  SELECT m.series, time_ns - time_ns % {w} AS wstart, value, user_id
  FROM m JOIN starts USING (series)
  WHERE time_ns >= t0a AND time_ns <= {T1}),
agg AS (
  SELECT series, wstart, COUNT(*) AS window_npoints,
         CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum,
         MIN(value) AS value_min, MAX(value) AS value_max,
         COUNT(value) AS value_count,
         CAST(SUM(CAST(user_id AS DECIMAL(28,6))) AS DOUBLE) AS user_id_sum,
         MIN(user_id) AS user_id_min, MAX(user_id) AS user_id_max,
         COUNT(user_id) AS user_id_count
  FROM data GROUP BY series, wstart),
bounds AS (
  SELECT d.series, MIN(s.t0a) AS bfirst, MAX(d.wstart) AS blast
  FROM data d JOIN starts s USING (series) GROUP BY d.series),
spine AS (
  SELECT series, UNNEST(generate_series(bfirst, blast, {w})) AS wstart FROM bounds)
"""


AUTO_INTERVAL_NS = 12 * 3600 * 1_000_000_000  # W5 driver query: 12h windows
AUTO_MAX_POINTS = 500


def _q_auto_downsample(spark, sf_dir):  # W5 — Grafana auto-downsample policy
    from simple_tsdb_spark.operators import auto_downsample

    return auto_downsample(
        _events(spark, sf_dir, t0=None, t1=T1), field="value", t0=T0, t1=T1,
        interval_ns=AUTO_INTERVAL_NS, max_points=AUTO_MAX_POINTS, exact=True,
    )


ROLLUP_BASE_NS = 6 * 3600 * 1_000_000_000  # 6h base buckets; W = 4 bases


def _q_hybrid_rollup_sum(spark, sf_dir):
    """Continuous-aggregate read path end-to-end: materialize the base
    rollup (fresh temp dir), then hybrid-read rollup history + raw tail.
    The result must equal a direct windowed aggregation — which is
    exactly what the DuckDB oracle computes, so the whole rollup
    machinery sits behind the hash gate."""
    import tempfile

    from simple_tsdb_spark.operators import hybrid_sum_points, materialize_rollup

    raw = _events(spark, sf_dir, t0=None, t1=T1)
    rollup_path = tempfile.mkdtemp(prefix="tsdb_rollup_q_") + "/r"
    materialize_rollup(
        spark, raw, rollup_path, fields=["value"], base_window_ns=ROLLUP_BASE_NS, exact=True
    )
    return hybrid_sum_points(
        spark, raw, rollup_path, fields=["value"],
        base_window_ns=ROLLUP_BASE_NS, window_ns=W, t0=T0, t1=T1, exact=True,
    )


def _session_stats_oracle() -> str:
    from simple_tsdb_spark.operators.timeseries import session_stats_oracle

    return session_stats_oracle(_M, gap_ns=SESSION_GAP_NS)


def oracle_sql() -> dict[str, str]:
    sum_cte = _sum_cte(W)
    return {
        "select_points": f"""
SELECT * FROM (
  SELECT event_type AS series, epoch_ns(ts) AS time_ns, value, user_id, event_id
  FROM events
  WHERE event_type = 'click' AND epoch_ns(ts) BETWEEN {T0} AND {T1}
  ORDER BY time_ns, event_id LIMIT 200)
""",
        "select_last": f"""
SELECT * FROM (
  SELECT event_type AS series, epoch_ns(ts) AS time_ns, value, user_id, event_id
  FROM events
  WHERE event_type = 'purchase' AND epoch_ns(ts) BETWEEN {T0} AND {T1}
  ORDER BY time_ns DESC, event_id DESC LIMIT 100)
""",
        "select_last_per_series": f"""
SELECT series, time_ns, value, user_id, event_id FROM (
  SELECT event_type AS series, epoch_ns(ts) AS time_ns, value, user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
  FROM events WHERE epoch_ns(ts) BETWEEN {T0} AND {T1})
WHERE rn <= 25
""",
        "count_points": f"""
SELECT event_type AS series, COUNT(*) AS npoints,
       MIN(epoch_ns(ts)) AS time_first, MAX(epoch_ns(ts)) AS time_last
FROM events WHERE epoch_ns(ts) BETWEEN {T0} AND {T1}
GROUP BY event_type
""",
        "sum_points": sum_cte
        + """
SELECT spine.series, spine.wstart,
       COALESCE(agg.window_npoints, 0) AS window_npoints,
       agg.value_sum, agg.value_min, agg.value_max,
       COALESCE(agg.value_count, 0) AS value_count,
       agg.user_id_sum, agg.user_id_min, agg.user_id_max,
       COALESCE(agg.user_id_count, 0) AS user_id_count
FROM spine LEFT JOIN agg ON spine.series = agg.series AND spine.wstart = agg.wstart
""",
        # u64f: same spine/alignment semantics as sum_points, but over a
        # derived full-range u64 column (every value > 2^63).  DuckDB
        # accumulates in HUGEINT; finals CAST to VARCHAR on both engines
        # (DIVERGENCES §14: no HUGEINT/DECIMAL in gated output).
        "u64_decimal_sum": f"""
WITH m0 AS ({_M}),
m AS (SELECT series, time_ns,
        CAST('9223372036854775808' AS HUGEINT)
        + CAST(user_id AS HUGEINT) * 1000000000000000
        + CAST(event_id AS HUGEINT) AS big
      FROM m0),
tf AS (SELECT series, MIN(time_ns) AS tfirst FROM m GROUP BY series),
starts AS (SELECT series, GREATEST({-(-T0 // W) * W}, tfirst - tfirst % {W}) AS t0a FROM tf),
data AS (
  SELECT m.series, time_ns - time_ns % {W} AS wstart, big
  FROM m JOIN starts USING (series)
  WHERE time_ns >= t0a AND time_ns <= {T1}),
agg AS (
  SELECT series, wstart, COUNT(*) AS window_npoints,
         CAST(SUM(big) AS VARCHAR) AS big_sum,
         CAST(MIN(big) AS VARCHAR) AS big_min,
         CAST(MAX(big) AS VARCHAR) AS big_max,
         COUNT(big) AS big_count
  FROM data GROUP BY series, wstart),
bounds AS (
  SELECT d.series, MIN(s.t0a) AS bfirst, MAX(d.wstart) AS blast
  FROM data d JOIN starts s USING (series) GROUP BY d.series),
spine AS (
  SELECT series, UNNEST(generate_series(bfirst, blast, {W})) AS wstart FROM bounds)
SELECT spine.series, spine.wstart,
       COALESCE(agg.window_npoints, 0) AS window_npoints,
       agg.big_sum, agg.big_min, agg.big_max,
       COALESCE(agg.big_count, 0) AS big_count
FROM spine LEFT JOIN agg ON spine.series = agg.series AND spine.wstart = agg.wstart
""",
        "mean_points": sum_cte
+ """
SELECT spine.series, spine.wstart,
       COALESCE(agg.window_npoints, 0) AS window_npoints,
       CASE WHEN COALESCE(agg.value_count, 0) > 0
            THEN agg.value_sum / agg.value_count END AS value_mean
FROM spine LEFT JOIN agg ON spine.series = agg.series AND spine.wstart = agg.wstart
""",
        # Continuous-aggregate read (rollup history + raw tail) must equal
        # a direct windowed aggregation — the oracle IS that aggregation
        # (agg only: hybrid does not emit empty buckets).
        "hybrid_rollup_sum": _sum_cte(W)
+ """
SELECT series, wstart, window_npoints, value_sum, value_min, value_max, value_count
FROM agg
""",
        # W5: > max_points rows in range at every tested sf, so the policy
        # deterministically picks the 12h windowed mean on both engines.
        "auto_downsample": _auto_downsample_oracle(),
        "mean_fill_previous": sum_cte
+ """
, meanq AS (
  SELECT spine.series, spine.wstart,
         COALESCE(agg.window_npoints, 0) AS window_npoints,
         CASE WHEN COALESCE(agg.value_count, 0) > 0
              THEN agg.value_sum / agg.value_count END AS value_mean
  FROM spine LEFT JOIN agg ON spine.series = agg.series AND spine.wstart = agg.wstart)
SELECT series, wstart, window_npoints,
       last_value(value_mean IGNORE NULLS) OVER (
         PARTITION BY series ORDER BY wstart
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_mean
FROM meanq
""",
        "mean_fill_linear": sum_cte
+ """
, meanq AS (
  SELECT spine.series, spine.wstart,
         COALESCE(agg.window_npoints, 0) AS window_npoints,
         CASE WHEN COALESCE(agg.value_count, 0) > 0
              THEN agg.value_sum / agg.value_count END AS value_mean
  FROM spine LEFT JOIN agg ON spine.series = agg.series AND spine.wstart = agg.wstart),
nbr AS (
  SELECT series, wstart, window_npoints, value_mean,
         last_value(value_mean IGNORE NULLS) OVER wp AS last_v,
         last_value(CASE WHEN value_mean IS NOT NULL THEN wstart END IGNORE NULLS)
             OVER wp AS last_t,
         first_value(value_mean IGNORE NULLS) OVER wn AS next_v,
         first_value(CASE WHEN value_mean IS NOT NULL THEN wstart END IGNORE NULLS)
             OVER wn AS next_t
  FROM meanq
  WINDOW wp AS (PARTITION BY series ORDER BY wstart
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY series ORDER BY wstart
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
SELECT series, wstart, window_npoints,
       CASE WHEN value_mean IS NOT NULL THEN value_mean
            WHEN last_t IS NULL OR next_t IS NULL THEN NULL
            ELSE last_v + (next_v - last_v)
                 * (CAST(wstart - last_t AS DOUBLE) / CAST(next_t - last_t AS DOUBLE))
       END AS value_mean
FROM nbr
""",
        "minmax_downsample": sum_cte
        + """
, wide AS (
  SELECT series, wstart, value_sum, value_min, value_max, value_count,
         CASE WHEN value_count > 0 THEN value_sum / value_count END AS value_mean
  FROM agg)
SELECT series, wstart, stat, value FROM (
  SELECT series, wstart, 'min' AS stat, CAST(value_min AS DOUBLE) AS value FROM wide
  UNION ALL
  SELECT series, wstart, 'max' AS stat, CAST(value_max AS DOUBLE) AS value FROM wide
  UNION ALL
  SELECT series, wstart, 'mean' AS stat, value_mean AS value FROM wide)
WHERE value IS NOT NULL
""",
        "integrate_points": f"""
WITH m AS (
  SELECT event_type AS series, epoch_ns(ts) AS time_ns, value
  FROM events WHERE epoch_ns(ts) BETWEEN {T0} AND {T1}),
t AS (
  SELECT series, time_ns,
         CAST(ROUND(value * 1e6) AS BIGINT) AS vm,
         LAG(CAST(ROUND(value * 1e6) AS BIGINT)) OVER w AS lvm,
         LAG(time_ns) OVER w AS lag_t,
         CASE WHEN value IS NULL THEN 1 ELSE 0 END AS isn,
         CAST(value AS DOUBLE) AS v
  FROM m WINDOW w AS (PARTITION BY series ORDER BY time_ns)),
a AS (
  SELECT series, MIN(time_ns) AS t0_ns, MAX(time_ns) AS t1_ns, COUNT(*) AS npoints,
         SUM(CASE WHEN lag_t IS NOT NULL
                  THEN CAST(COALESCE(vm + lvm, 0) AS HUGEINT) * (time_ns - lag_t)
                  ELSE 0 END) AS s,
         MAX(isn) AS poisoned, MAX(v) AS single
  FROM t GROUP BY series)
SELECT series, t0_ns, t1_ns, npoints,
       CASE WHEN poisoned = 1 THEN NULL
            WHEN npoints = 1 THEN single
            ELSE CAST(s AS DOUBLE) * 0.5e-15 END AS value_integral
FROM a
""",
        "hopping_mean": f"""
WITH m AS ({_M}),
pts AS (
  SELECT series, time_ns, value, time_ns - (time_ns % {HOP_SLIDE_NS}) AS hi
  FROM m WHERE time_ns BETWEEN {T0} AND {T1}),
x AS (
  SELECT series, value,
         UNNEST(generate_series(hi - {W - HOP_SLIDE_NS}, hi, {HOP_SLIDE_NS})) AS wstart
  FROM pts)
SELECT series, wstart, COUNT(*) AS npoints,
       COUNT(value) AS value_count, MIN(value) AS value_min, MAX(value) AS value_max,
       CASE WHEN COUNT(value) > 0
            THEN CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) / COUNT(value) END AS value_mean
FROM x GROUP BY series, wstart
""",
        "time_weighted_avg": f"""
WITH m AS (
  SELECT event_type AS series, epoch_ns(ts) AS time_ns,
         epoch_ns(ts) - (epoch_ns(ts) % {W}) AS wstart, value
  FROM events WHERE epoch_ns(ts) BETWEEN {T0} AND {T1}),
t AS (
  SELECT series, wstart, time_ns,
         CASE WHEN LAG(time_ns) OVER w IS NOT NULL
              THEN CAST(COALESCE(CAST(ROUND(value * 1e6) AS BIGINT)
                                 + LAG(CAST(ROUND(value * 1e6) AS BIGINT)) OVER w, 0) AS HUGEINT)
                   * (time_ns - LAG(time_ns) OVER w)
              ELSE 0 END AS area,
         CASE WHEN value IS NULL THEN 1 ELSE 0 END AS isn,
         CAST(value AS DOUBLE) AS v
  FROM m WINDOW w AS (PARTITION BY series, wstart ORDER BY time_ns)),
a AS (
  SELECT series, wstart, COUNT(*) AS npoints,
         MIN(time_ns) AS t_first, MAX(time_ns) AS t_last,
         SUM(area) AS s, MAX(isn) AS poisoned, MAX(v) AS single
  FROM t GROUP BY series, wstart)
SELECT series, wstart, npoints, t_first, t_last,
       CASE WHEN poisoned = 1 THEN NULL
            WHEN npoints = 1 THEN single
            ELSE CAST(s AS DOUBLE) / CAST(t_last - t_first AS DOUBLE) / 2e6 END AS value_twa
FROM a
""",
        "active_series": f"""
SELECT DISTINCT event_type AS series FROM events
WHERE epoch_ns(ts) BETWEEN {T0} AND {T1}
""",
        "list_series": "SELECT DISTINCT event_type AS series FROM events",
        "tare": f"""
SELECT event_type AS series, epoch_ns(ts) AS time_ns,
       CAST(value - first_value(value IGNORE NULLS) OVER (
              PARTITION BY event_type ORDER BY epoch_ns(ts)
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS value_tare
FROM events
WHERE event_type = 'purchase' AND epoch_ns(ts) BETWEEN {T0} AND {T1}
""",
        "difference": f"""
SELECT event_type AS series, epoch_ns(ts) AS time_ns,
       CAST(value - LAG(value) OVER (PARTITION BY event_type ORDER BY epoch_ns(ts))
            AS DOUBLE) AS value_diff
FROM events WHERE epoch_ns(ts) BETWEEN {T0} AND {T1}
""",
        "derivative": f"""
SELECT event_type AS series, epoch_ns(ts) AS time_ns,
       1.0 * (value - LAG(value) OVER w)
           / ((epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w) / 1e9) AS value_rate
FROM events WHERE epoch_ns(ts) BETWEEN {T0} AND {T1}
WINDOW w AS (PARTITION BY event_type ORDER BY epoch_ns(ts))
""",
        **_timeseries_oracles(),
        **_pipeline_oracles(),
    }


def _timeseries_oracles() -> dict[str, str]:
    from simple_tsdb_spark.operators.timeseries import (
        asof_join_nearest_oracle,
        asof_join_oracle,
        burn_rate_alerts_oracle,
        distinct_count_oracle,
        interval_join_oracle,
        moving_avg_oracle,
        range_moving_avg_oracle,
        zscore_outliers_oracle,
        autocorr_oracle,
        mad_outliers_oracle,
        cusum_changepoints_oracle,
        seasonal_decompose_oracle,
        find_gaps_oracle,
        bollinger_bands_oracle,
        incident_windows_oracle,
        sessionize_oracle,
        value_histogram_oracle,
        value_quantiles_oracle,
    )

    from simple_tsdb_spark.operators.fill import ewma_oracle, holt_linear_oracle
    from simple_tsdb_spark.operators.windowed import lttb_downsample_oracle, quantile_points_oracle
    from simple_tsdb_spark.operators.transforms import counter_rate_oracle
    from simple_tsdb_spark.sources.layout import zorder_key_oracle

    ranged = f"SELECT * FROM ({_M}) WHERE time_ns BETWEEN {T0} AND {T1}"
    return {
        "ewma": ewma_oracle(_M, field="value", alpha=EWMA_ALPHA),
        "holt_linear": holt_linear_oracle(_M, field="value"),
        "counter_rate": counter_rate_oracle(ranged, field="value"),
        "zscore_outliers": zscore_outliers_oracle(ranged, field="value", k=2.0),
        "autocorr": autocorr_oracle(ranged, field="value", lags=AUTOCORR_LAGS),
        "mad_outliers": mad_outliers_oracle(ranged, field="value", k=3.5),
        "lttb": lttb_downsample_oracle(_M, field="value", n_out=50),
        "cusum": cusum_changepoints_oracle(_M, field="value", k=0.5, h=3.0),
        "seasonal": seasonal_decompose_oracle(_M, field="value", period=7),
        "find_gaps": find_gaps_oracle(_M, max_gap_ns=30_000_000_000),
        "quantile_points": quantile_points_oracle(_M, field="value", window_ns=W * 8),
        "bollinger": bollinger_bands_oracle(_M, field="value", n=20, k=2.0),
        "incidents": incident_windows_oracle(_M, field="value", k=2.0, gap_ns=60_000_000_000),
        "asof_join": asof_join_oracle(_M_CLICKS, _M_ERRORS, right_fields=["value"]),
        "asof_join_nearest": asof_join_nearest_oracle(_M_CLICKS, _M_ERRORS, right_fields=["value"], tolerance_ns=NEAREST_TOL_NS),
        "interval_join": interval_join_oracle(
            _M_CLICKS, _M_ERRORS, tol_ns=INTERVAL_TOL_NS, right_fields=["value"]
        ),
        "sessionize": sessionize_oracle(_M, gap_ns=SESSION_GAP_NS),
        "moving_avg": moving_avg_oracle(ranged, field="value", n_points=MAVG_N),
        "range_moving_avg": range_moving_avg_oracle(ranged, field="value", window_ns=RMAVG_W_NS),
        "zorder_key": zorder_key_oracle(
            ranged, ("series", "time_ns"),
            {"series": "string", "time_ns": "numeric"}, id_cols=("event_id",),
        ),
        "histogram": value_histogram_oracle(
            _M, field="value", lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS
        ),
        "quantiles": value_quantiles_oracle(_M, field="value"),
        "distinct_users": distinct_count_oracle(_M, field="user_id"),
    }


def _auto_downsample_oracle() -> str:
    """Replicates W5's driver-side policy DECISION against the oracle
    tables (count probe → raw passthrough vs windowed mean), so the
    branch — and therefore the output schema — matches Spark's on ANY
    corpus.  The real sf dirs always exceed AUTO_MAX_POINTS and take
    the downsample branch; degenerate corpora (fuzz_corpus.py) flip
    both engines to the raw branch together."""
    import os

    import duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")
        n = con.execute(
            f"SELECT COUNT(*) FROM ({_M}) WHERE time_ns BETWEEN {T0} AND {T1}"
        ).fetchone()[0]
    finally:
        con.close()
    if n <= AUTO_MAX_POINTS:
        return f"""
SELECT series, time_ns, value FROM ({_M}) WHERE time_ns BETWEEN {T0} AND {T1}
"""
    return _sum_cte(AUTO_INTERVAL_NS) + """
SELECT spine.series, spine.wstart,
       COALESCE(agg.window_npoints, 0) AS window_npoints,
       CASE WHEN COALESCE(agg.value_count, 0) > 0
            THEN agg.value_sum / agg.value_count END AS value_mean
FROM spine LEFT JOIN agg ON spine.series = agg.series AND spine.wstart = agg.wstart
"""


def _bpe_merges_oracle() -> str:
    """Refit the BPE merges on the DuckDB side (same word table, same
    shared merge loop — bit-identical by construction, see
    pipeline/bpe.py) and emit them as a literal VALUES table."""
    import os

    import duckdb

    from simple_tsdb_spark.pipeline import bpe_train_duck

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        ms = bpe_train_duck(con, n_merges=_BPE_MERGES, top_m=_BPE_TOPM)
    finally:
        con.close()

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    if not ms:  # empty/degenerate corpus: no pairs to merge
        return (
            "-- fit from documents (empty)\n"
            "SELECT CAST(NULL AS INT) AS mrank, CAST(NULL AS VARCHAR) AS lhs, "
            "CAST(NULL AS VARCHAR) AS rhs WHERE FALSE"
        )
    vals = ", ".join(f"({i}, {q(l)}, {q(r)})" for i, (l, r) in enumerate(ms))
    return (
        # the 'documents' mention routes this query into fuzz_corpus's
        # documents-table sweep (it selects on oracle text)
        "-- fit from documents\n"
        f"SELECT mrank, lhs, rhs FROM (VALUES {vals}) AS t(mrank, lhs, rhs) "
        "ORDER BY mrank"
    )


def _bpe_token_counts_oracle() -> str:
    """Read the gated doc slice in DuckDB, refit the merges on DuckDB's
    word table, run the SHARED encode loop, and emit the expected
    counts as a literal VALUES table (see _q_bpe_token_counts)."""
    import os
    import re

    import duckdb

    from simple_tsdb_spark.pipeline.bpe import bpe_train_duck, encode_word

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
        )
        ms = bpe_train_duck(con, n_merges=_BPE_MERGES, top_m=_BPE_TOPM)
        docs = con.execute(
            "SELECT doc_id, text FROM documents WHERE doc_id < 200 ORDER BY doc_id"
        ).fetchall()
    finally:
        con.close()
    ranks = {p: i for i, p in enumerate(ms)}
    ws = re.compile("[ \t\n\r\f\x0b]+")
    vals = []
    for doc_id, text in docs:
        words = [w for w in ws.split(text or "") if w]
        toks = [t for w in words for t in encode_word(w, ranks)]
        vals.append((doc_id, len(words), len(toks), len(set(toks))))
    if not vals:
        return (
            "-- encoded documents slice (empty)\n"
            "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_words, "
            "CAST(NULL AS BIGINT) AS n_tokens, CAST(NULL AS BIGINT) AS n_token_types "
            "WHERE FALSE"
        )
    rows = ", ".join(f"({d}, {w}, {t}, {y})" for d, w, t, y in vals)
    return (
        "-- encoded documents slice\n"
        "SELECT doc_id, n_words, n_tokens, n_token_types FROM "
        f"(VALUES {rows}) AS t(doc_id, n_words, n_tokens, n_token_types) "
        "ORDER BY doc_id"
    )


def _knn_ivf_trained_oracle() -> str:
    """Draw the identical hash-rank training sample in DuckDB and run
    the same driver-local fit (bit-identical to the Spark fit by
    construction — see train_ivf_centroids_sampled_duck) on the
    driver's oracle tables, then emit the standard knn_ivf oracle over
    those literals.  The driver evaluates oracles at sf0.01;
    SPARK_GRAFT_ORACLE_SF lets local check_oracle runs point the fit at
    another sf dir."""
    import os

    import duckdb

    from simple_tsdb_spark.pipeline import train_ivf_centroids_sampled_duck
    from simple_tsdb_spark.pipeline.similarity import knn_ivf_oracle

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        cs = train_ivf_centroids_sampled_duck(con, iters=TRAIN_IVF_ITERS)
    finally:
        con.close()
    return knn_ivf_oracle(query_ids=KNN_QUERY_IDS, k=10, centroids=cs)


def _knn_ivf_pq_trained_oracle() -> str:
    """Draw the identical hash-rank training sample in DuckDB and refit
    the PQ codebooks with the same driver-local fit (bit-identical to
    the Spark fit by construction — see
    train_pq_codebooks_sampled_duck) on the driver's oracle tables,
    then emit the standard knn_ivf_pq oracle over those literals."""
    import os

    import duckdb

    from simple_tsdb_spark.pipeline import train_pq_codebooks_sampled_duck
    from simple_tsdb_spark.pipeline.similarity import knn_ivf_pq_oracle

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'"
        )
        cbs = train_pq_codebooks_sampled_duck(con, iters=TRAIN_PQ_ITERS)
    finally:
        con.close()
    return knn_ivf_pq_oracle(query_ids=KNN_QUERY_IDS, k=10, codebooks=cbs)


def _hash60_duck_entry(expr: str) -> str:
    from simple_tsdb_spark.pipeline.dedup import _hash60_duck

    return _hash60_duck(expr)


def _pipeline_oracles() -> dict[str, str]:
    from simple_tsdb_spark.pipeline.curation import (
        dedup_components_oracle,
        domain_topk_oracle,
        hash_split_oracle,
        corpus_diff_oracle,
        keep_best_dedup_oracle,
        training_order_oracle,
        mixture_sample_oracle,
        pack_sequences_oracle,
        pack_stats_oracle,
        temperature_mixture_oracle,
    )
    from simple_tsdb_spark.pipeline.dedup import (
        block_dedup_oracle,
        embedding_dup_oracle,
        exact_dedup_oracle,
        minhash_est_jaccard_oracle,
        near_dup_rate_by_source_oracle,
        source_dedup_rate_oracle,
        minhash_lsh_oracle,
        minhash_lsh_oracle_parts,
        ngram_jaccard_oracle,
        simhash_band_dedup_oracle,
        simhash_pairs_oracle,
    )
    from simple_tsdb_spark.pipeline.multimodal import (
        attach_blob_meta_oracle,
        blob_features_oracle,
    )
    from simple_tsdb_spark.pipeline.similarity import (
        cluster_prune_oracle,
        embedding_moments_oracle,
        quantize_embeddings_int8_oracle,
        ivf_stats_oracle,
        kmeans_clusters_oracle,
        knn_brute_oracle,
        knn_ivf_oracle,
        range_search_oracle,
        label_centroids_oracle,
        knn_ivf_pq_oracle,
        knn_lsh_oracle,
        pq_encode_oracle,
    )
    from simple_tsdb_spark.pipeline.spans import (
        exact_substr_spans_oracle,
        boilerplate_spans_oracle,
        decontaminate_oracle,
        decontaminate_pairs_oracle,
        ngram_novelty_oracle,
    )
    from simple_tsdb_spark.operators.behavior import (
        active_users_oracle,
        cohort_retention_oracle,
        event_funnel_oracle,
        funnel_conversion_time_oracle,
    )
    from simple_tsdb_spark.operators.timeseries import (
        burn_rate_alerts_oracle,
        heatmap_bins_oracle,
        top_values_per_series_oracle,
    )
    from simple_tsdb_spark.pipeline.curation import ccnet_curate_oracle, curate_corpus_oracle, stratified_split_oracle
    from simple_tsdb_spark.pipeline.dedup import semdedup_oracle
    from simple_tsdb_spark.pipeline.similarity import (
        ann_recall_oracle,
        hard_negatives_oracle,
        knn_rp_oracle,
        rp_project_oracle,
    )
    from simple_tsdb_spark.pipeline.text import (
        bm25_topk_oracle,
        pmi_topk_oracle,
        corpus_stats_oracle,
        lm_perplexity_buckets_oracle,
        doc_chunks_oracle,
        normalize_text_oracle,
        quality_filter_pct_oracle,
        dsir_logweights_oracle,
        topk_ngrams_oracle,
        ngram_lm_score_oracle,
        dsir_resample_oracle,
        gopher_rules_oracle,
        dup_ngram_chars_oracle,
        char_entropy_oracle,
        winnowing_fingerprints_oracle,
        winnowing_matches_oracle,
        pii_scrub_oracle,
        fingerprint_oracle,
        lang_id_oracle,
        quality_score_oracle,
        repetition_stats_oracle,
        tfidf_topk_oracle,
        token_counts_oracle,
    )
    from simple_tsdb_spark.plans.analytics import (
        daily_event_pivot_oracle,
        event_transitions_oracle,
        forecast_revenue_oracle,
        large_volume_customers_oracle,
        min_cost_parts_oracle,
        nation_balance_share_oracle,
        supplier_balance_quartiles_oracle,
        revenue_cube_oracle,
        order_priority_counts_oracle,
        pricing_summary_oracle,
        shipping_priority_oracle,
        revenue_by_nation_oracle,
        revenue_rollup_oracle,
        top_customers_oracle,
    )

    return {
        "topk_ngrams": topk_ngrams_oracle(n=3, k=100),
        "ngram_lm_score": ngram_lm_score_oracle(gated=True),
        "stratified_split": stratified_split_oracle(frac=0.1),
        "curate_corpus": curate_corpus_oracle(),
        "ccnet_curate": ccnet_curate_oracle(frac=0.1),
        "stratified_split3": stratified_split_oracle(fracs={"valid": 0.05, "test": 0.05}),
        "rp_project": rp_project_oracle(),
        "knn_rp": knn_rp_oracle(query_ids=tuple(range(8)), k=10),
        "gopher_rules": gopher_rules_oracle(min_words=20),
        "dup_ngram_chars": dup_ngram_chars_oracle(),
        "char_entropy": char_entropy_oracle(gated=True),
        "dsir_resample": dsir_resample_oracle(target_pred="lang = 'en'", k=50),
        "winnowing": winnowing_fingerprints_oracle(n=4, w=5),
        "winnowing_matches": winnowing_matches_oracle(n=4, w=5, min_shared=2),
        "kmeans_clusters": kmeans_clusters_oracle(),
        "cluster_prune": cluster_prune_oracle(k=CLUSTER_PRUNE_K),
        "tfidf_topk": tfidf_topk_oracle(k=5),
        "bm25_topk": (
            "SELECT * EXCLUDE (bm25) FROM ("
            + bm25_topk_oracle(query_terms=BM25_TERMS, k=20)
            + ")"
        ),
        "pmi_topk": pmi_topk_oracle(k=100, min_count=5),
        "corpus_stats": corpus_stats_oracle(),
        "quality_filter_pct": quality_filter_pct_oracle(pct=0.1),
        "lm_perplexity_buckets": lm_perplexity_buckets_oracle(),
        "normalize_text": normalize_text_oracle(),
        "doc_chunks": doc_chunks_oracle(window=64, stride=48),
        "pii_scrub": pii_scrub_oracle(),
        "semdedup": semdedup_oracle(threshold=SEMDEDUP_THRESHOLD),
        "dsir_weights": dsir_logweights_oracle(target_pred="lang = 'en'"),
        "token_counts": token_counts_oracle(),
        "quality_score": quality_score_oracle(gated=True),
        "lang_id": lang_id_oracle(),
        "fingerprint": fingerprint_oracle(),
        "repetition_stats": repetition_stats_oracle(),
        "decontaminate": decontaminate_oracle(bench_filter=DECONTAM_BENCH_FILTER),
        "decontaminate_pairs": decontaminate_pairs_oracle(bench_filter=DECONTAM_BENCH_FILTER),
        "boilerplate_spans": boilerplate_spans_oracle(),
        "exact_substr_spans": exact_substr_spans_oracle(),
        "dedup_exact": exact_dedup_oracle(),
        "ngram_jaccard": ngram_jaccard_oracle(threshold=JACCARD_THRESHOLD),
        "ngram_containment": ngram_jaccard_oracle(threshold=CONTAINMENT_THRESHOLD, metric="containment"),
        "minhash_lsh": minhash_lsh_oracle(),
        "minhash_est_jaccard": minhash_est_jaccard_oracle(),
        "block_dedup": block_dedup_oracle(),
        "simhash_pairs": simhash_pairs_oracle(max_hamming=SIMHASH_MAX_HAMMING),
        "embedding_dup": embedding_dup_oracle(threshold=EMB_COS_THRESHOLD),
        "dedup_clusters": dedup_components_oracle(minhash_lsh_oracle_parts()),
        "keep_best_dedup": keep_best_dedup_oracle(minhash_lsh_oracle_parts()),
        "ngram_novelty": ngram_novelty_oracle(ref_filter=DECONTAM_BENCH_FILTER),
        "corpus_diff": corpus_diff_oracle(
            "SELECT doc_id, text FROM documents",
            "SELECT doc_id, CASE WHEN b < 10 THEN text || ' v2' ELSE text END AS text "
            "FROM (SELECT doc_id, text, "
            + _hash60_duck_entry("concat('diff-v1:', CAST(doc_id AS VARCHAR))")
            + " % 100 AS b FROM documents) WHERE b < 90",
        ),
        "source_dedup_rate": source_dedup_rate_oracle(),
        "near_dup_rate_by_source": near_dup_rate_by_source_oracle(),
        "training_order": training_order_oracle(),
        "temperature_mixture": (
            "SELECT source, n_docs, n_kept, p_keep_ppm FROM ("
            + temperature_mixture_oracle(target_total=TEMP_TARGET)
            + ") _t"
        ),
        "hash_split": hash_split_oracle(),
        "domain_topk": domain_topk_oracle(k=DOMAIN_TOPK_K),
        "mixture_sample": mixture_sample_oracle(rates=MIXTURE_RATES, default_rate=50),
        "pack_sequences": pack_sequences_oracle(budget=PACK_BUDGET),
        "pack_stats": pack_stats_oracle(budget=PACK_BUDGET),
        "knn_brute": knn_brute_oracle(query_ids=KNN_QUERY_IDS, k=10),
        "hard_negatives": hard_negatives_oracle(query_ids=KNN_QUERY_IDS, k=10),
        "ann_recall": ann_recall_oracle(query_ids=KNN_QUERY_IDS, k=10),
        "knn_range": range_search_oracle(query_ids=KNN_QUERY_IDS, tau=RANGE_TAU),
        "label_centroids": label_centroids_oracle(),
        "embedding_moments": embedding_moments_oracle(bigint_finals=True),
        "quantize_int8": quantize_embeddings_int8_oracle(),
        "ivf_stats": ivf_stats_oracle(),
        "knn_lsh": knn_lsh_oracle(query_ids=KNN_QUERY_IDS, k=10),
        "knn_ivf": knn_ivf_oracle(query_ids=KNN_QUERY_IDS, k=10),
        "knn_ivf_trained": _knn_ivf_trained_oracle(),
        "bpe_merges": _bpe_merges_oracle(),
        "bpe_token_counts": _bpe_token_counts_oracle(),
        "knn_ivf_pq_trained": _knn_ivf_pq_trained_oracle(),
        "knn_ivf_pq": knn_ivf_pq_oracle(query_ids=KNN_QUERY_IDS, k=10),
        "pq_encode": pq_encode_oracle(),
        "simhash_band_dedup": simhash_band_dedup_oracle(max_hamming=SIMHASH_MAX_HAMMING),
        "multimodal_meta": attach_blob_meta_oracle(),
        "blob_features": (
            "SELECT * EXCLUDE (mean_sample) FROM (" + blob_features_oracle() + ")"
        ),
        "pricing_summary": pricing_summary_oracle(),
        "forecast_revenue": forecast_revenue_oracle(),
        "event_transitions": event_transitions_oracle(),
        "shipping_priority": shipping_priority_oracle(),
        "order_priority_counts": order_priority_counts_oracle(),
        "large_volume_customers": large_volume_customers_oracle(),
        "revenue_cube": revenue_cube_oracle(),
        "min_cost_parts": min_cost_parts_oracle(),
        "nation_balance_share": nation_balance_share_oracle(),
        "supplier_balance_quartiles": supplier_balance_quartiles_oracle(),
        "revenue_by_nation": revenue_by_nation_oracle(),
        "top_customers": top_customers_oracle(),
        "daily_pivot": daily_event_pivot_oracle(),
        "revenue_rollup": revenue_rollup_oracle(),
        "cohort_retention": cohort_retention_oracle(_M, period_ns=DAY_NS),
        "active_users": active_users_oracle(_M, period_ns=DAY_NS),
        "funnel_conversion_time": funnel_conversion_time_oracle(_M, steps=list(FUNNEL_STEPS), window_ns=FUNNEL_WINDOW_NS),
        "heatmap": heatmap_bins_oracle(
            _M, field="value", t0=T0, t1=T1, window_ns=W,
            lo=HIST_LO, hi=HIST_HI, nbins=HIST_BINS,
        ),
        "top_values_per_series": top_values_per_series_oracle(
            _M, field="value", k=10, t0=T0, t1=T1, tiebreak="event_id"
        ),
        "burn_rate_alerts": burn_rate_alerts_oracle(
            _M, error_series="error", short_ns=BURN_SHORT_NS, long_ns=BURN_LONG_NS,
            slide_ns=BURN_SLIDE_NS, short_threshold=0.27, long_threshold=0.225,
        ),
        "session_stats": _session_stats_oracle(),
        "event_funnel": event_funnel_oracle(
            _M, steps=list(FUNNEL_STEPS), window_ns=FUNNEL_WINDOW_NS
        ),
    }
