"""Hypothesis property tests for the pure-math cornerstones — no Spark.

The correctness of simhash_pairs rests on the pigeonhole banding lemma;
windowed aggregation on the integer bucket/rounding algebra; the ewma
oracle on an exact replication of pandas' FP recurrence.  Each is a pure
function, so these run in milliseconds and explore far more cases than
the Spark-level tests can afford.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from simple_tsdb_spark.functions.timeutil import MAX_TIME_NS, clamp_time_range, round_up_ns
from simple_tsdb_spark.pipeline.dedup import _simhash_bands
from simple_tsdb_spark.pipeline.text import SIMHASH_BITS


@given(
    x=st.integers(0, 2**SIMHASH_BITS - 1),
    flips=st.sets(st.integers(0, SIMHASH_BITS - 1), max_size=6),
    max_hamming=st.integers(0, 8),
)
def test_simhash_band_pigeonhole(x, flips, max_hamming):
    """Flipping <= max_hamming bits leaves >= 1 of the max_hamming+1
    bands untouched — the lemma that makes band-bucket candidate
    generation EXACT (no missed pairs) in simhash_pairs."""
    y = x
    for b in flips:
        y ^= 1 << b
    bands = _simhash_bands(max_hamming)
    assert sum(w for _, w in bands) == SIMHASH_BITS  # bands tile the word
    if len(flips) <= max_hamming:
        shared = any(
            (x >> shift) & ((1 << width) - 1) == (y >> shift) & ((1 << width) - 1)
            for shift, width in bands
        )
        assert shared, f"hamming {len(flips)} pair missed by {len(bands)} bands"


@given(t=st.integers(0, MAX_TIME_NS), w=st.integers(1, 2**40))
def test_round_up_ns_algebra(t, w):
    r = round_up_ns(t, w)
    assert r % w == 0 and r >= t and r - t < w


@given(t0=st.integers(0, 2**64), t1=st.integers(0, 2**64))
def test_clamp_time_range_bounds(t0, t1):
    c0, c1 = clamp_time_range(t0, t1)
    assert 0 <= c0 <= MAX_TIME_NS and 0 <= c1 <= MAX_TIME_NS


@given(st.integers(0, 2))
def test_probe_masks_cover_hamming_ball(multiprobe):
    from simple_tsdb_spark.pipeline.similarity import N_PLANES, _probe_masks

    masks = _probe_masks(multiprobe)
    assert len(set(masks)) == len(masks)
    assert all(bin(m).count("1") <= multiprobe for m in masks)
    want = sum(
        len([1 for c in range(2**N_PLANES) if bin(c).count("1") == h])
        for h in range(multiprobe + 1)
    )
    assert len(masks) == want  # the full hamming ball, nothing missing


@settings(deadline=None)
@given(
    vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=300),
    alpha=st.floats(0.01, 0.99),
)
def test_ewma_oracle_recurrence_matches_pandas(vals, alpha):
    """The exact FP recurrence the DuckDB oracle encodes
    (fill.py::ewma_oracle) is bit-identical to pandas
    ewm(adjust=False).mean() — the contract the ewma hash-match rests on."""
    v = np.array(vals, dtype="float64")
    ref = pd.Series(v).ewm(alpha=alpha, adjust=False, ignore_na=True).mean().to_numpy()
    # pandas converts alpha -> com -> effective alpha; replicating that
    # conversion is what makes the recurrence bit-exact for EVERY alpha,
    # not just ones that round-trip (hypothesis found the divergence).
    com = (1.0 - float(alpha)) / float(alpha)
    a = 1.0 / (1.0 + com)
    b = 1.0 - a
    y = np.empty_like(v)
    y[0] = v[0]
    for i in range(1, len(v)):
        p, c = y[i - 1], v[i]
        y[i] = p if p == c else ((b * p) + (a * c)) / (b + a)
    assert np.array_equal(y.view(np.uint64), ref.view(np.uint64))


@settings(deadline=None, max_examples=30)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)),
        min_size=1, max_size=120,
    ),
    alpha=st.floats(0.05, 0.95),
)
def test_ewma_oracle_sql_matches_pandas_with_nulls(vals, alpha):
    """The full DuckDB recursive-CTE oracle (fill.py::ewma_oracle) is
    bit-identical to pandas ewm(adjust=False, ignore_na=True) INCLUDING
    NULL handling (carry-forward, leading NULLs)."""
    import duckdb

    from simple_tsdb_spark.operators.fill import ewma_oracle

    pdf = pd.DataFrame(
        {
            "series": "s",
            "time_ns": np.arange(len(vals), dtype="int64") * 10 + 100,
            "value": pd.array(vals, dtype="Float64"),
        }
    )
    con = duckdb.connect()
    con.register("m_tbl", pdf)
    sql = ewma_oracle("SELECT series, time_ns, value FROM m_tbl", field="value", alpha=alpha)
    got = con.execute(sql + " ORDER BY time_ns").df()["value_ewma"].to_numpy(dtype="float64")
    ref = (
        pd.Series(np.array([np.nan if v is None else v for v in vals], dtype="float64"))
        .ewm(alpha=alpha, adjust=False, ignore_na=True)
        .mean()
        .to_numpy()
    )
    assert np.array_equal(got.view(np.uint64), ref.view(np.uint64), equal_nan=True) or (
        np.array_equal(np.isnan(got), np.isnan(ref))
        and np.array_equal(
            got[~np.isnan(got)].view(np.uint64), ref[~np.isnan(ref)].view(np.uint64)
        )
    )
