"""Segmented-scan (block-prefix) twins vs the sequential per-series ops.

The segmented ops are the 100×-scale path for a single giant series
(VERDICT r8 structural note): pass 1 folds each time block's affine map
in parallel, the driver combines ~#blocks summary rows, pass 2 re-runs
each block seeded with its carry-in.  The contract is mathematical
equality with accumulated-ulp FP reassociation — verified here with
tight tolerances, and BIT-equality for every row once the decay
underflows (α=0.5 ⇒ (1-α)^n == 0.0 after ~1075 observations).
"""

import math

import pandas as pd
import pytest


def _mk(spark, rows, cols=("series", "time_ns", "value")):
    return spark.createDataFrame(pd.DataFrame(rows, columns=list(cols)))


def test_ewma_segmented_matches_sequential(spark):
    """Multi-series, NULLs, blocks cutting mid-series: values match the
    sequential operator to accumulated-ulp precision."""
    import random

    from simple_tsdb_spark.operators import ewma, ewma_segmented

    rng = random.Random(11)
    rows = []
    for s in ("a", "b"):
        for i in range(500):
            v = None if i % 97 == 3 else rng.gauss(10, 2)
            rows.append((s, i * 10, v))
    rows.append(("lead_null", 0, None))  # leading-NULL-only series
    rows.append(("lead_null", 10, 5.0))
    df = _mk(spark, rows)

    seq = {
        (r.series, r.time_ns): r.value_ewma
        for r in ewma(df, field="value", alpha=0.3).collect()
    }
    seg = {
        (r.series, r.time_ns): r.value_ewma
        for r in ewma_segmented(df, field="value", alpha=0.3, block_ns=730).collect()
    }
    assert set(seq) == set(seg)
    for k, v in seq.items():
        w = seg[k]
        if v is None or (isinstance(v, float) and math.isnan(v)):
            assert w is None or math.isnan(w), k
        else:
            assert w == pytest.approx(v, rel=1e-12, abs=1e-12), k


def test_ewma_segmented_bitexact_after_decay_underflow(spark):
    """α=0.5 decays to exactly 0.0 after ~1075 observations, so every
    block whose carry contribution underflowed emits bit-identical
    values to the sequential op."""
    import random

    from simple_tsdb_spark.operators import ewma, ewma_segmented

    rng = random.Random(5)
    rows = [("s", i, rng.gauss(0, 1)) for i in range(6000)]
    df = _mk(spark, rows)
    seq = {
        r.time_ns: r.value_ewma for r in ewma(df, field="value", alpha=0.5).collect()
    }
    seg = {
        r.time_ns: r.value_ewma
        for r in ewma_segmented(df, field="value", alpha=0.5, block_ns=2000).collect()
    }
    # rows ≥ 1100 into each 2000-row block: carry influence is exactly 0
    exact = [t for t in seq if (t % 2000) >= 1100]
    assert len(exact) > 2000
    for t in exact:
        assert seg[t] == seq[t]
    # and the rest still agree to accumulated-ulp precision
    for t in seq:
        assert seg[t] == pytest.approx(seq[t], rel=1e-12, abs=1e-12)


def test_holt_segmented_matches_sequential(spark):
    """Holt level+trend: block-prefix results match the sequential loop;
    NULL rows dropped identically; single-block series exactly equal."""
    import random

    from simple_tsdb_spark.operators import holt_linear, holt_segmented

    rng = random.Random(3)
    rows = []
    for s in ("x", "y"):
        for i in range(400):
            v = None if i % 83 == 7 else 0.05 * i + rng.gauss(0, 1)
            rows.append((s, i * 10, v))
    rows += [("tiny", 0, 1.0), ("tiny", 10, 2.0)]  # fits one block
    df = _mk(spark, rows)

    seq = {
        (r.series, r.time_ns): (r.level, r.trend)
        for r in holt_linear(df, field="value", alpha=0.5, beta=0.3).collect()
    }
    seg = {
        (r.series, r.time_ns): (r.level, r.trend)
        for r in holt_segmented(
            df, field="value", alpha=0.5, beta=0.3, block_ns=970
        ).collect()
    }
    assert set(seq) == set(seg)
    for k, (lv, tv) in seq.items():
        sl, st = seg[k]
        assert sl == pytest.approx(lv, rel=1e-9, abs=1e-9), k
        assert st == pytest.approx(tv, rel=1e-9, abs=1e-9), k
    # a series contained in ONE block takes the init path: bit-equal
    assert seg[("tiny", 0)] == seq[("tiny", 0)]
    assert seg[("tiny", 10)] == seq[("tiny", 10)]


def test_segmented_rejects_bad_block(spark):
    from simple_tsdb_spark.operators import ewma_segmented, holt_segmented

    df = _mk(spark, [("a", 1, 1.0)])
    with pytest.raises(ValueError):
        ewma_segmented(df, field="value", alpha=0.5, block_ns=0)
    with pytest.raises(ValueError):
        holt_segmented(df, field="value", block_ns=-5)
