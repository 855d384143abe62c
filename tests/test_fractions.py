"""exact_ppm: thresholds used in exact integer cross-multiplied
comparisons must sit on the 1e-6 grid — sub-ppm values raise instead of
silently coarsening firing semantics (ADVICE r10)."""

from __future__ import annotations

import pytest

from simple_tsdb_spark.functions.fractions import exact_ppm


@pytest.mark.parametrize(
    ("x", "ppm"),
    [
        (0.0, 0),
        (0.001, 1_000),
        (0.1, 100_000),
        (0.5, 500_000),
        (0.8, 800_000),
        (1.0, 1_000_000),
        (3.0, 3_000_000),
        (10.0, 10_000_000),
        (0.000001, 1),
    ],
)
def test_exact_ppm_on_grid(x, ppm):
    assert exact_ppm(x) == ppm


@pytest.mark.parametrize("x", [1e-7, 1 / 3, 0.0000015, 2**-20])
def test_exact_ppm_off_grid_raises(x):
    with pytest.raises(ValueError, match="1e-6 grid"):
        exact_ppm(x, name="threshold")


def test_burn_rate_rejects_sub_ppm_threshold(spark):
    """The firing semantics guard end-to-end: a sub-ppm burn-rate
    threshold fails loudly instead of snapping to the grid."""
    from simple_tsdb_spark.operators.timeseries import burn_rate_alerts

    df = spark.createDataFrame(
        [("error", 10**9), ("ok", 2 * 10**9)], "series string, time_ns long"
    )
    with pytest.raises(ValueError, match="short_threshold"):
        burn_rate_alerts(
            df,
            short_ns=10**9,
            long_ns=2 * 10**9,
            slide_ns=10**9,
            short_threshold=1e-7,
            long_threshold=0.001,
        )


def test_gopher_rules_rejects_off_grid_threshold(spark):
    from simple_tsdb_spark.pipeline import gopher_rules

    df = spark.createDataFrame([("d1", "a b c")], "doc_id string, text string")
    with pytest.raises(ValueError, match="min_alpha_frac"):
        gopher_rules(df, min_alpha_frac=1 / 3)
