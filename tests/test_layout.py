"""Z-order layout: data-skipping effectiveness vs a one-dimensional
sort, Morton interleave correctness, and round-trip integrity."""

from __future__ import annotations

import pandas as pd
import pytest

from simple_tsdb_spark.sources import file_overlap_fraction, write_zordered, zvalue


def _grid(n_series=64, n_times=512):
    rows = [
        (f"s{si:03d}", ti * 1_000, float(si * ti % 97))
        for si in range(n_series)
        for ti in range(n_times)
    ]
    return pd.DataFrame(rows, columns=["series", "time_ns", "value"])


def test_morton_interleave_matches_python_model(spark):
    """zvalue on two already-quantized integer columns equals the
    classic bit-interleave (numeric path with lo=0, hi=2^bits-1 is the
    identity quantizer)."""
    bits = 6
    top = (1 << bits) - 1
    pdf = pd.DataFrame(
        [(a, b) for a in (0, 1, 5, top) for b in (0, 2, 31, top)],
        columns=["a", "b"],
    )
    df = spark.createDataFrame(pdf)
    got = df.withColumn("z", zvalue(df, ("a", "b"), bits=bits)).toPandas()

    def morton(a, b):
        z = 0
        for j in range(bits):
            z |= ((a >> j) & 1) << (2 * j) | ((b >> j) & 1) << (2 * j + 1)
        return z

    for _, r in got.iterrows():
        assert r.z == morton(r.a, r.b), (r.a, r.b)


def test_zorder_beats_time_sort_for_series_queries(spark, tmp_path):
    """The whole point: a single-series box query overlaps EVERY file
    of a time-sorted layout but only a small fraction of the z-ordered
    one; time-range pruning stays effective in both."""
    pdf = _grid()
    df = spark.createDataFrame(pdf)
    zpath, tpath = str(tmp_path / "zorder"), str(tmp_path / "timesort")
    write_zordered(df, zpath, cols=("series", "time_ns"), n_files=16)
    (
        df.repartitionByRange(16, "time_ns")
        .sortWithinPartitions("time_ns")
        .write.mode("overwrite")
        .parquet(tpath)
    )

    # round-trip integrity: same rows either way
    assert spark.read.parquet(zpath).count() == len(pdf)
    back = spark.read.parquet(zpath).toPandas().sort_values(
        ["series", "time_ns"], ignore_index=True
    )
    pd.testing.assert_frame_equal(
        back, pdf.sort_values(["series", "time_ns"], ignore_index=True)
    )

    # series point predicate: z-order prunes, time-sort can't
    z_series = file_overlap_fraction(zpath, "series", "s007", "s007")
    t_series = file_overlap_fraction(tpath, "series", "s007", "s007")
    assert t_series == 1.0  # every time-sorted file holds every series
    assert z_series <= 0.5, f"z-order series overlap {z_series}"

    # time range predicate: both layouts prune (z-order keeps time
    # clustering good ENOUGH — within 4x of the perfect 1-D sort)
    lo, hi = 100_000, 140_000
    z_time = file_overlap_fraction(zpath, "time_ns", lo, hi)
    t_time = file_overlap_fraction(tpath, "time_ns", lo, hi)
    assert t_time <= 0.25
    assert z_time <= min(1.0, 4 * t_time + 1 / 16)


def test_zvalue_guards(spark):
    df = spark.createDataFrame(pd.DataFrame({"a": [1], "b": [2]}))
    with pytest.raises(ValueError):
        zvalue(df, ("a", "b"), bits=31)  # 62 bits > 60
    with pytest.raises(ValueError):
        zvalue(df, (), bits=8)
    # empty / all-NULL dimension: clear error, not float(None) TypeError
    empty = spark.createDataFrame([], schema="a long")
    with pytest.raises(ValueError, match="no non-NULL"):
        zvalue(empty, ("a",), bits=8)
    allnull = spark.createDataFrame([(None,), (None,)], schema="a long")
    with pytest.raises(ValueError, match="no non-NULL"):
        zvalue(allnull, ("a",), bits=8)


def test_zvalue_null_dim_clamps_low(spark):
    """A NULL dimension value lands on the low quantum instead of a
    NULL z-value (which repartitionByRange would place arbitrarily)."""
    df = spark.createDataFrame([(None,), (0,), (255,)], schema="a long")
    got = df.withColumn("z", zvalue(df, ("a",), bits=8)).toPandas()
    by_a = {a: z for a, z in zip(got.a, got.z)}
    assert by_a[0] == 0 and by_a[255] == 255
    null_z = got[got.a.isna()].z
    assert (null_z == 0).all() and not null_z.isna().any()


def test_string_ordinal_is_monotone(spark):
    """The base-128 prefix ordinal preserves lexicographic order on
    ASCII strings (ties only past the 7-char prefix) — the property
    that makes string min/max stats prune after z-ordering."""
    import random

    from simple_tsdb_spark.sources.layout import _string_ordinal

    rng = random.Random(7)
    alpha = "abcdefghijklmnopqrstuvwxyz0123456789_-"
    vals = sorted(
        {"".join(rng.choice(alpha) for _ in range(rng.randint(0, 12))) for _ in range(300)}
    )
    df = spark.createDataFrame(pd.DataFrame({"s": vals}))
    got = (
        df.withColumn("o", _string_ordinal("s"))
        .orderBy("s")
        .toPandas()
    )
    o = list(got.o)
    assert all(a <= b for a, b in zip(o, o[1:]))
    # strict where the 7-char prefixes differ
    for (s1, o1), (s2, o2) in zip(got.values, got.values[1:]):
        if s1[:7] != s2[:7]:
            assert o1 < o2, (s1, s2)
