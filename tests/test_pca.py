"""embedding_moments + PCA: exact integer-grid moment sums (numpy
model twin), driver-side eigenfit properties, literal-matrix projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from simple_tsdb_spark.pipeline import embedding_moments, pca_model, pca_project
from simple_tsdb_spark.pipeline.similarity import MOMENT_GRID


def _corpus(n=120, d=8, seed=7, scale=1.0):
    rng = np.random.default_rng(seed)
    # planted dominant direction so PCA has signal
    u = rng.normal(size=d)
    u /= np.linalg.norm(u)
    x = rng.normal(scale=0.05, size=(n, d)) + np.outer(rng.normal(size=n) * 0.8, u)
    x = (x * scale).astype(np.float32)
    return pd.DataFrame(
        {"vec_id": range(n), "embedding": [row.tolist() for row in x]}
    ), x


def _np_moments(x, d):
    # int64 then object: exact Python-int arithmetic in the model
    q = np.floor(x.astype(np.float64) * float(MOMENT_GRID)).astype(np.int64).astype(object)
    n = len(q)
    out = {}
    for i in range(d):
        for j in range(i, d):
            out[(i + 1, j + 1)] = (
                n,
                int(sum(q[:, i])),
                int(sum(q[:, j])),
                int(sum(q[:, i] * q[:, j])),
            )
    return out


def test_moments_match_numpy_model(spark):
    d = 8
    pdf, x = _corpus(d=d)
    got = embedding_moments(spark.createDataFrame(pdf), dim=d).toPandas()
    want = _np_moments(x, d)
    assert len(got) == d * (d + 1) // 2
    for _, r in got.iterrows():
        n, si, sj, sij = want[(r.pos_i, r.pos_j)]
        assert r.n == n
        assert int(r.s_i) == si and int(r.s_j) == sj and int(r.s_ij) == sij


def test_moments_exact_on_large_magnitudes(spark):
    """Magnitudes big enough to force the int64-matmul fallback
    (qmax² > 2^51, i.e. chunked-float64 path impossible) still sum
    exactly — while staying inside the documented qmax²·n < 2^63
    int64 bound."""
    d = 4
    pdf, x = _corpus(n=40, d=d, scale=120.0)  # qmax ~ 2^27 -> qmax^2 ~ 2^54
    got = embedding_moments(spark.createDataFrame(pdf), dim=d).toPandas()
    want = _np_moments(x, d)
    for _, r in got.iterrows():
        n, si, sj, sij = want[(r.pos_i, r.pos_j)]
        assert (int(r.s_i), int(r.s_j), int(r.s_ij)) == (si, sj, sij)


def test_moments_excludes_corrupt_vectors(spark):
    """Corrupt rows (wrong dim, NULL vector, NULL element) are excluded
    from the fold — one bad row must not kill or skew a corpus scan.
    A corpus that is ALL wrong-dim yields zero moment rows."""
    pdf, _ = _corpus(n=10, d=8)
    assert embedding_moments(spark.createDataFrame(pdf), dim=16).count() == 0

    good, x = _corpus(n=20, d=8)
    bad = pd.DataFrame(
        {
            "vec_id": [100, 101, 102],
            "embedding": [None, [1.0] * 4, [1.0] * 7 + [None]],
        }
    )
    mixed = pd.concat([good, bad], ignore_index=True)
    got = embedding_moments(spark.createDataFrame(mixed), dim=8).toPandas()
    want = _np_moments(x, 8)
    assert len(got) == 8 * 9 // 2
    for _, r in got.iterrows():
        n, si, sj, sij = want[(r.pos_i, r.pos_j)]
        assert r.n == n  # the 3 corrupt rows never entered the fold
        assert (int(r.s_i), int(r.s_j), int(r.s_ij)) == (si, sj, sij)


def test_pca_model_properties(spark):
    d = 8
    pdf, x = _corpus(n=200, d=d)
    m = pca_model(embedding_moments(spark.createDataFrame(pdf), dim=d), dim=d)
    w = np.array(m["components"])
    ev = np.array(m["explained_variance"])
    # orthonormal rows
    assert np.allclose(w @ w.T, np.eye(d), atol=1e-9)
    # variance sorted descending, non-negative (up to fp noise)
    assert (np.diff(ev) <= 1e-12).all() and ev[0] > 0
    # matches numpy covariance eigenvalues of the quantized data
    q = np.floor(x.astype(np.float64) * MOMENT_GRID) / MOMENT_GRID
    ref = np.linalg.eigvalsh(np.cov(q, rowvar=False))[::-1]
    assert np.allclose(ev, ref, rtol=1e-9, atol=1e-12)
    # mean matches the quantized-grid mean
    assert np.allclose(m["mean"], q.mean(axis=0), atol=1e-12)
    # planted dominant direction -> strong first component
    assert ev[0] / ev.sum() > 0.5


def test_pca_project_matches_numpy(spark):
    d, k = 8, 3
    pdf, x = _corpus(n=100, d=d)
    sdf = spark.createDataFrame(pdf)
    m = pca_model(embedding_moments(sdf, dim=d), dim=d)
    got = pca_project(sdf, m, k=k).toPandas()
    assert set(got.j) == set(range(k))
    w = np.array(m["components"])[:k]
    want = (x.astype(np.float64) - np.array(m["mean"])) @ w.T
    gm = got.pivot(index="vec_id", columns="j", values="val").to_numpy()
    assert np.allclose(gm, want, atol=1e-9)


def test_pca_model_guards(spark):
    pdf, _ = _corpus(n=1, d=4)
    with pytest.raises(ValueError):
        pca_model(embedding_moments(spark.createDataFrame(pdf), dim=4), dim=4)


# -- ivf_stats ----------------------------------------------------------------


def test_ivf_stats_counts_and_spine(spark):
    """Counts match a direct assignment recount; empty lists appear
    zero-filled; load_factor averages to 1."""
    from simple_tsdb_spark.pipeline import ivf_stats, knn_ivf
    from simple_tsdb_spark.pipeline.similarity import N_LISTS

    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = ivf_stats(df).toPandas().set_index("list_id")
    assert len(got) == N_LISTS  # full spine, empties included
    assert got.n_vecs.sum() == df.count()
    # e6/ppm grids: each entry truncates by < 1, so the sums land
    # within nlist of the exact totals
    assert abs(got.load_factor_e6.sum() / len(got) - 1_000_000) <= len(got)
    assert 1_000_000 - len(got) <= got.frac_ppm.sum() <= 1_000_000
    # cross-check one list's population against the knn_ivf assignment
    # (same projection, so the recount must agree)
    from pyspark.sql import functions as F
    from simple_tsdb_spark.pipeline.similarity import _score_array_spark

    sarr = _score_array_spark("emb", 64, None)
    recount = (
        df.select(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"))
        .withColumn("_s", F.expr(sarr))
        .select(F.expr("array_position(_s, array_max(_s)) - 1").cast("int").alias("l"))
        .groupBy("l").count().toPandas().set_index("l")["count"]
    )
    for lid, n in recount.items():
        assert got.loc[lid, "n_vecs"] == n


# -- int8 quantization ---------------------------------------------------------


def test_quantize_int8_roundtrip_and_bounds(spark):
    """q in [-127,127]; dequantized error <= scale per dim; max-|x|
    element hits ±127; zero-variance dim quantizes to 0/scale 0."""
    from simple_tsdb_spark.pipeline import quantize_embeddings_int8

    d = 4
    pdf = pd.DataFrame(
        {
            "vec_id": range(50),
            "embedding": [
                [float(np.sin(i * 1.3 + j)) if j < 3 else 0.0 for j in range(d)]
                for i in range(50)
            ],
        }
    )
    got = quantize_embeddings_int8(spark.createDataFrame(pdf)).toPandas()
    assert got.q.between(-127, 127).all()
    x = np.array(pdf.embedding.tolist())
    for pos in range(1, d + 1):
        sub = got[got.pos == pos]
        col = x[:, pos - 1]
        maxabs = np.abs(col).max()
        if maxabs == 0:
            assert (sub.q == 0).all() and (sub.scale == 0).all()
            continue
        assert np.allclose(sub.scale, maxabs / 127.0)
        # floor quantization: q*scale within one scale step below x
        deq = sub.sort_values("vec_id").q.to_numpy() * (maxabs / 127.0)
        err = np.sort(col) - np.sort(deq)  # same order stats
        assert np.abs(np.sort(col) - np.sort(deq)).max() <= maxabs / 127.0 + 1e-12
        # the extreme element saturates
        assert sub.q.abs().max() == 127


# -- Arrow IVF assignment fast path -------------------------------------------


def test_assign_lists_arrow_matches_codegen(spark):
    """Zero divergence from the codegen quantizer assignment on the
    real fixtures (sf0.001 AND sf0.01) — the bulk-build contract."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import assign_lists_arrow
    from simple_tsdb_spark.pipeline.similarity import _score_array_spark

    for sf in ("sf0.001", "sf0.01"):
        df = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        sarr = _score_array_spark("emb", 64, None)
        want = (
            df.select(
                "vec_id",
                F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("emb"),
            )
            .withColumn("_s", F.expr(sarr))
            .select(
                "vec_id",
                F.expr("array_position(_s, array_max(_s)) - 1").cast("int").alias("l"),
            )
            .toPandas()
            .set_index("vec_id")["l"]
        )
        got = (
            assign_lists_arrow(df)
            .toPandas()
            .set_index("vec_id")["list_id"]
        )
        assert (got.sort_index() == want.sort_index()).all(), sf
