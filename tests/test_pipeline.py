"""Functional tests for the pipeline extension operators: dedup really
finds planted near-dups, knn_lsh has sane recall vs knn_brute, multimodal
plumbing round-trips and the real-decoder path raises the stub error."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_near_dup_methods_agree(spark, docs):
    # Planted near-dups: jaccard-certified pairs should be mostly
    # rediscovered by minhash-LSH candidates (banding has known recall).
    from simple_tsdb_spark.pipeline import minhash_lsh_pairs, ngram_jaccard_pairs

    true_pairs = {
        (r.a, r.b)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    cand = {(r.a, r.b) for r in minhash_lsh_pairs(docs).collect()}
    assert true_pairs, "expected planted near-dups at jaccard>=0.8"
    recall = len(true_pairs & cand) / len(true_pairs)
    assert recall >= 0.8, f"minhash recall {recall}"


def test_simhash_finds_near_dups(spark, docs):
    from simple_tsdb_spark.pipeline import ngram_jaccard_pairs, simhash_pairs

    true_pairs = {(r.a, r.b) for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()}
    sh = {(r.a, r.b) for r in simhash_pairs(docs, max_hamming=6, block_col="lang").collect()}
    # simhash blocks by lang; only count true pairs in the same lang block
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    blocked_true = {(a, b) for a, b in true_pairs if langs[a] == langs[b]}
    if blocked_true:
        assert len(blocked_true & sh) / len(blocked_true) >= 0.5


def test_knn_lsh_recall(spark, embs):
    from simple_tsdb_spark.pipeline import knn_brute, knn_lsh

    qids = [0, 1, 2, 3, 4]
    brute = knn_brute(embs, query_ids=qids, k=10).toPandas()
    approx = knn_lsh(embs, query_ids=qids, k=10).toPandas()
    # within-bucket results must be a subset of the full ranking by cos
    recalls = []
    for q in qids:
        b = set(brute[brute.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        recalls.append(len(a & b) / 10)
    # random data: bucket holds ~1/256 of corpus, so recall is low —
    # assert the mechanism works (nonempty, ranked subset), not magic.
    assert len(approx) > 0
    assert (approx.groupby("query_id")["rank"].apply(lambda s: list(s) == list(range(1, len(s) + 1)))).all()


def test_knn_ivf_full_probe_equals_brute(spark, embs):
    """Probing every IVF list is exhaustive search: knn_ivf(nprobe=nlist)
    must equal knn_brute row for row — pins quantizer assignment and the
    probe plumbing in one shot."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import knn_brute, knn_ivf
    from simple_tsdb_spark.pipeline.similarity import N_LISTS

    qids = [0, 1, 2, 3, 4]
    brute = knn_brute(embs, query_ids=qids, k=10).toPandas()
    full = knn_ivf(embs, query_ids=qids, k=10, nprobe=N_LISTS).toPandas()
    pd.testing.assert_frame_equal(
        full.sort_values(["query_id", "rank"], ignore_index=True),
        brute.sort_values(["query_id", "rank"], ignore_index=True),
    )
    # partial probe: valid ranked output, subset mechanism sane
    part = knn_ivf(embs, query_ids=qids, k=10, nprobe=4).toPandas()
    assert len(part) > 0
    assert (
        part.groupby("query_id")["rank"].apply(lambda s: list(s) == list(range(1, len(s) + 1)))
    ).all()


def test_ngram_containment_vs_jaccard(spark):
    """Containment catches a short doc quoted inside a long one where
    Jaccard stays low; both metrics agree with a python set model."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import ngram_jaccard_pairs

    quote = "the quick brown fox jumps over the lazy dog again and again"
    filler = " ".join(f"filler{i:03d} word{i:03d}" for i in range(60))
    docs = [(1, quote), (2, quote + " " + filler)]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))

    cont = ngram_jaccard_pairs(df, threshold=0.5, metric="containment", max_df=10**6).toPandas()
    jac = ngram_jaccard_pairs(df, threshold=0.0, metric="jaccard", max_df=10**6).toPandas()
    assert len(cont) == 1 and len(jac) == 1

    def shset(t):
        return {t[i : i + 8] for i in range(max(len(t) - 7, 1))}

    a, b = shset(docs[0][1]), shset(docs[1][1])
    inter = len(a & b)
    assert cont.containment_ppm.iloc[0] == (10**6 * inter) // min(len(a), len(b))
    assert jac.jaccard_ppm.iloc[0] == (10**6 * inter) // len(a | b)
    # the whole point: containment ≈ 1, jaccard diluted by the filler
    assert cont.containment_ppm.iloc[0] > 950_000
    assert jac.jaccard_ppm.iloc[0] < 500_000


def test_block_dedup_model(spark):
    """block_dedup vs a python keep-first model on a tiny corpus with a
    planted repeated block, including ragged tails and a fully-dup doc."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import block_dedup

    blk = "w0 w1 w2 w3"  # block_words=4 for the test
    docs = [
        (1, f"{blk} a b c d tail1 tail2"),   # blocks: blk | "a b c d" | "tail1 tail2"
        (2, f"{blk} x y z q"),               # blk dup of doc1 → dropped
        (3, blk),                            # entirely dup → kept_text ''
        (4, "a b c d e f g h"),              # "a b c d" dup of doc1
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = block_dedup(df, block_words=4).toPandas().set_index("doc_id")

    seen: set[str] = set()
    want = {}
    for d, t in docs:
        ws = t.split(" ")
        blocks = [" ".join(ws[i : i + 4]) for i in range(0, len(ws), 4)]
        kept = []
        for b in blocks:
            if b not in seen:
                seen.add(b)
                kept.append(b)
        want[d] = (len(blocks), len(kept), " ".join(kept))
    for d, (nb, nk, txt) in want.items():
        row = got.loc[d]
        assert (row.n_blocks, row.n_kept, row.kept_text) == (nb, nk, txt), d


def test_minhash_est_jaccard_audit(spark, docs):
    """est/exact audit columns recompute correctly: the exact jaccard
    matches a Python set model over the same stride-4 shingles, the
    estimate is matches/16 ∈ [0,1], and err = est − exact."""
    from simple_tsdb_spark.pipeline import minhash_est_jaccard
    from simple_tsdb_spark.pipeline.dedup import MINHASH_STRIDE, SHINGLE_LEN

    out = minhash_est_jaccard(docs).toPandas()
    assert len(out) > 0
    assert ((out.est_jaccard_ppm >= 0) & (out.est_jaccard_ppm <= 10**6)).all()
    np.testing.assert_array_equal(
        out.err_ppm.to_numpy(), (out.est_jaccard_ppm - out.jaccard_ppm).to_numpy()
    )
    texts = {r.doc_id: r.text for r in docs.collect()}

    def shset(t):
        n = max(len(t) - SHINGLE_LEN + 1, 1)
        return {t[i : i + SHINGLE_LEN] for i in range(0, n, MINHASH_STRIDE)}

    for r in out.itertuples():
        a, b = shset(texts[r.a]), shset(texts[r.b])
        want = (10**6 * len(a & b)) // len(a | b)
        assert r.jaccard_ppm == want, (r.a, r.b)


def test_range_search_matches_brute_threshold(spark, embs):
    """range_search(tau) must equal the >=tau slice of the full brute
    ranking — same cosine fold, threshold instead of top-k — and every
    returned cosine must clear the bar."""
    from simple_tsdb_spark.pipeline import knn_brute, range_search

    qids = [0, 1, 2, 3, 4]
    tau = 0.25
    hits = range_search(embs, query_ids=qids, tau=tau).toPandas()
    assert (hits["cos"] >= tau).all()
    # brute with k = corpus size is the exhaustive ranking; its >=tau
    # slice must be exactly the range result (same pairs, same cosines).
    n = embs.count()
    brute = knn_brute(embs, query_ids=qids, k=n).toPandas()
    want = brute[brute["cos"] >= tau][["query_id", "neighbor_id", "cos"]]
    got = hits[["query_id", "neighbor_id", "cos"]]
    key = ["query_id", "neighbor_id"]
    pd.testing.assert_frame_equal(
        got.sort_values(key, ignore_index=True),
        want.sort_values(key, ignore_index=True),
    )


def test_exact_dedup_counts(spark, docs):
    from simple_tsdb_spark.pipeline import exact_dedup

    total = docs.count()
    groups = exact_dedup(docs)
    assert groups.groupBy().sum("n_copies").first()[0] == total


def test_lang_id_deterministic(spark, docs):
    from simple_tsdb_spark.pipeline import lang_id

    a = lang_id(docs).toPandas().sort_values("doc_id", ignore_index=True)
    b = lang_id(docs).toPandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a.lang_pred) <= {"de", "en", "es", "fr", "zh", "und"}


def test_multimodal_roundtrip(spark, docs):
    from simple_tsdb_spark.pipeline import attach_blob, extract_blob_features

    blobs = attach_blob(docs)
    feats = extract_blob_features(blobs).toPandas()
    src = docs.select("doc_id", "text").toPandas()
    merged = feats.merge(src, on="doc_id")
    # n_bytes round-trips through the binary payload
    assert (merged.n_bytes == merged.text.str.encode("utf-8").str.len()).all()
    # deterministic fake decoder: width/height derived from byte length
    assert (merged.width == merged.n_bytes % 64 + 1).all()
    assert merged.mean_sample.between(0, 1).all()


def test_real_decoder_is_stubbed(spark, docs):
    from simple_tsdb_spark.pipeline import attach_blob, extract_blob_features
    from simple_tsdb_spark.pipeline.multimodal import DecoderNotAvailable

    blobs = attach_blob(docs.limit(2))
    with pytest.raises(Exception) as exc:
        extract_blob_features(blobs, use_real_decoder=True).collect()
    assert "DecoderNotAvailable" in str(exc.value) or "no decoder" in str(exc.value)


def test_embedding_dup_symmetric_bound(spark, embs):
    from simple_tsdb_spark.pipeline import embedding_dup_pairs

    pairs = embedding_dup_pairs(embs, threshold=0.3).toPandas()
    assert (pairs.a < pairs.b).all()
    assert pairs.cos.between(-1, 1).all()


def test_resize_and_frame_sample(spark, docs):
    import hashlib

    from simple_tsdb_spark.pipeline import attach_blob, resize_images, sample_frames

    blobs = attach_blob(docs.limit(10))
    rs = resize_images(blobs, width=32, height=32).toPandas()
    assert len(rs) == 10 and (rs.out_width == 32).all()
    src = docs.limit(10).select("doc_id", "text").toPandas()
    m = rs.merge(src, on="doc_id")
    want = [
        hashlib.md5(t.encode() + b":32x32").hexdigest() for t in m.text
    ]
    assert list(m.resized_md5) == want

    fr = sample_frames(blobs, every_n_bytes=64, max_frames=4).toPandas()
    assert fr.groupby("doc_id").frame_idx.max().max() <= 3
    assert (fr.frame_offset == fr.frame_idx * 64).all()


def test_train_ivf_centroids_improves_quantizer(spark, embs):
    """Lloyd's refinement must (a) keep the literal-oracle contract —
    Spark knn_ivf with trained centroids equals the DuckDB oracle built
    from the SAME literals — and (b) not hurt recall vs knn_brute
    compared to the default pseudo-centroids."""
    import duckdb

    from simple_tsdb_spark.pipeline import (
        default_centroids,
        knn_brute,
        knn_ivf,
        train_ivf_centroids,
    )
    from simple_tsdb_spark.pipeline.similarity import knn_ivf_oracle

    trained = train_ivf_centroids(embs, iters=2)
    assert len(trained) == len(default_centroids())
    assert trained != default_centroids()  # it actually moved

    qids = (0, 1, 2)
    got = (
        knn_ivf(embs, query_ids=qids, k=5, centroids=trained)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    want = (
        con.execute(knn_ivf_oracle(query_ids=qids, k=5, centroids=trained))
        .df()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert list(got.neighbor_id) == list(want.neighbor_id)
    assert np.allclose(got.cos, want.cos)

    def recall(centroids):
        truth = {
            (r.query_id, r.neighbor_id)
            for r in knn_brute(embs, query_ids=qids, k=5).collect()
        }
        approx = {
            (r.query_id, r.neighbor_id)
            for r in knn_ivf(embs, query_ids=qids, k=5, centroids=centroids).collect()
        }
        return len(truth & approx) / len(truth)

    assert recall(trained) >= recall(None) - 0.15  # no recall collapse


def test_embedding_dup_trained_centroids_oracle_exact(spark, embs):
    """Trained quantizer blocks stay oracle-exact for embedding_dup too
    (the pair set CHANGES with the blocking — both engines must change
    identically)."""
    import duckdb

    from simple_tsdb_spark.pipeline import embedding_dup_pairs, train_ivf_centroids
    from simple_tsdb_spark.pipeline.dedup import embedding_dup_oracle

    cs = train_ivf_centroids(embs, iters=2)
    got = (
        embedding_dup_pairs(embs, threshold=0.3, centroids=cs)
        .toPandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    want = (
        con.execute(embedding_dup_oracle(threshold=0.3, centroids=cs))
        .df()
        .sort_values(["a", "b"], ignore_index=True)
    )
    assert list(got.a) == list(want.a) and list(got.b) == list(want.b)
    assert np.allclose(got.cos, want.cos)


def test_train_ivf_zero_norm_mean_keeps_previous_centroid(spark):
    """A list whose assigned vectors cancel to a ~zero mean must keep its
    previous centroid — a zero centroid would make the quantizer score
    dot/|c| divide by zero (NULL in Spark, inf/nan in DuckDB) and the
    engines' argmax assignment would diverge."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import train_ivf_centroids
    from simple_tsdb_spark.pipeline.similarity import default_centroids

    v = [1.0, 2.0, 3.0, 4.0]
    pdf = pd.DataFrame({"vec_id": [1, 2], "embedding": [v, [-x for x in v]]})
    df = spark.createDataFrame(pdf)
    # nlist=1: both vectors land in list 0 and their mean is exactly zero.
    cs = train_ivf_centroids(df, nlist=1, dim=4, iters=2)
    assert cs == default_centroids(1, 4)


def test_train_ivf_spark_and_duck_fits_identical(spark, embs):
    """The crux of the trained-quantizer hash gate: the Spark fit and the
    DuckDB fit must produce byte-identical centroid literals (exact
    floor-quantized integer accumulation makes both order-independent)."""
    import duckdb

    from simple_tsdb_spark.pipeline import train_ivf_centroids, train_ivf_centroids_duck

    got = train_ivf_centroids(embs, iters=2)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    want = train_ivf_centroids_duck(con, iters=2)
    assert got == want  # exact float equality, not allclose


def test_training_sample_spark_and_duck_identical(spark, embs):
    """The sampled-trainer hash gate rests on both engines drawing the
    SAME hash-rank sample: same rows (md5-of-id rank), same float→double
    widenings, id-sorted — bit-identical arrays."""
    import duckdb

    from simple_tsdb_spark.pipeline import training_sample, training_sample_duck

    got = training_sample(embs, sample_n=100)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    want = training_sample_duck(con, sample_n=100)
    assert got.shape == (100, 64)
    assert np.array_equal(got, want)
    # Oversized cap = the whole corpus (minus zero-norm/NULL-id rows).
    full = training_sample(embs, sample_n=10**9)
    assert full.shape[0] == embs.count()


def test_sampled_fits_spark_and_duck_identical(spark, embs):
    """Trained-quantizer gate, sampled path: Spark-sampled and
    DuckDB-sampled fits must emit byte-identical literals (IVF and PQ),
    because both draw the same sample and share the local Lloyd."""
    import duckdb

    from simple_tsdb_spark.pipeline import (
        train_ivf_centroids_sampled,
        train_ivf_centroids_sampled_duck,
        train_pq_codebooks_sampled,
        train_pq_codebooks_sampled_duck,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    assert train_ivf_centroids_sampled(embs, iters=2) == (
        train_ivf_centroids_sampled_duck(con, iters=2)
    )
    assert train_pq_codebooks_sampled(embs, iters=2) == (
        train_pq_codebooks_sampled_duck(con, iters=2)
    )


def test_sampled_fit_empty_and_degenerate_sample(spark):
    """Zero-norm-only corpora sample to an empty array → both fits keep
    their deterministic inits (the distributed trainers' convention);
    a wrong-dim sample fails loudly."""
    from simple_tsdb_spark.pipeline import (
        fit_ivf_centroids_local,
        fit_pq_codebooks_local,
        training_sample,
    )
    from simple_tsdb_spark.pipeline.similarity import default_centroids, pq_codebooks

    pdf = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [[0.0] * 8, [0.0] * 8]}
    )
    empty = training_sample(spark.createDataFrame(pdf), sample_n=10)
    assert empty.size == 0
    assert fit_ivf_centroids_local(empty, nlist=2, dim=8, iters=2) == (
        default_centroids(2, 8)
    )
    assert fit_pq_codebooks_local(empty, dim=8, m=2, k=4, iters=2) == (
        pq_codebooks(2, 4, 8)
    )
    with pytest.raises(ValueError, match="dim"):
        fit_ivf_centroids_local(np.ones((3, 5)), nlist=2, dim=8, iters=1)


def test_repetition_stats_python_model(spark):
    """Repetition signals vs a direct python recomputation, including the
    looping-boilerplate case and the no-bigram edge."""
    from collections import Counter

    from simple_tsdb_spark.pipeline import repetition_stats

    texts = {
        1: "a b c d e",
        2: "spam spam spam spam",          # one repeated word/bigram
        3: "x y x y x y x y z",            # dominant alternating bigram
        4: "single",                       # no bigrams
        5: "",                             # empty string -> [''] token
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    for i, t in texts.items():
        w = t.split(" ")
        bgs = [f"{w[j]} {w[j+1]}" for j in range(len(w) - 1)]
        top = max(Counter(bgs).values()) if bgs else 0
        r = got[i]
        assert r.n_words == len(w)
        assert r.n_distinct_words == len(set(w))
        assert r.dup_word_frac_ppm == (10**6 * (len(w) - len(set(w)))) // len(w)
        assert r.top_bigram_n == top
        assert r.top_bigram_frac_ppm == ((10**6 * top) // len(bgs) if bgs else 0)
    # sanity: the boilerplate docs score worse than the clean one
    assert got[2].dup_word_frac_ppm > got[1].dup_word_frac_ppm
    assert got[3].top_bigram_frac_ppm > got[1].top_bigram_frac_ppm


@pytest.mark.soak
def test_pq_trained_fits_identical_and_oracle_exact(spark, embs):
    """IVF-PQ with TRAINED codebooks + trained coarse centroids: the
    Spark and DuckDB per-subspace Lloyd's fits must emit byte-identical
    codebooks, and the full ADC query must hash-match the oracle built
    from the same literals."""
    import duckdb

    from simple_tsdb_spark.pipeline import (
        knn_ivf_pq,
        train_ivf_centroids,
        train_pq_codebooks,
        train_pq_codebooks_duck,
    )
    from simple_tsdb_spark.pipeline.similarity import knn_ivf_pq_oracle, pq_codebooks

    cbs = train_pq_codebooks(embs, iters=2)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    assert cbs == train_pq_codebooks_duck(con, iters=2)  # exact float equality
    assert cbs != pq_codebooks()  # it actually moved

    cs = train_ivf_centroids(embs, iters=2)
    qids = (0, 1, 2)
    got = (
        knn_ivf_pq(embs, query_ids=qids, k=5, codebooks=cbs, centroids=cs)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    want = (
        con.execute(knn_ivf_pq_oracle(query_ids=qids, k=5, codebooks=cbs, centroids=cs))
        .df()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert list(got.neighbor_id) == list(want.neighbor_id)
    assert np.allclose(got.adist, want.adist)


def test_pq_training_improves_recall(spark, embs):
    """Trained codebooks+centroids must beat the deterministic defaults
    on recall@10 vs exact brute force (everything is deterministic, so
    this is a stable regression bound, not a flaky ML assertion)."""
    from simple_tsdb_spark.pipeline import (
        knn_brute,
        knn_ivf_pq,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    qids = (0, 1, 2, 3, 4)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in knn_brute(embs, query_ids=qids, k=10).collect()
    }

    def recall(codebooks, centroids):
        hits = {
            (r.query_id, r.neighbor_id)
            for r in knn_ivf_pq(
                embs, query_ids=qids, k=10, codebooks=codebooks, centroids=centroids
            ).collect()
        }
        return len(truth & hits) / len(truth)

    r_default = recall(None, None)
    r_trained = recall(train_pq_codebooks(embs, iters=2), train_ivf_centroids(embs, iters=2))
    assert r_trained > r_default
    assert r_trained >= 0.2  # measured 0.26 on this fixture — pinned floor


def test_pq_encode_shape_and_determinism(spark, embs):
    from simple_tsdb_spark.pipeline import pq_encode
    from simple_tsdb_spark.pipeline.similarity import PQ_K, PQ_M

    codes = pq_encode(embs.limit(50)).toPandas()
    assert len(codes) == 50
    assert all(len(c) == PQ_M for c in codes.codes)
    assert all(0 <= v < PQ_K for c in codes.codes for v in c)
    again = pq_encode(embs.limit(50)).toPandas()
    assert list(map(list, codes.codes)) == list(map(list, again.codes))


def test_decontaminate_python_model(spark):
    """Flagged docs and overlap counts vs a direct python n-gram model."""
    from simple_tsdb_spark.pipeline import decontaminate

    bench_texts = {100: "a b c d e f", 101: "q r s t"}
    corpus_texts = {
        1: "x a b c d y",        # shares 4-gram "a b c d"
        2: "a b c d e f g",      # shares 3 distinct 4-grams with doc 100
        3: "z z z z z",          # clean
        4: "q r s t",            # exact benchmark copy, 1 shared 4-gram
    }
    mk = lambda d: spark.createDataFrame(
        pd.DataFrame({"doc_id": list(d), "text": list(d.values())})
    )
    got = {r.doc_id: r.n_overlap for r in
           decontaminate(mk(corpus_texts), mk(bench_texts), n=4).collect()}

    def grams(t, n=4):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    bench = set().union(*(grams(t) for t in bench_texts.values()))
    want = {
        i: len(grams(t) & bench)
        for i, t in corpus_texts.items()
        if grams(t) & bench
    }
    assert got == want and 3 not in got


def test_boilerplate_spans_python_model(spark):
    """Span df profile vs a python model: cross-document spans only."""
    from simple_tsdb_spark.pipeline import boilerplate_spans

    texts = {
        1: "a b c d",        # k=2 spans: "a b", "c d"
        2: "a b x y",        # shares "a b" with doc 1
        3: "c d c d",        # "c d" twice in ONE doc + doc 1 -> dup by df
        4: "solo",           # single partial span, unique
    }
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    )
    got = {r.doc_id: r for r in boilerplate_spans(df, k=2).collect()}

    spans = {i: [" ".join(t.split(" ")[j:j + 2]) for j in range(0, len(t.split(" ")), 2)]
             for i, t in texts.items()}
    docfreq = {}
    for i, ss in spans.items():
        for s in set(ss):
            docfreq[s] = docfreq.get(s, 0) + 1
    for i, ss in spans.items():
        r = got[i]
        assert r.n_spans == len(ss)
        assert r.n_dup_spans == sum(1 for s in ss if docfreq[s] >= 2)
    # doc 3's internal repetition alone must NOT count as boilerplate:
    # "c d" is dup only because doc 1 also has it.
    assert got[3].n_dup_spans == 2
    assert got[4].n_dup_spans == 0


def test_decontaminate_pairs_python_model(spark):
    """Leak attribution (corpus doc, bench doc, shared-gram count) vs a
    direct python model; agreement with the count-only operator."""
    from simple_tsdb_spark.pipeline import decontaminate, decontaminate_pairs

    bench_texts = {100: "a b c d e f", 101: "q r s t", 102: "a b c d"}
    corpus_texts = {
        1: "x a b c d y",        # hits bench 100 AND 102 via "a b c d"
        2: "a b c d e f g",      # 3 grams with 100, 1 with 102
        3: "z z z z z",          # clean
    }
    mk = lambda d: spark.createDataFrame(
        pd.DataFrame({"doc_id": list(d), "text": list(d.values())})
    )
    got = {(r.doc_id, r.bench_id): r.n_shared for r in
           decontaminate_pairs(mk(corpus_texts), mk(bench_texts), n=4).collect()}

    def grams(t, n=4):
        w = t.split(" ")
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}

    want = {}
    for ci, ct in corpus_texts.items():
        for bi, bt in bench_texts.items():
            shared = grams(ct) & grams(bt)
            if shared:
                want[(ci, bi)] = len(shared)
    assert got == want
    assert got[(1, 100)] == 1 and got[(1, 102)] == 1 and got[(2, 100)] == 3

    # per-doc distinct-gram counts agree with the count-only operator
    counts = {r.doc_id: r.n_overlap for r in
              decontaminate(mk(corpus_texts), mk(bench_texts), n=4).collect()}
    for ci in counts:
        union = set()
        for bi, bt in bench_texts.items():
            union |= grams(corpus_texts[ci]) & grams(bt)
        assert counts[ci] == len(union)


def test_train_cache_modes_fit_identical(spark, embs):
    """cache='local' | 'disk' | None must fit byte-identical literals —
    the materialization policy is a storage trade, never a result
    change (the quantized sums are partitioning-independent)."""
    from simple_tsdb_spark.pipeline import train_ivf_centroids, train_pq_codebooks

    base_c = train_ivf_centroids(embs, iters=2, cache="local")
    assert train_ivf_centroids(embs, iters=2, cache="disk") == base_c
    assert train_ivf_centroids(embs, iters=2, cache=None) == base_c

    base_p = train_pq_codebooks(embs, iters=1, cache="local")
    assert train_pq_codebooks(embs, iters=1, cache="disk") == base_p
    assert train_pq_codebooks(embs, iters=1, cache=None) == base_p

    import pytest as _pytest

    with _pytest.raises(ValueError):
        train_ivf_centroids(embs, iters=1, cache="ram")


def test_ngram_jaccard_arrow_shingles_identical(spark, docs):
    """shingles='arrow' (pandas_udf distinct sets) must produce the
    exact result of the default exploded-stream plan — it is a measured
    alternative (a wash at sf0.1, see ROADMAP), kept as an option for
    corpora where Python slicing beats codegen substring."""
    from simple_tsdb_spark.pipeline import ngram_jaccard_pairs

    a = sorted(
        (r.a, r.b, r.jaccard_ppm)
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    )
    b = sorted(
        (r.a, r.b, r.jaccard_ppm)
        for r in ngram_jaccard_pairs(docs, threshold=0.5, shingles="arrow").collect()
    )
    assert a == b and len(a) > 0


def test_lm_perplexity_buckets(spark, docs):
    """Tercile split: labels consistent with the emitted thresholds,
    bucket sizes within one doc of N/3, thresholds equal numpy terciles
    of the scored xents."""
    import numpy as np

    from simple_tsdb_spark.pipeline import lm_perplexity_buckets, ngram_lm_score

    got = lm_perplexity_buckets(docs).toPandas()
    xs = sorted(
        ngram_lm_score(docs).toPandas().xent_munat.dropna().astype(int)
    )
    m = len(xs) - 1
    want_thr = []
    for j in (1, 2):
        k, fr = (m * j) // 3, (m * j) % 3
        want_thr.append(3 * xs[k] + fr * (xs[min(k + 1, m)] - xs[k]))
    assert int(got.t_head_x3.iloc[0]) == want_thr[0]
    assert int(got.t_middle_x3.iloc[0]) == want_thr[1]
    lab = got.dropna(subset=["xent_munat"])
    assert (
        lab.bucket
        == np.where(3 * lab.xent_munat <= lab.t_head_x3, "head",
                    np.where(3 * lab.xent_munat <= lab.t_middle_x3, "middle", "tail"))
    ).all()
    counts = lab.bucket.value_counts()
    n = len(lab)
    for b in ("head", "middle", "tail"):
        assert abs(counts[b] - n / 3) <= 2, counts


def test_corpus_stats_model(spark, docs):
    """corpus_stats vs pandas groupby recomputation (counts, totals,
    unrounded mean, interpolated median)."""
    from simple_tsdb_spark.pipeline import corpus_stats

    got = corpus_stats(docs).toPandas()
    pdf = docs.toPandas()
    pdf["nt"] = pdf.text.str.split(" ").str.len()
    pdf["nc"] = pdf.text.str.len()
    want = pdf.groupby(["lang", "source"]).agg(
        n_docs=("nt", "size"),
        total_tokens=("nt", "sum"),
        total_chars=("nc", "sum"),
        median_chars=("nc", "median"),
    )
    assert len(got) == len(want)
    for r in got.itertuples():
        wr = want.loc[(r.lang, r.source)]
        assert r.n_docs == wr.n_docs and r.total_tokens == wr.total_tokens
        assert r.total_chars == wr.total_chars
        assert r.median_chars_x2 == int(2 * wr.median_chars)
        assert r.mean_tokens_e6 == (10**6 * wr.total_tokens) // wr.n_docs


def test_quality_filter_pct(spark, docs):
    """The adaptive gate keeps ~(1-pct) of docs; flags are consistent
    with the emitted ×10^6 threshold; the threshold equals the exact
    type-7 interpolated order statistic on the quality_ppm grid."""
    from simple_tsdb_spark.pipeline import quality_filter_pct, quality_score

    got = quality_filter_pct(docs, pct=0.2).toPandas()
    q = sorted(quality_score(docs).toPandas().quality_ppm.astype(int))
    n, pm = len(q), 200_000
    idx = (n - 1) * pm
    k, fr = idx // 1_000_000, idx % 1_000_000
    xk, xk1 = q[k], q[min(k + 1, n - 1)]
    thr = 1_000_000 * xk + fr * (xk1 - xk)
    assert int(got.threshold_x1m.iloc[0]) == thr
    assert (got.keep == (1_000_000 * got.quality_ppm >= got.threshold_x1m)).all()
    frac = got.keep.mean()
    assert 0.75 <= frac <= 0.85  # ~80% kept at pct=0.2 (ties can shift it)


def test_pmi_topk_python_model(spark):
    """pmi_topk vs a python recomputation on a tiny corpus with a planted
    always-together collocation (high PMI) and a promiscuous word (low)."""
    import math

    import pandas as pd

    from simple_tsdb_spark.pipeline import pmi_topk

    docs = [
        (1, "san francisco is a city"),
        (2, "san francisco is a port"),
        (3, "a city is a place"),
        (4, "san francisco bay area port"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = pmi_topk(df, k=10, min_count=2).toPandas()

    from collections import Counter

    uni: Counter = Counter()
    bi: Counter = Counter()
    for _, t in docs:
        ws = t.split(" ")
        uni.update(ws)
        bi.update(" ".join(p) for p in zip(ws, ws[1:]))
    n = sum(uni.values())
    want = {}
    for g, cxy in bi.items():
        if cxy < 2:
            continue
        x, y = g.split(" ")
        want[g] = (
            math.floor(1e6 * math.log(cxy * n)) - math.floor(1e6 * math.log(uni[x] * uni[y]))
        )
    order = sorted(want, key=lambda g: (-want[g], g))[:10]
    assert list(got.bigram) == order
    for r in got.itertuples():
        assert r.pmi_munat == want[r.bigram]
    # the planted collocation dominates
    assert got.bigram.iloc[0] == "san francisco"


def test_bm25_topk_python_model(spark):
    """bm25_topk vs a direct python recomputation on a tiny corpus:
    same µnat-quantized idf, same fixed-order scoring; absent terms
    contribute exactly zero and ranking tiebreaks on doc_id."""
    import math

    import pandas as pd

    from simple_tsdb_spark.pipeline import bm25_topk
    from simple_tsdb_spark.pipeline.text import BM25_B, BM25_K1

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry dates"),
        (3, "apple dates eggs eggs eggs"),
        (4, "plum plum plum"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    terms = ["apple", "cherry"]
    got = bm25_topk(df, query_terms=terms, k=4).toPandas()

    from simple_tsdb_spark.pipeline.text import _bm25_rationals

    a, c, p, q = _bm25_rationals(BM25_K1, BM25_B)
    assert (a, c, p, q) == (6, 5, 3, 4)
    words = {d: t.split() for d, t in docs}
    n = len(docs)
    sumdl = sum(len(w) for w in words.values())
    avgdl = sumdl / n
    dfreq = {t: sum(1 for w in words.values() if t in w) for t in terms}
    want = {}
    want_munat = {}
    for d, w in words.items():
        score = 0.0
        munat = 0
        for t in terms:
            tf = w.count(t)
            idfq = math.floor(1e6 * math.log(2 * n + 2)) - math.floor(
                1e6 * math.log(2 * dfreq[t] + 1)
            )
            score += (idfq / 1e6) * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * (len(w) / avgdl))
            )
            munat += (idfq * (a + c) * q * tf * sumdl) // (
                c * q * tf * sumdl + a * (q - p) * sumdl + a * p * len(w) * n
            )
        want[d] = score
        want_munat[d] = munat
    # ranking: integer munat score desc, doc_id asc (the gated order)
    order = sorted(want_munat, key=lambda d: (-want_munat[d], d))
    assert list(got.doc_id) == order
    for r in got.itertuples():
        assert abs(r.bm25 - want[r.doc_id]) < 1e-9
        assert r.bm25_munat == want_munat[r.doc_id]
        assert r.tf_apple == words[r.doc_id].count("apple")
    # doc 4 contains neither term → exactly zero on both grids
    assert got[got.doc_id == 4].bm25.iloc[0] == 0.0
    assert got[got.doc_id == 4].bm25_munat.iloc[0] == 0


def test_tfidf_topk_python_model(spark):
    """tfidf_topk vs a direct python recomputation on a tiny corpus,
    including the mathematically-tied-score case (2·ln3 vs ln9 style)
    falling to the term tiebreak."""
    import math

    import pandas as pd

    from simple_tsdb_spark.pipeline import tfidf_topk

    docs = [
        (1, "apple banana apple cherry"),
        (2, "banana cherry cherry dates"),
        (3, "apple dates eggs eggs eggs"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {
        (r.doc_id, r.rnk): (r.term, r.tf, r.df_term)
        for r in tfidf_topk(df, k=2).collect()
    }

    # python model
    from collections import Counter

    tfs = {d: Counter(t.split()) for d, t in docs}
    dfreq = Counter(term for c in tfs.values() for term in c)
    n = len(docs)
    want = {}
    for d, c in tfs.items():
        scored = sorted(
            (
                (-round(tf * math.log((n + 1) / (dfreq[t] + 1)), 9), t, tf)
                for t, tf in c.items()
            )
        )
        for rnk, (neg, t, tf) in enumerate(scored[:2], start=1):
            want[(d, rnk)] = (t, tf, dfreq[t])
    assert got == want


def test_dsir_logweights_separates_target(spark):
    """DSIR weights: target-slice docs must score higher on average
    than off-target docs (that is the whole point of the method), and a
    doc with no bigram scores exactly 0."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import dsir_logweights

    rows = []
    for i in range(40):
        rows.append((i, "the quick brown fox jumps over the lazy dog", "en"))
    for i in range(40, 80):
        rows.append((i, "le renard brun rapide saute par dessus le chien", "fr"))
    rows.append((80, "singleword", "en"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    got = {r.doc_id: r.logw for r in dsir_logweights(df, target_pred="lang = 'en'").collect()}
    assert len(got) == 81
    en = sum(got[i] for i in range(40)) / 40
    fr = sum(got[i] for i in range(40, 80)) / 40
    assert en > fr
    assert got[80] == 0


def test_semdedup_keep_semantics(spark, embs):
    """semdedup: keep flags are exactly 'no outranking >=threshold
    partner in my cluster' — verified against a direct recomputation
    from the pair list and ranks."""
    from simple_tsdb_spark.pipeline import embedding_dup_pairs, semdedup

    out = semdedup(embs, threshold=0.8).collect()
    by_id = {r.vec_id: r for r in out}
    assert len(by_id) == embs.count()

    pairs = embedding_dup_pairs(embs, threshold=0.8, salt_buckets=4).collect()
    rank = {r.vec_id: (r.centroid_cos, r.vec_id) for r in out}
    expect_dropped = set()
    for p in pairs:
        ra, rb = rank[p.a], rank[p.b]
        if ra < rb:
            expect_dropped.add(p.b)
        else:
            expect_dropped.add(p.a)
    got_dropped = {r.vec_id for r in out if not r.keep}
    assert got_dropped == expect_dropped
    # every doc appears with its cluster assignment
    assert all(r.cluster >= 0 for r in out)


def test_exact_substr_spans_model(spark):
    """exact_substr_spans vs a direct python recomputation: planted
    shared region across two docs, within-doc repeat, merge-vs-split of
    nearby anchors."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import exact_substr_spans

    shared = "one two three four five six seven eight nine ten"
    docs = [
        (1, f"{shared} alpha beta gamma delta epsilon zeta eta theta"),
        (2, f"prefix words here also fill {shared}"),
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w1 w2 w3 w4 w5 w6 w7 w8"),  # self-repeat
        (4, "totally unique words that appear nowhere else at all ok"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_anchors)
        for r in exact_substr_spans(df, n=8).collect()
    }

    # python model with the same rule
    from collections import Counter

    n, gap = 8, 8
    grams = {}
    for d, t in docs:
        w = t.split()
        grams[d] = [(i + 1, " ".join(w[i:i + n])) for i in range(len(w) - n + 1)]
    counts = Counter(g for v in grams.values() for _, g in v)
    want = set()
    for d, v in grams.items():
        pos = [p for p, g in v if counts[g] >= 2]
        if not pos:
            continue
        runs, cur = [], [pos[0]]
        for p in pos[1:]:
            if p - cur[-1] > gap:
                runs.append(cur)
                cur = [p]
            else:
                cur.append(p)
        runs.append(cur)
        for r in runs:
            want.add((d, r[0], r[-1] + n - 1, len(r)))
    assert got == want
    assert any(d == 1 for d, *_ in got) and any(d == 2 for d, *_ in got)
    assert any(d == 3 for d, *_ in got)      # self-repeat counts
    assert not any(d == 4 for d, *_ in got)  # unique doc clean


def test_ngram_arrow_null_text_matches_explode(spark):
    """NULL-text docs: both shingle paths must agree (explode drops
    them; the arrow path now filters them instead of emitting {''})."""
    import pandas as pd
    from pyspark.sql import types as T

    from simple_tsdb_spark.pipeline import ngram_jaccard_pairs

    sch = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), True),
        ]
    )
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [None, None, "shared words run along here fine", "shared words run along here fine"],
        }
    )
    df = spark.createDataFrame(pdf, sch)
    a = sorted((r.a, r.b) for r in ngram_jaccard_pairs(df, threshold=0.5).collect())
    b = sorted(
        (r.a, r.b)
        for r in ngram_jaccard_pairs(df, threshold=0.5, shingles="arrow").collect()
    )
    assert a == b == [(3, 4)]  # the NULL pair must NOT appear


def test_pii_scrub_planted_cross_engine(spark):
    """pii_scrub on planted PII: Spark output must equal the DuckDB
    oracle byte-for-byte (the regexes live in the Java-regex/RE2 common
    subset — this is the test that proves it), and redactions behave."""
    import duckdb
    import pandas as pd

    from simple_tsdb_spark.pipeline import pii_scrub
    from simple_tsdb_spark.pipeline.text import pii_scrub_oracle

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4, 5],
            "text": [
                "contact me at john.doe+x@example.co.uk or 555-867-5309 now",
                "server 192.168.1.254 and 10.0.0.1 ok",
                "no pii here at all",
                "a@b.io plus 123.456.7890",
                "crossover 555-867-5309@weird.example.com case",
            ],
        }
    )
    got = (
        pii_scrub(spark.createDataFrame(pdf))
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(pii_scrub_oracle() + " ORDER BY doc_id").df()
    assert got["clean_text"].tolist() == want["clean_text"].tolist()
    for c in ("n_emails", "n_ips", "n_phones"):
        assert got[c].tolist() == want[c].tolist(), c
    assert got.loc[0, "clean_text"] == "contact me at <EMAIL> or <PHONE> now"
    assert got.loc[1, "clean_text"] == "server <IP> and <IP> ok"
    assert got.loc[2, "clean_text"] == "no pii here at all"


def test_semdedup_sub_planes_cross_engine_and_recall(spark, embs):
    """sub_planes composed block key: Spark must equal the DuckDB oracle
    for the same sub_planes, and EXACT duplicates are always caught
    (identical vectors share every sign bit)."""
    import duckdb
    import pandas as pd

    from simple_tsdb_spark.pipeline import semdedup
    from simple_tsdb_spark.pipeline.dedup import semdedup_oracle

    got = sorted(
        (r.vec_id, r.cluster, r.centroid_cos, r.keep)
        for r in semdedup(embs, threshold=0.9, sub_planes=4).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        "read_parquet('/root/testdata/sf0.001/embeddings.parquet')"
    )
    want = sorted(
        tuple(r) for r in con.execute(semdedup_oracle(threshold=0.9, sub_planes=4)).fetchall()
    )
    assert got == want

    # planted exact duplicates: 100% recall under any sub_planes
    import numpy as np

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 64)).astype("float32")
    vecs[1] = vecs[0]
    vecs[21] = vecs[20]
    pdf = pd.DataFrame(
        {"vec_id": range(40), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    out = {r.vec_id: r.keep for r in semdedup(df, threshold=0.999, sub_planes=6).collect()}
    assert (out[0], out[1]) in ((True, False), (False, True))
    assert (out[20], out[21]) in ((True, False), (False, True))
    assert sum(1 for k in out.values() if not k) == 2


def test_prewarm_compiles_and_warms(spark):
    """prewarm() runs the literal-heavy plans on a 1-row frame and a
    subsequent real query with the same literals is a codegen cache
    hit (asserted indirectly: it returns the warmed-plan count and the
    operators still produce correct output afterwards)."""
    import time

    from simple_tsdb_spark.pipeline import knn_ivf, prewarm

    assert prewarm(spark) == 3
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    t0 = time.time()
    out = knn_ivf(embs, query_ids=(0, 1), k=3).collect()
    assert len(out) > 0
    assert time.time() - t0 < 60


def test_topk_ngrams_python_model(spark):
    """topk_ngrams vs direct python recomputation on a tiny corpus."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import topk_ngrams

    docs = [
        (1, "a b c a b c"),
        (2, "a b c d"),
        (3, "x y"),          # shorter than n: contributes nothing
        (4, "a b c"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {
        r["gram"]: (r["n_occurrences"], r["n_docs"])
        for r in topk_ngrams(df, n=3, k=10).collect()
    }
    # "a b c": docs 1 (x2), 2, 4 -> 4 occurrences over 3 docs
    assert got["a b c"] == (4, 3)
    assert got["b c a"] == (1, 1)
    assert got["b c d"] == (1, 1)
    assert "x y" not in got


def test_winnowing_guarantee_and_model(spark):
    """Winnowing must (a) match a direct python model and (b) satisfy
    the SIGMOD-2003 guarantee: documents sharing a >= w+n-1 word run
    share at least one fingerprint."""
    import hashlib

    import pandas as pd

    from simple_tsdb_spark.pipeline import winnowing_fingerprints

    n, w = 3, 4
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 words >= w+n-1=6
    docs = [
        (1, f"one two {shared} three"),
        (2, f"{shared} nine ten eleven"),
        (3, "tiny doc"),  # < n words: no fingerprints
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    rows = winnowing_fingerprints(df, n=n, w=w).collect()

    def model(text):
        ws = text.split(" ")
        if len(ws) < n:
            return set()
        g = [
            int(hashlib.md5(" ".join(ws[i:i + n]).encode()).hexdigest()[:15], 16)
            for i in range(len(ws) - n + 1)
        ]
        out = set()
        for j in range(max(len(g) - w + 1, 1)):
            win = g[j:j + w]
            m = min(win)
            out.add((j + win.index(m) + 1, m))
        return out

    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    assert by_doc.get(1) == model(docs[0][1])
    assert by_doc.get(2) == model(docs[1][1])
    assert 3 not in by_doc
    # guarantee: the shared 7-word run yields a shared fingerprint VALUE
    fps1 = {fp for _p, fp in by_doc[1]}
    fps2 = {fp for _p, fp in by_doc[2]}
    assert fps1 & fps2


def test_kmeans_clusters_model(spark):
    """kmeans_clusters vs recomputing the assignment in python with the
    same default centroid literals."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import kmeans_clusters
    from simple_tsdb_spark.pipeline.similarity import default_centroids

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = kmeans_clusters(embs).toPandas()
    cs = default_centroids(16, 64)
    norms = [sum(x * x for x in c) ** 0.5 for c in cs]
    pdf = embs.toPandas()
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0.0, None, None])
    for _, row in pdf.iterrows():
        e = [float(x) for x in row["embedding"]]
        scores = [
            round(sum(p * q for p, q in zip(e, c)) / nrm, 6)
            for c, nrm in zip(cs, norms)
        ]
        cl = scores.index(max(scores))
        a = agg[cl]
        a[0] += 1
        a[1] += max(scores)
        a[2] = row["vec_id"] if a[2] is None else min(a[2], row["vec_id"])
        a[3] = row["vec_id"] if a[3] is None else max(a[3], row["vec_id"])
    assert len(got) == len(agg)
    for _, r in got.iterrows():
        n, s, lo, hi = agg[r["cluster"]]
        assert r["n_vecs"] == n and r["min_id"] == lo and r["max_id"] == hi
        assert abs(r["sum_cos"] - s) < 1e-4


def test_cluster_prune_model(spark):
    """cluster_prune vs python model: keep k hardest (lowest cos) per
    cluster, deterministic ties."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import cluster_prune
    from simple_tsdb_spark.pipeline.similarity import default_centroids

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    k = 5
    got = cluster_prune(embs, k=k).toPandas()
    cs = default_centroids(16, 64)
    norms = [sum(x * x for x in c) ** 0.5 for c in cs]
    rows = []
    for _, row in embs.toPandas().iterrows():
        e = [float(x) for x in row["embedding"]]
        scores = [
            round(sum(p * q for p, q in zip(e, c)) / nrm, 6)
            for c, nrm in zip(cs, norms)
        ]
        rows.append((scores.index(max(scores)), int(row["vec_id"]), max(scores)))
    import itertools

    want = []
    rows.sort(key=lambda r: (r[0], r[2], r[1]))
    for cl, grp in itertools.groupby(rows, key=lambda r: r[0]):
        for rk, (c, vid, cos) in enumerate(list(grp)[:k], 1):
            want.append((c, vid, cos, rk))
    got_t = [
        (int(r["cluster"]), int(r["vec_id"]), float(r["cos"]), int(r["rk"]))
        for _, r in got.iterrows()
    ]
    assert sorted(got_t) == sorted(want)
    # within each cluster, kept examples are the FARTHEST from prototype
    per_cl = {c: [cos for (cc, _v, cos, _r) in want if cc == c] for c, *_ in want}
    for c, kept in per_cl.items():
        dropped = [cos for (cc, _v, cos) in rows if cc == c][k:]
        if dropped:
            assert max(kept) <= min(dropped) + 1e-9


def test_winnowing_matches_model(spark):
    """winnowing_matches finds the planted copied-run pair, respects
    min_shared, and the max_df boilerplate cap drops ubiquitous
    fingerprints from pair generation."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import winnowing_matches

    shared = "alpha beta gamma delta epsilon zeta eta theta"
    boiler = "this is common footer text every doc has"
    docs = [
        (1, f"one two {shared} xx"),
        (2, f"{shared} nine ten"),
        (3, f"unrelated words only here nothing common {boiler}"),
        (4, f"completely different content again {boiler}"),
        (5, f"more unrelated filler stuff {boiler}"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnowing_matches(df, n=3, w=4, min_shared=2).collect()
    }
    assert (1, 2) in got and got[(1, 2)] >= 2
    # boilerplate cap: fingerprints in >2 docs dropped -> 3/4/5 pairs gone
    got_capped = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnowing_matches(df, n=3, w=4, min_shared=1, max_df=2).collect()
    }
    for pair in [(3, 4), (3, 5), (4, 5)]:
        assert pair not in got_capped
    assert (1, 2) in got_capped


def test_ngram_lm_score_python_model(spark):
    """ngram_lm_score vs a direct python recomputation: fit on the
    'wiki' slice, score everything — covers seen bigrams, unseen bigram
    with seen history, fully-OOV doc, and the <2-token NULL case."""
    import math

    import pandas as pd

    from simple_tsdb_spark.pipeline import ngram_lm_score

    docs = [
        (1, "the cat sat on the mat", "wiki"),
        (2, "the cat ran", "wiki"),
        (3, "the cat sat quickly", "web"),     # "sat quickly" unseen, "sat" seen
        (4, "zebra quagga okapi", "web"),      # fully OOV
        (5, "single", "web"),                  # no bigram -> NULL
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text", "source"]))
    got = {
        r.doc_id: (r.n_bigrams, r.xent)
        for r in ngram_lm_score(df, fit_pred="source = 'wiki'").collect()
    }

    fit = [t for _, t, s in docs if s == "wiki"]
    c2: dict[tuple[str, str], int] = {}
    for t in fit:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _), c in c2.items():
        c1[a] = c1.get(a, 0) + c
    V = len({w for t in fit for w in t.split(" ")})
    want = {}
    for d, t, _ in docs:
        w = t.split(" ")
        bgs = list(zip(w, w[1:]))
        if not bgs:
            want[d] = (0, None)
            continue
        S = 0  # exact integer µnat sum, as the operator accumulates
        for a, b in bgs:
            S += math.floor(1e6 * math.log(c1.get(a, 0) + V)) - math.floor(
                1e6 * math.log(c2.get((a, b), 0) + 1)
            )
        want[d] = (len(bgs), float(S) / len(bgs) / 1e6)
    assert got == want


def test_ngram_lm_score_hot_path_identical(spark):
    """Forcing every key through the hot (broadcast) lane must not
    change a single value — the lanes are partitions of the same rows."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import ngram_lm_score

    docs = [(i, "the cat sat on the mat every day", "wiki" if i % 2 else "web")
            for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text", "source"]))
    a = {r.doc_id: (r.n_bigrams, r.xent)
         for r in ngram_lm_score(df, fit_pred="source = 'wiki'").collect()}
    b = {r.doc_id: (r.n_bigrams, r.xent)
         for r in ngram_lm_score(df, fit_pred="source = 'wiki'", hot_frac=1e-9).collect()}
    c = {r.doc_id: (r.n_bigrams, r.xent)
         for r in ngram_lm_score(df, fit_pred="source = 'wiki'", hot_frac=2.0).collect()}
    d = {r.doc_id: (r.n_bigrams, r.xent)
         for r in ngram_lm_score(df, fit_pred="source = 'wiki'", hot_tables="eager").collect()}
    e = {r.doc_id: (r.n_bigrams, r.xent)
         for r in ngram_lm_score(df, fit_pred="source = 'wiki'", hot_tables="lazy",
                                 hot_frac=1e-9).collect()}
    assert a == b == c == d == e


def test_stratified_split_exact_fractions(spark):
    """stratified_split vs the python model: per-stratum eval count is
    EXACTLY floor(frac·n), membership is the smallest salted hashes,
    and frac edge cases (0.0, 1.0) hold."""
    import hashlib

    import pandas as pd

    from simple_tsdb_spark.pipeline import stratified_split

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(301)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))

    def h60(i, salt="strat-v1"):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)

    for frac in (0.1, 0.37, 0.0, 1.0):
        got = {r.doc_id: r.split for r in stratified_split(df, frac=frac).collect()}
        assert len(got) == len(rows)
        for lang in ("en", "de", "fr"):
            ids = [i for i, l in rows if l == lang]
            k = int(frac * len(ids))
            want_eval = set(sorted(ids, key=lambda i: (h60(i), i))[:k])
            got_eval = {i for i in ids if got[i] == "eval"}
            assert got_eval == want_eval, (frac, lang)


def test_stratified_split_boundary_bucket_rank(spark):
    """Force many hash-space buckets to be occupied and k to land
    mid-bucket so the boundary-rank lane (not just whole-bucket
    selection) is exercised."""
    import hashlib

    import pandas as pd

    from simple_tsdb_spark.pipeline import stratified_split

    rows = [(i, "x") for i in range(2000)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))
    frac = 0.333
    got = {r.doc_id: r.split for r in stratified_split(df, frac=frac).collect()}

    def h60(i, salt="strat-v1"):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)

    k = int(frac * len(rows))
    want_eval = set(sorted((i for i, _ in rows), key=lambda i: (h60(i), i))[:k])
    assert {i for i, s in got.items() if s == "eval"} == want_eval
    assert sum(1 for s in got.values() if s == "eval") == k


def test_dsir_resample_model(spark):
    """dsir_resample = exact top-k of (logw + quantized salted Gumbel):
    recompute the scores in python from the operator's own weights and
    check the selected set and ordering keys match; a different salt
    draws a different sample."""
    import hashlib
    import math

    import pandas as pd

    from simple_tsdb_spark.pipeline import dsir_logweights, dsir_resample

    docs = [
        (i, ("the cat sat on the mat " * (1 + i % 3)).strip(),
         "en" if i % 4 else "de")
        for i in range(40)
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text", "lang"]))
    w = {r.doc_id: r.logw for r in dsir_logweights(df, target_pred="lang = 'en'").collect()}

    def score(i, salt):
        h = int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / 2**60
        return w[i] + math.floor(1e6 * -math.log(-math.log(u)))

    k = 10
    got = [(r.doc_id, r.logw, r.score) for r in dsir_resample(df, target_pred="lang = 'en'", k=k).collect()]
    want = sorted(((score(i, "dsir-v1"), i) for i in w), key=lambda t: (-t[0], t[1]))[:k]
    assert [(i, w[i], s) for s, i in want] == got

    other = [r.doc_id for r in dsir_resample(df, target_pred="lang = 'en'", k=k, salt="v2").collect()]
    assert set(other) != {i for i, _, _ in got}  # fresh draw


def test_stratified_split_randomized_model(spark):
    """Seeded randomized stress of the bucket-selection algorithm:
    uneven strata (including singletons) × extreme fracs, membership
    checked against the full-sort python model every time."""
    import hashlib
    import random

    import pandas as pd

    from simple_tsdb_spark.pipeline import stratified_split

    rng = random.Random(7)
    rows = []
    i = 0
    for s in range(18):
        size = rng.choice([1, 2, 3, 7, 50, 211, 500])
        for _ in range(size):
            rows.append((i, f"st{s}"))
            i += 1
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))

    def h60(i, salt):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)

    for frac, salt in ((0.001, "a"), (0.25, "b"), (0.5, "strat-v1"), (0.999, "c")):
        got = {
            r.doc_id: r.split
            for r in stratified_split(df, frac=frac, salt=salt).collect()
        }
        assert len(got) == len(rows)
        by_stratum: dict[str, list[int]] = {}
        for i, s in rows:
            by_stratum.setdefault(s, []).append(i)
        for s, ids in by_stratum.items():
            k = int(frac * len(ids))
            want = set(sorted(ids, key=lambda i: (h60(i, salt), i))[:k])
            assert {i for i in ids if got[i] == "eval"} == want, (frac, salt, s)


def test_curate_corpus_python_model(spark):
    """curate_corpus vs a python recomputation of the full chain:
    quality gate → lang allowlist → exact-dedup keep-first → exact
    stratified holdout (including a planted duplicate pair where only
    the min-id copy survives)."""
    import hashlib

    import pandas as pd

    from simple_tsdb_spark.pipeline import curate_corpus

    rows = [
        # high-quality en/de docs (long, stopwords, diverse)
        (i, f"the quick brown fox {i} jumps of and over the lazy dog to a it", ["en", "de"][i % 2])
        for i in range(20)
    ]
    rows.append((100, rows[4][1], "en"))       # exact dup of doc 4 → dropped
    rows.append((101, "x x x x", "en"))        # low quality → dropped
    rows.append((102, rows[5][1], "zh"))       # lang filtered
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text", "lang"]))
    got = {r.doc_id: (r.lang, r.split)
           for r in curate_corpus(df, min_quality=0.3, langs=("en", "de"), frac=0.25).collect()}

    # python model
    def quality(t):
        toks = t.split(" ")
        stop = sum(w in ("the", "a", "of", "and", "is", "to", "in", "that") for w in toks)
        return (0.4 * min(len(toks), 256) / 256
                + 0.3 * min(stop / len(toks) * 4, 1.0)
                + 0.3 * len(set(toks)) / len(toks))

    kept = [(i, t, l) for i, t, l in rows if quality(t) >= 0.3 and l in ("en", "de")]
    first = {}
    for i, t, _ in kept:
        h = hashlib.md5(t.encode()).hexdigest()
        first[h] = min(first.get(h, i), i)
    surv = [(i, l) for i, t, l in kept if first[hashlib.md5(t.encode()).hexdigest()] == i]
    assert 100 not in dict(surv) and 101 not in dict(surv) and 102 not in dict(surv)

    def h60(i):
        return int(hashlib.md5(f"strat-v1:{i}".encode()).hexdigest()[:15], 16)

    want = {}
    for lang in ("en", "de"):
        ids = [i for i, l in surv if l == lang]
        k = int(0.25 * len(ids))
        ev = set(sorted(ids, key=lambda i: (h60(i), i))[:k])
        for i in ids:
            want[i] = (lang, "eval" if i in ev else "train")
    assert got == want


def test_stratified_split_multiway_model(spark):
    """Multi-way exact split vs the full-sort python model: segment
    boundaries (including two thresholds landing in one hash bucket,
    zero-width segments, and fracs summing to 1)."""
    import hashlib

    import pandas as pd

    from simple_tsdb_spark.pipeline import stratified_split

    rows = [(i, ["en", "de"][i % 2]) for i in range(400)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "lang"]))

    def h60(i, salt="strat-v1"):
        return int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:15], 16)

    for fracs in (
        {"valid": 0.05, "test": 0.05},
        {"a": 0.001, "b": 0.001},          # both thresholds in the first bucket
        {"v": 0.3, "zero": 0.0, "t": 0.3}, # zero-width middle segment
        {"v": 0.5, "t": 0.5},              # sums to 1 — no train left
    ):
        got = {r.doc_id: r.split for r in stratified_split(df, fracs=fracs).collect()}
        names = list(fracs)
        cum, acc = [], 0.0
        for n in names:
            acc += fracs[n]
            cum.append(acc)
        for lang in ("en", "de"):
            ids = sorted((i for i, l in rows if l == lang), key=lambda i: (h60(i), i))
            ks = [int(c * len(ids)) for c in cum]
            for rn, i in enumerate(ids, start=1):
                want = "train"
                for j, k in enumerate(ks):
                    if rn <= k:
                        want = names[j]
                        break
                assert got[i] == want, (fracs, lang, i, rn, got[i], want)
        assert sum(1 for v in got.values() if v == "zero") == 0 or "zero" not in fracs


def test_rp_project_model_and_jl_property(spark, embs):
    """rp_project vs a numpy recomputation (exact), plus the JL point:
    pairwise distances in the 16-dim projection correlate strongly with
    the original 64-dim distances."""
    import numpy as np

    from simple_tsdb_spark.pipeline import rp_project, rp_signs

    sub = embs.where("vec_id < 40")
    got = rp_project(sub).toPandas().pivot(index="vec_id", columns="j", values="val")
    src = {r.vec_id: np.array(r.embedding, dtype=np.float64)
           for r in sub.select("vec_id", "embedding").collect()}
    S = np.array(rp_signs(64, 16))  # out_dim x in_dim
    for vid, v in src.items():
        want = (S @ v) / np.sqrt(16)
        np.testing.assert_allclose(got.loc[vid].to_numpy(), want, rtol=1e-12)

    ids = sorted(src)
    X = np.stack([src[i] for i in ids])
    P = np.stack([got.loc[i].to_numpy() for i in ids])
    dx = np.linalg.norm(X[:, None] - X[None, :], axis=2)[np.triu_indices(len(ids), 1)]
    dp = np.linalg.norm(P[:, None] - P[None, :], axis=2)[np.triu_indices(len(ids), 1)]
    # JL with k=16: each distance is preserved within ~1/sqrt(k) in
    # expectation.  (Distance CORRELATION is the wrong statistic here:
    # iid random vectors concentrate all pairwise distances near one
    # value, leaving correlation dominated by the projection noise.)
    ratio = dp / dx
    assert abs(ratio.mean() - 1.0) < 0.15, ratio.mean()
    assert np.mean(np.abs(ratio - 1.0)) < 0.35, np.mean(np.abs(ratio - 1.0))


def test_knn_rp_recall_and_rerank_exactness(spark, embs):
    """knn_rp: stage-2 cos values must equal knn_brute's exact cos for
    every returned neighbor, ranks must be consistent, and recall vs
    brute must beat random-candidate recall by a wide margin."""
    from simple_tsdb_spark.pipeline import knn_brute, knn_rp

    qids = [0, 1, 2, 3, 4]
    brute = knn_brute(embs, query_ids=qids, k=10).toPandas()
    rp = knn_rp(embs, query_ids=qids, k=10, overfetch=8).toPandas()
    bcos = {(r.query_id, r.neighbor_id): r.cos for r in brute.itertuples()}
    for r in rp.itertuples():
        if (r.query_id, r.neighbor_id) in bcos:
            assert r.cos == bcos[(r.query_id, r.neighbor_id)]
    assert (rp.groupby("query_id")["rank"]
            .apply(lambda s: list(s) == list(range(1, len(s) + 1)))).all()
    recalls = []
    for q in qids:
        b = set(brute[brute.query_id == q].neighbor_id)
        a = set(rp[rp.query_id == q].neighbor_id)
        recalls.append(len(a & b) / len(b))
    # corpus is 1000 vectors: random 80 candidates would give ~8% recall;
    # JL-guided candidates must do far better
    assert sum(recalls) / len(recalls) > 0.4, recalls


def test_gopher_rules_python_model(spark):
    """gopher_rules vs python recomputation — each rule violated by at
    least one planted doc."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import gopher_rules
    from simple_tsdb_spark.pipeline.text import GOPHER_STOPWORDS, GOPHER_SYMBOLS

    good = "the cat and dog have fun with that ball " * 5  # 50 words incl trailing ''
    docs = [
        (1, good.strip()),                          # passes (40 words w/ min 20)
        (2, "short text"),                          # too few words
        (3, " ".join(["a"] * 30)),                  # mean len 1 < 3, no stopwords
        (4, " ".join(["#"] * 10 + ["the", "of"] + ["word"] * 20)),  # symbol ratio
        (5, " ".join(["12345"] * 25 + ["the", "of"])),  # alpha frac low
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {r.doc_id: r for r in gopher_rules(df, min_words=20).collect()}

    for i, t in docs:
        w = t.split(" ")
        n = len(w)
        nc = sum(len(x) for x in w)
        na = sum(any(c.isascii() and c.isalpha() for c in x) for x in w)
        ns = sum(x in GOPHER_SYMBOLS for x in w)
        stop = sum(x in GOPHER_STOPWORDS for x in w)
        r = got[i]
        assert r.n_words == n and r.n_stopwords == stop
        assert r.mean_word_len_e6 == (10**6 * nc) // n
        assert r.alpha_frac_ppm == (10**6 * na) // n
        assert r.symbol_ratio_ppm == (10**6 * ns) // n
        want = (20 <= n <= 100_000
                and 3_000_000 * n <= 10**6 * nc <= 10_000_000 * n
                and 10**6 * na >= 800_000 * n and 10**6 * ns <= 100_000 * n
                and stop >= 2)
        assert r.passes == want, (i, r)
    assert got[1].passes and not any(got[i].passes for i in (2, 3, 4, 5))


def test_dup_ngram_chars_python_model(spark):
    """dup_ngram_chars vs python recomputation — repeated phrase,
    no-repetition doc, and a doc shorter than n."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import dup_ngram_chars

    docs = [
        (1, "spam ham spam ham spam ham eggs"),
        (2, "all words here are fully unique"),
        (3, "tiny"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {(r.doc_id, r.n): r.dup_char_frac_ppm for r in dup_ngram_chars(df).collect()}

    for i, t in docs:
        w = t.split(" ")
        tot = sum(len(x) for x in w)
        for n in (2, 3, 4):
            grams = [tuple(w[j:j + n]) for j in range(len(w) - n + 1)] if len(w) >= n else []
            from collections import Counter
            c = Counter(grams)
            dup = sum(cnt * sum(len(x) for x in g) for g, cnt in c.items() if cnt > 1)
            assert got[(i, n)] == (10**6 * dup) // tot, (i, n, got[(i, n)])
    assert got[(2, 2)] == 0 and got[(3, 2)] == 0
    assert got[(1, 2)] > 500_000  # "spam ham" dominates


def test_ann_index_build_search_equals_knn_ivf(spark, embs, tmp_path):
    """Materialized index: search over the written partitions must
    equal knn_ivf (same quantizer) row for row, full probe must equal
    brute, and the scan must read only the probed list partitions."""
    import os

    from simple_tsdb_spark.pipeline import (
        knn_brute,
        knn_ivf,
        search_ann_index,
        write_ann_index,
    )
    from simple_tsdb_spark.pipeline.similarity import N_LISTS

    path = str(tmp_path / "idx")
    man = write_ann_index(spark, embs, path)
    assert man["nlist"] == N_LISTS
    lists = [d for d in os.listdir(f"{path}/vectors") if d.startswith("list_id=")]
    assert len(lists) >= 2

    qids = [0, 1, 2, 3, 4]
    got = search_ann_index(spark, path, query_ids=qids, k=10, nprobe=4).toPandas()
    want = knn_ivf(embs, query_ids=qids, k=10, nprobe=4).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"], ignore_index=True),
        want.sort_values(["query_id", "rank"], ignore_index=True),
    )

    full = search_ann_index(spark, path, query_ids=qids, k=10, nprobe=N_LISTS).toPandas()
    brute = knn_brute(embs, query_ids=qids, k=10).toPandas()
    pd.testing.assert_frame_equal(
        full.sort_values(["query_id", "rank"], ignore_index=True),
        brute.sort_values(["query_id", "rank"], ignore_index=True),
    )

    # partition pruning: the probed scan must carry a list_id partition filter
    df = search_ann_index(spark, path, query_ids=[0], k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan

    with pytest.raises(KeyError):
        search_ann_index(spark, path, query_ids=[10**9], k=5)


def test_ann_index_pq_payload(spark, embs, tmp_path):
    """with_pq=True stores M-byte codes next to each vector and the
    codebooks in the manifest."""
    from simple_tsdb_spark.pipeline import write_ann_index

    path = str(tmp_path / "idxpq")
    man = write_ann_index(spark, embs, path, with_pq=True)
    assert man["with_pq"] and man["codebooks"]
    row = spark.read.parquet(f"{path}/vectors").limit(1).collect()[0]
    assert len(row["codes"]) == len(man["codebooks"])


def test_ann_index_adc_equals_knn_ivf_pq(spark, embs, tmp_path):
    """ADC search over the materialized codes must equal knn_ivf_pq
    row for row (same quantizer + codebooks), and require with_pq."""
    from simple_tsdb_spark.pipeline import (
        knn_ivf_pq,
        search_ann_index,
        write_ann_index,
    )

    path = str(tmp_path / "idxadc")
    write_ann_index(spark, embs, path, with_pq=True)
    qids = [0, 1, 2, 3, 4]
    got = search_ann_index(spark, path, query_ids=qids, k=10, nprobe=4,
                           method="adc").toPandas()
    want = knn_ivf_pq(embs, query_ids=qids, k=10, nprobe=4).toPandas()
    pd.testing.assert_frame_equal(
        got.sort_values(["query_id", "rank"], ignore_index=True),
        want.sort_values(["query_id", "rank"], ignore_index=True),
    )

    bare = str(tmp_path / "idxbare")
    write_ann_index(spark, embs, bare)
    with pytest.raises(ValueError):
        search_ann_index(spark, bare, query_ids=qids, method="adc")


def test_minhash_index_incremental_dedup(spark, docs, tmp_path):
    """Incremental dedup: candidates of a new slice against the index
    must equal minhash_lsh_pairs over the union, restricted to
    new×corpus pairs; append makes later slices see earlier ones."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import (
        append_to_minhash_index,
        dedup_against_index,
        minhash_lsh_pairs,
        write_minhash_index,
    )

    corpus = docs.where("doc_id < 400")
    # new slice: near-copies of corpus docs under fresh ids + fresh docs
    newdocs = (
        docs.where("doc_id >= 400")
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars")
    )
    path = str(tmp_path / "mhidx")
    write_minhash_index(spark, corpus, path)

    got = {
        (r.new_doc, r.corpus_doc, r.n_bands)
        for r in dedup_against_index(spark, newdocs, path).collect()
    }
    both = corpus.unionByName(newdocs)
    want = set()
    for r in minhash_lsh_pairs(both).collect():
        a, b = r.a, r.b
        if a < 400 and b >= 100000:
            want.add((b, a, r.n_bands))
        elif b < 400 and a >= 100000:
            want.add((a, b, r.n_bands))
    assert got == want and want, (len(got), len(want))

    # append the slice; a re-sent slice now collides with itself in the
    # index (same band keys, different ids excluded only when equal)
    append_to_minhash_index(spark, newdocs, path)
    again = dedup_against_index(
        spark,
        newdocs.select((F.col("doc_id") + 500000).alias("doc_id"), "text", "lang", "source", "n_chars"),
        path,
    )
    hits = {r.corpus_doc for r in again.collect()}
    assert any(h >= 100000 for h in hits)  # matched the appended slice

    # tiny slice → the index read is partition-pruned to hit buckets
    plan = (
        dedup_against_index(spark, newdocs.limit(3), path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "band_id" in plan and "kb" in plan

    # signature drift is rejected
    import json as _json

    with open(f"{path}/manifest.json", "w") as fh:
        fh.write(_json.dumps({"shingle_len": 99}))
    with pytest.raises(ValueError):
        dedup_against_index(spark, newdocs, path)


def test_digest_index_incremental_exact_dedup(spark, docs, tmp_path):
    """Exact-digest index: a new slice keeps only docs whose content is
    absent from the index; partition pruning carries a bucket filter."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import (
        filter_against_digest_index,
        write_digest_index,
    )

    corpus = docs.where("doc_id < 400")
    path = str(tmp_path / "digidx")
    write_digest_index(spark, corpus, path)

    dup_slice = corpus.limit(20).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    fresh_slice = docs.where("doc_id >= 400")
    new = dup_slice.unionByName(fresh_slice)
    kept = filter_against_digest_index(spark, new, path).toPandas()
    # every exact copy dropped, every genuinely-new doc kept (unless its
    # text coincides with a corpus doc)
    corpus_texts = {r.text for r in corpus.select("text").collect()}
    want = {r.doc_id for r in new.collect() if r.text not in corpus_texts}
    assert set(kept.doc_id) == want
    assert set(kept.columns) == {"doc_id", "text", "lang", "source", "n_chars"}

    plan = (
        filter_against_digest_index(spark, dup_slice, path)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "bucket" in plan


def test_embedding_dups_against_index(spark, embs, tmp_path):
    """Incremental embedding dedup equals embedding_dup_pairs over the
    union (same default quantizer), restricted to new×corpus pairs;
    the read prunes to the slice's lists."""
    from pyspark.sql import functions as F

    from simple_tsdb_spark.pipeline import (
        embedding_dup_pairs,
        embedding_dups_against_index,
        write_ann_index,
    )

    corpus = embs.where("vec_id < 800")
    # slice = 20 exact copies of corpus vectors (planted dups) + fresh ones
    copies = embs.where("vec_id < 20").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    fresh = embs.where("vec_id >= 800").select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    newv = copies.unionByName(fresh)
    path = str(tmp_path / "incemb")
    write_ann_index(spark, corpus, path)

    got = {
        (r.new_id, r.corpus_id, r.cos)
        for r in embedding_dups_against_index(
            spark, newv, path, threshold=0.2
        ).collect()
    }
    both = corpus.unionByName(newv)
    want = set()
    for r in embedding_dup_pairs(both, threshold=0.2).collect():
        if r.a < 800 and r.b >= 100000:
            want.add((r.b, r.a, r.cos))
        elif r.b < 800 and r.a >= 100000:
            want.add((r.a, r.b, r.cos))
    assert got == want and want, (len(got), len(want))

    plan = (
        embedding_dups_against_index(spark, newv.limit(3), path, threshold=0.2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "list_id" in plan


def test_char_entropy_python_model(spark):
    """char_entropy vs python recomputation: repeated char → 0, known
    distributions exact, empty doc NULL."""
    import math
    from collections import Counter

    import pandas as pd

    from simple_tsdb_spark.pipeline import char_entropy

    docs = [(1, "aaaa"), (2, "abab"), (3, "the quick brown fox"), (4, "")]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {r.doc_id: (r.n_chars, r.entropy) for r in char_entropy(df).collect()}

    def lnq(x: int) -> int:
        return math.floor(1e6 * math.log(x))

    for i, t in docs:
        if not t:
            assert got[i] == (0, None)
            continue
        c = Counter(t)
        n = len(t)
        num = max(lnq(n) * n - sum(k * lnq(k) for k in c.values()), 0)
        assert got[i] == (n, float(num) / n / 1e6), (i, got[i])
    # repeated char is EXACTLY 0 (the µnat numerator cancels), and the
    # uniform-2-symbol doc lands within quantization error of ln 2
    assert got[1][1] == 0.0
    assert abs(got[2][1] - math.log(2)) < 2e-6


def test_label_centroids_model(spark, embs):
    """Centroids match numpy per-label means within the 2^-30 grid, and
    the quantized quotient recomputes exactly."""
    import numpy as np

    from simple_tsdb_spark.pipeline import label_centroids

    got = label_centroids(embs).toPandas()
    pdf = embs.toPandas()
    g = float(1 << 30)
    for label, grp in pdf.groupby("label"):
        mat = np.array([np.asarray(v, dtype=np.float64) for v in grp.embedding])
        sub = got[got.label == label].sort_values("pos")
        assert (sub.n_vecs == len(grp)).all()
        # exact recomputation on the integer grid
        qsum = np.floor(mat * g).sum(axis=0).astype(np.int64)
        np.testing.assert_array_equal(sub.centroid_sum_q.to_numpy(), qsum)
        want_q30 = np.trunc(qsum / len(grp)).astype(np.int64)
        np.testing.assert_array_equal(sub.centroid_q30.to_numpy(), want_q30)
        # and the grid is far below float32 noise vs the true mean
        assert np.abs(sub.centroid_q30.to_numpy() / g - mat.mean(axis=0)).max() < 1e-6


def test_normalize_text_model(spark):
    """Normalization vs python: case folding, whitespace-run collapse
    (spaces/tabs/newlines), trim, changed flag."""
    import re as _re

    import pandas as pd

    from simple_tsdb_spark.pipeline import normalize_text

    docs = [
        (1, "Hello  World"),
        (2, " padded \t text\nwith lines "),
        (3, "already clean"),
        (4, "MiXeD Case"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = normalize_text(df).toPandas().set_index("doc_id")
    for d, t in docs:
        want = _re.sub(r"\s+", " ", t.lower()).strip()
        row = got.loc[d]
        assert row.norm_text == want
        assert row.changed == (want != t)
        assert row.n_chars == len(t) and row.n_chars_norm == len(want)
    assert not got.loc[3].changed


def test_doc_chunks_model(spark):
    """doc_chunks vs a python chunker: tail alignment, full coverage,
    overlap contract, short-doc single chunk, empty text."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import doc_chunks

    W, S = 8, 5
    docs = [
        (1, " ".join(f"t{i}" for i in range(30))),   # multi-chunk + tail align
        (2, " ".join(f"t{i}" for i in range(8))),    # exactly one window
        (3, " ".join(f"t{i}" for i in range(3))),    # short: 1 chunk of 3
        (4, ""),                                      # split('') → [''] → 1 token
        (5, " ".join(f"t{i}" for i in range(13))),   # n-W=5 → exactly 2 chunks
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = doc_chunks(df, window=W, stride=S).toPandas()

    for did, text in docs:
        toks = text.split(" ")
        n = len(toks)
        n_chunks = 1 if n <= W else -(-(n - W) // S) + 1
        rows = got[got.doc_id == did].sort_values("chunk_idx")
        assert len(rows) == n_chunks, (did, len(rows), n_chunks)
        covered = set()
        for _, r in rows.iterrows():
            start = min(r.chunk_idx * S, max(n - W, 0))
            assert r.start_tok == start
            want = toks[start : start + W]
            assert r.chunk_text == " ".join(want)
            assert r.n_toks == len(want)
            covered.update(range(start, start + len(want)))
        assert covered == set(range(n))  # every token in ≥1 chunk
    # stride == window: disjoint except the tail-aligned last chunk;
    # n=30, W=8 → chunks at 0/8/16/22 — the last re-covers 2 tokens
    got2 = doc_chunks(df, window=W, stride=W).toPandas()
    one = got2[got2.doc_id == 1].sort_values("chunk_idx")
    assert list(one.start_tok) == [0, 8, 16, 22]
    assert int(one.n_toks.sum()) == 32


def test_hard_negatives_model(spark):
    """hard_negatives vs numpy: top-k cosine among DIFFERENT-label
    vectors only, self excluded, rank order (cos desc, id)."""
    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.pipeline import hard_negatives

    rng = np.random.default_rng(11)
    n, d = 60, 8
    vecs = rng.normal(size=(n, d)).astype("float32")
    labels = (np.arange(n) % 3).astype("int32")
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"), "embedding": list(map(list, vecs)), "label": labels}
    )
    df = spark.createDataFrame(pdf)
    k = 5
    got = hard_negatives(df, query_ids=[0, 1], k=k).toPandas()

    v = vecs.astype("float64")
    nrm = np.sqrt((v * v).sum(axis=1))
    for q in (0, 1):
        cos = (v @ v[q]) / (nrm * nrm[q])
        cand = [
            (float(cos[j]), int(j))
            for j in range(n)
            if j != q and labels[j] != labels[q]
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        want_ids = [j for _, j in cand[:k]]
        rows = got[got.query_id == q].sort_values("rank")
        assert list(rows.neighbor_id) == want_ids
        assert (rows.neg_label.to_numpy() != labels[q]).all()
        for c_got, (c_want, _) in zip(rows.cos, cand[:k]):
            assert c_got == pytest.approx(c_want, rel=1e-9)


def test_ann_recall_consistency(spark):
    """ann_recall equals the set intersection of the knn_brute and
    knn_lsh operator outputs, recall in [0,1], one row per query."""
    from simple_tsdb_spark.pipeline import ann_recall, knn_brute, knn_lsh

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qids, k = [0, 1, 2], 10
    got = ann_recall(embs, query_ids=qids, k=k).toPandas().set_index("query_id")
    exact = knn_brute(embs, query_ids=qids, k=k).toPandas()
    approx = knn_lsh(embs, query_ids=qids, k=k).toPandas()
    assert sorted(got.index) == qids
    for q in qids:
        e = set(exact[exact.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        hits = len(e & a)
        assert got.loc[q].n_hits == hits
        assert got.loc[q].recall_ppm == (10**6 * hits) // k
        assert 0 <= got.loc[q].recall_ppm <= 10**6


def test_ngram_novelty_model(spark):
    """Novelty fractions vs a python set model: fully-copied doc -> 0,
    disjoint doc -> 1, short doc -> NULL novelty with n_grams=0."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import ngram_novelty

    ref = pd.DataFrame({"doc_id": [100], "text": ["a b c d e f g"]})
    corpus = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "a b c d e f g",        # all grams in ref -> novelty 0
                "x y z w q r",          # disjoint -> novelty 1
                "a b c d x y z w",      # mixed
                "too short",            # < n words -> 0 grams, NULL
            ],
        }
    )
    got = (
        ngram_novelty(spark.createDataFrame(corpus), spark.createDataFrame(ref), n=4)
        .toPandas()
        .set_index("doc_id")
    )

    def grams(t, n=4):
        w = t.split(" ")
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    ref_g = grams(ref.text[0])
    for doc_id, text in zip(corpus.doc_id, corpus.text):
        g = grams(text)
        r = got.loc[doc_id]
        assert r.n_grams == len(g)
        assert r.n_novel == len(g - ref_g)
        if g:
            assert r.novelty_ppm == (1_000_000 * len(g - ref_g)) // len(g)
        else:
            assert pd.isna(r.novelty_ppm)
    assert got.loc[1, "novelty_ppm"] == 0 and got.loc[2, "novelty_ppm"] == 1_000_000


def test_ann_index_arrow_build_equals_codegen_build(spark, embs, tmp_path):
    """assign='arrow' produces a byte-identical index CONTENT to the
    codegen build on the fixtures (per-vector list assignment equal),
    and search results match row-for-row."""
    from simple_tsdb_spark.pipeline import search_ann_index, write_ann_index

    p1, p2 = str(tmp_path / "cg"), str(tmp_path / "ar")
    write_ann_index(spark, embs, p1)
    write_ann_index(spark, embs, p2, assign="arrow")
    a = spark.read.parquet(f"{p1}/vectors").select("vec_id", "list_id").toPandas()
    b = spark.read.parquet(f"{p2}/vectors").select("vec_id", "list_id").toPandas()
    a = a.sort_values("vec_id", ignore_index=True)
    b = b.sort_values("vec_id", ignore_index=True)
    assert (a.vec_id == b.vec_id).all() and (a.list_id == b.list_id).all()

    qids = [int(x) for x in a.vec_id.head(3)]
    r1 = search_ann_index(spark, p1, query_ids=qids, k=5).toPandas()
    r2 = search_ann_index(spark, p2, query_ids=qids, k=5).toPandas()
    import pandas as pd

    pd.testing.assert_frame_equal(
        r1.sort_values(["query_id", "rank"], ignore_index=True),
        r2.sort_values(["query_id", "rank"], ignore_index=True),
    )

    import pytest as _pt

    with _pt.raises(ValueError):
        write_ann_index(spark, embs, str(tmp_path / "bad"), assign="nope")


def test_index_health_equals_ivf_stats(spark, embs, tmp_path):
    """index_health over a materialized index row-for-row equals
    ivf_stats over the same corpus + centroids (metadata-only read)."""
    import pandas as pd

    from simple_tsdb_spark.pipeline import index_health, ivf_stats, write_ann_index

    path = str(tmp_path / "idx")
    write_ann_index(spark, embs, path)
    got = index_health(spark, path).toPandas()
    want = ivf_stats(embs).toPandas()
    pd.testing.assert_frame_equal(got, want)


def test_rebalance_ann_index_heals_hot_list(spark, tmp_path):
    """A skewed corpus overloads one default-quantizer list; rebalance
    retrains, writes a NEW generation, flips the pointer atomically,
    and the max load factor drops.  Search keeps working against the
    new generation (nprobe=nlist equals brute force)."""
    import json as _json

    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.pipeline import (
        index_health,
        knn_brute,
        rebalance_ann_index,
        search_ann_index,
        write_ann_index,
    )

    # 300 vectors tightly clustered around one direction -> one hot list
    rng = np.random.default_rng(3)
    u = rng.normal(size=64); u /= np.linalg.norm(u)
    x = (u[None, :] + rng.normal(scale=0.03, size=(300, 64))).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(300), "embedding": [r.tolist() for r in x]})
    df = spark.createDataFrame(pdf)
    path = str(tmp_path / "idx")
    write_ann_index(spark, df, path)

    rep = rebalance_ann_index(spark, path, max_load=2.0, iters=2)
    assert rep["rebalanced"] is True
    assert rep["max_load_after"] < rep["max_load_before"]
    man = _json.loads(open(f"{path}/manifest.json").read())
    assert man["vectors_dir"] == "vectors_gen1" and man["generation"] == 1
    # health now reads the new generation
    h = index_health(spark, path).toPandas()
    assert abs(h.load_factor_e6.max() / 1e6 - rep["max_load_after"]) < 1e-6 + 1e-12
    # full-probe search over the new generation == brute force
    got = search_ann_index(spark, path, query_ids=[0, 7], k=5, nprobe=man["nlist"]).toPandas()
    want = knn_brute(df, query_ids=[0, 7], k=5).toPandas()
    assert list(got.neighbor_id) == list(want.neighbor_id)
    # idempotent when healthy enough: second call with a loose bound
    rep2 = rebalance_ann_index(spark, path, max_load=rep["max_load_after"] + 0.01)
    assert rep2["rebalanced"] is False


def test_rebalance_rejects_non_improving_candidate(spark, tmp_path):
    """Intrinsically concentrated data (every vector ~one direction)
    cannot be balanced by retraining — the improvement guard must KEEP
    the old generation instead of flipping to a no-better candidate."""
    import json as _json

    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.pipeline import rebalance_ann_index, write_ann_index

    rng = np.random.default_rng(11)
    u = np.abs(rng.normal(size=64)) + 1.0  # strictly positive direction
    x = (u[None, :] * (1.0 + rng.normal(scale=1e-3, size=(200, 1)))).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(200), "embedding": [r.tolist() for r in x]})
    path = str(tmp_path / "idx")
    write_ann_index(spark, spark.createDataFrame(pdf), path)

    rep = rebalance_ann_index(spark, path, max_load=2.0, iters=1)
    man = _json.loads(open(f"{path}/manifest.json").read())
    if rep["rebalanced"]:
        # if the retrain DID help, the pointer moved and load dropped
        assert rep["max_load_after"] < rep["max_load_before"]
        assert man["vectors_dir"] == "vectors_gen1"
    else:
        # guard path: pointer unmoved, rejection recorded
        assert "vectors_dir" not in man or man["vectors_dir"] == "vectors"
        assert rep.get("rejected_load") is not None
        assert rep["rejected_load"] >= rep["max_load_before"]


def test_lm_perplexity_buckets_degenerate_corpus(spark):
    """ADVICE r10: when NO doc has >= 2 tokens, every xent is NULL.  The
    Spark plan emits one NULL-threshold/NULL-bucket row per doc; the
    DuckDB oracle's threshold CTE must still produce its single row (an
    aggregate without GROUP BY) so the cross join doesn't empty the
    result.  Both engines must agree row-for-row."""
    import duckdb

    from simple_tsdb_spark.pipeline import lm_perplexity_buckets
    from simple_tsdb_spark.pipeline.text import lm_perplexity_buckets_oracle

    rows = [("d1", "one", "src0"), ("d2", "two", "src1"), ("d3", "", "src1")]
    df = spark.createDataFrame(rows, "doc_id string, text string, source string")
    got = lm_perplexity_buckets(df).toPandas().sort_values("doc_id")
    assert len(got) == 3
    assert got.bucket.isna().all()
    assert got.xent_munat.isna().all()

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id VARCHAR, text VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
    odf = con.execute(lm_perplexity_buckets_oracle()).df().sort_values("doc_id")
    assert len(odf) == 3, "oracle lost the docs when the threshold CTE was empty"
    assert odf.bucket.isna().all()
    assert odf.xent_munat.isna().all()
