"""BPE tokenizer: hand-worked fit example, cross-engine fit equality
(the bpe_merges gate contract), and encode equivalence against an
independent re-implementation of the reference bpe() algorithm."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from simple_tsdb_spark.pipeline.bpe import (
    EOW,
    bpe_encode_counts,
    bpe_fit,
    bpe_train_duck,
    bpe_train_sampled,
    encode_word,
    word_freqs_duck,
    word_freqs_spark,
)

SF = "/root/testdata/sf0.001"


def test_bpe_fit_hand_worked():
    # classic toy corpus (Sennrich et al. example shape)
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_fit(wf, 4)
    # 'es' appears 9x (newest+widest) — top pair; then 'es'+'t' 9x,
    # then 'est</w>' 9x, then 'l'+'o' 7x
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", EOW)
    assert merges[3] == ("l", "o")


def test_bpe_fit_deterministic_tiebreak():
    # all pairs count 1: merges must walk lexicographically
    wf = {"ba": 1, "dc": 1}
    merges = bpe_fit(wf, 2)
    assert merges[0] == ("a", EOW)  # smallest (left, right) among ties
    assert merges[1] == ("b", "a" + EOW)


def test_encode_word_matches_reference_bpe():
    """Independent model: apply merges in RANK order globally (the
    original Sennrich formulation), which is equivalent to the GPT-2
    lowest-rank-first loop used by encode_word."""
    wf = {"low": 5, "lowest": 3, "newer": 4, "wider": 2, "new": 1}
    merges = bpe_fit(wf, 8)
    ranks = {p: i for i, p in enumerate(merges)}

    def reference(word):
        syms = list(word) + [EOW]
        for left, right in merges:  # rank order
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for w in list(wf) + ["newlow", "wid", "x", "lowerest", ""]:
        assert encode_word(w, ranks) == reference(w), w


def test_encode_word_reconstructs():
    wf = {"abc": 3, "abd": 2, "bcd": 1}
    merges = bpe_fit(wf, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ("abc", "abcd", "zzz", "a"):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + EOW


def test_cross_engine_fit_identical(spark):
    """The bpe_merges gate contract: Spark fit == DuckDB fit on the
    driver's own documents table."""
    df = spark.read.parquet(f"{SF}/documents.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    wf_s = word_freqs_spark(df, top_m=512)
    wf_d = word_freqs_duck(con, top_m=512)
    assert wf_s == wf_d
    ms = bpe_train_sampled(df, n_merges=60, top_m=512)
    md = bpe_train_duck(con, n_merges=60, top_m=512)
    assert ms == md
    assert len(ms) == 60


def test_bpe_encode_counts_spark_matches_local(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe_train_sampled(df, n_merges=40, top_m=256)
    got = bpe_encode_counts(df, merges).toPandas().set_index("doc_id").sort_index()
    ranks = {p: i for i, p in enumerate(merges)}
    import re

    ws = re.compile("[ \t\n\r\f\x0b]+")
    pdf = pd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for _, row in pdf.head(50).iterrows():
        words = [w for w in ws.split(row.text or "") if w]
        toks = [t for w in words for t in encode_word(w, ranks)]
        r = got.loc[row.doc_id]
        assert r.n_words == len(words)
        assert r.n_tokens == len(toks)
        assert r.n_token_types == len(set(toks))
    # compression sanity: merges shorten the stream vs chars+EOW
    assert got.n_tokens.sum() < sum(
        len(w) + 1 for t in pdf.text for w in ws.split(t or "") if w
    )
