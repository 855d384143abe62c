"""Cross-engine fuzz: the document-table query/oracle pairs on
PATHOLOGICAL corpora.

The driver gate only ever sees the generated TPC-H-ish corpus; the
degenerate paths (empty fit sets, <2-token docs, 100%-duplicate corpora,
unicode width/segmentation edges) are exactly where engines diverge —
the r10 ADVICE found one such hole (lm_perplexity_buckets' empty
threshold CTE).  This harness rebuilds a scale dir with a pathological
``documents.parquet`` (all other tables symlinked from sf0.001) and runs
every documents-reading ``queries()``/``oracle_sql()`` pair through the
strict dtype-kind compare of scripts/check_oracle.py.

Usage: python scripts/fuzz_corpus.py [corpus ...]
Corpora: degenerate identical unicode no_fit single_doc
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile

import pandas as pd

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

from check_oracle import TABLES, compare, duck_con  # noqa: E402

BASE_SF = "/root/testdata/sf0.001"

LANGS = ["en", "de", "es", "fr", "zh"]


def _docs_df(rows: list[tuple[int, str, str, str]]) -> pd.DataFrame:
    """(doc_id, text, lang, source) -> driver-schema documents frame."""
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source"])
    df["doc_id"] = df["doc_id"].astype("int64")
    df["n_chars"] = df["text"].str.len().astype("int64")
    return df[["doc_id", "text", "lang", "source"]].assign(
        n_chars=df["n_chars"]
    )


def corpus_degenerate() -> pd.DataFrame:
    """Sub-bigram docs: empty strings, single chars, single words —
    every per-doc denominator (n_bigrams, n_words-1, shingle count)
    at or below its floor; src0 present so the LM fit set is tiny but
    non-empty."""
    rows = []
    texts = ["", "a", "x", "word", "  ", "a b", "!"]
    for i in range(28):
        rows.append((i, texts[i % len(texts)], LANGS[i % 5], f"src{i % 4}"))
    return _docs_df(rows)


def corpus_identical() -> pd.DataFrame:
    """100% duplicate corpus: every pair is a dup, every gram df = N."""
    t = "the quick brown fox jumps over the lazy dog again and again"
    return _docs_df([(i, t, "en", f"src{i % 3}") for i in range(24)])


def corpus_unicode() -> pd.DataFrame:
    """Emoji / CJK / combining marks / RTL — code-point vs byte length
    and tokenizer edges."""
    texts = [
        "😀😀 😀 emoji run 😀",
        "汉字 没有 空格 的 语言 处理 汉字",
        "é combining acute é twice",
        "שלום rtl hebrew שלום",
        "mixed 汉字 and ascii and 😀 marks",
        "ZERO​WIDTH​JOINED words",
    ]
    rows = [
        (i, texts[i % len(texts)] + (" tail" if i % 2 else ""), LANGS[i % 5], f"src{i % 4}")
        for i in range(24)
    ]
    return _docs_df(rows)


def corpus_no_fit() -> pd.DataFrame:
    """No src0 docs at all: the bigram-LM fit set is EMPTY (vocab 0,
    every gram unseen) — ln/COALESCE edges on both engines."""
    rows = [
        (i, f"doc {i} has some plain words to score against nothing", "en", f"src{1 + i % 3}")
        for i in range(20)
    ]
    return _docs_df(rows)


def corpus_single_doc() -> pd.DataFrame:
    """A corpus of one document — window/percentile/df statistics at
    n=1 (terciles collapse, df caps trivially)."""
    return _docs_df([(0, "just one document in the whole corpus here", "en", "src0")])


CORPORA = {
    "degenerate": corpus_degenerate,
    "identical": corpus_identical,
    "unicode": corpus_unicode,
    "no_fit": corpus_no_fit,
    "single_doc": corpus_single_doc,
}


def build_sf_dir(tmp: str, docs: pd.DataFrame) -> str:
    sf = os.path.join(tmp, "sf_fuzz")
    os.makedirs(sf, exist_ok=True)
    for t in TABLES:
        src = f"{BASE_SF}/{t}.parquet"
        dst = f"{sf}/{t}.parquet"
        if t != "documents" and not os.path.exists(dst):
            os.symlink(src, dst)
    docs.to_parquet(f"{sf}/documents.parquet", index=False)
    return sf


def doc_queries() -> list[str]:
    import __spark_entry__ as entry_mod

    return [
        n
        for n, sql in entry_mod.oracle_sql().items()
        if re.search(r"\bdocuments\b", sql)
    ]


def main() -> int:
    only = sys.argv[1:] or list(CORPORA)
    import __spark_entry__ as entry_mod
    from simple_tsdb_spark import get_spark

    spark = get_spark("fuzz_corpus")
    names = doc_queries()
    print(f"fuzzing {len(names)} documents-table queries over {only}")
    n_pass = n_fail = n_err = 0
    failures: list[str] = []
    for cname in only:
        docs = CORPORA[cname]()
        tmp = tempfile.mkdtemp(prefix=f"fuzz_{cname}_")
        sf = build_sf_dir(tmp, docs)
        os.environ["SPARK_GRAFT_ORACLE_SF"] = sf
        con = duck_con(sf)
        qs = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
        for name in names:
            try:
                sdf = qs[name](spark, sf).toPandas()
                odf = con.sql(oracles[name]).df()
            except Exception as exc:  # engine crash on degenerate input
                print(f"[{cname}/{name}] ERROR {type(exc).__name__}: {str(exc).splitlines()[0][:140]}")
                failures.append(f"{cname}/{name} (error)")
                n_err += 1
                continue
            if compare(f"{cname}/{name}", sdf, odf):
                n_pass += 1
            else:
                print(f"[{cname}/{name}] FAIL rows spark={len(sdf)} oracle={len(odf)}")
                failures.append(f"{cname}/{name}")
                n_fail += 1
        con.close()
        shutil.rmtree(tmp, ignore_errors=True)
        print(f"== corpus {cname} done ==")
    print(f"== fuzz: {n_pass} pass, {n_fail} fail, {n_err} error ==")
    for f in failures:
        print(f"  - {f}")
    return 1 if (n_fail or n_err) else 0


if __name__ == "__main__":
    sys.exit(main())
