"""BPE tokenizer: sample-bounded training + distributed encoding.

The training-data-pipeline shape (SentencePiece/GPT-2 doctrine, all
public): a tokenizer is FIT on a bounded summary of the corpus and
APPLIED distributed.  Here the summary is the top-M word types by
frequency — one map-side-combined groupBy over the corpus plus a
TakeOrdered of M rows to the driver (driver payload independent of
corpus size; at 100 TB the word-type distribution is Zipfian and top-M
covers the overwhelming token mass).  The merge loop itself
(:func:`bpe_fit`) is plain deterministic Python over that table: pair
counts weighted by word frequency, ties broken by the lexicographically
smallest pair, so the fitted merges are independent of partitioning and
row order.

Cross-engine gate (the ``knn_ivf_trained`` doctrine): the DuckDB oracle
independently computes the same top-M word table (same explicit
ASCII whitespace-class split — same ``(count DESC, word ASC)``
binary-collation total order) and runs the SAME Python merge loop, so
the fitted merges are hash-checkable in the driver's gate
(``bpe_merges``).  Encoding is genuinely non-SQL (an ordered iterative
rewrite), so ``bpe_token_counts`` ships without an oracle and is pinned
by model-equivalence pytest instead.

Encoding scale: :func:`bpe_encode_counts` runs in ``mapInPandas`` with a
per-batch word→tokens memo — Zipf again: almost every word in a batch is
a repeat, so the merge loop runs once per word TYPE, not per token.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bpe_fit",
    "bpe_train_sampled",
    "bpe_train_duck",
    "bpe_encode_counts",
    "encode_word",
]

#: end-of-word marker (GPT-2 style closed vocabulary over whole words)
EOW = "</w>"


# -- shared fit (both engines call this on their own word table) ------------

def _word_symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (EOW,)


def bpe_fit(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge learning over a word-frequency table.

    Deterministic: the next merge is the pair with the highest
    frequency-weighted count, ties broken by the lexicographically
    smallest (left, right) pair — no dict-order dependence."""
    words = {w: _word_symbols(w) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            f = word_freqs[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for w, syms in words.items():
            if best[0] not in syms:
                continue
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = tuple(out)
    return merges



# -- word-frequency tables ----------------------------------------------------

def word_freq_plan(
    df: DataFrame, *, text_col: str = "text", top_m: int = 4096
) -> DataFrame:
    """The word-table plan :func:`word_freqs_spark` collects: explode →
    map-side-combined groupBy → TakeOrdered(top_m).  Exposed so the
    explain audit can assert the shape (partial aggregation present, the
    global order is a TakeOrderedAndProject of M rows — never a
    full sort)."""
    words = df.select(
        F.explode(F.split(F.col(text_col), "[ \\t\\n\\r\\f\\x0B]+")).alias("w")
    ).where(F.col("w") != "")
    return (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(int(top_m))
    )


def word_freqs_spark(
    df: DataFrame, *, text_col: str = "text", top_m: int = 4096
) -> dict[str, int]:
    """Top-M word types by (count DESC, word ASC) — ONE map-side-combined
    shuffle + a TakeOrdered of M rows; the only driver payload of the
    whole fit, bounded by top_m regardless of corpus size."""
    rows = word_freq_plan(df, text_col=text_col, top_m=top_m).collect()
    # bounded collect: top_m rows (see docstring)
    return {r["w"]: r["n"] for r in rows}


def word_freqs_duck(
    con, *, table: str = "documents", text_col: str = "text", top_m: int = 4096
) -> dict[str, int]:
    """DuckDB twin of :func:`word_freqs_spark`: same explicit ASCII
    whitespace-class split (Java's ``\\s`` includes ``\\x0B``, RE2's does
    not — the class pins them equal), same '' filter, same binary-collation total order."""
    rows = con.execute(
        f"""
        SELECT w, COUNT(*) AS n
        FROM (SELECT unnest(regexp_split_to_array({text_col}, '[ \\t\\n\\r\\f\\x0B]+')) AS w
              FROM {table})
        WHERE w <> ''
        GROUP BY w
        ORDER BY n DESC, w ASC
        LIMIT {int(top_m)}
        """
    ).fetchall()
    return {w: n for w, n in rows}


def bpe_train_sampled(
    df: DataFrame, *, text_col: str = "text", n_merges: int = 200, top_m: int = 4096
) -> list[tuple[str, str]]:
    """Fit BPE merges from the corpus (Spark side)."""
    return bpe_fit(word_freqs_spark(df, text_col=text_col, top_m=top_m), n_merges)


def bpe_train_duck(
    con, *, table: str = "documents", text_col: str = "text",
    n_merges: int = 200, top_m: int = 4096,
) -> list[tuple[str, str]]:
    """Fit BPE merges from the same corpus via DuckDB — bit-identical
    to :func:`bpe_train_sampled` by construction (shared fit loop)."""
    return bpe_fit(word_freqs_duck(con, table=table, text_col=text_col, top_m=top_m), n_merges)


# -- encoding -----------------------------------------------------------------

def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank pair first (the standard
    GPT-2 bpe() loop)."""
    syms = list(_word_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_i = i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distributed encode → (id, n_words, n_tokens, n_token_types).

    mapInPandas with a per-batch word→len(tokens) memo: the merge loop
    runs once per word TYPE per batch (Zipf: repeats dominate), and only
    counts cross the Arrow boundary."""
    import re

    import pandas as pd

    ranks = {tuple(p): i for i, p in enumerate(merges)}
    ws = re.compile("[ \t\n\r\f\x0b]+")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def doc_counts(text: str):
            n_words = n_tokens = 0
            types = set()
            for w in ws.split(text):
                if not w:
                    continue
                toks = memo.get(w)
                if toks is None:
                    toks = encode_word(w, ranks)
                    memo[w] = toks
                n_words += 1
                n_tokens += len(toks)
                types.update(toks)
            return n_words, n_tokens, len(types)

        for pdf in it:
            out = [
                (i, *doc_counts(t or ""))
                for i, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame(
                out, columns=[id_col, "n_words", "n_tokens", "n_token_types"]
            )

    return df.select(id_col, text_col).mapInPandas(
        batches,
        schema=f"{id_col} long, n_words long, n_tokens long, n_token_types long",
    )
