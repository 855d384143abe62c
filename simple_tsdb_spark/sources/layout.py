"""Z-order (Morton-curve) data layout — multi-dimensional data skipping.

The 100 TB problem this solves: parquet row-group/file pruning works off
per-file min/max statistics, which are only tight for columns the data
is SORTED by.  A time-sorted layout prunes time predicates perfectly but
a (series, time-range) box query still overlaps EVERY file, because
every file contains every series.  Interleaving the bits of the
quantized dimensions (the Morton/Z curve — the same technique Delta
Lake's OPTIMIZE ZORDER and ClickHouse's mortonEncode use, public
knowledge) keeps both columns' min/max ranges tight per file, so a k-D
box query overlaps ~N^((k-1)/k) of N files instead of all of them.

Everything is a codegen expression (shifts + masks — no UDF); the only
wide operation is the ``repartitionByRange`` on the z-value, which is
exactly the shuffle any clustering write pays.

Quantization per dimension — ORDER-PRESERVING in both cases, because
parquet min/max pruning only works when files hold contiguous VALUE
ranges (a hash bucketing clusters equal values but scatters the
min/max span across the whole domain, defeating stats pruning):
- numeric: linear min/max scaling to ``bits`` bits (two tiny
  aggregates collected driver-side — bounded, two values per column).
- string: the 7-char prefix read as a base-128 ordinal (lexicographic
  order preserved for ASCII data), then the same linear scaling.
  Strings sharing a 7-char prefix land in one quantum — fine: they're
  adjacent in the string order too, so file min/max stays tight.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension (z-value width = bits × #cols; keep ≤ 30 total
#: per dim so the interleave stays in a BIGINT for ≤ 2 dims)
DEFAULT_BITS = 12


def _string_ordinal(col: str) -> Column:
    """Order-preserving string → BIGINT: the 7-char prefix as a
    base-128 number (49 bits; non-ASCII chars clamp to 127, keeping
    monotonicity for the ASCII range)."""
    terms = [
        f"CAST(least(coalesce(ascii(substring({col}, {i + 1}, 1)), 0), 127) "
        f"AS BIGINT) * CAST({128 ** (6 - i)} AS BIGINT)"
        for i in range(7)
    ]
    return F.expr(" + ".join(terms))


def _quantize_expr(src: Column, lo: float, hi: float, bits: int) -> Column:
    """[0, 2^bits) order-preserving quantization of ``src`` given its
    driver-collected [lo, hi] bounds (see module doc)."""
    n_levels = 1 << bits
    span = (hi - lo) or 1.0
    q = F.floor(
        (src.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(float(n_levels - 1))
    ).cast("long")
    # NULL dimension values quantize to the low quantum instead of
    # propagating a NULL z-value that repartitionByRange would place
    # arbitrarily (breaking the clustering contract for those rows)
    return F.coalesce(
        F.least(F.greatest(q, F.lit(0)), F.lit(n_levels - 1)), F.lit(0).cast("long")
    )


def zvalue(df: DataFrame, cols: tuple[str, ...], *, bits: int = DEFAULT_BITS) -> Column:
    """Morton z-value of ``cols``: bit j of dimension i lands at
    position ``j·k + i`` — a pure shift/mask codegen expression."""
    k = len(cols)
    if not 1 <= k <= 4:
        raise ValueError("zvalue supports 1-4 dimensions")
    if bits * k > 60:
        raise ValueError(f"bits*dims must be <= 60, got {bits * k}")
    # ONE bounds job for every dimension (bounded driver collect:
    # 2 scalars per dim) — previously each dimension paid its own full
    # min/max scan of the input (r14; one scan instead of k).
    dts = dict(df.dtypes)
    srcs = [
        _string_ordinal(c) if dts[c] == "string" else F.col(c) for c in cols
    ]
    aggs = []
    for i, src in enumerate(srcs):
        aggs.append(F.min(src.cast("double")).alias(f"_lo{i}"))
        aggs.append(F.max(src.cast("double")).alias(f"_hi{i}"))
    row = df.agg(*aggs).first()
    for i, c in enumerate(cols):
        if row is None or row[f"_lo{i}"] is None or row[f"_hi{i}"] is None:
            raise ValueError(
                f"zvalue: column {c!r} has no non-NULL values to quantize "
                "(empty input or all-NULL dimension)"
            )
    qs = [
        _quantize_expr(src, float(row[f"_lo{i}"]), float(row[f"_hi{i}"]), bits)
        for i, src in enumerate(srcs)
    ]
    z = F.lit(0).cast("long")
    for i, q in enumerate(qs):
        for j in range(bits):
            z = z + (F.shiftright(q, j).bitwiseAND(F.lit(1)) * F.lit(1 << (j * k + i)))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    cols: tuple[str, ...],
    bits: int = DEFAULT_BITS,
    n_files: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    Z-curve of ``cols`` — after this, a predicate on ANY subset of
    ``cols`` prunes files by min/max stats instead of scanning all of
    them.  One range shuffle + in-partition sort; no driver-side data
    movement beyond the per-dimension min/max scalars.
    """
    z = zvalue(df, cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(int(n_files), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_overlap_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of written parquet files whose [min, max] stats for
    ``col`` overlap [lo, hi] — the data-skipping audit (what a
    stats-based reader would have to touch).  Driver-side metadata
    read only; no row data."""
    import glob as _glob

    import pyarrow.parquet as pq

    files = sorted(_glob.glob(f"{path}/part-*.parquet"))
    if not files:
        raise ValueError(f"no parquet files under {path}")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                fmin = fmax = None
                break
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            hit += 1  # unknown stats count as touched (reader must read)
    return hit / len(files)


def zorder_key_frame(
    df: DataFrame, cols: tuple[str, ...], *, bits: int = DEFAULT_BITS,
    id_cols: tuple[str, ...] = ("series", "time_ns"),
) -> DataFrame:
    """The z-value as a queryable frame — (id_cols..., z) — so the
    clustering key itself sits behind the cross-engine hash gate (the
    write path reuses exactly this expression)."""
    return df.select(*id_cols, zvalue(df, cols, bits=bits).alias("z")).orderBy(
        *id_cols
    )


def zorder_key_oracle(
    measurement_sql: str,
    cols: tuple[str, ...],
    col_types: dict[str, str],
    *,
    bits: int = DEFAULT_BITS,
    id_cols: tuple[str, ...] = ("series", "time_ns"),
) -> str:
    """DuckDB twin of :func:`zorder_key_frame`: recomputes the per-dim
    min/max scalars in SQL (exact MIN/MAX of exact doubles — identical
    to the driver-collected literals) and replicates the quantize +
    interleave bit-for-bit.  ``col_types[col]`` ∈ numeric|string."""
    n_levels = 1 << bits
    sels, joins = [], []
    for i, c in enumerate(cols):
        if col_types[c] == "string":
            terms = " + ".join(
                f"CAST(LEAST(COALESCE(ascii(substring({c}, {j + 1}, 1)), 0), 127) "
                f"AS BIGINT) * CAST({128 ** (6 - j)} AS BIGINT)"
                for j in range(7)
            )
            src = f"({terms})"
        else:
            src = c
        sels.append(f"CAST({src} AS DOUBLE) AS v{i}")
        joins.append(
            f"m{i} AS (SELECT MIN(v{i}) AS lo{i}, MAX(v{i}) AS hi{i} FROM base)"
        )
    idc = ", ".join(id_cols)
    qs = []
    for i in range(len(cols)):
        span = f"CASE WHEN hi{i} - lo{i} = 0 THEN 1.0 ELSE hi{i} - lo{i} END"
        # COALESCE mirrors the Spark _quantize_expr coalesce: a NULL numeric
        # dimension lands in the low quantum on BOTH engines (string dims
        # already coalesce per-char inside the ordinal).
        q = (
            f"COALESCE(LEAST(GREATEST(CAST(floor((v{i} - lo{i}) / ({span}) * "
            f"{float(n_levels - 1)!r}) AS BIGINT), 0), {n_levels - 1}), 0)"
        )
        qs.append(q)
    k = len(cols)
    z_terms = " + ".join(
        f"(((q{i} >> {j}) & 1) * {1 << (j * k + i)})"
        for i in range(k)
        for j in range(bits)
    )
    qcols = ", ".join(f"{q} AS q{i}" for i, q in enumerate(qs))
    mjoin = ", ".join(f"m{i}" for i in range(len(cols)))
    return f"""
WITH base AS (SELECT {idc}, {", ".join(sels)} FROM ({measurement_sql})),
{", ".join(joins)},
quant AS (SELECT {idc}, {qcols} FROM base, {mjoin})
SELECT {idc}, CAST({z_terms} AS BIGINT) AS z FROM quant
ORDER BY {idc}
"""
