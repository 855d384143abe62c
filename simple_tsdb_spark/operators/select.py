"""S1/S2 — time-range scans with LIMIT / LAST-N.

Reference behavior (``/root/reference/src/libtsdb/select_op.cc``):

- ``select_op_first`` (S1, select_op.cc:175-231): forward scan of one
  series over ``[t0, t1]``, projecting the requested fields, stopping after
  ``limit`` points.  Results are in ascending time order.
- ``select_op_last`` (S2, select_op.cc:233-371): the *last* N points of the
  range, still returned ascending.

Spark-first: both are pure DataFrame expressions.  Catalyst pushes the
series + time predicates into the Parquet scan (partition pruning on
``series``, row-group min/max pruning on ``time_ns`` — equivalent to the
reference's index binary search, select_op.cc:50-59), prunes columns to the
projection, and plans `TakeOrderedAndProject` for sort+limit so only N rows
per partition survive the local sort before the final merge.

At 100 TB: sort+limit on a time-pruned range is a per-partition top-K
(heap) followed by a driver-side merge of K-row partials, not a global
sort — the pushed-down time filter bounds the scanned rows, which is the
same reason the reference's LAST-N index seek is cheap.  For un-pruned
LAST-N over a huge range, pair with a coarse time_bucket partition column
and probe recent buckets first (library policy, SURVEY.md §4.3.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_tsdb_spark.functions.timeutil import clamp_time_range
from simple_tsdb_spark.errors import DuplicateField, NoSuchField
from simple_tsdb_spark.sources.measurement import field_columns


def _base(
    df: DataFrame,
    series: str | Sequence[str] | None,
    fields: Sequence[str] | None,
    t0: int,
    t1: int,
    tiebreak: Sequence[str],
) -> tuple[DataFrame, list[str]]:
    t0, t1 = clamp_time_range(t0, t1)
    if fields is None or len(fields) == 0:
        # Empty projection = all fields in schema order (measurement.h:116-150).
        fields = field_columns(df)
    else:
        known = set(df.columns)
        unknown = [f for f in fields if f not in known]
        if unknown:
            raise NoSuchField(f"unknown fields: {unknown}")  # gen_entries NO_SUCH_FIELD
        if len(set(fields)) != len(fields):
            raise DuplicateField("duplicate field in projection")  # measurement.h:137-139
    out = df.where(F.col("time_ns").between(t0, t1))
    if series is not None:
        if isinstance(series, str):
            out = out.where(F.col("series") == series)
        else:
            out = out.where(F.col("series").isin(list(series)))
    cols = ["series", "time_ns", *fields]
    order = ["time_ns", *[t for t in tiebreak if t in cols]]
    return out.select(*cols), order


def select_points(
    df: DataFrame,
    *,
    series: str | Sequence[str] | None = None,
    fields: Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    limit: int | None = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SELECT fields FROM series WHERE t0 <= time_ns <= t1 [LIMIT n] — S1.

    ``tiebreak`` columns make the LIMIT cut deterministic when multiple
    points share a timestamp (cannot happen within one reference series —
    timestamps are unique per series — but can across series).
    """
    out, order = _base(df, series, fields, t0, t1, tiebreak)
    out = out.orderBy(*order)
    if limit is not None:
        out = out.limit(int(limit))
    return out


def select_last_points(
    df: DataFrame,
    *,
    series: str | Sequence[str] | None = None,
    fields: Sequence[str] | None = None,
    t0: int = 0,
    t1: int = 2**63 - 1,
    last: int = 1,
    per_series: bool = False,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """SELECT ... LAST n — S2: the last ``n`` points of the range, ascending.

    ``per_series=True`` generalizes the reference (which queries one series
    at a time) to last-N *per series* via a ranking window — the idiomatic
    top-K-per-group plan (one shuffle on series, per-partition heap).
    """
    out, order = _base(df, series, fields, t0, t1, tiebreak)
    desc = [F.col(c).desc() for c in order]
    if per_series:
        from pyspark.sql import Window

        w = Window.partitionBy("series").orderBy(*desc)
        out = out.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= int(last)).drop("_rn")
        return out.orderBy("series", *order)
    # Single global LAST-N: TakeOrderedAndProject on the descending order,
    # then ascending re-sort of the tiny result (driver-sized, ≤ last rows).
    return out.orderBy(*desc).limit(int(last)).orderBy(*order)
