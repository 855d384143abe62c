"""Segmented-scan (block-prefix) twins of the recursive per-series ops.

``ewma`` / ``holt_linear`` run one sequential loop per series
(``applyInPandas``) — correct and bit-deterministic, but a SINGLE
multi-billion-point series serializes into one task (VERDICT r8's
structural note).  Both recurrences are *affine* in their state:

- EWMA:  ``y_t = (1-α)·y_{t-1} + α·v_t``            (1-dim affine)
- Holt:  ``(l,b)_t = M_t·(l,b)_{t-1} + c_t``        (2-dim affine)

so a time-bucketed BLOCK of points composes to a single affine map
``state_out = A·state_in + B`` — the classic parallel-prefix (Blelloch
scan) decomposition:

1. **Pass 1** (parallel over ``(series, block)``): each block folds its
   own affine map — for EWMA ``A = (1-α_eff)^n_obs`` analytically and
   ``B`` by one seeded pandas run; for Holt the 2×2 ``M`` + offset ``c``
   by three seeded loops (seeds (0,0), (1,0), (0,1)) — plus the
   init-semantics result in case the block starts its series.
2. **Driver combine**: the per-series chain of block maps folds
   sequentially over ``#blocks`` SUMMARY rows (a bounded driver
   materialization: span/block_ns × series rows — choose ``block_ns``
   so this stays ≤ ~10⁵; 100M points at 1M-point blocks is 100 rows).
3. **Pass 2** (parallel over ``(series, block)``): each block re-runs
   the plain sequential recurrence seeded with its carry-in state —
   within a block the op order is IDENTICAL to the one-task loop.

Numeric contract: pass 2 is exactly the sequential recurrence given its
carry-in, but the carry-in itself comes from the composed affine maps,
which REASSOCIATES the floating-point ops — results are mathematically
identical and differ from the one-task loop only at accumulated-ulp
level (and not at all once the decay ``A`` underflows to 0.0, which for
EWMA happens after ~5k observations at α = 0.5: every block past its
first few thousand rows is then bit-equal to the sequential operator).
The sequential ops stay the oracle-gated surface; these are the
100×-scale path (``scale_smoke.py`` drives a single giant series
through both and checks the ≤2× wall-clock bound and value agreement).

No reference counterpart (extension op; the reference has no windowed
smoothing at all — ewma itself is already an extension).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ewma_segmented", "holt_segmented"]


def _alpha_eff(alpha: float) -> float:
    """pandas ewm(adjust=False) reconstitutes α via com — replicate so
    the analytic decay matches the pandas-side update weights."""
    com = (1.0 - float(alpha)) / float(alpha)
    return 1.0 / (1.0 + com)


def ewma_segmented(
    df: DataFrame,
    *,
    field: str,
    alpha: float,
    block_ns: int,
    out_col: str | None = None,
) -> DataFrame:
    """EWMA via the segmented scan above — same output schema and
    NULL (ignore_na) semantics as :func:`fill.ewma`, but a single
    giant series parallelizes over its time blocks instead of
    serializing into one task."""
    import pandas as pd

    out = out_col or f"{field}_ewma"
    a = float(alpha)
    a_eff = _alpha_eff(a)
    schema_sum = "series string, blk long, n_obs long, apow double, b0 double, i0 double"
    spark = df.sparkSession
    b = int(block_ns)
    if b <= 0:
        raise ValueError("block_ns must be positive")

    src = (
        df.select("series", "time_ns", F.col(field).cast("double").alias(field))
        .withColumn("blk", F.expr(f"time_ns DIV {b}"))
    )

    def summarize(pdf):
        pdf = pdf.sort_values("time_ns")
        vals = pdf[field]
        n_obs = int(vals.notna().sum())
        if n_obs == 0:
            apow, b0, i0 = 1.0, float("nan"), float("nan")
        else:
            apow = (1.0 - a_eff) ** n_obs
            # y_out(S): prepend the seed as a synthetic first observation —
            # pandas then runs the exact seeded recurrence
            seeded = pd.concat([pd.Series([0.0]), vals], ignore_index=True)
            b0 = float(seeded.ewm(alpha=a, adjust=False, ignore_na=True).mean().iloc[-1])
            i0 = float(vals.ewm(alpha=a, adjust=False, ignore_na=True).mean().iloc[-1])
        return pd.DataFrame(
            {
                "series": [pdf["series"].iloc[0]],
                "blk": [pdf["blk"].iloc[0]],
                "n_obs": [n_obs],
                "apow": [apow],
                "b0": [b0],
                "i0": [i0],
            }
        )

    sums = (
        src.groupBy("series", "blk")
        .applyInPandas(summarize, schema=schema_sum)
        .collect()  # bounded: (span/block_ns) × series summary rows
    )

    carry_rows = []
    state: dict[str, float] = {}
    for r in sorted(sums, key=lambda r: (r["series"], r["blk"])):
        s = state.get(r["series"])
        carry_rows.append((r["series"], r["blk"], s))
        if r["n_obs"] > 0:
            state[r["series"]] = (
                r["i0"] if s is None else r["apow"] * s + r["b0"]
            )

    carries = spark.createDataFrame(
        carry_rows, "series string, blk long, _carry double"
    )
    schema_out = f"series string, time_ns long, {field} double, {out} double"

    def rescan(pdf):
        pdf = pdf.sort_values("time_ns")
        carry = pdf["_carry"].iloc[0]
        if pd.isna(carry):
            ew = pdf[field].ewm(alpha=a, adjust=False, ignore_na=True).mean()
        else:
            seeded = pd.concat(
                [pd.Series([float(carry)]), pdf[field]], ignore_index=True
            )
            ew = (
                seeded.ewm(alpha=a, adjust=False, ignore_na=True)
                .mean()
                .iloc[1:]
                .reset_index(drop=True)
            )
        res = pdf[["series", "time_ns", field]].reset_index(drop=True)
        res[out] = ew.to_numpy()
        return res

    return (
        src.join(F.broadcast(carries), ["series", "blk"], "left")
        .groupBy("series", "blk")
        .applyInPandas(rescan, schema=schema_out)
    )


def holt_segmented(
    df: DataFrame,
    *,
    field: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    block_ns: int,
) -> DataFrame:
    """Holt linear smoothing via the segmented scan — same output schema
    and NULL-drop semantics as :func:`fill.holt_linear`; the per-block
    affine map is 2×2 + offset, extracted with three seeded loops."""
    import pandas as pd

    a, b1m = float(alpha), 1.0 - float(alpha)
    bt, bt1m = float(beta), 1.0 - float(beta)
    b = int(block_ns)
    if b <= 0:
        raise ValueError("block_ns must be positive")
    spark = df.sparkSession

    src = (
        df.select("series", "time_ns", F.col(field).cast("double").alias(field))
        .where(F.col(field).isNotNull())
        .withColumn("blk", F.expr(f"time_ns DIV {b}"))
    )

    def _seeded(vals, lvl, trd):
        for v in vals:
            new_lvl = (a * v) + (b1m * (lvl + trd))
            trd = (bt * (new_lvl - lvl)) + (bt1m * trd)
            lvl = new_lvl
        return lvl, trd

    schema_sum = (
        "series string, blk long, n_obs long, "
        "m00 double, m01 double, m10 double, m11 double, "
        "c0 double, c1 double, li double, bi double"
    )

    def summarize(pdf):
        pdf = pdf.sort_values("time_ns")
        vals = [float(v) for v in pdf[field]]
        l00, b00 = _seeded(vals, 0.0, 0.0)
        l10, b10 = _seeded(vals, 1.0, 0.0)
        l01, b01 = _seeded(vals, 0.0, 1.0)
        # init semantics: first obs sets (l, b) = (v, 0)
        li, bi = _seeded(vals[1:], vals[0], 0.0)
        return pd.DataFrame(
            {
                "series": [pdf["series"].iloc[0]],
                "blk": [pdf["blk"].iloc[0]],
                "n_obs": [len(vals)],
                "m00": [l10 - l00],
                "m01": [l01 - l00],
                "m10": [b10 - b00],
                "m11": [b01 - b00],
                "c0": [l00],
                "c1": [b00],
                "li": [li],
                "bi": [bi],
            }
        )

    sums = (
        src.groupBy("series", "blk")
        .applyInPandas(summarize, schema=schema_sum)
        .collect()  # bounded summary rows, as in ewma_segmented
    )

    carry_rows = []
    state: dict[str, tuple[float, float]] = {}
    for r in sorted(sums, key=lambda r: (r["series"], r["blk"])):
        s = state.get(r["series"])
        carry_rows.append(
            (r["series"], r["blk"], None if s is None else s[0], None if s is None else s[1])
        )
        if s is None:
            state[r["series"]] = (r["li"], r["bi"])
        else:
            state[r["series"]] = (
                r["m00"] * s[0] + r["m01"] * s[1] + r["c0"],
                r["m10"] * s[0] + r["m11"] * s[1] + r["c1"],
            )

    carries = spark.createDataFrame(
        carry_rows, "series string, blk long, _cl double, _cb double"
    )
    schema_out = (
        f"series string, time_ns long, {field} double, level double, trend double"
    )

    def rescan(pdf):
        pdf = pdf.sort_values("time_ns")
        cl = pdf["_cl"].iloc[0]
        lvls, trds = [], []
        if pd.isna(cl):
            lvl = trd = None
        else:
            lvl, trd = float(cl), float(pdf["_cb"].iloc[0])
        for v in pdf[field]:
            v = float(v)
            if lvl is None:
                lvl, trd = v, 0.0
            else:
                new_lvl = (a * v) + (b1m * (lvl + trd))
                trd = (bt * (new_lvl - lvl)) + (bt1m * trd)
                lvl = new_lvl
            lvls.append(lvl)
            trds.append(trd)
        res = pdf[["series", "time_ns", field]].reset_index(drop=True)
        res["level"] = lvls
        res["trend"] = trds
        return res

    return (
        src.join(F.broadcast(carries), ["series", "blk"], "left")
        .groupBy("series", "blk")
        .applyInPandas(rescan, schema=schema_out)
    )
