"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful stream processing (SURVEY §2.8 — its only
state is the WAL).  This module shows the engine's custom-operator tier
for streams: per-series state that survives across micro-batches, Arrow
batches in and out, bounded by timeouts.

``streaming_ewma`` continues the batch EWMA (operators/fill.py) across
micro-batches: state = (last smoothed value), so a point arriving in a
later batch continues the recursion exactly where the previous batch
stopped — the property a windowless recursive operator needs and
stateless ``foreachBatch`` cannot provide.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_ewma(
    stream: DataFrame,
    *,
    field: str,
    alpha: float,
    out_col: str | None = None,
) -> DataFrame:
    """Continuous per-series EWMA over a streaming measurement DataFrame.

    Emits one row per input point with the smoothed value; per-series
    state is a single float + last timestamp.  Rows inside one batch are
    processed in time order; cross-batch continuity comes from the state.
    """
    out = out_col or f"{field}_ewma"
    a = float(alpha)
    out_schema = f"series string, time_ns long, {field} double, {out} double"
    state_schema = "y double, last_t long"

    def update(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series,) = key
        y, last_t = state.get if state.exists else (None, -1)
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values("time_ns")
            vals = pdf[field].astype(float).reset_index(drop=True)
            # Vectorized continuation: seed pandas ewm with the carried
            # state (prepend y, drop the first output).  adjust=False +
            # ignore_na=True make the recurrence stationary, so the
            # seeded run is bit-identical to one uninterrupted ewm over
            # the whole series — the same FP op order as the batch
            # operator (operators/fill.py ewma).
            if y is not None:
                seeded = pd.concat([pd.Series([y]), vals], ignore_index=True)
                sm = seeded.ewm(alpha=a, adjust=False, ignore_na=True).mean().iloc[1:]
            else:
                sm = vals.ewm(alpha=a, adjust=False, ignore_na=True).mean()
            sm = sm.reset_index(drop=True)
            out_pdf = pdf[["time_ns", field]].copy()
            out_pdf.insert(0, "series", series)
            out_pdf[out] = sm.to_numpy()
            if len(out_pdf):
                last_t = int(out_pdf["time_ns"].iloc[-1])
                valid = sm[sm.notna()]
                if len(valid):
                    y = float(valid.iloc[-1])
            frames.append(out_pdf)
        state.update((y, last_t))
        yield from frames

    return stream.groupBy("series").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_holt(
    stream: DataFrame,
    *,
    field: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Continuous per-series Holt level+trend smoothing — the streaming
    twin of ``operators.fill.holt_linear``: state = (level, trend), so
    a point arriving in a later micro-batch continues the recursion
    exactly where the previous batch stopped.  The explicit loop uses
    the batch operator's fixed FP op order, so the emitted
    (level, trend) stream is bit-identical to the batch operator over
    the concatenated input (pinned in test_streaming_stateful)."""
    a, b1m = float(alpha), 1.0 - float(alpha)
    bt, bt1m = float(beta), 1.0 - float(beta)
    out_schema = f"series string, time_ns long, {field} double, level double, trend double"
    state_schema = "lvl double, trd double"

    def update(
        key: tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (series,) = key
        lvl, trd = state.get if state.exists else (None, None)
        frames = []
        for pdf in pdfs:
            pdf = pdf.sort_values("time_ns")
            pdf = pdf[pdf[field].notna()]
            lvls, trds = [], []
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
            out_pdf = pdf[["time_ns", field]].copy()
            out_pdf.insert(0, "series", series)
            out_pdf["level"] = lvls
            out_pdf["trend"] = trds
            frames.append(out_pdf)
        if lvl is not None:
            state.update((lvl, trd))
        yield from frames

    return stream.select("series", "time_ns", field).groupBy("series").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_time_weighted_avg(
    stream: DataFrame,
    *,
    field: str,
    window_ns: int,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Continuous time-weighted average — the stateful streaming twin of
    ``operators.integral.time_weighted_avg``: per (series, window) the
    trapezoid numerator accumulates incrementally as points arrive
    (state = count, bounds, last micro-value, exact integer accumulator),
    and the finalized row emits on event-time timeout once the watermark
    passes the window end.

    Exactness: the accumulator is an arbitrary-precision Python int
    carried as a decimal string (the state schema has no DECIMAL(38,0)),
    so a finalized window's twa is bit-equal to the batch operator's
    (same conventions: single point → its value, any NULL poisons,
    final value = float(acc)/float(t_last−t_first)/2e6 — the identical
    IEEE op order).  Assumes per-series time-ordered arrival across
    batches (the streaming_ewma contract); within a batch rows are
    sorted.

    Scale: state is O(open windows × series), a handful of scalars each;
    Arrow-batched updates; windows expire with the watermark.
    """
    from pyspark.sql import functions as F

    w = int(window_ns)
    if w % 1_000_000 != 0:
        raise ValueError("event-time timeouts need ms-resolution window_ns")
    out_schema = (
        f"series string, wstart long, npoints long, t_first long, t_last long, "
        f"{field}_twa double"
    )
    state_schema = (
        "npoints long, tf long, tl long, last_vm long, last_has_v boolean, "
        "acc string, poisoned boolean, single double"
    )

    def update(key, pdfs, state: GroupState):
        series, wstart = key[0], int(key[1])
        if state.hasTimedOut:
            npoints, tf, tl, last_vm, last_has_v, acc_s, poisoned, single = state.get
            acc = int(acc_s)
            if poisoned:
                twa = None
            elif npoints == 1:
                twa = single
            else:
                twa = float(acc) / float(tl - tf) / 2e6
            state.remove()
            yield pd.DataFrame(
                [[series, wstart, npoints, tf, tl, twa]],
                columns=["series", "wstart", "npoints", "t_first", "t_last", f"{field}_twa"],
            )
            return
        if state.exists:
            npoints, tf, tl, last_vm, last_has_v, acc_s, poisoned, single = state.get
            acc = int(acc_s)
        else:
            npoints, tf, tl, last_vm, last_has_v, acc, poisoned, single = (
                0, None, None, 0, False, 0, False, None,
            )
        for pdf in pdfs:
            pdf = pdf.sort_values("time_ns")
            for t, v in zip(pdf["time_ns"].astype("int64"), pdf[field]):
                t = int(t)
                has_v = pd.notna(v)
                # micro-units: under the exact-mode contract (<=6
                # meaningful decimals) v*1e6 sits within ~1e-9 of an
                # integer, so HALF_UP (Spark F.round) and half-to-even
                # (Python round) coincide
                vm = int(round(v * 1e6)) if has_v else 0
                if not has_v:
                    poisoned = True
                if npoints > 0:
                    # batch: coalesce((vm+lvm)*dt, 0) — null on either end
                    # contributes zero (poisoning handles correctness)
                    if has_v and last_has_v:
                        acc += (vm + last_vm) * (t - tl)
                    tl = t
                else:
                    tf = tl = t
                    if has_v:
                        single = float(v)
                npoints += 1
                last_vm, last_has_v = vm, has_v
        state.update((npoints, tf, tl, last_vm, last_has_v, str(acc), poisoned, single))
        state.setTimeoutTimestamp(wstart // 1_000_000 + w // 1_000_000)

    src = (
        stream.withColumn("_event_ts", F.expr("timestamp_micros(time_ns div 1000)"))
        .withWatermark("_event_ts", watermark_delay)
        .withColumn("wstart", F.col("time_ns") - (F.col("time_ns") % F.lit(w)))
    )
    return src.groupBy("series", "wstart").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_active_users(
    stream: DataFrame,
    *,
    period_ns: int,
    window_periods: int = 1,
    user_col: str = "user_id",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Continuous EXACT trailing-window active-user counts — the
    streaming twin of ``operators.behavior.active_users`` for one
    granularity: per period, the distinct users active in the trailing
    ``window_periods`` periods (k=1 ⇒ DAU stream, k=7 ⇒ WAU stream).

    Streaming distinct counting is done exactly, not with a sketch, by
    chaining two stateful operators: each event fans out to the k
    period labels its activity keeps alive, a
    ``dropDuplicatesWithinWatermark`` on (user, period) keeps state
    per distinct pair only, and a per-period
    ``applyInPandasWithState`` counter emits the final count on
    event-time timeout once the watermark passes the period's close
    (the streaming_time_weighted_avg finalization shape).

    State: O(distinct (user, period-label) pairs within the watermark
    horizon) + one counter per open period.  The watermark delay must
    absorb the forward labels: internally the effective delay adds
    ``(window_periods − 1) · period``.
    """
    p = int(period_ns)
    k = int(window_periods)
    if p <= 0 or k <= 0:
        raise ValueError("period_ns and window_periods must be positive")
    if p % 1_000_000 != 0:
        raise ValueError("event-time timeouts need ms-resolution period_ns")
    from pyspark.sql import functions as F

    ts = F.expr("timestamp_micros(time_ns div 1000)")
    src = (
        stream.where(F.col(user_col).isNotNull())
        .withColumn("_event_ts", ts)
        .withWatermark("_event_ts", watermark_delay)
    )
    per = F.col("time_ns") - (F.col("time_ns") % F.lit(p))
    fanned = src.select(
        F.col(user_col).alias("u"),
        "_event_ts",
        F.explode(F.sequence(per, per + F.lit((k - 1) * p), F.lit(p))).alias("period"),
    )
    dedup = fanned.dropDuplicatesWithinWatermark(["u", "period"])

    out_schema = "period long, n_users long"
    state_schema = "n long"

    def count_users(key, pdfs, state: GroupState):
        (period,) = key
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame([[int(period), int(n)]], columns=["period", "n_users"])
            return
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        # the period label can sit up to (k-1)·p ahead of its events'
        # clock: finalize once the watermark passes the label's close
        state.setTimeoutTimestamp(int(period) // 1_000_000 + p // 1_000_000)

    return dedup.groupBy("period").applyInPandasWithState(
        count_users,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
