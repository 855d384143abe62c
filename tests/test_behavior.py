"""Cohort retention + ordered funnel vs direct python models."""

from __future__ import annotations

import pandas as pd
import pytest

from simple_tsdb_spark.operators.behavior import cohort_retention, event_funnel


def _events(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["series", "time_ns", "user_id"])
    )


def test_cohort_retention_model(spark):
    P = 100
    rows = [
        # u1: first period 0, returns periods 1 and 3
        ("view", 10, 1), ("click", 110, 1), ("view", 350, 1),
        # u2: first period 1 only
        ("view", 150, 2), ("view", 199, 2),
        # u3: first period 0, returns period 1
        ("view", 95, 3), ("view", 105, 3),
        # NULL user dropped
        ("view", 10, None),
    ]
    got = {
        (r.cohort, r.period_offset): r.n_users
        for r in cohort_retention(_events(spark, rows), period_ns=P).collect()
    }
    want = {
        (0, 0): 2,   # u1, u3 active in their cohort period
        (0, 1): 2,   # u1, u3 return in period 1
        (0, 3): 1,   # u1 returns in period 3
        (100, 0): 1, # u2's own cohort period
    }
    assert got == want


def test_event_funnel_model(spark):
    rows = [
        # u1 completes in order within the window
        ("view", 100, 1), ("click", 200, 1), ("purchase", 300, 1),
        # u2 clicks BEFORE viewing → click doesn't count (strict order)
        ("click", 50, 2), ("view", 100, 2), ("purchase", 300, 2),
        # u3 views then clicks outside the window
        ("view", 100, 3), ("click", 5000, 3),
        # u4 views only
        ("view", 400, 4),
        # u5 completes, but purchase lands outside window from FIRST view
        ("view", 100, 5), ("click", 150, 5), ("purchase", 1200, 5),
    ]
    got = [
        (r.step_idx, r.step, r.n_users)
        for r in event_funnel(
            _events(spark, rows),
            steps=["view", "click", "purchase"],
            window_ns=1000,
        ).collect()
    ]
    # u1: full; u2: view@100 then no click after → stops at view;
    # u3: click at 5000 > 100+1000 → stops; u4: view only;
    # u5: click ok, purchase at 1200 > 1100 → stops at click
    assert got == [(1, "view", 5), (2, "click", 2), (3, "purchase", 1)]


def test_event_funnel_same_timestamp_is_not_ordered(spark):
    # simultaneous view+click does NOT satisfy the strict order
    rows = [("view", 100, 1), ("click", 100, 1)]
    got = {
        r.step: r.n_users
        for r in event_funnel(
            _events(spark, rows), steps=["view", "click"], window_ns=1000
        ).collect()
    }
    assert got == {"view": 1, "click": 0}


def test_behavior_rejects_bad_params(spark):
    df = _events(spark, [("view", 1, 1)])
    with pytest.raises(ValueError):
        cohort_retention(df, period_ns=0)
    with pytest.raises(ValueError):
        event_funnel(df, steps=["view"], window_ns=10)
    with pytest.raises(ValueError):
        event_funnel(df, steps=["view", "click"], window_ns=0)


def test_session_stats_model(spark):
    from simple_tsdb_spark.operators import session_stats

    rows = [
        # series a: sessions [0..20] (3 events), [100] (1 event)
        ("a", 0, 1), ("a", 10, 1), ("a", 20, 1), ("a", 100, 1),
        # series b: one session
        ("b", 5, 2), ("b", 15, 2),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["series", "time_ns", "user_id"])
    )
    got = {r.series: r for r in session_stats(df, gap_ns=30).collect()}
    a = got["a"]
    assert (a.n_sessions, a.total_events, a.max_duration_ns) == (2, 4, 20)
    assert a.total_duration_ns == 20 + 0
    assert a.mean_events_e6 == (1_000_000 * 4) // 2
    assert a.mean_duration_ns == (20 + 0) // 2
    b = got["b"]
    assert (b.n_sessions, b.total_events, b.mean_duration_ns) == (1, 2, 10)
    assert b.mean_events_e6 == 2_000_000 and b.total_duration_ns == 10


def test_shipping_priority_q3_model(spark):
    """shipping_priority vs a duckdb recomputation at sf0.001 (row set
    and exact revenue values)."""
    import duckdb

    from simple_tsdb_spark.plans.analytics import shipping_priority, shipping_priority_oracle

    sf = "/root/testdata/sf0.001"
    got = shipping_priority(spark, sf).toPandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute(shipping_priority_oracle()).df()
    assert len(got) == len(want)
    assert list(got.l_orderkey) == list(want.l_orderkey)
    assert (got.revenue.to_numpy() == want.revenue.to_numpy()).all()


def test_active_users_model(spark):
    """DAU/WAU/stickiness vs a python set model, including a user active
    across a window boundary and a NULL user row."""
    import pandas as pd

    p = 10
    rows = [
        ("s", 1, 1), ("s", 2, 1),          # u1 twice in period 0 (distinct once)
        ("s", 5, 2),                        # u2 period 0
        ("s", 15, 1),                       # u1 period 10
        ("s", 35, 3),                       # u3 period 30 (gap at 20)
        ("s", 36, None),                    # NULL user ignored
    ]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "user_id"])
    df = spark.createDataFrame(pdf)

    from simple_tsdb_spark.operators.behavior import active_users

    got = (
        active_users(df, period_ns=p, window_periods=2)
        .toPandas()
        .set_index("period")
    )
    # model: per-period active sets
    act = {0: {1, 2}, 10: {1}, 30: {3}}
    for per, users in act.items():
        w = users | act.get(per - p, set())
        row = got.loc[per]
        assert row.dau == len(users)
        assert row.wau == len(w)
        assert row.stickiness_ppm == (10**6 * len(users)) // len(w)
    # period 20 has no activity -> no row (40 would be window-only: no DAU row)
    assert set(got.index) == {0, 10, 30}


def test_funnel_conversion_time_model(spark):
    """Latency distribution over full-funnel completers: min-chain
    latencies recompute against a hand-built fixture."""
    import pandas as pd

    rows = [
        # u1 converts: view@10 -> click@20 -> purchase@40  (latency 30)
        ("view", 10, 1), ("click", 20, 1), ("purchase", 40, 1),
        # u2 converts: view@0 -> click@50 -> purchase@60   (latency 60)
        ("view", 0, 2), ("click", 50, 2), ("purchase", 60, 2),
        # u3 stalls at click
        ("view", 5, 3), ("click", 9, 3),
        # u4 purchase BEFORE click -> not converted
        ("view", 0, 4), ("purchase", 10, 4), ("click", 20, 4),
    ]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "user_id"])
    df = spark.createDataFrame(pdf)

    from simple_tsdb_spark.operators.behavior import funnel_conversion_time

    got = funnel_conversion_time(
        df, steps=["view", "click", "purchase"], window_ns=100
    ).toPandas().iloc[0]
    assert got.n_converted == 2
    assert got.min_ns == 30 and got.max_ns == 60
    assert got.mean_ns == (30 + 60) // 2
    # interpolated midpoint of {30, 60} on the x10 grid: 10*30 + 5*(60-30)
    assert got.p50_ns_x10 == 450
    assert got.p90_ns_x10 == 10 * 30 + 9 * (60 - 30)


def test_event_transitions_model(spark):
    """event_transitions vs a python model: per-user time order with
    event_id tie-break, no cross-user pairs, probs sum to 1 per from."""
    import pandas as pd

    from simple_tsdb_spark.plans.analytics import event_transitions

    sf = "/root/testdata/sf0.001"
    got = event_transitions(spark, sf).toPandas()

    ev = pd.read_parquet(f"{sf}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    counts = {}
    for _, g in ev.groupby("user_id"):
        types = list(g.event_type)
        for a, b in zip(types, types[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    assert len(got) == len(counts)
    froms = {}
    for (a, b), n in counts.items():
        froms[a] = froms.get(a, 0) + n
    for _, r in got.iterrows():
        assert counts[(r.from_type, r.to_type)] == r.n
        assert r.prob_ppm == (10**6 * counts[(r.from_type, r.to_type)]) // froms[r.from_type]
    # ppm probabilities per from_type sum to 1e6 minus < fan-out truncation
    sums = got.groupby("from_type").prob_ppm.sum()
    fan = got.groupby("from_type").size()
    for ft in sums.index:
        assert 10**6 - fan[ft] < sums[ft] <= 10**6


def test_forecast_revenue_q6_model(spark):
    """forecast_revenue vs a pandas recomputation of the Q6 filter and
    exact cent-grid revenue."""
    import pandas as pd

    from simple_tsdb_spark.plans.analytics import forecast_revenue

    sf = "/root/testdata/sf0.001"
    got = forecast_revenue(spark, sf).toPandas().set_index("ship_year")

    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    sel = li[
        (li.l_shipdate >= "1996-01-01")
        & (li.l_shipdate < "1998-01-01")
        & (li.l_discount >= 0.05)
        & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    ].copy()
    assert len(sel) == int(got.n_items.sum())
    for year, g in sel.groupby(sel.l_shipdate.dt.year):
        # exact integer cent×percent accumulation (the DECIMAL model)
        cents = (g.l_extendedprice * 100).round().astype("int64")
        pct = (g.l_discount * 100).round().astype("int64")
        want = float((cents * pct).sum()) / 10000.0
        assert got.loc[year].revenue == want
        assert got.loc[year].n_items == len(g)


def test_order_priority_counts_q4_model(spark):
    """Q4-shape EXISTS semantics: an order counts ONCE no matter how
    many of its lineitems shipped late, and zero-late orders are
    excluded.  Verified against a duckdb recomputation at sf0.001 plus
    a pandas EXISTS model."""
    import duckdb

    from simple_tsdb_spark.plans.analytics import (
        order_priority_counts,
        order_priority_counts_oracle,
    )

    sf = "/root/testdata/sf0.001"
    got = order_priority_counts(spark, sf).toPandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute(order_priority_counts_oracle()).df()
    assert list(got.o_orderpriority) == list(want.o_orderpriority)
    assert list(got.order_count) == list(want.order_count)
    # pandas EXISTS model — the semi-join must not double-count
    import pandas as pd

    o = pd.read_parquet(f"{sf}/orders.parquet")
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    o = o[(o.o_orderdate >= "1995-01-01") & (o.o_orderdate < "1995-04-01")]
    j = o.merge(li, left_on="o_orderkey", right_on="l_orderkey")
    late_keys = set(j[j.l_shipdate > j.o_orderdate].o_orderkey)
    model = (
        o[o.o_orderkey.isin(late_keys)]
        .groupby("o_orderpriority").size().sort_index()
    )
    assert list(got.order_count) == list(model)


def test_large_volume_customers_q18_model(spark):
    """Q18-shape group-HAVING: totals are exact decimal sums, the
    threshold is strict, ranking deterministic."""
    import duckdb

    from simple_tsdb_spark.plans.analytics import (
        large_volume_customers,
        large_volume_customers_oracle,
    )

    sf = "/root/testdata/sf0.001"
    got = large_volume_customers(spark, sf, min_quantity=100, k=10).toPandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute(
        large_volume_customers_oracle(min_quantity=100, k=10)
    ).df()
    assert list(got.o_orderkey) == list(want.o_orderkey)
    assert (got.total_qty.to_numpy() == want.total_qty.to_numpy()).all()
    assert (got.total_qty > 100).all()


def test_revenue_cube_rollup_model(spark):
    """ROLLUP invariants: per-nation subtotals equal the sum of their
    year rows, the grand total equals everything, lvl encodes the
    grouping level."""
    import duckdb

    from simple_tsdb_spark.plans.analytics import revenue_cube, revenue_cube_oracle

    sf = "/root/testdata/sf0.001"
    got = revenue_cube(spark, sf).toPandas()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute(revenue_cube_oracle()).df()
    assert len(got) == len(want)
    detail = got[got.lvl == 0]
    subtotal = got[got.lvl == 1]
    grand = got[got.lvl == 3]
    assert len(grand) == 1 and grand.iloc[0].n_name == "(all)"
    # subtotal consistency (double sums of the same decimal-exact parts)
    import numpy as np

    for _, s_ in subtotal.iterrows():
        parts = detail[detail.n_name == s_.n_name].revenue.sum()
        assert np.isclose(parts, s_.revenue, rtol=1e-12)
    assert np.isclose(grand.iloc[0].revenue, detail.revenue.sum(), rtol=1e-12)


def test_range_moving_avg_model(spark):
    """RANGE frame vs a brute-force pandas recomputation on irregular
    timestamps, including duplicate-timestamp peers."""
    import pandas as pd

    from simple_tsdb_spark.operators import range_moving_avg

    rows = [
        ("a", 100, 1.0), ("a", 150, 2.0), ("a", 150, 4.0),  # dup ts peers
        ("a", 260, 8.0), ("a", 400, 16.0),
        ("b", 100, 5.0), ("b", 99 + 101, 7.0),
    ]
    pdf = pd.DataFrame(rows, columns=["series", "time_ns", "value"])
    got = range_moving_avg(
        spark.createDataFrame(pdf), field="value", window_ns=101
    ).toPandas()
    for _, r in got.iterrows():
        mask = (
            (pdf.series == r.series)
            & (pdf.time_ns > r.time_ns - 101)
            & (pdf.time_ns <= r.time_ns)
        )
        want = pdf[mask].value.mean()
        assert r.n_in_window == mask.sum()
        assert abs(r.value_rmavg - want) < 1e-12, (r.series, r.time_ns)
    # duplicate timestamps are PEERS: both 150-rows see both values
    peers = got[(got.series == "a") & (got.time_ns == 150)]
    assert (peers.n_in_window == 3).all()  # 100, 150, 150 in (49, 150]
    import pytest as _pt

    with _pt.raises(ValueError):
        range_moving_avg(spark.createDataFrame(pdf), field="value", window_ns=0)


def test_min_cost_parts_keeps_all_ties(spark):
    """Q2 semantics: EVERY part at the type minimum survives; the
    window decorrelation equals the correlated-subquery oracle."""
    import duckdb

    from simple_tsdb_spark.plans.analytics import min_cost_parts, min_cost_parts_oracle

    sf = "/root/testdata/sf0.001"
    got = min_cost_parts(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf}/part.parquet'")
    want = con.execute(min_cost_parts_oracle()).df()
    assert list(got.p_partkey) == list(want.p_partkey)
    # per type, everything kept shares ONE price = the type min
    import pandas as pd

    part = pd.read_parquet(f"{sf}/part.parquet")
    mins = part.groupby("p_type").p_retailprice.min()
    for _, r in got.iterrows():
        assert r.p_retailprice == mins[r.p_type]


def test_nation_balance_share_sums_to_one(spark):
    """Truncated ppm shares over ALL nations sum to 10^6 minus the
    per-nation truncation losses (each < 1 ppm); the exact
    cross-multiplied threshold only filters."""
    import pandas as pd

    from simple_tsdb_spark.plans.analytics import nation_balance_share

    sf = "/root/testdata/sf0.001"
    got = nation_balance_share(spark, sf, min_share=0.0).toPandas()
    n_nations = len(got)
    assert 1_000_000 - n_nations <= got.share_ppm.sum() <= 1_000_000
    # cents are exact: totals must equal the pandas cents sum
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    nat = pd.read_parquet(f"{sf}/nation.parquet")
    cents = (cust.c_acctbal * 100).round().astype("int64")
    want = (
        cust.assign(_c=cents)
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .groupby("n_name")["_c"]
        .sum()
    )
    for r in got.itertuples():
        assert r.total_balance_cents == want[r.n_name]
    g = int(cents.sum())
    filtered = nation_balance_share(spark, sf, min_share=0.05).toPandas()
    assert set(filtered.n_name) == {
        n for n in got.n_name if want[n] * 20 > g  # 0.05 = 1/20 exact
    }


def test_supplier_balance_quartiles_model(spark):
    """Exact cents-x4 quartiles vs numpy (linear method on the integer
    cents, x4 is then an exact integer) per nation; every fixture
    nation appears."""
    import numpy as np
    import pandas as pd

    from simple_tsdb_spark.plans.analytics import supplier_balance_quartiles

    sf = "/root/testdata/sf0.001"
    got = supplier_balance_quartiles(spark, sf).toPandas().set_index("n_name")
    sup = pd.read_parquet(f"{sf}/supplier.parquet")
    nat = pd.read_parquet(f"{sf}/nation.parquet")
    j = sup.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    j["_cents"] = (j.s_acctbal * 100).round().astype("int64")
    for name, g in j.groupby("n_name"):
        assert got.loc[name, "n_suppliers"] == len(g)
        for q, col in (
            (0.25, "q1_cents_x4"),
            (0.5, "median_cents_x4"),
            (0.75, "q3_cents_x4"),
        ):
            want = 4 * np.quantile(g._cents.to_numpy(), q, method="linear")
            assert int(round(want)) == got.loc[name, col], (name, col)
            assert want == round(want)  # the x4 grid is exactly integral
    assert set(got.index) == set(j.n_name)
