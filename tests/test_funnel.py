"""Hand-computed funnel / retention-cohort cases (operators/history.py
funnel_counts, retention_cohorts). The adversarial shapes the shared
DuckDB oracle cannot adjudicate alone: out-of-order steps, equal-ts
ties under the strict-> rule, activity before the anchor, and the
offset-0 self period. Full-table parity rides sweep_oracles
(cdc_funnel_steps, cdc_retention_cohorts)."""

import datetime as dt

from clever_canal_spark.operators.history import funnel_counts, retention_cohorts

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), t) for (u, m, t) in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_order_and_dropoff(spark):
    rows = [
        # u1 completes all three in order
        (1, 0, "signup"), (1, 5, "view"), (1, 9, "buy"),
        # u2: buy BEFORE view -> reaches view only
        (2, 0, "signup"), (2, 3, "buy"), (2, 7, "view"),
        # u3: signup only
        (3, 0, "signup"),
        # u4: never signs up -> not in the funnel at all
        (4, 1, "view"), (4, 2, "buy"),
    ]
    out = funnel_counts(_ev(spark, rows), ["signup", "view", "buy"])
    got = {r.step_idx: (r.step, r.n_keys) for r in out.collect()}
    assert got == {1: ("signup", 3), 2: ("view", 2), 3: ("buy", 1)}


def test_funnel_strict_gt_excludes_same_timestamp(spark):
    # view at EXACTLY the signup instant does not advance (strict >),
    # but a later view does — and the buy after that later view counts
    rows = [
        (1, 0, "signup"), (1, 0, "view"),            # tie: no advance
        (2, 0, "signup"), (2, 0, "view"), (2, 4, "view"), (2, 6, "buy"),
    ]
    out = funnel_counts(_ev(spark, rows), ["signup", "view", "buy"])
    got = {r.step_idx: r.n_keys for r in out.collect()}
    assert got == {1: 2, 2: 1, 3: 1}


def test_funnel_earliest_reach_blocks_shortcut(spark):
    # u1's EARLIEST view (t=1) precedes its buy window correctly:
    # reach times are min-per-step, so buy at t=2 counts even though a
    # second view happened later at t=10
    rows = [(1, 0, "signup"), (1, 1, "view"), (1, 2, "buy"), (1, 10, "view")]
    out = funnel_counts(_ev(spark, rows), ["signup", "view", "buy"])
    assert {r.step_idx: r.n_keys for r in out.collect()} == {1: 1, 2: 1, 3: 1}


def _ev_days(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1) + dt.timedelta(days=d), t) for (u, d, t) in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_retention_offsets_and_pre_anchor_exclusion(spark):
    # 2024-01-01 is epoch day 19723; 19723 div 7 = 2817 -> that 7-day
    # bin starts at epoch day 19719 = 2023-12-28
    rows = [
        (1, 0, "signup"),            # cohort bin B
        (1, 0, "click"),             # offset 0 (same bin, same day)
        (1, 7, "click"),             # 2024-01-08: bin B+1 -> offset 1
        (1, 21, "click"),            # offset 3
        (2, 7, "signup"),            # cohort B+1
        (2, 0, "click"),             # BEFORE anchor bin -> excluded
        (2, 14, "click"),            # offset 1
        (3, 0, "click"),             # never signs up -> absent
    ]
    out = retention_cohorts(_ev_days(spark, rows), "signup")
    got = {(str(r.cohort_start), r.period_offset): r.n_active for r in out.collect()}
    assert got == {
        ("2023-12-28", 0): 1,
        ("2023-12-28", 1): 1,
        ("2023-12-28", 3): 1,
        ("2024-01-04", 0): 1,
        ("2024-01-04", 1): 1,
    }


def test_retention_distinct_within_period(spark):
    # three clicks in one later bin count the user ONCE
    rows = [(1, 0, "signup"), (1, 7, "click"), (1, 8, "click"), (1, 9, "click")]
    out = retention_cohorts(_ev_days(spark, rows), "signup")
    got = {r.period_offset: r.n_active for r in out.collect()}
    assert got == {0: 1, 1: 1}


def test_retention_active_types_filter(spark):
    # with active_types=['click'], the signup itself doesn't count as
    # activity — offset 0 disappears for a user whose only bin-B event
    # is the signup
    rows = [(1, 0, "signup"), (1, 7, "click"), (1, 14, "view")]
    out = retention_cohorts(_ev_days(spark, rows), "signup", active_types=["click"])
    got = {r.period_offset: r.n_active for r in out.collect()}
    assert got == {1: 1}
