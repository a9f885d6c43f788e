"""Funnel / retention / transition analytics.

Micro-cases pin the greedy in-order semantics (>= at equal ts, prefix
monotonicity); randomized cases prove the one-shuffle array
formulation equals the naive per-user Python definition.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.funnel import (
    event_transition_matrix,
    funnel_counts,
    retention_cohorts,
)


def ev_df(spark, rows):
    """rows: (user_id, event_id, us, event_type)."""
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, us long, event_type string"
    )
    return df.withColumn(
        "ts", F.timestamp_micros("us").cast("timestamp_ntz")
    ).drop("us")


def funnel_naive(rows, steps):
    """Greedy earliest in-order match per user; returns per-step user counts."""
    by_user: dict[int, list[tuple[int, str]]] = {}
    for u, _e, us, t in rows:
        by_user.setdefault(u, []).append((us, t))
    counts = [0] * len(steps)
    for evs in by_user.values():
        prev = None
        for i, s in enumerate(steps):
            cands = [us for us, t in evs if t == s and (prev is None or us >= prev)]
            if not cands:
                break
            prev = min(cands)
            counts[i] += 1
    return {i + 1: c for i, c in enumerate(counts)}


def test_funnel_in_order_only(spark):
    rows = [
        (1, 0, 10, "view"), (1, 1, 20, "click"), (1, 2, 30, "purchase"),
        (2, 3, 20, "click"), (2, 4, 30, "view"),  # click before view: no step 2
        (3, 5, 10, "view"),
    ]
    out = funnel_counts(ev_df(spark, rows), ["view", "click", "purchase"]).collect()
    got = {r.step_idx: r.n_users for r in out}
    assert got == {1: 3, 2: 1, 3: 1}
    assert got == funnel_naive(rows, ["view", "click", "purchase"])


def test_funnel_equal_ts_counts_in_order(spark):
    # >= semantics: click at the same instant as view completes the step
    rows = [(1, 0, 10, "view"), (1, 1, 10, "click")]
    out = funnel_counts(ev_df(spark, rows), ["view", "click"]).collect()
    assert {r.step_idx: r.n_users for r in out} == {1: 1, 2: 1}


def test_funnel_greedy_earliest_anchor(spark):
    # the greedy anchor is the EARLIEST step-1 ts; a later view cannot
    # "rescue" an earlier click, but a later click still matches
    rows = [(1, 0, 50, "view"), (1, 1, 40, "click"), (1, 2, 60, "click")]
    out = funnel_counts(ev_df(spark, rows), ["view", "click"]).collect()
    assert {r.step_idx: r.n_users for r in out} == {1: 1, 2: 1}


def test_funnel_randomized_vs_naive(spark):
    rng = random.Random(13)
    types = ["view", "click", "purchase", "error"]
    rows = [
        (rng.randint(1, 20), i, rng.randint(0, 50), rng.choice(types))
        for i in range(400)
    ]
    steps = ["view", "click", "purchase"]
    out = funnel_counts(ev_df(spark, rows), steps).collect()
    got = {r.step_idx: r.n_users for r in out}
    assert got == funnel_naive(rows, steps)
    # prefix monotonicity
    assert got[1] >= got[2] >= got[3]


def retention_naive(rows, period):
    first = {}
    for u, _e, us, _t in rows:
        p = us // period
        first[u] = min(first.get(u, p), p)
    cells: dict[tuple[int, int], set[int]] = {}
    for u, _e, us, _t in rows:
        cells.setdefault((first[u], us // period - first[u]), set()).add(u)
    return {k: len(v) for k, v in cells.items()}


def test_retention_micro(spark):
    rows = [
        (1, 0, 5, "view"), (1, 1, 25, "view"),   # cohort 0, offsets 0 and 2
        (2, 2, 12, "view"), (2, 3, 13, "view"),  # cohort 1, offset 0 (distinct!)
    ]
    out = retention_cohorts(ev_df(spark, rows), period_us=10).collect()
    got = {(r.cohort_period, r.offset): r.n_users for r in out}
    assert got == {(0, 0): 1, (0, 2): 1, (1, 0): 1}
    assert got == retention_naive(rows, 10)


def test_retention_randomized_vs_naive(spark):
    rng = random.Random(17)
    rows = [
        (rng.randint(1, 15), i, rng.randint(0, 200), "view") for i in range(300)
    ]
    out = retention_cohorts(ev_df(spark, rows), period_us=20).collect()
    got = {(r.cohort_period, r.offset): r.n_users for r in out}
    assert got == retention_naive(rows, 20)


def test_transition_matrix(spark):
    rows = [
        (1, 0, 10, "a"), (1, 1, 20, "b"), (1, 2, 30, "a"),
        (2, 3, 10, "b"), (2, 4, 20, "a"),
    ]
    out = event_transition_matrix(ev_df(spark, rows)).collect()
    got = {(r.from_type, r.to_type): r.n for r in out}
    assert got == {("a", "b"): 1, ("b", "a"): 2}


def test_transition_ties_broken_by_order_col(spark):
    # equal ts: event_id decides the order deterministically
    rows = [(1, 2, 10, "c"), (1, 1, 10, "b"), (1, 0, 10, "a")]
    out = event_transition_matrix(ev_df(spark, rows)).collect()
    got = {(r.from_type, r.to_type): r.n for r in out}
    assert got == {("a", "b"): 1, ("b", "c"): 1}
