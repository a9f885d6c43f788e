"""Temporal operators: sessionize / asof_join / range_join_count.

Hand-built micro-cases pin the boundary semantics (gap strictly >,
as-of <= with right-at-equal-ts visible, ±W inclusive, self excluded);
a randomized case proves the scalable formulations equal the naive
O(n²) definitions.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.temporal import (
    asof_join,
    range_join_count,
    session_stats,
    sessionize,
)


def ev_df(spark, rows):
    """rows: (user_id, event_id, us) with us in int64 'micros'."""
    df = spark.createDataFrame(rows, "user_id long, event_id long, us long")
    # sessionize derives us from ts; synthesize a ts from the micros
    return df.withColumn("ts", F.timestamp_micros("us").cast("timestamp_ntz")).drop(
        "us"
    )


def test_sessionize_gap_boundary(spark):
    # gap=10us: deltas of exactly 10 stay in-session, 11 starts a new one
    rows = [(1, 0, 100), (1, 1, 110), (1, 2, 121), (1, 3, 131)]
    out = sessionize(ev_df(spark, rows), gap_us=10).select(
        "event_id", "session_id"
    ).collect()
    got = {r.event_id: r.session_id for r in out}
    assert got == {0: 1, 1: 1, 2: 2, 3: 2}


def test_sessionize_per_user_independent(spark):
    rows = [(1, 0, 0), (2, 1, 1), (1, 2, 1_000_000_000), (2, 3, 2)]
    out = sessionize(ev_df(spark, rows), gap_us=10).collect()
    got = {r.event_id: (r.user_id, r.session_id) for r in out}
    assert got == {0: (1, 1), 2: (1, 2), 1: (2, 1), 3: (2, 1)}


def test_session_stats_aggregates(spark):
    rows = [(1, 5, 100), (1, 6, 105), (1, 7, 300)]
    out = session_stats(ev_df(spark, rows), gap_us=10).collect()
    by_sid = {r.session_id: r for r in out}
    assert by_sid[1].n_events == 2
    assert by_sid[1].duration_us == 5
    assert by_sid[1].first_event_id == 5
    assert by_sid[2].n_events == 1
    assert by_sid[2].duration_us == 0


def asof_naive(lefts, rights):
    """lefts: (key, us, lid); rights: (key, us, rid) unique per (key,us)."""
    out = {}
    for k, lus, lid in lefts:
        best = None
        for rk, rus, rid in rights:
            if rk == k and rus <= lus and (best is None or rus > best[0]):
                best = (rus, rid)
        out[lid] = best[1] if best else None
    return out


def test_asof_join_semantics(spark):
    lefts = [(1, 100, 10), (1, 50, 11), (1, 20, 12), (2, 100, 13)]
    rights = [(1, 30, 900), (1, 100, 901), (2, 101, 902)]
    l = spark.createDataFrame(lefts, "k long, us long, lid long")
    r = spark.createDataFrame(rights, "k long, us long, rid long")
    out = asof_join(l, r, on="k", ts="us", right_cols=["rid"]).collect()
    got = {x.lid: x.rid for x in out}
    # lid 10: right at equal ts (100) wins over 30; lid 12: nothing <= 20;
    # lid 13: right ts 101 > 100 → no match
    assert got == {10: 901, 11: 900, 12: None, 13: None}
    assert got == asof_naive(lefts, rights)


def test_asof_join_randomized_vs_naive(spark):
    rng = random.Random(7)
    lefts = [(rng.randint(1, 5), rng.randint(0, 1000), i) for i in range(120)]
    # unique (key, us) on the right
    seen = set()
    rights = []
    for j in range(80):
        k, us = rng.randint(1, 5), rng.randint(0, 1000)
        if (k, us) not in seen:
            seen.add((k, us))
            rights.append((k, us, 1000 + j))
    l = spark.createDataFrame(lefts, "k long, us long, lid long")
    r = spark.createDataFrame(rights, "k long, us long, rid long")
    out = asof_join(l, r, on="k", ts="us", right_cols=["rid"]).collect()
    got = {x.lid: x.rid for x in out}
    assert got == asof_naive(lefts, rights)


def test_asof_join_keeps_left_payload(spark):
    l = spark.createDataFrame([(1, 10, 77, "keep")], "k long, us long, lid long, tag string")
    r = spark.createDataFrame([(1, 5, 9)], "k long, us long, rid long")
    row = asof_join(l, r, on="k", ts="us", right_cols=["rid"]).collect()[0]
    assert (row.tag, row.rid) == ("keep", 9)


def range_naive(lefts, rights, w):
    out = {}
    for k, lus, lid in lefts:
        out[lid] = sum(
            1
            for rk, rus, rid in rights
            if rk == k and rid != lid and abs(rus - lus) <= w
        )
    return out


def test_range_join_count_boundaries(spark):
    # |dt| == W inclusive; self excluded; zero-match rows kept at 0
    lefts = [(1, 100, 0), (1, 500, 1)]
    rights = [(1, 100, 0), (1, 110, 2), (1, 89, 3), (1, 111, 4)]
    l = spark.createDataFrame(lefts, "k long, us long, id long")
    r = spark.createDataFrame(rights, "k long, us long, id long")
    out = range_join_count(
        l, r, on="k", ts="us", window_us=10, left_id="id", right_id="id"
    ).collect()
    got = {x.id: x.n_nearby for x in out}
    assert got == {0: 1, 1: 0}  # only id=2 at +10; 89 (-11) and 111 (+11) out


def test_range_join_count_randomized_vs_naive(spark):
    rng = random.Random(11)
    rows = [(rng.randint(1, 4), rng.randint(0, 300), i) for i in range(150)]
    df = spark.createDataFrame(rows, "k long, us long, id long")
    out = range_join_count(
        df, df, on="k", ts="us", window_us=25, left_id="id", right_id="id"
    ).collect()
    got = {x.id: x.n_nearby for x in out}
    assert got == range_naive(rows, rows, 25)


def test_turn_latency_closed_form(spark):
    """Two convs with known µs gaps; percentile interpolation exact."""
    from datetime import datetime

    from montecarlopagerank_spark.pipeline.temporal import turn_latency

    def t(s):
        return datetime(2026, 1, 1, 0, 0, s)

    rows = [
        # conv A: user@0 -> assistant@2 -> user@3
        ("A", 0, "user", t(0)), ("A", 1, "assistant", t(2)),
        ("A", 2, "user", t(3)),
        # conv B: user@0 -> assistant@6
        ("B", 0, "user", t(0)), ("B", 1, "assistant", t(6)),
    ]
    ts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    got = {(r["prev_role"], r["role"]): r for r in turn_latency(ts).collect()}
    ua = got[("user", "assistant")]
    # gaps 2s and 6s -> mean 4s, p50 = 4s, p95 = 2 + 0.95*4 = 5.8s
    assert ua["n"] == 2
    assert ua["mean_us"] == 4_000_000.0
    assert ua["p50_us"] == 4_000_000.0
    assert ua["p95_us"] == pytest.approx(5_800_000.0)
    au = got[("assistant", "user")]
    assert (au["n"], au["mean_us"], au["p50_us"]) == (1, 1_000_000.0, 1_000_000.0)
    assert len(got) == 2  # no other transitions


def test_conversation_profile_closed_form(spark):
    import datetime as dt

    from montecarlopagerank_spark.pipeline.temporal import conversation_profile

    b = dt.datetime(2024, 3, 1)
    rows = [
        ("c1", 0, "user", "hi", None, b),
        ("c1", 1, "assistant", "hello!", "bash", b + dt.timedelta(seconds=2)),
        ("c1", 2, "user", "bye", None, b + dt.timedelta(seconds=5)),
        ("c2", 0, "user", "x", "sql", b),
    ]
    ts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    got = {r["conv_id"]: r for r in conversation_profile(ts).collect()}
    c1 = got["c1"]
    assert (c1["n_turns"], c1["n_roles"], c1["n_tool_calls"]) == (3, 2, 1)
    assert c1["duration_us"] == 5_000_000
    assert c1["total_chars"] == len("hi") + len("hello!") + len("bye")
    assert (got["c2"]["n_turns"], got["c2"]["duration_us"]) == (1, 0)


def test_conversation_profile_null_adversarial(spark):
    """The r03 driver hash-FAIL mode: a conversation whose ts (or text)
    values are ALL NULL must yield duration_us = 0 / total_chars = 0 as
    non-null BIGINTs — a nullable long round-trips through Arrow/pandas
    as float64 NaN and hash-canonicalizes differently from SQL NULL."""
    import datetime as dt

    from montecarlopagerank_spark.pipeline.temporal import conversation_profile

    b = dt.datetime(2024, 3, 1)
    rows = [
        ("c1", 0, "user", None, None, None),      # all-NULL ts + text
        ("c1", 1, "assistant", None, "bash", None),
        ("c2", 0, None, "x", None, b),            # NULL role
        ("c2", 1, "user", None, None, None),      # mixed NULL ts/text
    ]
    ts = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string,"
        " tool string, ts timestamp")
    out = conversation_profile(ts)
    # non-null long columns, never nullable-coerced
    dtypes = dict(out.dtypes)
    assert dtypes["duration_us"] == "bigint"
    assert dtypes["total_chars"] == "bigint"
    got = {r["conv_id"]: r for r in out.collect()}
    c1, c2 = got["c1"], got["c2"]
    assert (c1["duration_us"], c1["total_chars"]) == (0, 0)
    assert c1["n_roles"] == 2 and c1["n_tool_calls"] == 1
    # one non-null ts → max-min over the singleton = 0; one non-null text
    assert (c2["duration_us"], c2["total_chars"]) == (0, 1)
    assert c2["n_roles"] == 1  # countDistinct skips the NULL role
    pdf = out.toPandas()
    assert str(pdf["duration_us"].dtype) == "int64"  # no float64 NaN coercion
    assert str(pdf["total_chars"].dtype) == "int64"
