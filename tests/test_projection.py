"""Bipartite co-occurrence projection: pair weights vs a naive oracle,
dedup of repeated (group, item) rows, and the mega-group drop guard."""

from __future__ import annotations

import itertools
import random

from montecarlopagerank_spark.operators.projection import (
    butterfly_stats,
    cooccurrence_pairs,
)


def proj_naive(rows, cap=None):
    groups: dict[int, set[str]] = {}
    for g, item in rows:
        if item is not None:
            groups.setdefault(g, set()).add(item)
    counts: dict[tuple[str, str], int] = {}
    for items in groups.values():
        if cap is not None and len(items) > cap:
            continue
        for a, b in itertools.combinations(sorted(items), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    return counts


def to_df(spark, rows):
    return spark.createDataFrame(rows, "g long, item string")


def test_pairs_micro(spark):
    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a")]
    out = cooccurrence_pairs(to_df(spark, rows), group_col="g", item_col="item").collect()
    got = {(r.item_a, r.item_b): r.n_groups for r in out}
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_duplicate_rows_and_nulls_ignored(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, None)]
    out = cooccurrence_pairs(to_df(spark, rows), group_col="g", item_col="item").collect()
    assert {(r.item_a, r.item_b): r.n_groups for r in out} == {("a", "b"): 1}


def test_mega_group_dropped_not_truncated(spark):
    # group 9 has 5 distinct items > cap 3: ALL its pairs vanish;
    # group 1 (2 items) survives untouched
    rows = [(9, f"x{i}") for i in range(5)] + [(1, "a"), (1, "b")]
    out = cooccurrence_pairs(
        to_df(spark, rows), group_col="g", item_col="item", max_group_items=3
    ).collect()
    got = {(r.item_a, r.item_b): r.n_groups for r in out}
    assert got == {("a", "b"): 1}
    assert got == proj_naive(rows, cap=3)


def butterfly_naive(rows, cap=None):
    counts = proj_naive(rows, cap=cap)
    return {
        "n_butterflies": sum(c * (c - 1) // 2 for c in counts.values()),
        "n_linked_item_pairs": len(counts),
        "n_closed_item_pairs": sum(1 for c in counts.values() if c >= 2),
        "max_pair_groups": max(counts.values(), default=0),
    }


def test_butterfly_micro(spark):
    # groups 1,2 both contain {a,b} -> exactly one butterfly; group 3
    # adds a third {a,b} group -> C(3,2)=3 butterflies on that pair
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "b")]
    got = butterfly_stats(
        to_df(spark, rows), group_col="g", item_col="item"
    ).collect()[0].asDict()
    assert got == {
        "n_butterflies": 3,
        "n_linked_item_pairs": 1,
        "n_closed_item_pairs": 1,
        "max_pair_groups": 3,
    }


def test_butterfly_empty_relation(spark):
    # no item ever co-occurs: zero pairs, all-zero census (not nulls)
    rows = [(1, "a"), (2, "b")]
    got = butterfly_stats(
        to_df(spark, rows), group_col="g", item_col="item"
    ).collect()[0].asDict()
    assert got == {
        "n_butterflies": 0,
        "n_linked_item_pairs": 0,
        "n_closed_item_pairs": 0,
        "max_pair_groups": 0,
    }


def test_butterfly_randomized_vs_naive(spark):
    rng = random.Random(31)
    rows = [(rng.randint(1, 10), f"i{rng.randint(0, 7)}") for _ in range(300)]
    got = butterfly_stats(
        to_df(spark, rows), group_col="g", item_col="item", max_group_items=None
    ).collect()[0].asDict()
    assert got == butterfly_naive(rows)


def test_butterfly_respects_mega_group_cap(spark):
    # the over-cap group's wedges vanish from the census too
    rows = [(9, f"x{i}") for i in range(5)] + [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    got = butterfly_stats(
        to_df(spark, rows), group_col="g", item_col="item", max_group_items=3
    ).collect()[0].asDict()
    assert got == butterfly_naive(rows, cap=3)


def test_randomized_vs_naive(spark):
    rng = random.Random(23)
    rows = [
        (rng.randint(1, 12), f"i{rng.randint(0, 9)}") for _ in range(250)
    ]
    out = cooccurrence_pairs(
        to_df(spark, rows), group_col="g", item_col="item", max_group_items=None
    ).collect()
    got = {(r.item_a, r.item_b): r.n_groups for r in out}
    assert got == proj_naive(rows)
