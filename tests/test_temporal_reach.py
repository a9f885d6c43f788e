"""Earliest-arrival temporal reachability (algos/temporal_reach.py):
python-twin equality, time-respecting-path semantics, hop cap, and the
early-stop fixpoint."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from montecarlopagerank_spark.algos.temporal_reach import earliest_arrival


def ea_naive(tedges, sources, hops):
    """Python twin: per round ea(v) ← min(ea(v), min {t : (u,v,t), t ≥ ea(u)})."""
    ea = {}
    for v, t0 in sources:
        ea[v] = min(ea.get(v, t0), t0)
    for _ in range(hops):
        nxt = dict(ea)
        for u, v, t in tedges:
            if u in ea and t >= ea[u]:
                nxt[v] = min(nxt.get(v, t), t)
        if nxt == ea:
            break
        ea = nxt
    return ea


def run(spark, tedges, sources, **kw):
    te = spark.createDataFrame(tedges, "src string, dst string, t long")
    s = spark.createDataFrame(sources, "v string, t0 long")
    out, info = earliest_arrival(spark, te, s, **kw)
    return {r.v: r.ea for r in out.collect()}, info


def test_chain_respects_time_order(spark):
    # b→c fires at t=5 BEFORE a→b arrives (t=10): c unreachable via b
    tedges = [("a", "b", 10), ("b", "c", 5), ("b", "d", 20)]
    got, info = run(spark, tedges, [("a", 0)])
    assert got == {"a": 0, "b": 10, "d": 20}
    assert info["converged"]


def test_min_over_parallel_paths(spark):
    tedges = [("a", "b", 3), ("a", "b", 7), ("b", "c", 4), ("b", "c", 9)]
    got, _ = run(spark, tedges, [("a", 1)])
    # arrive b at 3, then c at 4 (4 ≥ 3)
    assert got == {"a": 1, "b": 3, "c": 4}


def test_hop_cap_limits_depth(spark):
    tedges = [(f"n{i}", f"n{i+1}", i + 1) for i in range(10)]
    got, info = run(spark, tedges, [("n0", 0)], max_hops=3)
    assert got == {f"n{i}": i for i in range(4)} | {"n0": 0}
    assert not info["converged"]


def test_duplicate_sources_take_min_t0(spark):
    got, _ = run(spark, [("s", "x", 50)], [("s", 60), ("s", 40)])
    assert got == {"s": 40, "x": 50}


def test_randomized_vs_python_twin(spark):
    rng = random.Random(73)
    tedges = [
        (f"v{rng.randint(0, 12)}", f"v{rng.randint(0, 12)}", rng.randint(0, 40))
        for _ in range(80)
    ]
    sources = [("v0", 5), ("v3", 12)]
    got, info = run(spark, tedges, sources, max_hops=8)
    assert got == ea_naive(tedges, sources, 8)


def test_early_stop_before_cap(spark):
    tedges = [("a", "b", 1), ("b", "c", 2)]
    got, info = run(spark, tedges, [("a", 0)], max_hops=50)
    assert got == {"a": 0, "b": 1, "c": 2}
    assert info["converged"] and info["rounds"] <= 4


def relay_naive(tedges, h):
    out: dict = {}
    for _, v, t1 in tedges:
        for u, _, t2 in tedges:
            if u == v and t1 <= t2 <= t1 + h:
                out[v] = out.get(v, 0) + 1
    return out


def test_relay_counts_vs_naive(spark):
    rng = random.Random(83)
    tedges = [
        (f"v{rng.randint(0, 8)}", f"v{rng.randint(0, 8)}", rng.randint(0, 500))
        for _ in range(120)
    ]
    from montecarlopagerank_spark.algos.temporal_reach import relay_counts

    te = spark.createDataFrame(tedges, "src string, dst string, t long")
    got = {r.v: r.n_relays for r in relay_counts(te, horizon_us=50).collect()}
    assert got == relay_naive(tedges, 50)


def test_relay_horizon_boundary_inclusive(spark):
    from montecarlopagerank_spark.algos.temporal_reach import relay_counts

    # in at t=100; outs at t=99 (before: no), 100 (equal: yes),
    # 150 (inside: yes), 200 (== t1+H: yes), 201 (past: no)
    te = spark.createDataFrame(
        [("a", "m", 100), ("m", "x", 99), ("m", "x", 100), ("m", "x", 150),
         ("m", "x", 200), ("m", "x", 201)],
        "src string, dst string, t long",
    )
    got = {r.v: r.n_relays for r in relay_counts(te, horizon_us=100).collect()}
    assert got == {"m": 3, "x": 0} or got == {"m": 3}
    assert got.get("m") == 3
