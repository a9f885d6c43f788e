"""Adjacency / CSR block / skew-helper unit tests (SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from montecarlopagerank_spark.operators.adjacency import (
    assign_blocks,
    build_adjacency,
    build_csr_blocks,
)
from montecarlopagerank_spark.operators.skew import salted_sum


def test_build_adjacency_closed_and_sorted(spark):
    e = spark.createDataFrame(
        [(0, 2), (0, 1), (1, 0)], "src long, dst long"
    )
    v = spark.createDataFrame([(0,), (1,), (2,)], "vid long")
    adj = {r["src"]: (r["neighbours"], r["deg"]) for r in
           build_adjacency(e, v).collect()}
    assert adj[0] == ([1, 2], 2)  # sorted
    assert adj[1] == ([0], 1)
    assert adj[2] == ([], 0)  # dangling -> empty array (ref :34-35)


def test_assign_blocks_degree_aware(spark):
    """Blocks pack ~equal edge counts: a hub vertex ends up alone in its
    block while low-degree vertices coalesce (north_star degree-aware
    block splits)."""
    rows = [(0, 100, 0)] + [(v, 1, 0) for v in range(1, 51)]
    deg = spark.createDataFrame(rows, "v long, out_deg long, in_deg long")
    ba = {r["v"]: r["block_id"] for r in
          assign_blocks(deg, edges_per_block=50).collect()}
    assert ba[0] == 0
    # the hub fills block 0 (101 weight > 50); others don't share it
    assert all(ba[v] > 0 for v in range(1, 51))
    # deterministic under repartition
    ba2 = {r["v"]: r["block_id"] for r in
           assign_blocks(deg.repartition(5), edges_per_block=50).collect()}
    assert ba == ba2


def test_csr_blocks_roundtrip(spark, gnutella_mini, gnutella_mini_pairs):
    from montecarlopagerank_spark.operators.edges import degrees

    deg = degrees(gnutella_mini)
    adj = build_adjacency(
        gnutella_mini, deg.select(F.col("v").alias("vid")))
    csr = build_csr_blocks(adj, assign_blocks(deg, edges_per_block=64))
    rebuilt = set()
    for row in csr.collect():
        vids = np.asarray(row["vids"])
        indptr = np.asarray(row["indptr"])
        indices = np.asarray(row["indices"])
        assert len(indptr) == len(vids) + 1
        assert list(vids) == sorted(vids)  # sorted within block
        for i, v in enumerate(vids):
            for d in indices[indptr[i]:indptr[i + 1]]:
                rebuilt.add((int(v), int(d)))
    assert rebuilt == set(gnutella_mini_pairs)


def test_salted_sum_equals_plain_sum(spark):
    # skewed input: one hot key with 10k rows
    df = spark.range(0, 10000).select(
        (F.col("id") % 7 == 0).cast("long").alias("k"),
        F.lit(1).alias("val"),
        F.col("id"),
    )
    plain = {r["k"]: r["s"] for r in
             df.groupBy("k").agg(F.sum("val").alias("s")).collect()}
    salted = {r["k"]: r["sum_val"] for r in
              salted_sum(df, "k", "val", n_salts=8).collect()}
    assert plain == salted


def test_salted_sum_deterministic(spark):
    df = spark.range(0, 1000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("val"))
    a = sorted(map(tuple, salted_sum(df, "k", "val").collect()))
    b = sorted(map(tuple, salted_sum(df.repartition(9), "k", "val").collect()))
    assert a == b
