"""Multi-source BFS hop distance as a frontier-expansion DataFrame loop.

New-engine scope (SURVEY.md §2.7): min-hop distance from a source vertex
set, the primitive behind "how far is every page from the seed set" /
neighborhood queries on a link graph. Undirected by default (edges are
traversed both ways); ``directed=True`` follows src→dst only.

Scale shape: classic frontier BFS — per round only the NEWLY discovered
frontier joins the edge table, never the full visited set, so round cost
is O(frontier boundary), not O(V). The edge table (symmetrized for the
undirected case) is hash-partitioned by the join key once and persisted;
each round shuffles only the O(frontier) vertex set into it via a
shuffle_hash join plus one aggregate to drop duplicates. The visited set
accumulates in a parquet-backed state table (flat plans, bounded lineage);
"seen before?" is a left-anti join against it, co-partitioned by v. Each
round is TWO jobs (frontier write with its count observed, visited-set
write); the loop stops when the frontier empties or at ``max_hops``.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from montecarlopagerank_spark.operators.state import StateStore


def bfs_hops(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 6,
    directed: bool = False,
    n_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """``edges(src, dst)`` + ``sources(v)`` → (``dist(v, hops:int)``, info)
    for every vertex reachable within ``max_hops``; sources get hops 0.
    Unreachable vertices are absent from the result."""
    t0 = time.time()
    n_parts = int(n_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("w"))
        )
    e = (
        e.filter(F.col("u") != F.col("w"))
        .distinct()  # multigraph dups only duplicate frontier work
        .repartition(n_parts, "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()  # pay the one edge exchange in setup

    store = StateStore(spark)
    frontier = store.materialize(
        sources.select("v").distinct().repartition(n_parts, "v"), "bfs_frontier"
    )
    visited = store.materialize(
        frontier.select("v", F.lit(0).alias("hops")), "bfs_dist"
    )
    rounds = 0
    for hop in range(1, max_hops + 1):
        obs = Observation(f"bfs_round_{hop}")
        nxt = (
            e.join(
                frontier.repartition(n_parts, "v").hint("shuffle_hash"),
                e["u"] == F.col("v"),
            )
            .select(F.col("w").alias("v"))
            .distinct()
            .withColumn("hops", F.lit(hop))
            # left-anti against the visited set: both sides hash(v)
            .join(visited.hint("shuffle_hash"), "v", "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        new = store.materialize(nxt, "bfs_frontier")
        if obs.get["n"] == 0:
            break
        rounds = hop
        frontier = new.select("v")
        visited = store.materialize(visited.unionByName(new), "bfs_dist")
    e.unpersist()
    out = visited.persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    return out, {
        "rounds": rounds,
        "max_hops": max_hops,
        "secs": round(time.time() - t0, 3),
    }


def _landmark_distances(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: DataFrame,
    max_hops: int,
    directed: bool,
    n_partitions: int | None,
) -> tuple[DataFrame, int]:
    """Shared kernel of the landmark centralities: exact per-(landmark,
    vertex) hop distances ``(l, v, hops)`` within ``max_hops``, from ONE
    multi-source BFS whose state is keyed (landmark, vertex) — landmarks
    expand simultaneously, so the loop costs the same number of rounds as
    a single BFS, not |landmarks| of them. Same one-job-per-hop /
    O(frontier) shape as :func:`bfs_hops`. Returns (distances, rounds);
    the distance table is NOT persisted (callers aggregate it once)."""
    n_parts = int(n_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("w"))
    if not directed:
        e = e.unionByName(
            edges.select(F.col("dst").alias("u"), F.col("src").alias("w"))
        )
    e = (
        e.filter(F.col("u") != F.col("w"))
        .distinct()
        .repartition(n_parts, "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    e.count()

    store = StateStore(spark)
    frontier = store.materialize(
        landmarks.select(F.col("v").alias("l"), "v")
        .distinct()
        .repartition(n_parts, "v"),
        "hc_frontier",
    )
    visited = store.materialize(
        frontier.select("l", "v", F.lit(0).alias("hops")), "hc_dist"
    )
    rounds = 0
    for hop in range(1, max_hops + 1):
        obs = Observation(f"hc_round_{hop}")
        nxt = (
            e.join(
                frontier.repartition(n_parts, "v").hint("shuffle_hash"),
                e["u"] == F.col("v"),
            )
            .select("l", F.col("w").alias("v"))
            .distinct()
            .withColumn("hops", F.lit(hop))
            .join(visited.hint("shuffle_hash"), ["l", "v"], "left_anti")
            .observe(obs, F.count(F.lit(1)).alias("n"))
        )
        new = store.materialize(nxt, "hc_frontier")
        if obs.get["n"] == 0:
            break
        rounds = hop
        frontier = new.select("l", "v")
        visited = store.materialize(visited.unionByName(new), "hc_dist")
    e.unpersist()
    return visited, rounds


def harmonic_centrality(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: DataFrame,
    max_hops: int = 6,
    directed: bool = False,
    n_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Landmark harmonic centrality (Boldi & Vigna, "Axioms for
    Centrality", Internet Math 2014): ``h(v) = Σ_l 1/d(v,l)`` over the
    landmark set, d capped at ``max_hops`` (unreached terms contribute 0,
    which is harmonic's built-in disconnection handling — no 1/∞
    special-casing). Distances via :func:`_landmark_distances`.

    Returns (``scores(v, harmonic)``, info). Vertices reaching no
    landmark within the cap are absent (h = 0)."""
    t0 = time.time()
    visited, rounds = _landmark_distances(
        spark, edges, landmarks, max_hops, directed, n_partitions
    )
    out = (
        visited.filter(F.col("hops") > 0)  # d(l,l)=0 excluded (l ≠ v terms)
        .groupBy("v")
        .agg(F.sum(F.lit(1.0) / F.col("hops")).alias("harmonic"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    return out, {
        "rounds": rounds,
        "max_hops": max_hops,
        "secs": round(time.time() - t0, 3),
    }


def closeness_centrality(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: DataFrame,
    max_hops: int = 6,
    directed: bool = False,
    n_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Landmark closeness centrality: ``c(v) = r_v / Σ_l d(v, l)`` over
    the landmarks v reaches within ``max_hops`` (r_v = how many) — the
    reciprocal of v's mean distance to its reachable landmarks, the
    landmark-sampled estimator of classic closeness (Eppstein & Wang,
    "Fast approximation of centrality", J. Graph Alg. Appl. 2004;
    restricting the mean to reached nodes is the standard
    disconnection-safe convention, cf. Wasserman & Faust). ``r_v`` is
    returned so callers can apply a reach-fraction correction or filter
    to vertices covering the full landmark set. The self term d(v,v)=0
    of a landmark vertex is excluded, matching harmonic. Distances via
    the same ONE simultaneous multi-source BFS as harmonic
    (:func:`_landmark_distances`); the aggregation is one map-side-
    combined groupBy — at 100 TB the only O(E)-touching work is the
    shared BFS itself.

    Returns (``scores(v, closeness, reached)``, info). Vertices reaching
    no landmark are absent."""
    t0 = time.time()
    visited, rounds = _landmark_distances(
        spark, edges, landmarks, max_hops, directed, n_partitions
    )
    out = (
        visited.filter(F.col("hops") > 0)
        .groupBy("v")
        .agg(
            (F.count(F.lit(1)) / F.sum("hops")).alias("closeness"),
            F.count(F.lit(1)).alias("reached"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    out.count()
    return out, {
        "rounds": rounds,
        "max_hops": max_hops,
        "secs": round(time.time() - t0, 3),
    }
