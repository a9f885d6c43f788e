"""Katz centrality as pure DataFrame joins/aggs.

New-engine scope (no reference twin — the reference ships only PageRank;
Katz is the third canonical link-analysis centrality next to PageRank
and HITS, SURVEY.md §2.7): x = Σ_k α^k (Aᵀ)^k·β1, computed by the fixed
point  x ← β + α·Aᵀx  over the directed multigraph (duplicate edges
count, matching the PageRank operators' multigraph semantics).

The raw series converges only for α < 1/λ_max(A); on a web-scale
multigraph λ_max grows with hub degree, so NO fixed α is scale-safe —
the raw iterate can overflow the useful double range while stronger
vertices still dominate correctly. The deliverable is therefore the
L1-NORMALIZED score (``katz_norm``, scaled ×n like the PageRank
queries): below the spectral radius it equals normalized Katz, above it
the iterate's direction converges to the dominant left eigenvector
(eigenvector centrality with β-regularization) — deterministic and
well-conditioned either way. The raw score is also returned for graphs
a caller KNOWS are subcritical. Normalizing once at the end (not per
step) keeps the unrolled SQL twin trivially identical.

Scale shape mirrors hits.py: the edge table is exchanged ONCE
(hash-partitioned by src) and pinned; each superstep shuffles only the
O(V) score vector into that partitioning via a shuffle_hash join (never
broadcast — O(V) driver-serial hash builds flatline core scaling), and
is exactly ONE Spark job: the state write, with the score L1 mass riding
as an ``observe`` metric. State is carried exactly (no normalization),
so the unrolled SQL twin (contract.py ``_katz_sql``) matches to fp
round-off.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from montecarlopagerank_spark.operators.state import StateStore


def katz(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    alpha: float = 0.05,
    beta: float = 1.0,
    iters: int = 6,
    n_partitions: int | None = None,
    x0: float | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """``edges(src, dst)`` → (``scores(v, katz)``, info) after ``iters``
    exact supersteps from x₀ = ``x0``·1 (default β·1). ``vertices(vid,
    ...)`` optionally supplies isolated vertex ids (score stays β).
    ``x0`` exists so the β=0 power-method family (eigenvector
    centrality) can still start from a non-degenerate vector."""
    t0 = time.time()
    n_parts = int(n_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select("src", "dst")
    if vertices is not None:
        verts = vertices.select(F.col("vid").alias("v")).distinct()
    else:
        verts = (
            e.select(F.col("src").alias("v"))
            .unionByName(e.select(F.col("dst").alias("v")))
            .distinct()
        )
    e_src = e.repartition(n_parts, "src").persist(StorageLevel.MEMORY_AND_DISK)
    verts = verts.repartition(n_parts, "v").persist(StorageLevel.MEMORY_AND_DISK)
    e_src.count()
    n = verts.count()
    if n == 0:
        return spark.createDataFrame([], "v string, katz double"), {
            "iterations": 0,
            "n": 0,
        }

    init = float(beta if x0 is None else x0)
    store = StateStore(spark)
    x = store.materialize(verts.select("v", F.lit(init).alias("s")), "katz_x")
    mass = float(n) * init
    for it in range(iters):
        agg = (
            e_src.join(
                x.repartition(n_parts, "v").hint("shuffle_hash"),
                e_src["src"] == F.col("v"),
            )
            .select(F.col("dst").alias("vc"), F.col("s").alias("m"))
            .groupBy("vc")
            .agg(F.sum("m").alias("m"))
        )
        obs = Observation(f"katz_{it}")
        x_next = (
            verts.join(agg.hint("shuffle_hash"), verts["v"] == agg["vc"], "left")
            .select(
                "v",
                (
                    F.lit(float(beta))
                    + F.lit(float(alpha)) * F.coalesce("m", F.lit(0.0))
                ).alias("s"),
            )
            .observe(obs, F.sum("s").alias("t"))
        )
        x = store.materialize(x_next, "katz_x")
        mass = obs.get["t"]

    norm = (
        (F.col("s") * F.lit(float(n)) / F.lit(float(mass)))
        if mass != 0.0
        else F.lit(0.0)  # edge-free graph: keep the output finite
    )
    out = x.select(
        "v",
        F.col("s").alias("katz"),
        norm.alias("katz_norm"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    e_src.unpersist(), verts.unpersist()
    return out, {
        "iterations": iters,
        "n": n,
        "mass": mass,
        "secs": round(time.time() - t0, 3),
    }


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    iters: int = 6,
    n_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """In-edge eigenvector centrality by ``iters`` exact power-method
    supersteps: x₀ = 1, x ← Aᵀx, L1-normalized ×n once at the end — the
    β=0 member of the Katz family (x converges in direction to the
    dominant left eigenvector of the multigraph adjacency; the single
    final normalization keeps the unrolled SQL twin exact, katz.py
    module docstring). Output column is still named ``katz``/
    ``katz_norm`` — same contract as :func:`katz`."""
    return katz(
        spark,
        edges,
        vertices,
        alpha=1.0,
        beta=0.0,
        iters=iters,
        n_partitions=n_partitions,
        x0=1.0,
    )
