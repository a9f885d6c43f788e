"""Connected components via alternating small-star / large-star.

Algorithm: Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
"Connected Components in MapReduce and Beyond" (SoCC 2014) — the exact
algorithm named by BASELINE.json's north_star (no reference code exists;
SURVEY.md §2.7). Components are over the *undirected* closure of the edge
set. Output labels are exact: every vertex gets the minimum vid of its
component, so results are deterministic and parallelism-invariant.

Edges are treated as undirected node pairs throughout; each star op views
the pair from the directions it needs (large-star from both endpoints,
small-star from the larger endpoint), exactly as in the paper's MapReduce
formulation:

  large-star(u):  m = min(Γ(u) ∪ {u});  emit (v, m) for v ∈ Γ(u), v > u
  small-star(u):  over N≤ = {v ∈ Γ(u): v < u}: m = min(N≤);
                  emit (v, m) for v ∈ N≤ ∪ {u}, v ≠ m

Both are one groupBy(min) + one join + a conditional projection — pure
DataFrame, partial-aggregable, O(log n) rounds on real-world graphs. Per
round we ``localCheckpoint`` the edge set to keep the plan flat; the
fixpoint test is an exact symmetric-difference emptiness check on the
canonical undirected pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montecarlopagerank_spark.operators.state import StateStore


def _pairs(edges: DataFrame, a: str = "src", b: str = "dst") -> DataFrame:
    """Canonical undirected loop-free pair set (x < y), deduplicated."""
    return (
        edges.filter(F.col(a) != F.col(b))
        .select(F.least(a, b).alias("x"), F.greatest(a, b).alias("y"))
        .distinct()
    )


def _large_star(p: DataFrame) -> DataFrame:
    """p(x<y) → new canonical pairs. Views each pair from both endpoints."""
    sym = p.select(F.col("x").alias("u"), F.col("y").alias("v")).unionByName(
        p.select(F.col("y").alias("u"), F.col("x").alias("v"))
    )
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    out = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("x"), F.col("m").alias("y"))
    )
    return _pairs(out, "x", "y")


def _small_star(p: DataFrame) -> DataFrame:
    """p(x<y) → new canonical pairs. Views each pair from the larger end."""
    le = p.select(F.col("y").alias("u"), F.col("x").alias("v"))  # v < u
    m = le.groupBy("u").agg(F.min("v").alias("m"))
    out = (
        le.join(m, "u")
        .select(F.col("v").alias("x"), F.col("m").alias("y"))
        .unionByName(m.select(F.col("u").alias("x"), F.col("m").alias("y")))
    )
    return _pairs(out, "x", "y")


def connected_components(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 50,
) -> DataFrame:
    """``edges(src, dst)`` → ``components(v:long, component:long)`` where
    component = min vid of the vertex's undirected component. Isolated
    vertices from ``vertices`` get component = own vid."""
    store = StateStore(spark)  # flat per-round materializer (state.py)
    p = store.materialize(_pairs(edges), "pairs")
    for _ in range(max_iters):
        p2 = store.materialize(_small_star(_large_star(p)), "pairs")
        changed = not (p.exceptAll(p2).isEmpty() and p2.exceptAll(p).isEmpty())
        p = p2
        if not changed:
            break
    # at fixpoint p is a star set (child y? no: canonical x<y with x = root)
    labels = p.select(F.col("y").alias("v"), F.col("x").alias("component")).groupBy(
        "v"
    ).agg(F.min("component").alias("component"))
    roots = labels.select(
        F.col("component").alias("v"), F.col("component")
    ).distinct()
    labels = labels.unionByName(roots).groupBy("v").agg(
        F.min("component").alias("component")
    )
    if vertices is not None:
        labels = (
            vertices.select(F.col("vid").alias("v"))
            .join(labels, "v", "left")
            .select("v", F.coalesce("component", F.col("v")).alias("component"))
        )
    return labels
