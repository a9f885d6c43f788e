"""Core-number decomposition (H-index iteration) as DataFrame joins/aggs.

New-engine scope (no reference twin — the reference ships only PageRank;
coreness is the per-vertex generalization of algos/kcore.py's fixed-k
filter): every vertex's core number — the largest k such that v belongs
to the k-core — computed by synchronous H-index iteration (Lü, Zhou,
Zhang & Stanley, "The H-index of a network node and its relation to
degree and coreness", Nature Communications 2016): start h₀(v) =
deg(v); repeat h_{t+1}(v) = H({h_t(w) : w ∈ Γ(v)}) where H is the
H-index (the largest i with at least i neighbour values ≥ i). The
sequence is monotone non-increasing and converges exactly to coreness;
convergence is detected as a zero-change round (observed metric riding
the state write — no extra job).

The H-index is computed WITHOUT per-vertex sorting of the full
neighbour list (hub-safe): H = max over DISTINCT neighbour values h of
min(h, |{w : h_t(w) ≥ h}|). So the per-round shape is
  (1) one O(E) join of the pinned symmetric pair set with the O(V)
      h-table (shuffle_hash on the small side),
  (2) a map-side-combined groupBy (v, h) count — collapses a hub's
      millions of neighbour rows to at most |distinct h| rows,
  (3) a window over v ordered by h desc for the running count — input
      rows per vertex = distinct neighbour VALUES (≤ coreness spread,
      tiny), not neighbours, so hub skew never reaches the sort.

Scale shape: pair set exchanged once and pinned; per round the O(V)
h-table moves twice (join + final groupBy); everything map-side-
combinable is; state is re-materialized per round (StateStore, flat
plans). Rounds needed = H-index convergence depth, empirically far
below the peeling depth (coreness spread) on power-law graphs.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from montecarlopagerank_spark.algos.components import _pairs
from montecarlopagerank_spark.operators.state import StateStore


def core_numbers(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 100,
    n_partitions: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """``edges(src, dst)`` → (``cores(v, coreness:long)``, info) over the
    undirected simple closure (self-loops dropped). Isolated /
    self-loop-only vertices get coreness 0. ``info['converged']`` is
    True iff a zero-change round happened within ``max_rounds``."""
    t0 = time.time()
    n_parts = int(n_partitions or spark.conf.get("spark.sql.shuffle.partitions"))
    store = StateStore(spark)

    verts = (
        edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    p = _pairs(edges)
    sym = (
        p.select(F.col("x").alias("u"), F.col("y").alias("w"))
        .unionByName(p.select(F.col("y").alias("u"), F.col("x").alias("w")))
        .repartition(n_parts, "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    h = store.materialize(
        sym.groupBy(F.col("u").alias("v")).agg(
            F.count(F.lit(1)).cast("long").alias("h")
        ),
        "coren_h",
    )
    rounds, converged = 0, False
    for it in range(max_rounds):
        # neighbour-value histogram: hub rows collapse to distinct values
        hist = (
            sym.join(
                h.select(F.col("v").alias("w"), F.col("h").alias("hw")).hint(
                    "shuffle_hash"
                ),
                "w",
            )
            .groupBy(F.col("u").alias("v"), F.col("hw"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        win = (
            Window.partitionBy("v")
            .orderBy(F.desc("hw"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        h_new = (
            hist.withColumn("ge", F.sum("cnt").over(win))
            .groupBy("v")
            .agg(F.max(F.least(F.col("hw"), F.col("ge"))).alias("h"))
        )
        obs = Observation(f"coren_round_{it}")
        nxt = (
            h.select("v", F.col("h").alias("h_old"))
            .join(h_new.withColumnRenamed("h", "h_upd"), "v", "left")
            .select(
                "v", F.coalesce("h_upd", F.lit(0)).cast("long").alias("h"),
                (F.coalesce("h_upd", F.lit(0)) != F.col("h_old"))
                .cast("long")
                .alias("chg"),
            )
            .observe(obs, F.sum("chg").alias("changed"))
        )
        h = store.materialize(nxt.select("v", "h"), "coren_h")
        rounds += 1
        if int(obs.get["changed"] or 0) == 0:
            converged = True
            break

    out = (
        verts.join(h.hint("shuffle_hash"), "v", "left")
        .select("v", F.coalesce("h", F.lit(0)).cast("long").alias("coreness"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    max_core = out.agg(F.max("coreness")).collect()[0][0]
    sym.unpersist()
    return out, {
        "rounds": rounds,
        "converged": converged,
        "max_coreness": int(max_core or 0),
        "secs": round(time.time() - t0, 3),
    }
