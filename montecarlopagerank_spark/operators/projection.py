"""Bipartite co-occurrence projection (group–item → item–item graph).

New-engine scope: the transcript graph is naturally bipartite in
several ways (conversation↔tool, conversation↔role), and the standard
analysis move is to project one side away: two tools are linked if the
same conversation used both, weighted by how many conversations did.
The projected graph then feeds the existing algorithms (PageRank on
the tool co-usage graph, communities via LPA, etc.).

Scale shape: the classic hazard is a mega-group (one conversation
touching 10^4 items) exploding into 10^8 pairs. Like
``linkpred.common_neighbors`` this caps the per-group distinct-item
count — groups over the cap are *dropped with a logged count*, never
silently truncated to an arbitrary subset (truncation would make the
result depend on row order; dropping is deterministic). The pair
enumeration itself is a self-join of the deduplicated (group, item)
table on group — co-partitioned, one shuffle each side — followed by
a partial-aggregable groupBy on (item_a, item_b).
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def cooccurrence_pairs(
    df: DataFrame,
    *,
    group_col: str,
    item_col: str,
    max_group_items: int | None = 1000,
) -> DataFrame:
    """Project a bipartite (group, item) relation onto weighted item
    pairs: (item_a < item_b, n_groups = number of distinct groups
    containing both).

    ``max_group_items`` drops groups whose *distinct* item count
    exceeds the cap (pair blowup guard; logged). ``None`` disables the
    cap — only safe when the per-group item count is known-bounded.
    """
    gi = (
        df.select(F.col(group_col).alias("g"), F.col(item_col).alias("item"))
        .filter(F.col("item").isNotNull())
        .distinct()
    )
    if max_group_items is not None:
        sizes = gi.groupBy("g").agg(F.count("*").alias("_n"))
        n_dropped = sizes.filter(F.col("_n") > max_group_items).count()
        if n_dropped:
            log.warning(
                "cooccurrence_pairs: dropping %d groups over "
                "max_group_items=%d (pair-blowup guard)",
                n_dropped,
                max_group_items,
            )
        gi = (
            gi.join(sizes, "g")
            .filter(F.col("_n") <= max_group_items)
            .drop("_n")
        )
    a = gi.select("g", F.col("item").alias("item_a"))
    b = gi.select("g", F.col("item").alias("item_b"))
    return (
        a.join(b, "g")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_groups"))
    )


def butterfly_stats(
    df: DataFrame,
    *,
    group_col: str,
    item_col: str,
    max_group_items: int | None = 1000,
) -> DataFrame:
    """Bipartite 4-cycle (butterfly) census of a (group, item) relation.

    A butterfly is two groups sharing two items — the bipartite analogue
    of the triangle and the standard cohesion motif for bipartite graphs
    (Wang et al., "Vertex Priority Based Butterfly Counting for Large-scale
    Bipartite Networks", VLDB 2019). With ``c(a,b)`` = number of distinct
    groups containing both items of a pair, the census is pure pair-table
    arithmetic:

      ``n_butterflies      = Σ_pairs C(c, 2)``
      ``n_linked_item_pairs = #{pairs : c ≥ 1}``
      ``n_closed_item_pairs = #{pairs : c ≥ 2}``  (pairs in ≥1 butterfly)
      ``max_pair_groups``   = max c (the densest pair)

    Counting from the item side equals counting from the group side (a
    4-cycle is symmetric), so one projection suffices.

    Scale shape: reuses :func:`cooccurrence_pairs` — the mega-group cap
    (dropped WITH a logged count, never silently truncated) bounds the
    wedge self-join exactly as in the projection itself; everything after
    the pair table is one map-side-combined global aggregate reducing to
    a single row. Returns a 1-row DataFrame.
    """
    pairs = cooccurrence_pairs(
        df,
        group_col=group_col,
        item_col=item_col,
        max_group_items=max_group_items,
    )
    c = F.col("n_groups")
    # Σ c(c−1) is always even; summing BEFORE the halving (integer DIV)
    # keeps the census in exact int64 — no double rounding at web-scale
    return pairs.agg(
        F.expr(
            "CAST(coalesce(sum(n_groups * (n_groups - 1L)), 0L) DIV 2 AS BIGINT)"
        ).alias("n_butterflies"),
        F.count(F.lit(1)).cast("bigint").alias("n_linked_item_pairs"),
        F.coalesce(F.sum(F.when(c >= 2, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("n_closed_item_pairs"),
        F.coalesce(F.max(c), F.lit(0)).cast("bigint").alias("max_pair_groups"),
    )
