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
