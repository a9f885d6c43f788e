"""Degree-preserving null-model rewiring (directed configuration model).

New-engine scope: the significance test behind every motif census —
"are this graph's triangles/butterflies/reciprocity more than its
degree sequence forces?" (Newman SIAM Rev 2003 §4; Maslov-Sneppen,
Science 2002). The directed configuration model keeps every vertex's
out-degree and in-degree EXACTLY (the multisets of edge sources and of
edge destinations are both preserved) while destroying all higher-order
structure: pair the i-th source in one deterministic order with the
i-th destination in an independent deterministic order. Self-loops and
parallel edges may appear — the standard convention (they vanish at
rate O(1/n) on sparse graphs).

Determinism without randomness: the two orders are md5 hashes of the
edge row under two salts, ties broken by (src, dst). Rows tying on a
hash are byte-identical rows (same salt+src+dst string ⇒ same row), so
any tie resolution yields the same output multiset — reruns, engines,
and cluster sizes agree, and the DuckDB twin replays it with two plain
ROW_NUMBER windows (contract.py ``null_model_rewire``).

Scale shape: positions come from :func:`~montecarlopagerank_spark.
pipeline.sampling._global_rank` — the bucketed distributed prefix-rank
(md5-prefix buckets → per-bucket row_number + driver-side exclusive
bucket bases), NEVER a single-partition global window; the final
pairing is one position-keyed equi-join of two already-position-
shuffled O(E) sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.sampling import _global_rank


def rewire_configuration(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    n_buckets: int = 256,
) -> DataFrame:
    """``edges(src, dst)`` (multigraph) → ``(pos, src, dst)``: the
    deterministic configuration-model rewiring. Exactly |E| rows; the
    src column is a permutation of the input's src multiset and dst of
    its dst multiset (out-/in-degrees preserved vertex-for-vertex)."""
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    key = F.concat(F.col("src").cast("string"), F.lit("#"), F.col("dst").cast("string"))
    srcs = _global_rank(
        e.withColumn("_h", F.md5(F.concat(F.lit("s#"), key))),
        h_col="_h",
        tie_cols=["src", "dst"],
        n_buckets=n_buckets,
    ).select("pos", "src")
    dsts = _global_rank(
        e.withColumn("_h", F.md5(F.concat(F.lit("d#"), key))),
        h_col="_h",
        tie_cols=["src", "dst"],
        n_buckets=n_buckets,
    ).select("pos", "dst")
    return srcs.join(dsts, "pos").select("pos", "src", "dst")
