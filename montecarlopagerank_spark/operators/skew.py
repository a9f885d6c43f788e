"""Skew-handling helpers: salted two-phase aggregation.

Transcript graphs have mega-hubs (popular tools/roles receive most
turn_tool / role_role edges). A plain ``groupBy(dst).sum()`` funnels every
hub row through one reducer task. Spark's hash aggregate already does
map-side partial aggregation, which absorbs most of this — but when there
are billions of distinct groups with a few hot ones, the *reduce* side
still skews. Salting splits a hot key across ``n_salts`` reducers and
re-reduces.

``salted_sum`` is algebraically identical to ``groupBy(key).agg(sum(val))``
(unit-tested against it); results never depend on the salt value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum(
    df: DataFrame,
    key: str,
    val: str,
    n_salts: int = 16,
    out_name: str | None = None,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase skew-proof sum: groupBy(key, salt) → groupBy(key).

    The salt is a deterministic hash of ``salt_cols`` (default: every
    input column), so reruns produce identical partials; exact-duplicate
    rows share a salt, which is harmless because duplicates of one
    (key, salt) group are collapsed by phase 1's map-side combine anyway.
    """
    out_name = out_name or f"sum_{val}"
    scols = salt_cols or df.columns
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in scols]), F.lit(n_salts))
    )
    phase1 = salted.groupBy(key, "_salt").agg(F.sum(val).alias("_partial"))
    return phase1.groupBy(key).agg(F.sum("_partial").alias(out_name))
