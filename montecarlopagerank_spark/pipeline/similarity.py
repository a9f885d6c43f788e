"""Similarity search over an embedding column (``array<float>``).

* ``cosine_topk_bruteforce`` — the exact baseline: broadcast the (small)
  query set, one ``zip_with``/``aggregate`` dot product per (query, row),
  per-query top-k via window row_number. All JVM expressions — at 100 TB
  this is one full scan, embarrassingly parallel, no shuffle except the
  final per-query top-k (k rows per partition survive the window's
  partial sort).
* ``cosine_topk_lsh`` — the scale path: sign-random-hyperplane LSH.
  Each vector gets a ``n_planes``-bit bucket key from fixed deterministic
  pseudo-random hyperplanes (hash-derived, no stored model); queries only
  scan their bucket (+ optional multi-probe neighbours at Hamming 1).
  Approximate: recall measured against the brute-force baseline in tests.
* ``embedding_near_dupes`` — near-duplicate pairs by cosine ≥ threshold,
  LSH-bucketed self-join then exact verify.

Hyperplanes are generated from ``xxhash64(dim, plane)`` mapped to [-1, 1)
— deterministic across sessions/parallelism without shipping a matrix.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def with_unit_vectors(emb: DataFrame, col: str = "embedding") -> DataFrame:
    """Pre-normalize to unit length (double precision) so cosine = dot."""
    dbl = F.transform(F.col(col), lambda x: x.cast("double"))
    return emb.withColumn("_unit", F.transform(dbl, lambda x: x / _norm(dbl)))


def cosine_topk_bruteforce(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: ``(query_id, neighbour_id, cos_sim)``, self-matches
    excluded, ties broken by neighbour id (deterministic)."""
    base = with_unit_vectors(emb, vec_col).select(
        F.col(id_col).alias("neighbour_id"), F.col("_unit").alias("v")
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_unit").alias("qv")
    )
    scored = base.join(F.broadcast(q), F.col("neighbour_id") != F.col("query_id")).select(
        "query_id",
        "neighbour_id",
        F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbour_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbour_id", "cos_sim", "rn")
    )


def _bucket(vec: Column, n_planes: int, dim: int, seed: int = 0) -> Column:
    """Sign-LSH bucket id: bit p = sign of <v, h_p> where h_p[d] is a
    deterministic pseudo-random value in [-1, 1) derived from
    xxhash64(d, p, seed). JVM-only arithmetic."""
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: (
                        F.pmod(F.xxhash64(d, F.lit(p), F.lit(seed)), F.lit(2000001))
                        / F.lit(1000000.0)
                        - F.lit(1.0)
                    ),
                ),
                lambda x, h: x * h,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _table_buckets(vec: Column, n_planes: int, dim: int, n_tables: int) -> Column:
    """Array of ``n_tables`` bucket keys (one independent hash table each,
    table index baked into the key so tables never cross-match)."""
    return F.array(
        *[
            _bucket(vec, n_planes, dim, seed=t) + F.lit(t << 32).cast("long")
            for t in range(n_tables)
        ]
    )


def cosine_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: scan only rows sharing ≥1 of the query's LSH
    bucket keys across ``n_tables`` independent tables (plus Hamming-1
    multiprobe buckets per table). Multiple small tables, not one deep
    code: sign-LSH collision probability per plane is (1 − θ/π), so for
    the near-orthogonal bulk of high-dim data recall comes from OR-ing
    tables (1−(1−p^planes)^tables), not from deeper codes. Same output
    schema as brute force; recall measured against it in tests."""
    base = with_unit_vectors(emb, vec_col).select(
        F.col(id_col).alias("neighbour_id"),
        F.col("_unit").alias("v"),
        F.explode(
            _table_buckets(F.col("_unit"), n_planes, dim, n_tables)
        ).alias("bucket"),
    )
    q = with_unit_vectors(queries, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_unit").alias("qv"),
        F.posexplode(
            _table_buckets(F.col("_unit"), n_planes, dim, n_tables)
        ).alias("table", "qbucket"),
    )
    if multiprobe:
        probes = F.array(
            F.col("qbucket"),
            *[
                F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)
            ],
        )
        q = q.select("query_id", "qv", F.explode(probes).alias("bucket"))
    else:
        q = q.select("query_id", "qv", F.col("qbucket").alias("bucket"))
    scored = base.join(F.broadcast(q), "bucket").filter(
        F.col("neighbour_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbour_id",
        F.round(_dot(F.col("qv"), F.col("v")), 6).alias("cos_sim"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbour_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbour_id", "cos_sim", "rn")
    )


def embedding_near_dupes(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 10,
    n_tables: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs ``(a, b, cos_sim ≥ threshold)``:
    bucket self-join over ``n_tables`` tables (high-cosine pairs collide
    with probability (1−θ/π)^planes per table), then exact cosine verify.
    Approximate recall by design; the exact variant is the brute-force
    O(n²) join reserved for tests."""
    base = with_unit_vectors(emb, vec_col).select(
        F.col(id_col).alias("id"),
        F.col("_unit").alias("v"),
        F.explode(
            _table_buckets(F.col("_unit"), n_planes, dim, n_tables)
        ).alias("bucket"),
    )
    left = base.select(F.col("bucket"), F.col("id").alias("a"), F.col("v").alias("va"))
    right = base.select(F.col("bucket"), F.col("id").alias("b"), F.col("v").alias("vb"))
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(_dot(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
        .distinct()
        .filter(F.col("cos_sim") >= threshold)
    )
