"""Scalar quantization (int8/uint8) for embedding columns: per-dimension
min-max training, 1-byte-per-dim encoding, asymmetric cosine search
against the dequantized reconstruction.

New-engine scope (vector ops have no reference counterpart): the
simplest compression layer under large-scale ANN — a 64-dim float32
embedding is 256 bytes, its SQ code 64 bytes (4× shrink; PQ in
pipeline/pq.py goes 64× at more recall loss and a Lloyd training loop).
SQ training is ONE aggregation pass: per-dimension MIN/MAX, fully
map-side combined — O(d) shuffled bytes regardless of corpus size,
which is why SQ is the default first quantizer at 100 TB (no iterative
training job to babysit).

Determinism — this module is built so a DuckDB twin reproduces it
BYTE-EXACTLY (contract.py "sq_topk"):

- MIN/MAX are order-independent exact aggregates, and float32→double
  widening is exact, so both engines derive identical per-dim bounds.
- The code is ``clamp(floor((x - mn) / (mx - mn) * 256), 0, 255)`` —
  three IEEE double ops in a fixed order on identical inputs, then an
  exact floor: codes agree exactly across engines and parallelism.
  (``x == mx`` hits 256 and clamps to 255; a zero-width dimension
  encodes 0.)
- Dequantization is ``mn + (code + 0.5) * ((mx - mn) / 256)`` (bucket
  midpoint), again a fixed op order; cosine folds dimensions left to
  right (the shared exact-fold idiom, clustering._d2 style) and rounds
  to 6 before the top-k tie-break on neighbour id.

Everything is column expressions over the array column — whole-stage
codegen, no Python in the corpus scan; the query side is broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.clustering import _dbl


def sq_train(
    emb: DataFrame, *, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """ONE aggregation pass → (mins, maxes), each ``d`` Python doubles
    (plan-time scalars: O(d) driver bytes, never a driver loop over
    rows)."""
    dim = len(emb.select(vec_col).first()[0])
    v = _dbl(vec_col)
    row = emb.select(v.alias("vec")).agg(
        *[F.min(F.col("vec")[j]).alias(f"mn{j}") for j in range(dim)],
        *[F.max(F.col("vec")[j]).alias(f"mx{j}") for j in range(dim)],
    ).first()
    mins = [float(row[f"mn{j}"]) for j in range(dim)]
    maxes = [float(row[f"mx{j}"]) for j in range(dim)]
    return mins, maxes


def sq_encode(
    emb: DataFrame,
    mins: list[float],
    maxes: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, vec[d])`` → ``(vec_id, codes:array<int>)`` with each code
    in 0..255 (1 byte of information per dimension; kept as int for
    cheap arithmetic — a binary packing would save 3 bytes/dim of
    transient width at the cost of unpack expressions in every scan)."""
    dim = len(mins)
    vec = _dbl(vec_col)
    codes = F.array(*[
        F.lit(0)
        if maxes[j] == mins[j]
        else F.least(
            F.lit(255),
            F.greatest(
                F.lit(0),
                F.floor(
                    (vec[j] - F.lit(mins[j]))
                    / F.lit(maxes[j] - mins[j])
                    * F.lit(256.0)
                ).cast("int"),
            ),
        )
        for j in range(dim)
    ])
    return emb.select(F.col(id_col).alias("vec_id"), codes.alias("codes"))


def _dequant(codes_col: str, mins: list[float], maxes: list[float]):
    """Reconstruction x̂ = mn + (code + 0.5) * ((mx - mn) / 256)."""
    c = F.col(codes_col)
    return F.array(*[
        F.lit(mins[j])
        + (c[j].cast("double") + F.lit(0.5))
        * F.lit((maxes[j] - mins[j]) / 256.0)
        for j in range(len(mins))
    ])


def _fold_dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )


def sq_topk(
    spark: SparkSession,
    codes: DataFrame,
    mins: list[float],
    maxes: list[float],
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric top-k: full-precision queries against the dequantized
    corpus codes → ``(query_id, neighbour_id, cos_r6, rn)``, self
    excluded, ties by neighbour id. The corpus side never shuffles its
    vectors: queries are broadcast, the per-query top-k window
    partially aggregates (TakeOrdered per partition before the final
    per-query merge)."""
    xq = _dequant("codes", mins, maxes)
    base = codes.select(
        F.col("vec_id").alias("neighbour_id"),
        xq.alias("v"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _dbl(vec_col).alias("qv")
    )
    scored = base.join(
        F.broadcast(q), F.col("neighbour_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbour_id",
        F.round(
            _fold_dot(F.col("qv"), F.col("v"))
            / (
                F.sqrt(_fold_dot(F.col("qv"), F.col("qv")))
                * F.sqrt(_fold_dot(F.col("v"), F.col("v")))
            ),
            6,
        ).alias("cos_r6"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_r6"), F.asc("neighbour_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbour_id", "cos_r6", "rn")
    )
