"""Product quantization (PQ) for embedding columns: train per-subspace
codebooks, encode the corpus to M small codes, search with asymmetric
distance computation (ADC).

New-engine scope (vector ops have no reference counterpart): the
compression layer under every billion-vector ANN index (Jégou, Douze,
Schmid, "Product quantization for nearest neighbor search", PAMI 2011).
The 100 TB story is MEMORY, not candidate pruning: a 64-dim float32
embedding is 256 bytes; its PQ code is M bytes (M=4 here) — a 64×
shrink that turns a 100 TB embedding table into a ~1.6 TB code table a
modest cluster scans in RAM. Candidate pruning composes orthogonally
(IVF cells from pipeline/clustering.py — IVFADC); this module is the
quantizer + the exhaustive ADC scan that IVF would run per probed cell.

Spark shape, one design decision per stage:

- **train**: the M subquantizers are trained JOINTLY — the corpus is
  exploded once into (vid, m, subvec) rows and every Lloyd iteration is
  ONE scan + ONE (m, cid, pos)-keyed mean over all subspaces, not M
  sequential k-means runs (M× fewer jobs; the per-iteration shuffle is
  M·K·(D/M) = K·D agg keys — constant in corpus size, fully map-side
  combined). Init is deterministic hash-order: subspace m's K seed
  codewords are the subvectors of the K smallest-``md5(vid)`` rows —
  one window job, row-order-free, engine-reproducible.
- **encode**: subvector rows × broadcast codebook (M·K rows), argmin
  over (ROUND(d², 6), cid) — the rounding trick every clustering twin
  here uses to make fp-order noise irrelevant to the argmin; codes
  pivot to one ``array<int>`` row per vector via sort_array(collect_list).
- **ADC search**: the query side builds its M·K distance table (tiny,
  broadcast); the corpus CODE rows join it on (m, code) — a broadcast
  hash join, the corpus never shuffles — and the per-(query, cand) sum
  of M table entries is a partially-aggregated groupBy. Exact d² to the
  RECONSTRUCTED candidate, the ADC definition.

Determinism: subvector values are float32→double widened exactly, d² is
the exact left fold shared with clustering.py, argmins and the final
top-k order round to 6 before comparing — byte-stable across engines
and parallelism levels, pinned against a pure-numpy PQ twin in
tests/test_pq.py (codes exact, ADC distances to 1e-9, top-k exact) plus
a recall floor vs brute-force cosine.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.clustering import _d2, _dbl


def _subrows(emb: DataFrame, id_col: str, vec_col: str, m: int, sub: int):
    """Explode ``(id, vec[D])`` → ``(vid, m, subvec[D/M])`` rows."""
    return emb.select(
        F.col(id_col).alias("vid"), _dbl(vec_col).alias("vec")
    ).select(
        "vid",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda i: F.struct(
                    i.cast("int").alias("m"),
                    F.slice("vec", i * sub + 1, sub).alias("subvec"),
                ),
            )
        ).alias("s"),
    ).select("vid", "s.m", "s.subvec")


def pq_train(
    spark: SparkSession,
    emb: DataFrame,
    *,
    m: int = 4,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Train M subspace codebooks jointly (module docstring). Returns
    ``(m:int, cid:int, cvec:array<double>)`` with K codewords per
    subspace. D must be divisible by ``m``. Empty cells keep their
    previous codeword (same rule as clustering.kmeans)."""
    dim = len(emb.select(vec_col).first()[0])
    assert dim % m == 0, f"dim {dim} not divisible by m={m}"
    sub = dim // m
    rows = _subrows(emb, id_col, vec_col, m, sub).persist()

    # hash-order init: one window job seeds ALL subspaces
    wm = Window.partitionBy("m").orderBy(
        F.md5(F.col("vid").cast("string")), F.col("vid")
    )
    seeds = (
        rows.withColumn("rn", F.row_number().over(wm))
        .filter(F.col("rn") <= k)
        .select("m", (F.col("rn") - 1).cast("int").alias("cid"),
                F.col("subvec").alias("cvec"))
    )
    cents = [(r["m"], r["cid"], list(r["cvec"])) for r in seeds.collect()]

    def cents_df(cs):
        return spark.createDataFrame(
            cs, "m int, cid int, cvec array<double>"
        )

    def assign(cdf: DataFrame) -> DataFrame:
        j = rows.join(F.broadcast(cdf), "m")
        pick = j.select(
            "vid", "m", "subvec",
            F.struct(
                F.round(_d2("subvec", "cvec"), 6).alias("d2r"), "cid"
            ).alias("s"),
        )
        return (
            pick.groupBy("vid", "m")
            .agg(F.min("s").alias("mn"), F.first("subvec").alias("subvec"))
            .select("vid", "m", "subvec", F.col("mn.cid").alias("cid"))
        )

    for _ in range(iters):
        a = assign(cents_df(cents))
        means = (
            a.select("m", "cid", F.posexplode("subvec").alias("pos", "x"))
            .groupBy("m", "cid", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("m", "cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s["mx"],
                ).alias("cvec")
            )
        )
        new = {(r["m"], r["cid"]): list(r["cvec"]) for r in means.collect()}
        cents = [(mm, cid, new.get((mm, cid), old)) for mm, cid, old in cents]

    rows.unpersist()
    return cents_df(cents)


def pq_encode(
    emb: DataFrame,
    codebook: DataFrame,
    *,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector to its M nearest-codeword ids:
    ``(vid, codes:array<int>)`` — the M-byte representation the ADC
    scan reads instead of the raw vectors."""
    dim = len(emb.select(vec_col).first()[0])
    sub = dim // m
    rows = _subrows(emb, id_col, vec_col, m, sub)
    pick = rows.join(F.broadcast(codebook), "m").select(
        "vid", "m",
        F.struct(
            F.round(_d2("subvec", "cvec"), 6).alias("d2r"), "cid"
        ).alias("s"),
    )
    best = pick.groupBy("vid", "m").agg(F.min("s").alias("mn"))
    return (
        best.groupBy("vid")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("m", F.col("mn.cid").alias("cid")))),
                lambda s: s["cid"],
            ).alias("codes")
        )
    )


def pq_adc_topk(
    spark: SparkSession,
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    *,
    m: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k: exact d² from each query to every
    candidate's RECONSTRUCTION, as M table lookups. Returns
    ``(query_id, rank, match_id, adc_r6)`` ascending by distance
    (rank 1 = nearest), query excluded from its own results.

    Plan: the (|Q|·M·K)-row distance table is built once and broadcast;
    corpus codes explode to (vid, m, code) and hash-join it on
    (m, code) — no corpus shuffle — then partial-aggregated
    ``groupBy(query_id, vid)`` sums the M entries."""
    dim = len(queries.select(vec_col).first()[0])
    sub = dim // m
    qrows = _subrows(queries, id_col, vec_col, m, sub).withColumnRenamed(
        "vid", "query_id"
    )
    table = qrows.join(F.broadcast(codebook), "m").select(
        "query_id", "m", "cid", _d2("subvec", "cvec").alias("d2")
    )
    crows = codes.select(
        F.col("vid").alias("cand_id"),
        F.posexplode("codes").alias("m", "cid"),
    )
    adc = (
        crows.join(F.broadcast(table), ["m", "cid"])
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.round(F.sum("d2"), 6).alias("adc_r6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_r6"), F.asc("cand_id")
    )
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("cand_id").alias("match_id"),
                "adc_r6")
    )
