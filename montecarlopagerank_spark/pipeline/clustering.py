"""Deterministic k-means over embedding columns + IVF-style ANN.

New-engine scope (the reference ships no vector ops): the coarse
quantizer every vector store builds (IVF, Jégou et al. 2011 PAMI) —
Lloyd's k-means with hash-seeded deterministic init, then top-k cosine
search probing only the ``nprobe`` nearest cells instead of the whole
corpus.

Determinism (what makes the DuckDB twin hash-match):

- init: deterministic farthest-point (maxmin) seeding — seed 0 is the
  vector with the smallest ``md5(vec_id)``; seed i maximizes the min
  squared distance to the seeds so far (ROUND 6, ties by vec_id).
  Hash-order start is row-order-free; the greedy maxmin walk is the
  deterministic analogue of k-means++ and guarantees one seed per
  well-separated blob (an arbitrary-hash init can drop two seeds in
  one blob and zero in another — Lloyd cannot recover from that).
- assignment: argmin over (ROUND(d², 6), cid) — rounding gives both
  engines the same total order even though centroid *means* are
  accumulated in engine-specific fp order (≈1e-15 noise vs the 1e-6
  quantum).
- d² itself is an exact left fold (Spark ``F.aggregate`` with 0.0 init
  ≡ DuckDB ``list_reduce``: (0.0 + x₁) is bit-exact x₁), elementwise
  over the float32→double widened vectors — bit-identical per pair.

Scale shape (the 100 TB plan):

- per iteration: ONE scan of the (persisted) corpus × a **broadcast**
  k-row centroid table, then a two-level (cid, pos) mean — k·dim agg
  keys, fully map-side combined. Centroids are collected to the driver
  between iterations (k·dim doubles — plan-time scalars, the same shape
  Spark MLlib uses), so lineage stays flat.
- IVF search: query→cell probing is a window over |Q|·k rows; the
  corpus side is touched by ONE broadcast-hash join on cell id (no
  shuffle of the corpus, no all-pairs crossJoin) — cost ∝ the probed
  cells' population, the IVF contract.
- brute-force cosine (the exactness baseline) stays in
  ``pipeline/similarity.py``; this module is the scale path.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _dbl(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def _d2(vec: str, cvec: str):
    """Exact-left-fold squared L2 distance between two double arrays."""
    return F.aggregate(
        F.zip_with(vec, cvec, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroids_df(spark: SparkSession, cents: list[tuple[int, list[float]]]):
    return spark.createDataFrame(cents, "cid int, cvec array<double>")


def kmeans(
    spark: SparkSession,
    emb: DataFrame,
    *,
    k: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, dict[str, Any]]:
    """Lloyd's k-means, ``iters`` exact iterations, deterministic
    hash-seeded init (module docstring).

    Returns ``(assignments, centroids, info)``: assignments is
    ``(vid, vec, cid, d2r)`` — every input row with its final cluster
    (argmin against the POST-update centroids, so the table is exactly
    reproducible from the returned ``centroids``); centroids is
    ``(cid, cvec)``. Empty clusters keep their previous centroid.
    """
    base = emb.select(F.col(id_col).alias("vid"), _dbl(vec_col).alias("vec"))
    base = base.persist()

    # farthest-point seeding: k TakeOrdered jobs over the persisted
    # corpus, each seed collected to the driver (dim doubles apiece)
    first = (
        base.select(F.md5(F.col("vid").cast("string")).alias("h"), "vec")
        .orderBy("h")
        .limit(1)
        .collect()
    )
    seeds: list[list[float]] = [list(first[0]["vec"])]
    for _ in range(1, k):
        dists = [
            _d2("vec", F.array(*[F.lit(x) for x in s]))  # type: ignore[arg-type]
            for s in seeds
        ]
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        nxt = (
            base.select("vid", "vec", F.round(mind, 6).alias("md"))
            .orderBy(F.desc("md"), F.asc("vid"))
            .limit(1)
            .collect()
        )
        seeds.append(list(nxt[0]["vec"]))
    cents = list(enumerate(seeds))

    def assign(cdf: DataFrame) -> DataFrame:
        j = base.crossJoin(F.broadcast(cdf))
        pick = j.select(
            "vid", "vec",
            F.struct(F.round(_d2("vec", "cvec"), 6).alias("d2r"), "cid").alias("s"),
        )
        best = pick.groupBy("vid").agg(
            F.min("s").alias("m"), F.first("vec").alias("vec")
        )
        return best.select(
            "vid", "vec", F.col("m.cid").alias("cid"), F.col("m.d2r").alias("d2r")
        )

    inertia = []
    for _ in range(iters):
        cdf = _centroids_df(spark, cents)
        a = assign(cdf)
        means = (
            a.select("cid", F.posexplode("vec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s["mx"],
                ).alias("cvec"),
                F.count(F.lit(1)).alias("_dims"),
            )
        )
        new = {r["cid"]: list(r["cvec"]) for r in means.collect()}
        cents = [(cid, new.get(cid, old)) for cid, old in cents]

    cdf = _centroids_df(spark, cents)
    out = assign(cdf)
    info = {"k": k, "iters": iters, "inertia": inertia}
    return out, cdf, info


def ivf_topk(
    spark: SparkSession,
    emb: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    nprobe: int = 2,
    n_clusters: int = 10,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k cosine: assign the corpus to ``n_clusters``
    k-means cells, probe each query's ``nprobe`` nearest cells, rank
    candidates by cosine (ROUND 6, ties by corpus id — both engines
    agree). Queries are excluded from their own result. Returns
    ``(query_id, rank, match_id, cos_r6)``.
    """
    assigned, cents, _ = kmeans(
        spark, emb, k=n_clusters, iters=iters, id_col=id_col, vec_col=vec_col
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("vec", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    corpus = assigned.select(
        F.col("vid").alias("cand_id"), F.col("vec").alias("cvecd"),
        "cid", norm.alias("cnorm"),
    )

    q = queries.select(F.col(id_col).alias("query_id"), _dbl(vec_col).alias("qvec"))
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id", "qvec", "cid",
            F.struct(F.round(_d2("qvec", "cvec"), 6).alias("d2r"), "cid").alias("s"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy("s")
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "qvec", "cid")
    )

    qnorm = F.sqrt(
        F.aggregate(
            F.transform("qvec", lambda x: x * x), F.lit(0.0), lambda a, x: a + x
        )
    )
    dot = F.aggregate(
        F.zip_with("qvec", "cvecd", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cand = (
        corpus.join(F.broadcast(probes), "cid")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id", "cand_id",
            F.round(dot / (qnorm * F.col("cnorm")), 6).alias("cos_r6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_r6"), F.asc("cand_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", F.col("cand_id").alias("match_id"), "cos_r6")
    )


def dbscan_exact(
    spark: SparkSession,
    emb: DataFrame,
    sim_threshold: float = 0.4,
    min_pts: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Deterministic DBSCAN over the cosine-similarity graph (Ester et
    al., KDD 1996): a vector is **core** iff it has ≥ ``min_pts``
    neighbours at rounded cosine ≥ ``sim_threshold`` (self excluded);
    clusters are the connected components of the core-core subgraph
    (label = min vec_id — the engine's CC convention); a non-core
    vector with ≥ 1 core neighbour is a **border** point assigned to
    the MIN cluster label among its core neighbours (classic DBSCAN's
    border assignment is scan-order-dependent — the min rule makes it
    a pure function of the graph); everything else is **noise**.
    Emits ``(vec_id, role, cluster_id)`` with cluster_id null for noise.

    ``pairs`` defaults to the exact brute-force O(n²) pair join (the
    oracle/test path, hash-checked in contract.py); pass
    ``similarity.embedding_near_dupes`` output for the LSH-bucketed
    at-scale path — everything downstream of the pair set is
    shuffle-bounded by the (sparse) similarity graph, so the scale
    story is the pair detector's, exactly as in dedup.cluster_keep.
    """
    from montecarlopagerank_spark.algos.components import connected_components
    from montecarlopagerank_spark.pipeline.similarity import (
        _dot,
        with_unit_vectors,
    )

    if pairs is None:
        u = with_unit_vectors(emb, vec_col).select(id_col, "_unit")
        a = u.select(F.col(id_col).alias("a"), F.col("_unit").alias("va"))
        b = u.select(F.col(id_col).alias("b"), F.col("_unit").alias("vb"))
        pairs = (
            a.join(b, F.col("a") < F.col("b"))
            .select(
                "a", "b", F.round(_dot(F.col("va"), F.col("vb")), 6).alias("cos_sim")
            )
            .filter(F.col("cos_sim") >= sim_threshold)
        )
    p = pairs.select("a", "b")
    sym = p.unionByName(
        p.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    core = deg.filter(F.col("d") >= min_pts).select("v")
    core_pairs = p.join(
        core.withColumnRenamed("v", "a").hint("shuffle_hash"), "a", "left_semi"
    ).join(core.withColumnRenamed("v", "b").hint("shuffle_hash"), "b", "left_semi")
    cc = connected_components(
        spark, core_pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )
    clusters = (
        core.join(cc.withColumnRenamed("v", "v"), "v", "left")
        .select("v", F.coalesce("component", "v").alias("cluster_id"))
    )
    # border: non-core with a core neighbour → min core-neighbour cluster
    border = (
        sym.join(
            clusters.withColumnRenamed("v", "b")
            .withColumnRenamed("cluster_id", "cl")
            .hint("shuffle_hash"),
            "b",
        )
        .join(core.withColumnRenamed("v", "a").hint("shuffle_hash"), "a", "left_anti")
        .groupBy(F.col("a").alias("v"))
        .agg(F.min("cl").alias("cluster_id"))
    )
    universe = emb.select(F.col(id_col).alias("v"))
    out = (
        universe.join(
            clusters.withColumn("role", F.lit("core")).hint("shuffle_hash"),
            "v",
            "left",
        )
        .join(
            border.withColumnRenamed("cluster_id", "b_cl")
            .withColumn("b_role", F.lit("border"))
            .hint("shuffle_hash"),
            "v",
            "left",
        )
        .select(
            F.col("v").alias(id_col),
            F.coalesce("role", "b_role", F.lit("noise")).alias("role"),
            F.coalesce("cluster_id", "b_cl").alias("cluster_id"),
        )
    )
    return out
