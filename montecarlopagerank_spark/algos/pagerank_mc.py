"""Monte Carlo PageRank: distributed random walks with walk coalescing.

Re-expresses MonteCarloPageRank.scala:23-133 (Das Sarma et al. 2013,
Basic-PageRank-Algorithm) Spark-first:

* every vertex starts K coupons (reference default 10000, Conf.scala:15;
  ζ initialized to K, MonteCarloPageRank.scala:106);
* per superstep each coupon survives w.p. 1−ε (ε=0.15,
  MonteCarloPageRank.scala:28,63-64) and moves to a uniformly random
  out-neighbour; coupons at dangling vertices die
  (MonteCarloPageRank.scala:73);
* arrivals are *coalesced* — (dst, count) not one row per walk — inside
  the Arrow kernel (the reference coalesces only at reduceByKey,
  MonteCarloPageRank.scala:119; we additionally pre-coalesce per block,
  so shuffle volume is O(distinct dst per block), not O(walks));
* ζ accumulates arrivals per step (MonteCarloPageRank.scala:122) and the
  final rank is ζ_v / Σζ (MonteCarloPageRank.scala:126-132 — the code
  normalizes by total observed visits, not the paper's closed form).

Intentional fixes vs the reference (SURVEY.md §2.6): exactly c trials per
vertex (the reference's ``0 to currentCount`` inclusive loop inflates by
one trial per occupied vertex per step) and exactly ``iterations``
supersteps.

Randomness is **parallelism-invariant**: one ``numpy.random.Generator``
per (seed, block_id, superstep) — a stable *logical* block id, not the
reference's physical partition index (MonteCarloPageRank.scala:50-52),
so local[8] and local[32] produce byte-identical ranks. That property is
what lets the N-vs-4N scaling run double as a determinism check.

The walk step itself is fully vectorized numpy over CSR slices: binomial
survivor draws, then one uniform draw per surviving walk mapped through
(indptr, indices) with np.repeat — no per-walk Python.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from montecarlopagerank_spark.operators.adjacency import (
    assign_blocks,
    build_csr_blocks_from_edges,
)
from montecarlopagerank_spark.operators.checkpoint import CheckpointManager
from montecarlopagerank_spark.operators.state import StateStore

EPS = 0.15


def _walk_kernel(eps: float, seed: int, step: int):
    """Cogrouped-map kernel: (CSR block row, coupons in block) → coalesced
    arrivals (dst, cnt). Deterministic in (seed, block_id, step)."""

    def kernel(coupons_pdf: pd.DataFrame, blocks_pdf: pd.DataFrame) -> pd.DataFrame:
        # cogroup order: left = coupons⋈block_assign, right = CSR blocks
        if blocks_pdf.empty or coupons_pdf.empty:
            return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        block_id = int(blocks_pdf["block_id"].iloc[0])
        vids = np.asarray(blocks_pdf["vids"].iloc[0], dtype=np.int64)
        indptr = np.asarray(blocks_pdf["indptr"].iloc[0], dtype=np.int64)
        indices = np.asarray(blocks_pdf["indices"].iloc[0], dtype=np.int64)

        rng = np.random.default_rng(np.random.SeedSequence([seed, block_id, step]))
        # align coupons to CSR rows (coupons are a subset of block vids)
        order = np.argsort(coupons_pdf["v"].to_numpy())  # determinism
        v = coupons_pdf["v"].to_numpy(dtype=np.int64)[order]
        c = coupons_pdf["c"].to_numpy(dtype=np.int64)[order]
        loc = np.searchsorted(vids, v)
        k = indptr[loc + 1] - indptr[loc]  # out-degrees

        survivors = rng.binomial(c, 1.0 - eps)  # exactly c trials, not c+1
        survivors = np.where(k > 0, survivors, 0)  # dangling walks die
        total = int(survivors.sum())
        if total == 0:
            return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        starts = np.repeat(indptr[loc], survivors)
        lens = np.repeat(k, survivors)
        dest = indices[starts + (rng.random(total) * lens).astype(np.int64)]
        dst, cnt = np.unique(dest, return_counts=True)  # per-block coalescing
        return pd.DataFrame({"dst": dst, "cnt": cnt.astype(np.int64)})

    return kernel


def pagerank_monte_carlo(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    walks_per_vertex: int = 10,
    iterations: int = 10,
    eps: float = EPS,
    seed: int = 1234,  # reference's RNG base seed, MonteCarloPageRank.scala:52
    edges_per_block: int | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, dict[str, Any]]:
    """Returns (``ranks(v:long, rank:double)``, info). Rank = ζ_v / Σζ.

    ``edges_per_block`` controls walk-kernel parallelism: one CSR block =
    one Arrow task. Default sizes blocks so there are ≈ 2 blocks per core
    slot (min 4k edges/block so huge clusters don't shred small graphs);
    the default therefore varies with cluster size — pass an explicit
    value when outputs must be identical across different clusters.
    NOTE: block boundaries do NOT affect results (RNG is seeded per
    logical block — changing block size changes the draw sequence, but
    any fixed (seed, edges_per_block) is parallelism-invariant)."""
    t_setup = time.time()
    K = max(walks_per_vertex, 1)  # MonteCarloPageRank.scala:101
    # lean setup (one agg + block windows + one CSR pack): only vertices
    # with out-edges need blocks/CSR rows — coupons at dangling vertices
    # are dropped by the inner join below, i.e. they die, the reference's
    # dangling semantics (MonteCarloPageRank.scala:73)
    out_deg = edges.groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("out_deg")
    )
    verts = (
        vertices.select(F.col("vid").alias("v"))
        if vertices is not None
        else edges.select(F.col("src").alias("v"))
        .unionByName(edges.select(F.col("dst").alias("v")))
        .distinct()
    ).persist(StorageLevel.MEMORY_AND_DISK)
    if edges_per_block is None:
        total_w = edges.count() + verts.count()
        slots = spark.sparkContext.defaultParallelism
        edges_per_block = max(total_w // max(2 * slots, 1) + 1, 1 << 12)
    blocks_assign = assign_blocks(
        out_deg, edges_per_block=edges_per_block
    ).persist(StorageLevel.MEMORY_AND_DISK)
    csr = build_csr_blocks_from_edges(edges, blocks_assign).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    csr.count()  # materialize the loop-invariant structure once

    ckpt = None
    store = StateStore(spark)  # flat per-superstep materializer (state.py)
    start_step = 0
    if checkpoint_dir:
        ckpt = CheckpointManager(
            spark, checkpoint_dir,
            {"algo": "pagerank_mc", "K": K, "eps": eps, "seed": seed},
        )
        if resume:
            last = ckpt.last_complete_step()
            if last is not None:
                t = ckpt.load_tables(last, ["coupons", "visits"])
                coupons, visits = t["coupons"], t["visits"]
                start_step = last + 1
        else:
            ckpt.clear()
    if start_step == 0:
        init = verts.select("v", F.lit(int(K)).cast("long").alias("c"))
        visits_init = init.select("v", F.col("c").alias("z"))  # ζ starts at K (:106)
        if ckpt:
            t = ckpt.save_step(-1, {"coupons": init, "visits": visits_init},
                               {"init": True})
            coupons, visits = t["coupons"], t["visits"]
        else:
            coupons = store.materialize(init, "coupons")
            visits = store.materialize(visits_init, "visits")

    steps_run = start_step
    t_loop = time.time()
    for step in range(start_step, iterations):
        # shuffle_hash: block_assign is O(n) — broadcasting it per step
        # would serialize on the driver (see pagerank_power loop note)
        moved = (
            coupons.join(blocks_assign.hint("shuffle_hash"), "v")
            .groupby("block_id")
            .cogroup(csr.groupby("block_id"))
            .applyInPandas(_walk_kernel(eps, seed, step), schema="dst long, cnt long")
        )
        # global coalescing: partial+final hash agg (reference reduceByKey :119)
        new_coupons = (
            moved.groupBy(F.col("dst").alias("v")).agg(F.sum("cnt").alias("c"))
        )
        new_visits = (
            visits.unionByName(new_coupons.select("v", F.col("c").alias("z")))
            .groupBy("v")
            .agg(F.sum("z").alias("z"))
        )
        if ckpt:
            t = ckpt.save_step(
                step, {"coupons": new_coupons, "visits": new_visits},
                {"superstep": step},
            )
            coupons, visits = t["coupons"], t["visits"]
        else:
            coupons = store.materialize(new_coupons, "coupons")
            visits = store.materialize(new_visits, "visits")
        steps_run = step + 1
        if coupons.isEmpty():  # extinction — nothing left to walk
            break

    t_loop_end = time.time()
    total = visits.agg(F.sum("z")).collect()[0][0]
    ranks = visits.select("v", (F.col("z") / F.lit(float(total))).alias("rank"))
    if ckpt:
        store.close()
    else:
        ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
        ranks.count()  # pin before callers drop the scratch reference
    blocks_assign.unpersist()
    csr.unpersist()
    verts.unpersist()
    info = {
        "iterations": steps_run, "K": K, "seed": seed,
        "total_visits": int(total), "eps": eps,
        "setup_secs": round(t_loop - t_setup, 3),
        "loop_secs": round(t_loop_end - t_loop, 3),
    }
    return ranks, info
