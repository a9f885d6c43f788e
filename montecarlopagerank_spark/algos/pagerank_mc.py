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
* ζ accumulates arrivals (MonteCarloPageRank.scala:122) and the final
  rank is ζ_v / Σζ (MonteCarloPageRank.scala:126-132 — the code
  normalizes by total observed visits, not the paper's closed form).

Intentional fixes vs the reference (SURVEY.md §2.6): exactly c trials per
vertex (the reference's ``0 to currentCount`` inclusive loop inflates by
one trial per occupied vertex per step) and exactly ``iterations``
supersteps.

Scale shape — each superstep runs EXACTLY ONE Spark job: the coupon-state
write, with the surviving-walk total riding along as an observed metric
(extinction check without a separate ``isEmpty`` job). ζ is NOT
re-aggregated per step (the reference's ``union+reduceByKey`` over the
full visit history, MonteCarloPageRank.scala:122, doubles per-step shuffle
volume); instead each step's arrivals are already materialized as that
step's coupon table, and ζ = groupBy-sum over the union of all step
tables exactly once at the end.

Skew (north_star "hub vertices split across ≥2 blocks"): the block plan
(operators/adjacency.py::plan_walk_blocks) splits any vertex whose
out-degree exceeds ``edges_per_block`` into replicas carrying disjoint
neighbour subsets. A hub's coupons are routed to its replicas with an
exact multinomial draw ∝ replica size (seeded per (seed, step, v) — a
tiny Arrow kernel over hub rows only), each replica walks its slice
uniformly, and the ordinary groupBy(dst) coalescing re-reduces the
partials — so totals are conserved exactly and P(dst) = 1/deg exactly.

Randomness is **parallelism-invariant**: one ``numpy.random.Generator``
per (seed, block_id, superstep) — a stable *logical* block id, not the
reference's physical partition index (MonteCarloPageRank.scala:50-52) —
so any fixed (seed, edges_per_block) produces byte-identical ranks at
local[8] and local[32]. That property is what lets the N-vs-4N scaling
run double as a determinism check. The default ``edges_per_block``
derives from the cluster's core count, so pass an explicit value when
outputs must match across different cluster sizes.

The walk step itself is fully vectorized numpy over CSR slices: binomial
survivor draws, then one uniform draw per surviving walk mapped through
(indptr, indices) with np.repeat — no per-walk Python.
"""

from __future__ import annotations

import time
from functools import reduce
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from montecarlopagerank_spark.operators.adjacency import plan_walk_blocks
from montecarlopagerank_spark.operators.checkpoint import CheckpointManager
from montecarlopagerank_spark.operators.state import StateStore

EPS = 0.15


def _walk_kernel(eps: float, seed: int, step: int):
    """Cogrouped-map kernel: (CSR block row, routed coupons in block) →
    coalesced arrivals (dst, cnt). Deterministic in (seed, block_id, step).
    Coupons are keyed by rkey (= v << REPLICA_BITS | replica) matching the
    block's CSR row keys."""

    def kernel(coupons_pdf: pd.DataFrame, blocks_pdf: pd.DataFrame) -> pd.DataFrame:
        # cogroup order: left = routed coupons, right = CSR blocks
        if blocks_pdf.empty or coupons_pdf.empty:
            return pd.DataFrame({"dst": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        block_id = int(blocks_pdf["block_id"].iloc[0])
        vids = np.asarray(blocks_pdf["vids"].iloc[0], dtype=np.int64)
        indptr = np.asarray(blocks_pdf["indptr"].iloc[0], dtype=np.int64)
        indices = np.asarray(blocks_pdf["indices"].iloc[0], dtype=np.int64)

        rng = np.random.default_rng(np.random.SeedSequence([seed, block_id, step]))
        # align coupons to CSR rows (coupons are a subset of block rkeys)
        order = np.argsort(coupons_pdf["rkey"].to_numpy())  # determinism
        rk = coupons_pdf["rkey"].to_numpy(dtype=np.int64)[order]
        c = coupons_pdf["c"].to_numpy(dtype=np.int64)[order]
        loc = np.searchsorted(vids, rk)
        k = indptr[loc + 1] - indptr[loc]  # out-degrees (replica slice sizes)

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


def _route_kernel(seed: int, step: int):
    """Grouped-map kernel over ONE hub vertex's replica rows: split the
    vertex's coupon count c across replicas with an exact multinomial draw
    ∝ replica size — conserves Σc and keeps P(dst) = 1/deg exactly.
    Deterministic in (seed, step, v)."""

    def route(pdf: pd.DataFrame) -> pd.DataFrame:
        v = int(pdf["v"].iloc[0])
        c = int(pdf["c"].iloc[0])
        pdf = pdf.sort_values("rkey", kind="mergesort")  # determinism
        sizes = pdf["rsize"].to_numpy(dtype=np.float64)
        rng = np.random.default_rng(
            np.random.SeedSequence([seed, 0x517, step, v])
        )
        parts = rng.multinomial(c, sizes / sizes.sum())
        keep = parts > 0
        return pd.DataFrame(
            {
                "block_id": pdf["block_id"].to_numpy()[keep],
                "rkey": pdf["rkey"].to_numpy(dtype=np.int64)[keep],
                "c": parts[keep].astype(np.int64),
            }
        )

    return route


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

    ``edges_per_block`` controls walk-kernel parallelism (one CSR block =
    one Arrow task) AND the hub-split threshold (out_deg > edges_per_block
    → the vertex is split across replicas). Default sizes blocks so there
    are ≈ 2 blocks per core slot (min 4k edges/block); the default
    therefore varies with cluster size — pass an explicit value when
    outputs must be identical across different clusters."""
    t_setup = time.time()
    K = max(walks_per_vertex, 1)  # MonteCarloPageRank.scala:101
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
    blocks_assign, csr, plan_meta = plan_walk_blocks(
        edges, edges_per_block=edges_per_block
    )
    blocks_assign = blocks_assign.persist(StorageLevel.MEMORY_AND_DISK)
    csr = csr.persist(StorageLevel.MEMORY_AND_DISK)
    csr.count()  # materialize the loop-invariant structure once
    # hub replicas only exist for out_deg > edges_per_block vertices; the
    # routing kernel is skipped entirely when the graph has none
    has_hubs = plan_meta["has_hubs"]

    ckpt = None
    store = StateStore(spark)  # flat per-superstep materializer (state.py)
    start_step = 0
    step_coupons: list[DataFrame] = []  # arrivals per superstep (+ init ζ=K)
    if checkpoint_dir:
        ckpt = CheckpointManager(
            spark, checkpoint_dir,
            {"algo": "pagerank_mc", "K": K, "eps": eps, "seed": seed},
        )
        if resume:
            last = ckpt.last_complete_step()
            if last is not None:
                step_coupons = [
                    ckpt.load_tables(s, ["coupons"])["coupons"]
                    for s in range(-1, last + 1)
                ]
                coupons = step_coupons[-1]
                start_step = last + 1
        else:
            ckpt.clear()
    if start_step == 0:
        init = verts.select("v", F.lit(int(K)).cast("long").alias("c"))
        if ckpt:
            coupons = ckpt.save_step(-1, {"coupons": init}, {"init": True})[
                "coupons"
            ]
        else:
            coupons = store.materialize(init, "coupons_init")
        step_coupons = [coupons]

    steps_run = start_step
    t_loop = time.time()
    for step in range(start_step, iterations):
        # route coupons to CSR row keys; shuffle_hash: blocks_assign is
        # O(n) — broadcasting it per step would serialize on the driver
        joined = coupons.join(blocks_assign.hint("shuffle_hash"), "v")
        routed = joined.filter("n_rep = 1").select("block_id", "rkey", "c")
        if has_hubs:
            split = (
                joined.filter("n_rep > 1")
                .select("v", "block_id", "rkey", "rsize", "c")
                .groupBy("v")
                .applyInPandas(
                    _route_kernel(seed, step), schema="block_id int, rkey long, c long"
                )
            )
            routed = routed.unionByName(split)
        moved = (
            routed.groupby("block_id")
            .cogroup(csr.groupby("block_id"))
            .applyInPandas(_walk_kernel(eps, seed, step), schema="dst long, cnt long")
        )
        # global coalescing: partial+final hash agg (reference reduceByKey
        # :119) — this is also the re-reduce of hub-replica partials
        new_coupons = (
            moved.groupBy(F.col("dst").alias("v")).agg(F.sum("cnt").alias("c"))
        )
        # surviving-walk total rides the write job as an observed metric —
        # the extinction check costs no extra job (vs the old isEmpty())
        obs = Observation(f"mc_step_{step}")
        observed = new_coupons.observe(obs, F.sum("c").alias("total"))
        if ckpt:
            coupons = ckpt.save_step(
                step, {"coupons": observed}, {"superstep": step}
            )["coupons"]
        else:
            coupons = store.materialize(observed, f"coupons_{step}")
        step_coupons.append(coupons)
        steps_run = step + 1
        if int(obs.get["total"] or 0) == 0:  # extinction — nothing to walk
            break

    t_loop_end = time.time()
    # ζ = K + Σ arrivals: ONE union+groupBy over the per-step tables (each
    # already parquet-backed), not a per-step re-aggregation; Σζ rides the
    # visits write as an observed metric
    all_arrivals = reduce(
        DataFrame.unionByName,
        [df.select("v", F.col("c").alias("z")) for df in step_coupons],
    )
    obs_total = Observation("mc_total")
    visits = store.materialize(
        all_arrivals.groupBy("v")
        .agg(F.sum("z").alias("z"))
        .observe(obs_total, F.sum("z").alias("t")),
        "visits",
    )
    total = obs_total.get["t"]
    if total is None:  # empty graph: no vertices at all
        blocks_assign.unpersist()
        csr.unpersist()
        verts.unpersist()
        empty = spark.createDataFrame([], "v long, rank double")
        return empty, {
            "iterations": 0, "K": K, "seed": seed, "total_visits": 0,
            "eps": eps, "setup_secs": round(t_loop - t_setup, 3),
            "loop_secs": 0.0,
        }
    ranks = visits.select("v", (F.col("z") / F.lit(float(total))).alias("rank"))
    ranks = ranks.persist(StorageLevel.MEMORY_AND_DISK)
    ranks.count()  # pin; the scratch root (ranks' recompute source) is
    # reclaimed at interpreter exit (state.py atexit registry)
    blocks_assign.unpersist()
    csr.unpersist()
    verts.unpersist()
    info = {
        "iterations": steps_run, "K": K, "seed": seed,
        "total_visits": int(total), "eps": eps,
        "has_hub_splits": bool(has_hubs),
        "setup_secs": round(t_loop - t_setup, 3),
        "loop_secs": round(t_loop_end - t_loop, 3),
    }
    return ranks, info
