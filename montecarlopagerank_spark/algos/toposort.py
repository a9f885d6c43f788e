"""Topological layering / cycle diagnosis via synchronous Kahn peeling.

New-engine scope (no reference twin — the reference ships only PageRank;
`BASELINE.json` north_rule's edge graphs are built from *ordered* turn
chains, so "is this subgraph a DAG, and how deep" is a natural transcript
question). Synchronous Kahn (Kahn, CACM 1962, parallel formulation):
each round removes ALL current zero-in-degree vertices at once; the
round a vertex leaves in is its **layer** — equal to the longest path
from any source to it. Order-free ⇒ deterministic and parallelism-
invariant, no tie-break needed.

Run to fixpoint (``max_rounds=None``) the peel is an exact cycle
diagnosis: it stalls precisely when every remaining vertex has an
incoming live edge, i.e. the residue is exactly the set of vertices on
or reachable from a directed cycle (each peel round preserves this
invariant), and ``layer = -1`` marks them. With a bound, ``-1`` means
"not peeled within ``max_rounds``" — cyclic OR deeper than the bound —
which is what the unrolled DuckDB twin reproduces round-for-round
(contract.py ``_kahn_sql``).

Scale shape (mirrors kcore.py): state = the shrinking live edge list +
live vertex list, re-materialized per round (StateStore, flat plans).
Per round: peel = live verts anti-join live-edge destinations (O(V),
``shuffle_hash``), then the two state writes restrict verts/edges by
the peel — the peeled count rides the peel write via ``observe``, so a
round is three jobs, each a single exchange of an O(V) side; the O(E)
table is only ever semi-join-restricted, never re-keyed. Rounds = depth
of the acyclic prefix (longest source-to-vertex path), the intrinsic
span of the parallel algorithm.
"""

from __future__ import annotations

import time
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from montecarlopagerank_spark.operators.state import StateStore


def kahn_peel(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """``edges(src, dst)`` → (``layers(v, layer)``, info) over the directed
    simple graph (parallel edges deduped, self-loops kept — a self-loop
    IS a cycle). ``layer`` = peel round (longest source path); ``-1`` =
    not peeled (exactly the cycle-tainted residue when run to fixpoint,
    i.e. ``max_rounds=None``). ``info['converged']`` is True iff the
    fixpoint was reached — all vertices peeled, or a round peeled none;
    ``info['n_unresolved']`` counts the ``-1`` rows."""
    t0 = time.time()
    store = StateStore(spark)

    obs0 = Observation("kahn_init")
    d = store.materialize(
        edges.select("src", "dst")
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n")),
        "kahn_edges",
    )
    live_e = int(obs0.get["n"])
    v = store.materialize(
        d.select(F.col("src").alias("v"))
        .unionByName(d.select(F.col("dst").alias("v")))
        .distinct(),
        "kahn_verts",
    )

    peels: list[DataFrame] = []
    rounds, converged = 0, False
    it = 0
    while max_rounds is None or it < max_rounds:
        if live_e == 0:
            # no live edges: every remaining vertex is a source — peel
            # them all in one final layer and stop
            if v.isEmpty():
                converged = True
                break
            peels.append(
                store.materialize(
                    v.select("v", F.lit(it).cast("long").alias("layer")),
                    f"kahn_peel_{it}",
                )
            )
            v = store.materialize(v.limit(0), "kahn_verts")
            rounds += 1
            converged = True
            break
        obs = Observation(f"kahn_peel_{it}")
        # zero-in-degree ⇔ not a destination of any live edge
        peel = store.materialize(
            v.join(
                d.select(F.col("dst").alias("v")).distinct().hint("shuffle_hash"),
                "v",
                "left_anti",
            )
            .select("v", F.lit(it).cast("long").alias("layer"))
            .observe(obs, F.count(F.lit(1)).alias("n")),
            f"kahn_peel_{it}",
        )
        n_peeled = int(obs.get["n"])
        if n_peeled == 0:  # stalled: residue is cycle-tainted, exact
            converged = True
            break
        peels.append(peel)
        v = store.materialize(
            v.join(peel.select("v").hint("shuffle_hash"), "v", "left_anti"),
            "kahn_verts",
        )
        obs_e = Observation(f"kahn_edges_{it}")
        d = store.materialize(
            d.join(
                v.withColumnRenamed("v", "src").hint("shuffle_hash"),
                "src",
                "left_semi",
            ).observe(obs_e, F.count(F.lit(1)).alias("n")),
            "kahn_edges",
        )
        live_e = int(obs_e.get["n"])
        rounds += 1
        it += 1

    unresolved = v.select("v", F.lit(-1).cast("long").alias("layer"))
    out = unresolved
    for p in peels:
        out = out.unionByName(p)
    from pyspark.storagelevel import StorageLevel

    out = out.persist(StorageLevel.MEMORY_AND_DISK)
    n_unresolved = out.filter(F.col("layer") < 0).count()
    return out, {
        "rounds": rounds,
        "converged": converged,
        "n_unresolved": n_unresolved,
        "secs": round(time.time() - t0, 3),
    }
