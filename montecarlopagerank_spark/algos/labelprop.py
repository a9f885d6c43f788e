"""Synchronous label propagation (LPA) with deterministic tie-breaking.

North-rule algorithm with no reference implementation (SURVEY.md §2.7).
Labels start as each vertex's own vid; every superstep each vertex adopts
the most frequent label among its (undirected) neighbours, ties broken by
minimum label — so runs are deterministic and parallelism-invariant.
Synchronous LPA can oscillate on bipartite-ish structures, hence the hard
``max_iters`` cap; the fixpoint test is "no vertex changed label".

Shape per superstep: edges ⋈ labels → groupBy(v, label).count() →
window row_number over (count desc, label asc) → filter rn=1. The
count aggregation is partial-aggregable; the window partitions by vertex
(no global sort). Hub vertices with huge neighbourhoods pre-aggregate
map-side because (v, label) collapses duplicates early.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from montecarlopagerank_spark.operators.state import StateStore


def label_propagation(
    spark: SparkSession,
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 20,
) -> DataFrame:
    """``edges(src,dst)`` → ``labels(v:long, label:long)``."""
    e = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    sym = (
        e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter("u != v")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)  # loop-invariant
    )
    verts = (
        vertices.select(F.col("vid").alias("v"))
        if vertices is not None
        else sym.select("u").withColumnRenamed("u", "v").distinct()
    )
    store = StateStore(spark)  # flat per-superstep materializer (state.py)
    labels = store.materialize(
        verts.select("v", F.col("v").alias("label")), "labels"
    )

    w = Window.partitionBy("v").orderBy(F.desc("cnt"), F.asc("label"))
    for it in range(max_iters):
        nbr_labels = sym.join(
            labels.withColumnRenamed("v", "u"), "u"
        ).select("v", "label")
        mode = (
            nbr_labels.groupBy("v", "label")
            .agg(F.count("*").alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter("rn = 1")
            .select("v", F.col("label").alias("new_label"))
        )
        updated = (
            labels.join(mode, "v", "left")
            .select(
                "v",
                F.coalesce("new_label", "label").alias("label"),
                (F.coalesce("new_label", "label") != F.col("label")).alias("changed"),
            )
        )
        # changed-count rides the write job as an observed metric — one
        # Spark job per superstep, no separate count() action
        obs = Observation(f"lpa_step_{it}")
        updated = store.materialize(
            updated.observe(
                obs, F.sum(F.when(F.col("changed"), 1).otherwise(0)).alias("nc")
            ).select("v", "label"),
            "labels",
        )
        labels = updated
        if int(obs.get["nc"] or 0) == 0:
            break
    sym.unpersist()
    return labels
