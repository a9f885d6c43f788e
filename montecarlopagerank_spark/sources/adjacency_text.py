"""Reference text-format compatibility source/sink.

The reference stores graphs as whitespace-delimited adjacency-list text:
one line ``src dst1 dst2 ...``; a line with <2 tokens is a dangling node
(reference parser: MonteCarloPageRank.scala:31-38; writer:
ConvertNodeLinksToAdjacencyList.scala:41-45).

We parse with Spark SQL string functions (no Python in the hot path) and
deliberately do NOT reproduce the reference's self-loop parse bug
(``parts.drop(0)`` at MonteCarloPageRank.scala:37 keeps the node's own id
as its first neighbour — documented in SURVEY.md §2.6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_adjacency_text(spark: SparkSession, path: str) -> DataFrame:
    """Text adjacency file → ``adj(src:long, neighbours:array<long>)``.

    Dangling nodes (no tokens after the id) get an empty array, matching
    the reference's ``new Array[Int](0)`` (MonteCarloPageRank.scala:34-35).
    """
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return (
        lines.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(toks.alias("toks"))
        .select(
            F.element_at("toks", 1).cast("long").alias("src"),
            # slice length must not overflow start+length (int): use size
            F.transform(
                F.slice("toks", 2, F.greatest(F.size("toks") - 1, F.lit(0))),
                lambda x: x.cast("long"),
            ).alias("neighbours"),
        )
    )


def edges_from_adjacency(adj: DataFrame) -> DataFrame:
    """``adj(src, neighbours)`` → ``edges(src, dst)`` (dangling rows drop)."""
    return adj.select("src", F.explode("neighbours").alias("dst"))


def write_adjacency_text(adj: DataFrame, path: str) -> None:
    """Adjacency → reference text format ``src\\tdst1\\tdst2...``
    (ConvertNodeLinksToAdjacencyList.scala:41-45), neighbours sorted for
    determinism (the reference's groupByKey order is nondeterministic —
    ordering is not part of the format contract, FIXTURES.md F3)."""
    (
        adj.select(
            F.array_join(
                F.concat(
                    F.array(F.col("src").cast("string")),
                    F.transform(
                        F.sort_array("neighbours"), lambda x: x.cast("string")
                    ),
                ),
                "\t",
            ).alias("value")
        ).write.mode("overwrite").text(path)
    )
