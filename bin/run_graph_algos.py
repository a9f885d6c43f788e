"""spark-submit entry point: CC / LPA / triangles over a transcripts table.

    spark-submit --py-files dist/engine.zip bin/run_graph_algos.py \
        --input /path/transcripts --output /path/out --algo components
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--algo", choices=["components", "labelprop", "triangles"],
                    required=True)
    ap.add_argument("--max-iters", type=int, default=50)
    ap.add_argument("--edge-kinds", nargs="*", default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"graph-{args.algo}").getOrCreate()

    from montecarlopagerank_spark.operators.edges import transcript_edges
    from montecarlopagerank_spark.sources.transcripts import read_transcripts

    ts = read_transcripts(spark, args.input)
    edges, vertices = transcript_edges(ts, kinds=args.edge_kinds)
    edges = edges.persist()

    if args.algo == "components":
        from montecarlopagerank_spark.algos.components import connected_components

        out = connected_components(spark, edges, vertices, args.max_iters)
    elif args.algo == "labelprop":
        from montecarlopagerank_spark.algos.labelprop import label_propagation

        out = label_propagation(spark, edges, vertices, args.max_iters)
    else:
        from montecarlopagerank_spark.algos.triangles import triangles_per_vertex

        out = triangles_per_vertex(spark, edges)

    named = out.join(vertices, out.v == vertices.vid).select(
        F.concat("kind", F.lit("#"), "key").alias("vertex"),
        *[c for c in out.columns if c != "v"],
    )
    named.write.mode("overwrite").parquet(args.output)
    spark.stop()


if __name__ == "__main__":
    main()
