"""spark-submit entry point: PageRank over a transcripts table.

    spark-submit --py-files dist/engine.zip bin/run_pagerank.py \
        --input /path/to/transcripts_parquet --output /path/out \
        --algo power --tol 1e-6 --checkpoint-dir /path/ckpt [--resume]

Replaces the reference's CLI (Conf.scala:5-16: --input --output
--node-count --iterations --num-executors --walks). ``--node-count`` is
gone — the vertex set is derived, not declared; ``--num-executors`` is
spark-submit's own concern.
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="transcripts parquet dir or Iceberg table name")
    ap.add_argument("--output", required=True)
    ap.add_argument("--algo", choices=["power", "mc"], default="power")
    ap.add_argument("--eps", type=float, default=0.15)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--iterations", type=int, default=10,
                    help="MC supersteps (Conf.scala:10 default)")
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--walks", type=int, default=10000,
                    help="MC walks per vertex (Conf.scala:15 default)")
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--edge-kinds", nargs="*", default=None,
                    help="subset of turn_chain role_role turn_tool")
    args = ap.parse_args()

    spark = SparkSession.builder.appName(f"pagerank-{args.algo}").getOrCreate()

    from montecarlopagerank_spark.operators.edges import transcript_edges
    from montecarlopagerank_spark.sources.transcripts import read_transcripts

    ts = read_transcripts(spark, args.input)
    edges, vertices = transcript_edges(ts, kinds=args.edge_kinds)
    edges = edges.persist()

    if args.algo == "power":
        from montecarlopagerank_spark.algos.pagerank_power import pagerank_power

        ranks, info = pagerank_power(
            spark, edges, vertices, eps=args.eps, tol=args.tol,
            max_iters=args.max_iters, checkpoint_dir=args.checkpoint_dir,
            resume=args.resume,
        )
    else:
        from montecarlopagerank_spark.algos.pagerank_mc import pagerank_monte_carlo

        ranks, info = pagerank_monte_carlo(
            spark, edges, vertices, walks_per_vertex=args.walks,
            iterations=args.iterations, eps=args.eps, seed=args.seed,
            checkpoint_dir=args.checkpoint_dir, resume=args.resume,
        )

    out = (
        ranks.join(vertices, ranks.v == vertices.vid)
        .select(
            F.concat("kind", F.lit("#"), "key").alias("vertex"),
            "rank",
        )
        .orderBy(F.desc("rank"))
    )
    out.write.mode("overwrite").parquet(args.output)
    print({"info": {k: v for k, v in info.items() if k != "deltas"}})
    spark.stop()


if __name__ == "__main__":
    main()
