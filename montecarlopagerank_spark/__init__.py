"""montecarlopagerank_spark — a PySpark-native link-graph analytics engine.

A from-scratch DataFrame-first re-expression of the capabilities of
sjcampbell/MonteCarloPageRank (reference: /root/reference, Scala, Spark 1.5
RDD API), extended per the north_rule with connected components, label
propagation, triangle counting, a transcript-derived edge table, CSR-blocked
adjacency with Arrow kernels, skew handling, and resumable checkpointing —
plus the training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB corpus pipeline needs.

Design rules (see SURVEY.md):
  * DataFrame/SQL everywhere; the only Python execution is Arrow-batched
    (``applyInPandas`` / ``mapInPandas``) — never per-row Python.
  * Deterministic at any parallelism: RNG seeded by stable block id, vertex
    ids from a sorted dictionary — local[8] output == local[32] output.
  * Iterative algorithms checkpoint per superstep with a manifest and are
    resumable mid-iteration.
"""

__version__ = "0.1.0"

from montecarlopagerank_spark.session import get_spark  # noqa: F401
