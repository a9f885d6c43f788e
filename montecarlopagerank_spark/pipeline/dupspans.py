"""Cross-document duplicated n-gram spans over ``documents``.

New-engine scope (the reference ships no text pipeline): the
substring-level duplication signal behind exact-substring dedup (Lee et
al. 2022 "Deduplicating Training Data Makes Language Models Better",
whose suffix-array pass removes any 50-token span occurring twice;
Penedo et al. 2023 RefinedWeb §3.3 runs the same idea). A suffix array
is not a Spark-shaped structure; the distributed equivalent is
word-n-gram fingerprinting: a position's n-gram is *duplicated* when
the same n-gram occurs in ≥ ``min_docs`` DISTINCT documents, and a
duplicated *span* is a maximal run of consecutive duplicated positions
(a shared k-token substring, k ≥ n, shows up as a run of k-n+1
duplicated positions, so ``max_dup_run`` recovers span length as
``run + n - 1`` tokens).

This is deliberately CROSS-document: within-document repetition is the
separate Gopher-style ``repetition_stats`` (quality_filters.py).

Scale shape (the 100 TB plan):

- grams are built scan-side by a let-bound ``transform`` over the token
  array (codegen does no CSE inside higher-order-function lambdas —
  see contamination.word_shingles on the O(words²) trap), keyed by
  ``md5`` so the shuffled state is fixed-width, never the text.
- the document frequency of a gram is ``distinct(k, doc) → groupBy(k)``
  — both stages get full map-side combine, so a boilerplate gram
  occurring 10^9 times costs one partial row per task per stage.
- positions learn their verdict by joining against ONLY the duplicated
  key set (``nd ≥ min_docs``), which is tiny relative to the gram
  stream (most grams are unique at corpus scale); AQE will broadcast
  it when small and skew-split the probe side when a boilerplate gram
  is hot.
- per-document span statistics fold a doc-bounded sorted array with
  ``aggregate`` (docs are bounded; no corpus-wide window anywhere).

Deterministic; exact DuckDB twin in ``contract.py``
(``dup_ngram_spans``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positional_grams(text: Column, n: int) -> Column:
    """All (overlapping, position-ordered) lower-cased n-word grams of a
    whitespace tokenization — NOT distinct: positions matter for span
    recovery. Empty array for docs shorter than ``n`` words. Let-bound
    token array (see module docstring)."""

    def grams(tk: Column) -> Column:
        return F.when(F.size(tk) < n, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
            )
        )

    tk0 = F.split(F.lower(F.trim(text)), r"\s+")
    return F.element_at(F.transform(F.array(tk0), grams), 1)


def dup_ngram_spans(
    docs: DataFrame,
    *,
    n: int = 5,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per document: how much of it is corpus-duplicated at n-gram
    granularity.

    Returns one row per input document:
    ``(id, n_grams, n_dup_grams, dup_ratio, max_dup_run)`` where
    ``n_grams`` is the number of n-gram positions, ``n_dup_grams`` the
    positions whose gram occurs in ≥ ``min_docs`` distinct documents,
    ``dup_ratio`` their quotient (0.0 for gram-free docs), and
    ``max_dup_run`` the longest consecutive duplicated-position run
    (the longest shared span is ``max_dup_run + n - 1`` tokens).
    """
    g = _positional_grams(F.col(text_col), n)
    pos = docs.select(
        F.col(id_col), F.posexplode(g).alias("pos", "gram")
    ).select(id_col, "pos", F.md5("gram").alias("k"))

    # document frequency per gram: distinct pairs THEN count — two
    # map-side-combining stages, no count(distinct) row explosion
    dup_keys = (
        pos.select("k", id_col)
        .distinct()
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("k")
    )

    flagged = pos.join(
        dup_keys.withColumn("is_dup", F.lit(True)), "k", "left"
    ).select(id_col, "pos", F.coalesce("is_dup", F.lit(False)).alias("dup"))

    # fold the doc-ordered dup flags once: (current run, best run)
    runs = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("dup").cast("long")).alias("n_dup_grams"),
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "dup"))),
                lambda s: s["dup"],
            ),
            F.struct(F.lit(0).alias("cur"), F.lit(0).alias("best")),
            lambda acc, d: F.struct(
                F.when(d, acc["cur"] + 1).otherwise(F.lit(0)).alias("cur"),
                F.greatest(
                    acc["best"], F.when(d, acc["cur"] + 1).otherwise(F.lit(0))
                ).alias("best"),
            ),
            lambda acc: acc["best"],
        ).alias("max_dup_run"),
    )

    return (
        docs.select(id_col)
        .join(runs, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.col("n_dup_grams") / F.col("n_grams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_ratio"),
            F.coalesce("max_dup_run", F.lit(0)).cast("long").alias("max_dup_run"),
        )
    )
