"""Benchmark-contamination check: n-gram overlap between a training
corpus and a held-out benchmark set.

New-engine scope: the decontamination pass every serious pretraining
pipeline runs (GPT-3 appendix C / PaLM-style): a training document is
flagged when it shares any word n-gram with any benchmark document.

Scale shape: both sides are exploded to DISTINCT (doc, shingle) pairs
scan-side (a narrow ``transform`` + ``array_distinct`` + ``explode``;
distinct-per-doc BEFORE the join bounds a giant document at its own
shingle count), the benchmark side is reduced to a global distinct
shingle set, and the overlap is ONE equi-join keyed by the shingle
string — high-cardinality keys, no hot key can exceed the benchmark's
duplicate count for that shingle (the benchmark side is distinct, so
each train shingle occurrence matches at most once). At 100 TB the
join is a plain shuffle join; if the benchmark is small (the usual
case: benchmarks are MBs, corpora are TBs) Spark's AQE will broadcast
the distinct benchmark set automatically — exactly the plan you want.

Deterministic; exact DuckDB twin in contract.py (``contamination_check``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(text: Column, n: int) -> Column:
    """Distinct lower-cased n-word shingles of a whitespace tokenization.
    Empty array (never a descending ``sequence``) for docs shorter than
    ``n`` words.

    The token array is let-bound via a 1-element ``array``+``transform``
    wrapper: codegen does NOT common-subexpression-eliminate inside
    higher-order-function lambdas, so referencing the ``split`` column
    directly from the per-gram lambda would re-split the whole text for
    every gram — O(words²) per document (measured 10× slower at sf0.1).
    The lambda variable is evaluated once per row."""

    def grams(tk: Column) -> Column:
        return F.when(F.size(tk) < n, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(tk) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
                )
            )
        )

    tk0 = F.split(F.lower(F.trim(text)), r"\s+")
    return F.element_at(F.transform(F.array(tk0), grams), 1)


def contamination_check(
    train: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per train document: total distinct shingles, how many also occur
    anywhere in the benchmark, and the contaminated flag (any overlap).

    Returns (id, n_shingles, n_contaminated, contaminated) for EVERY
    train row, including shingle-free ones.
    """
    sh = word_shingles(F.col(text_col), n)
    t = train.select(
        F.col(id_col), F.size(sh).cast("long").alias("n_shingles"), sh.alias("sh")
    )
    bench_set = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("g"))
        .distinct()
    )
    hits = (
        t.select(id_col, F.explode("sh").alias("g"))
        .join(bench_set, "g")
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_contaminated"))
    )
    return (
        t.drop("sh")
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias(
                "n_contaminated"
            ),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
    )
