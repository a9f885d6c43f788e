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


def bloom_positions(
    keys: DataFrame,
    *,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    salt: str = "bf:",
) -> DataFrame:
    """Build a Bloom filter of the key set as its SET-BIT POSITION table
    (Bloom, CACM 1970): position ``md5(salt + h + ':' + key) % m_bits``
    for h in 0..k−1. Distinct positions, ≤ min(k·|keys|, m) rows — the
    compact relational form of the bitset (a 2^16-bit filter is ≤ 64 Ki
    rows ⇒ broadcastable however huge the key set was). Deterministic
    (md5), so the DuckDB twin reproduces every bit."""
    if m_bits <= 0 or k_hashes <= 0:
        raise ValueError("m_bits and k_hashes must be positive")
    k = keys.select(F.col(key_col).cast("string").alias("g")).distinct()
    rows = k.select(
        "g",
        F.explode(F.array(*[F.lit(h) for h in range(k_hashes)])).alias("h"),
    )
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.col("h").cast("string"), F.lit(":"), F.col("g")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )
    return rows.select(pos.alias("pos")).distinct()


def bloom_prefilter(
    train: DataFrame,
    bloom: DataFrame,
    *,
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    salt: str = "bf:",
) -> DataFrame:
    """The decontamination pre-filter: per train doc, how many distinct
    shingles pass a Bloom filter of the benchmark shingle set (ALL k
    positions set). NO FALSE NEGATIVES by construction — every truly
    contaminated shingle passes — so the exact join only needs the
    passing shingles: at 100 TB this turns the shingle-keyed shuffle
    from |corpus shingles| into |suspects| (FP rate ≈ (1−e^{−kn/m})^k
    of the rest), with the filter itself a ≤ m-row broadcast instead of
    a benchmark-sized side.

    Emits (id, n_shingles, n_suspect) for every train row. Compose:
    ``contamination_check`` on the suspects equals the unfiltered check
    (tests pin the no-false-negative containment)."""
    sh = word_shingles(F.col(text_col), n)
    t = train.select(
        F.col(id_col), F.size(sh).cast("long").alias("n_shingles"), sh.alias("sh")
    )
    g = t.select(id_col, F.explode("sh").alias("g"))
    rows = g.select(
        id_col,
        "g",
        F.explode(F.array(*[F.lit(h) for h in range(k_hashes)])).alias("h"),
    )
    pos = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.col("h").cast("string"), F.lit(":"), F.col("g")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
    )
    # a shingle is suspect iff ALL k of its positions are set: count the
    # set hits per (doc, shingle) against the broadcast position table
    hits = (
        rows.select(id_col, "g", pos.alias("pos"))
        .join(F.broadcast(bloom), "pos", "left_semi")
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("nh"))
        .filter(F.col("nh") == k_hashes)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_suspect"))
    )
    return (
        t.drop("sh")
        .join(hits, id_col, "left")
        .select(
            id_col,
            "n_shingles",
            F.coalesce("n_suspect", F.lit(0)).cast("long").alias("n_suspect"),
        )
    )
