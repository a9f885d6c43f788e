"""Gopher-style repetition + quality-rule filters over ``documents``.

New-engine scope (the reference ships no text pipeline): the document-
level repetition and heuristic-rule filters every LLM pretraining
pipeline runs before dedup/tokenization, after Rae et al. 2021 (Gopher,
arXiv:2112.11446 §A1.1) — adapted to token-fraction form so both Spark
and the DuckDB oracle compute them bit-identically.

Scale shape:

- ``gopher_quality_flags`` is a single-pass projection — every rule is a
  higher-order array expression over the whitespace tokenization, so it
  runs inside whole-stage codegen with full column pruning (reads only
  (doc_id, text)) and zero shuffles at any corpus size.
- ``repetition_stats`` needs the per-document *mode* of the n-gram
  multiset (top-gram fraction), which is not expressible as a bounded
  array expression — so grams are exploded and reduced by
  (doc_id, gram) then (doc_id): two shuffles, both keyed by doc_id
  whose cardinality grows with the corpus (no low-cardinality hot keys;
  a single pathological giant document caps at its own token count and
  can be pre-truncated upstream by ``chunk_text``). The duplicate-
  fraction columns deliberately stay scan-side (``array_distinct``) so
  the exploded pass carries only the one column that needs it.

Both operators are deterministic and have exact DuckDB twins in
``contract.py`` (``repetition_stats`` / ``gopher_quality_flags``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.textstats import STOPWORDS

# Gopher §A1.1 rule bounds, adapted: the word-count floor is lowered to
# 30 (the synthetic docs run 10-100 words; production would use 50) and
# the symbol set is the paper's (hash, ellipsis).
MIN_WORDS = 30
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_RATIO = 0.1
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORDS = 2


def _norm_tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens — the shared tokenization (same
    regex semantics in Spark and DuckDB for ``\\s+``)."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def gopher_quality_flags(docs: DataFrame) -> DataFrame:
    """Per-document Gopher rule flags + the combined keep decision.

    One projection over (doc_id, text); every rule is an array/regexp
    expression (no UDF, no shuffle). Returns the measured ratios
    (rounded so independent float evaluation orders hash-match) plus a
    boolean per rule and ``passes_gopher`` = AND of all rules.
    """
    tk = _norm_tokens(F.col("text"))
    n = F.size(tk).cast("double")
    sum_len = F.aggregate(
        tk, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    ).cast("double")
    mean_len = F.when(n > 0, sum_len / n).otherwise(F.lit(0.0))
    n_alpha = F.size(F.filter(tk, lambda t: t.rlike("[a-z]"))).cast("double")
    alpha_frac = F.when(n > 0, n_alpha / n).otherwise(F.lit(0.0))
    # Gopher counts hash + ellipsis occurrences relative to words
    n_symbol = (
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"(#|\.\.\.)"), 0))
    ).cast("double")
    symbol_ratio = F.when(n > 0, n_symbol / n).otherwise(F.lit(0.0))
    n_stop = F.size(F.filter(tk, lambda t: t.isin(STOPWORDS))).cast("long")

    f_words = (n >= MIN_WORDS) & (n <= MAX_WORDS)
    f_meanlen = (mean_len >= MIN_MEAN_WORD_LEN) & (mean_len <= MAX_MEAN_WORD_LEN)
    f_symbol = symbol_ratio <= MAX_SYMBOL_RATIO
    f_alpha = alpha_frac >= MIN_ALPHA_WORD_FRAC
    f_stop = n_stop >= MIN_STOPWORDS
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        n_stop.alias("n_stopwords"),
        f_words.alias("ok_words"),
        f_meanlen.alias("ok_mean_word_len"),
        f_symbol.alias("ok_symbol_ratio"),
        f_alpha.alias("ok_alpha_words"),
        f_stop.alias("ok_stopwords"),
        (f_words & f_meanlen & f_symbol & f_alpha & f_stop).alias("passes_gopher"),
    )


def _bigrams(tk0: Column) -> Column:
    """Adjacent token 2-grams; empty (not a descending sequence!) when
    the document has fewer than 2 tokens. ``tk0`` is let-bound through a
    1-element array+transform so the (typically ``split``-derived)
    expression is evaluated once per row, not once per gram — codegen
    does no CSE inside higher-order-function lambdas (see
    contamination.word_shingles)."""

    def grams(tk: Column) -> Column:
        return F.when(F.size(tk) < 2, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.concat_ws(" ", F.slice(tk, i, 2)),
            )
        )

    return F.element_at(F.transform(F.array(tk0), grams), 1)


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Per-document repetition measures (Gopher §A1.1 repetition family,
    token-fraction form):

    - ``dup_token_frac``: 1 − distinct/total tokens (scan-side).
    - ``dup_bigram_frac``: 1 − distinct/total adjacent 2-grams (scan-side).
    - ``top_bigram_frac``: the most frequent 2-gram's share of all
      2-gram occurrences (max_count/n_bigrams, bounded (0, 1]) — the
      mode needs an explode + two doc_id-keyed reductions (module
      docstring).
    """
    tk = _norm_tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(tk).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tk)).cast("long").alias("n_distinct_tokens"),
        _bigrams(tk).alias("bg"),
    )
    top = (
        base.select("doc_id", F.explode("bg").alias("g"))
        .groupBy("doc_id", "g")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram_count"))
    )
    n = F.col("n_tokens").cast("double")
    nbg = F.size("bg").cast("double")
    return (
        base.join(top, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.when(n > 0, 1.0 - F.col("n_distinct_tokens") / n).otherwise(0.0), 6
            ).alias("dup_token_frac"),
            F.round(
                F.when(nbg > 0, 1.0 - F.size(F.array_distinct("bg")) / nbg).otherwise(
                    0.0
                ),
                6,
            ).alias("dup_bigram_frac"),
            F.round(
                F.when(
                    nbg > 0,
                    F.coalesce(F.col("top_bigram_count"), F.lit(0)) / nbg,
                ).otherwise(0.0),
                6,
            ).alias("top_bigram_frac"),
        )
    )


# quality_funnel thresholds (repetition stage), on the r6-rounded fracs
MAX_DUP_TOKEN_FRAC = 0.3
MAX_TOP_BIGRAM_FRAC = 0.2


def quality_funnel(docs: DataFrame) -> DataFrame:
    """The full pretraining-filter funnel as ONE composition: per stage,
    how many documents (and how much text) survive the cumulative
    conjunction —

      0 all → 1 gopher rules → 2 repetition (dup_token ≤ 0.3 AND
      top_bigram ≤ 0.2, on the r6-rounded fracs) → 3 langid == en →
      4 exact-dedup keeper (min doc_id per normalized text among the
      stage-3 survivors)

    — the attrition table every data-curation run reports (Rae et al.
    2021 table A2's shape). Emits (stage, name, n_docs, n_chars).

    Scale shape: every per-doc signal joins on doc_id (co-partitioned
    hash joins); the five stage aggregates are CONDITIONAL sums in one
    map-side-combined pass over the joined table, unpivoted with
    ``stack`` — no per-stage rescans. The dedup keeper adds one
    norm-text-keyed min-aggregate over stage-3 survivors only.
    """
    from montecarlopagerank_spark.pipeline.textstats import (
        langid_heuristic,
        normalized_text,
    )

    g = gopher_quality_flags(docs).select("doc_id", "passes_gopher")
    r = repetition_stats(docs).select(
        "doc_id", "dup_token_frac", "top_bigram_frac"
    )
    lang = langid_heuristic(docs)
    base = docs.select(
        "doc_id",
        F.length("text").cast("long").alias("nc"),
        normalized_text(F.col("text")).alias("norm"),
    )
    j = base.join(g, "doc_id").join(r, "doc_id").join(lang, "doc_id")
    s1 = F.col("passes_gopher")
    s2 = (
        s1
        & (F.col("dup_token_frac") <= MAX_DUP_TOKEN_FRAC)
        & (F.col("top_bigram_frac") <= MAX_TOP_BIGRAM_FRAC)
    )
    s3 = s2 & (F.col("pred_lang") == "en")
    j = j.withColumn("_s3", s3)
    keep = (
        j.filter(F.col("_s3"))
        .groupBy("norm")
        .agg(F.min("doc_id").alias("_keep_id"))
    )
    j = j.join(keep.hint("shuffle_hash"), "norm", "left")
    s4 = F.col("_s3") & (F.col("doc_id") == F.col("_keep_id"))

    def cnt(cond):
        return F.sum(cond.cast("long"))

    def mass(cond):
        return F.sum(F.when(cond, F.col("nc")).otherwise(F.lit(0)))

    agg = j.agg(
        F.count(F.lit(1)).alias("c0"),
        F.sum("nc").alias("m0"),
        cnt(s1).alias("c1"),
        mass(s1).alias("m1"),
        cnt(s2).alias("c2"),
        mass(s2).alias("m2"),
        cnt(F.col("_s3")).alias("c3"),
        mass(F.col("_s3")).alias("m3"),
        cnt(s4).alias("c4"),
        mass(s4).alias("m4"),
    )
    return agg.select(
        F.expr(
            "stack(5, "
            "0L, 'all', c0, m0, "
            "1L, 'gopher', c1, m1, "
            "2L, 'repetition', c2, m2, "
            "3L, 'langid_en', c3, m3, "
            "4L, 'exact_dedup', c4, m4) AS (stage, name, n_docs, n_chars)"
        )
    ).select(
        "stage",
        "name",
        F.coalesce("n_docs", F.lit(0)).cast("bigint").alias("n_docs"),
        F.coalesce("n_chars", F.lit(0)).cast("bigint").alias("n_chars"),
    )
