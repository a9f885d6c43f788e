"""Text analysis over a ``documents(doc_id, text, ...)`` table.

Everything here is pure ``pyspark.sql.functions`` — JVM-side, whole-stage
codegen, no Python in the hot path — so each operator has an exact ANSI-SQL
twin in ``__spark_entry__.oracle_sql()`` (DuckDB-checked). At 100 TB these
are single-pass scans with full column pruning: each operator projects only
(doc_id, text).

Determinism notes: all ratios are rounded at the operator boundary so the
DuckDB oracle (which may sum in a different order) hash-matches; token
splitting is on ``\\s+`` after trim, identical semantics in Spark and
DuckDB regex engines for this pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# the reference corpus' stopword-ish tokens; deliberately small + fixed so
# the SQL oracle can inline the same list
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counting: whitespace tokens + a BPE-ish proxy
    (ceil(chars/4), the common 4-chars-per-token heuristic) + word-regex
    token count. One projection, one scan."""
    toks = _tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        F.when(F.length(F.trim("text")) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[A-Za-z0-9]+"), 0)).alias(
            "n_word_tokens"
        ),
        F.ceil(F.length("text") / F.lit(4)).cast("long").alias("n_bpe_est"),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality scoring: length band + stopword ratio + mean token
    length + punctuation density, combined into [0, 1]. Deterministic,
    SQL-expressible; thresholds are arbitrary but fixed."""
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS))).cast(
        "double"
    )
    n_chars = F.length("text").cast("double")
    n_punct = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(r"[.,;:!?]"), 0)
    ).cast("double")
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    length_ok = (n_chars >= 50) & (n_chars <= 20000)
    score = (
        F.when(length_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when((stop_ratio >= 0.01) & (stop_ratio <= 0.6), F.lit(0.3)).otherwise(
            F.lit(0.0)
        )
        + F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), F.lit(0.2)).otherwise(
            F.lit(0.0)
        )
        + F.when(punct_ratio <= 0.1, F.lit(0.1)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 2).alias("quality"),
    )


def langid_heuristic(docs: DataFrame) -> DataFrame:
    """Deterministic character-class language id: CJK → zh, kana → ja,
    hangul → ko, cyrillic → ru, high accented-latin density → latin-acc,
    else en. A real system would use fastText/cld3; the *Spark shape* (one
    regexp scan per class, no UDF) is the point — swapping in a model means
    swapping these columns for a pandas_udf over the same projection."""
    t = F.col("text")
    n_chars = F.greatest(F.length(t), F.lit(1)).cast("double")
    cjk = F.size(F.regexp_extract_all(t, F.lit(r"[\x{4E00}-\x{9FFF}]"), 0))
    kana = F.size(F.regexp_extract_all(t, F.lit(r"[\x{3040}-\x{30FF}]"), 0))
    hangul = F.size(F.regexp_extract_all(t, F.lit(r"[\x{AC00}-\x{D7AF}]"), 0))
    cyr = F.size(F.regexp_extract_all(t, F.lit(r"[\x{0400}-\x{04FF}]"), 0))
    acc = F.size(
        F.regexp_extract_all(t, F.lit(r"[\x{00C0}-\x{00FF}\x{0100}-\x{017F}]"), 0)
    )
    pred = (
        F.when(cjk / n_chars > 0.05, F.lit("zh"))
        .when(kana / n_chars > 0.05, F.lit("ja"))
        .when(hangul / n_chars > 0.05, F.lit("ko"))
        .when(cyr / n_chars > 0.05, F.lit("ru"))
        .when(acc / n_chars > 0.03, F.lit("latin-acc"))
        .otherwise(F.lit("en"))
    )
    return docs.select("doc_id", pred.alias("pred_lang"))


def normalized_text(text: Column) -> Column:
    """Dedup normalization: lowercase + collapse whitespace runs + trim."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact-dup key, and
    the one hash both Spark and DuckDB compute identically) plus a rolling
    polynomial token hash (mod 2^31-1, order-sensitive — catches
    reorderings md5-of-normalized would too, but is incrementally
    computable at ingest)."""
    toks = _tokens(normalized_text(F.col("text")))
    # token → 32-bit int via md5 prefix (the one hash Spark and DuckDB
    # share); fold with h*31+x mod 2^31-1 so h*31+x stays well inside long
    mod = F.lit(2147483647)  # 2^31 - 1
    tok_h = lambda t: F.conv(F.substring(F.md5(t.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )
    rolling = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda h, t: (h * F.lit(31) + tok_h(t)) % mod,
    )
    return docs.select(
        "doc_id",
        F.md5(normalized_text(F.col("text")).cast("binary")).alias("md5_norm"),
        rolling.alias("rolling_hash"),
    )


def corpus_vocab_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """ONE-row corpus vocabulary summary: document count, total token
    count, exact distinct-token count, approximate distinct-token count,
    and the type-token ratio. Tokens are lowercased ``[a-z0-9]+`` runs
    (the unigram-LM convention, pipeline/lmscore.py).

    Scale story: ``n_distinct`` is an exact distinct — one shuffle of the
    token stream, the small-SF oracle path. ``n_distinct_approx`` is
    Spark's HyperLogLog++ ``approx_count_distinct`` (rsd 1%) — NO shuffle
    of distinct tokens, just fixed-size sketches merged map-side; at a
    10^11-token corpus that is the only viable vocabulary counter (same
    sketch family the HyperANF operator builds per vertex). The pytest
    band pins the sketch within 3·rsd of exact."""
    toks = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), 0
            )
        ).alias("tok")
    )
    n_docs = docs.count()
    agg = toks.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.countDistinct("tok").alias("n_distinct"),
        F.approx_count_distinct("tok", 0.01).alias("n_distinct_approx"),
    )
    return agg.select(
        F.lit(n_docs).cast("long").alias("n_docs"),
        "total_tokens",
        "n_distinct",
        "n_distinct_approx",
        F.round(
            F.col("n_distinct").cast("double") / F.col("total_tokens"), 6
        ).alias("ttr_r6"),
    )


def group_top_terms(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k most frequent tokens per group with a deterministic
    (count DESC, term ASC) total order — e.g. "what do turns say when
    they invoke each tool". One explode → (group, term) map-side-
    combined count → per-group window top-k (the window reuses the
    count's hash partitioning — no second exchange)."""
    counts = (
        df.select(F.col(group_col).alias("grp"), _tokens(F.col(text_col)).alias("tk"))
        .select("grp", F.explode("tk").alias("term"))
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("grp").orderBy(F.desc("cnt"), F.asc("term"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "rank", "term", "cnt")
    )


def readability(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch reading-ease and Flesch-Kincaid grade per document (the
    classic length-complexity quality signals; Kincaid et al. 1975)
    with the standard heuristics: sentences = runs ending in [.!?]+
    (min 1), words = whitespace tokens (min 1), syllables = vowel-group
    runs [aeiouy]+ per lowercased word (min 1/word). ONE codegen scan —
    two regexp counts and an aggregate fold over the token array; the
    exact arithmetic is replayed by the DuckDB twin (fixed op order,
    round 4)."""
    toks = _tokens(F.lower(F.col(text_col)))
    n_words = F.greatest(F.size(toks), F.lit(1)).cast("double")
    n_sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    ).cast("double")
    n_syll = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, w: acc
        + F.greatest(F.regexp_count(w, F.lit(r"[aeiouy]+")), F.lit(1)),
    ).cast("double")
    ease = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sents)
        - F.lit(84.6) * (n_syll / n_words)
    )
    grade = (
        F.lit(0.39) * (n_words / n_sents)
        + F.lit(11.8) * (n_syll / n_words)
        - F.lit(15.59)
    )
    return docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
        F.round(ease, 4).alias("flesch_ease_r4"),
        F.round(grade, 4).alias("fk_grade_r4"),
    )


def count_min_sketch(
    docs: DataFrame,
    *,
    text_col: str = "text",
    depth: int = 4,
    width: int = 256,
    salt: str = "cm:",
) -> DataFrame:
    """Count-min sketch of the corpus token-frequency distribution
    (Cormode-Muthukrishnan, J.Alg 2005): ``depth`` rows of ``width``
    counters, counter (d, w) = Σ occurrences of tokens with
    ``md5(salt + d + ':' + token) % width == w``; any token's frequency
    estimate ``min_d sketch[d][h_d(token)]`` OVERestimates truth by at
    most ε·N with the usual (ε, δ) guarantees — the fixed-size heavy-
    hitter summary that a 10^12-token corpus can maintain where an
    exact vocabulary count cannot sit in one place. md5 (not xxhash64)
    keeps the DuckDB twin bit-exact.

    Emits the sketch as ``(d, w, c)`` rows — depth·width of them at
    most, independent of corpus size; sketches of corpus shards MERGE
    by cell-wise addition (the groupBy does exactly that), which is the
    whole point at scale. One token explode (shared tokenization) ×
    depth, reduced by ONE map-side-combined groupBy on the tiny
    (d, w) key space — hub tokens collapse to per-partition partials."""
    if depth <= 0 or width <= 0:
        raise ValueError("depth and width must be positive")
    toks = _tokens(F.col(text_col))
    t = docs.select(F.explode(toks).alias("t")).filter(F.col("t") != "")
    rows = t.select(
        "t", F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d")
    )
    w = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt), F.col("d").cast("string"), F.lit(":"), F.col("t")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % width
    )
    return (
        rows.select(F.col("d").cast("long").alias("d"), w.alias("w"))
        .groupBy("d", "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
