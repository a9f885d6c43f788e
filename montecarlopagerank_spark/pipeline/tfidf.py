"""TF-IDF term weighting and BM25 ranked retrieval over ``documents``.

New-engine scope: a training-data pipeline needs a cheap lexical
relevance primitive — per-document characteristic terms (TF-IDF) for
clustering / labeling / near-dup triage, and a ranked keyword search
(BM25) for corpus auditing ("show me the documents about X"). Both are
pure relational plans: tokenize → (doc, term) counts → join a tiny
term-statistics table → score → top-k.

Scale shape:

- ``doc_terms`` is explode + groupBy(doc, term): one shuffle over
  O(tokens) rows, partial-aggregated map-side (duplicate terms within
  a doc combine before the exchange).
- The document-frequency table is O(|vocab|) — tiny relative to the
  corpus — and is **broadcast** into the scoring join, so TF-IDF and
  BM25 add zero extra shuffles over the tf table itself.
- Top-k per doc is a window over the tf table's existing hash
  partitioning (partitionBy doc_id); global query top-k is a
  TakeOrderedAndProject, never a full sort.
- Scores are rounded to 6 decimals *inside* the deterministic
  ordering (round desc, then term/doc asc) so ranking is stable
  across engines and ulp-level libm differences can't reorder ties
  (the DuckDB twins in contract.py hash the same rounded values).

Tokenization is ``lower`` + split on ``[^a-z0-9]+`` with empties
dropped — deliberately the simplest spec that two engines can agree
on byte-for-byte (DuckDB twin: ``regexp_split_to_array`` + unnest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[^a-z0-9]+"


def doc_terms(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) — term frequency per document. One shuffle,
    map-side combined."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), TOKEN_RE)).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def tf_idf_top_terms(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF
    (sklearn convention: idf = ln((1+N)/(1+df)) + 1, weight = tf*idf).

    Returns (doc_id, rank 1-based, term, tfidf_r6). The df table is
    broadcast; the per-doc top-k window reuses the tf table's hash
    partitioning. Ordering is (rounded weight desc, term asc) so ties
    resolve identically in any engine.
    """
    tf = doc_terms(docs, id_col=id_col, text_col=text_col)
    n_docs = docs.select(F.count("*")).first()[0]
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log((1.0 + float(n_docs)) / (1.0 + F.col("df"))) + F.lit(1.0)
    scored = tf.join(F.broadcast(df_tbl), "term").select(
        "doc_id", "term", F.round(F.col("tf") * idf, 6).alias("tfidf_r6")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf_r6"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tfidf_r6")
    )


def bm25_search(
    docs: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones idf with the +1
    floor: idf = ln(1 + (N - df + 0.5)/(df + 0.5))): score each
    document against the tokenized ``query``, return the global top-k
    as (rank 1-based, doc_id, score_r6).

    The whole plan after the tf shuffle touches only rows whose term
    is in the (tiny, broadcast) query-term set, then aggregates by doc
    and takes a global ordered limit (TakeOrderedAndProject — no full
    sort). dl/avgdl use the post-tokenization length so the twin SQL
    is exact.
    """
    import re

    q_terms = sorted({t for t in re.split(TOKEN_RE, query.lower()) if t})
    if not q_terms:
        raise ValueError("query has no tokens")
    tf = doc_terms(docs, id_col=id_col, text_col=text_col).persist()
    n_docs = docs.select(F.count("*")).first()[0]
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    avgdl = dl.select(F.avg("dl")).first()[0]
    df_tbl = (
        tf.filter(F.col("term").isin(q_terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    idf = F.log(
        1.0
        + (float(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / float(avgdl))
    )
    scored = (
        tf.filter(F.col("term").isin(q_terms))
        .join(F.broadcast(df_tbl), "term")
        .join(dl, "doc_id")
        .select("doc_id", (idf * tf_norm).alias("part"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score_r6"))
    )
    top = (
        scored.orderBy(F.desc("score_r6"), F.asc("doc_id"))
        .limit(k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.desc("score_r6"), F.asc("doc_id"))
            ),
        )
        .select("rank", "doc_id", "score_r6")
    )
    tf.unpersist()
    return top


def hashed_features(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    ngram: int = 2,
) -> DataFrame:
    """Feature hashing (the "hashing trick", Weinberger et al. ICML
    2009): word n-grams → a fixed ``n_features``-dimensional sparse
    signed-count vector, no vocabulary table — THE vectorization step
    before linear models at corpus scale, because the feature space is
    fixed a priori (no global dictionary to build, broadcast, or keep
    consistent across jobs). Bucket = md5 of the gram mod n_features;
    a second hash bit supplies the ±1 sign that makes collision noise
    zero-mean. Emits sparse triplets ``(doc_id, idx, val)`` with
    ``val = Σ ±1`` over occurrences, zero-sum entries dropped.

    Deterministic — a pure function of the text (md5, not xxhash64, so
    the DuckDB twin reproduces every bucket and sign bit exactly).

    Scale shape: grams are built scan-side (let-bound token array, one
    split per row), exploded, and reduced by ONE map-side-combined
    groupBy on (doc_id, idx) — the same single-shuffle shape as
    ``doc_terms``; output size ≤ Σ grams, independent of any
    vocabulary."""
    if n_features <= 0:
        raise ValueError("n_features must be positive")
    if ngram <= 0:
        raise ValueError("ngram must be positive")
    from montecarlopagerank_spark.pipeline.textstats import normalized_text

    def grams(toks: Column) -> Column:
        k = F.size(toks) - (ngram - 1)
        return F.when(
            k > 0,
            F.transform(
                F.sequence(F.lit(0), k - 1),
                lambda i: F.array_join(F.slice(toks, i + 1, ngram), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    toks0 = F.split(normalized_text(F.col(text_col)), " ")
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.element_at(F.transform(F.array(toks0), grams), 1)
        ).alias("g"),
    ).filter(F.col("g") != "")
    idx = F.conv(F.substring(F.md5(F.concat(F.lit("fh:"), F.col("g"))), 1, 8), 16, 10
                 ).cast("long") % n_features
    sign = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fs:"), F.col("g"))), 1, 1), 16, 10
        ).cast("long") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    return (
        g.select("doc_id", idx.alias("idx"), sign.alias("s"))
        .groupBy("doc_id", "idx")
        .agg(F.sum("s").cast("bigint").alias("val"))
        .filter(F.col("val") != 0)
    )
