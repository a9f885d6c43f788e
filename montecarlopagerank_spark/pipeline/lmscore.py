"""Unigram language-model quality scoring: per-document cross-entropy
under the corpus's own unigram distribution.

New-engine scope (training-data pipeline family, like textstats /
quality_filters): the classic LM-based quality signal (CCNet, Wenzek et
al. LREC 2020, scores documents by LM perplexity; GPT-style pipelines
keep the low-perplexity tail). No external model is available here, so
the model IS the corpus: maximum-likelihood unigram probabilities
p(w) = count(w) / total over the scored corpus itself — self-perplexity.
Low cross-entropy = a document made of globally common tokens
(boilerplate-ish); high = rare-token-heavy (jargon, noise, other
languages). Both tails are the interesting filter targets.

Scale shape (the 100 TB story): ONE explode of the token stream feeding
two consumers — (a) the vocabulary count, a map-side-combined
``groupBy(tok)`` whose output is O(vocab), and (b) the scoring join,
token-keyed so both sides hash-shuffle on ``tok`` (the vocab side is
NEVER broadcast — a web-scale vocab is itself huge) — then one
doc-keyed average. Total-token count rides the vocab aggregate as one
scalar action. No UDFs anywhere; ``ln`` stays in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def unigram_lm_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """``docs(doc_id, text)`` → ``(doc_id, n_tokens:long, cross_entropy,
    perplexity)`` where ``cross_entropy = mean over tokens of
    -ln p(token)`` under the corpus MLE unigram model and ``perplexity =
    exp(cross_entropy)``. Tokens are lowercased ``[a-z0-9]+`` runs;
    documents with no tokens are absent (no defined score). Scoring the
    corpus that defines the model means no OOV ⇒ no smoothing needed."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), 0
            )
        ).alias("tok"),
    )
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c")).collect()[0][0]  # one scalar action
    logp = vocab.select(
        "tok", (F.log("c") - F.log(F.lit(float(total)))).alias("lp")
    )
    return (
        toks.join(logp.hint("shuffle_hash"), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg(-F.col("lp")).alias("cross_entropy"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "cross_entropy",
            F.exp("cross_entropy").alias("perplexity"),
        )
    )


def bigram_lm_scores(
    docs: DataFrame, text_col: str = "text", lam: float = 0.7
) -> DataFrame:
    """Interpolated bigram cross-entropy: ``docs(doc_id, text)`` →
    ``(doc_id, n_bigrams:long, cross_entropy, perplexity)`` where for
    each in-document bigram (w1, w2)

        p(w2 | w1) = lam * c(w1,w2)/c(w1·) + (1-lam) * c(w2)/total

    with ``c(w1,w2)`` the corpus bigram count, ``c(w1·)`` the bigram-
    context count (bigrams starting with w1), and the unigram term the
    MLE fallback (Jelinek-Mercer interpolation). Bigrams never cross a
    document boundary. Documents with <2 tokens are absent.

    Scale shape: the bigram stream is built with an ARRAY transform
    inside each row (no shuffle, no window — a per-doc_id window would
    be an extra O(corpus) sort); the three model tables are then joined
    token-keyed with ``shuffle_hash`` hints — bigram vocab is O(corpus)
    at web scale, never broadcast. All column math; zero Python UDFs.
    """
    tk = docs.select(
        "doc_id",
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), 0
        ).alias("tk"),
    ).filter(F.size("tk") >= 2)
    bg = tk.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(tk) - 2),"
                " i -> struct(tk[i] AS w1, tk[i + 1] AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")
    uni = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(r"[a-z0-9]+"), 0
                )
            ).alias("w2")
        )
        .groupBy("w2")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    total = uni.agg(F.sum("cu")).collect()[0][0]  # one scalar action
    c2 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cb"))
    ctx = c2.groupBy("w1").agg(F.sum("cb").alias("cc"))
    p = (
        F.lit(lam) * F.col("cb") / F.col("cc")
        + F.lit(1.0 - lam) * F.col("cu") / F.lit(float(total))
    )
    return (
        bg.join(c2.hint("shuffle_hash"), ["w1", "w2"])
        .join(ctx.hint("shuffle_hash"), "w1")
        .join(uni.hint("shuffle_hash"), "w2")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg(-F.log(p)).alias("cross_entropy"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "cross_entropy",
            F.exp("cross_entropy").alias("perplexity"),
        )
    )
