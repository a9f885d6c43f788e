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
