"""Distributed BPE tokenizer training (Sennrich, Haddow, Birch, ACL
2016) as pure DataFrame ops — learn the merge table, apply it, count
tokens.

New-engine scope: the tokenizer-training step of an LLM data pipeline,
run where the data is instead of sampling it down. The standard trick
makes this tractable at 100 TB: BPE statistics only depend on the WORD
TYPE table (word → corpus frequency), which Heaps' law keeps orders of
magnitude smaller than the corpus (~10-100M types for ~10^12 tokens) —
so one corpus-sized groupBy builds the type table and every merge round
after that touches only the types. Per round: ONE map-side-combined
pair-count aggregation + a driver argmax (a 1-row collect — plan-time
scalar, the merge decision is inherently global/sequential), then ONE
projection applying the merge. No Python ever sees a row.

Representation — chosen so a DuckDB twin reproduces training
BYTE-EXACTLY (contract.py "bpe_merges"): a word's symbol sequence is a
string — symbols joined by a DOUBLE space, padded with single spaces:
``[a, b, c]`` ↔ ``" a  b  c "``. Merging pair (x, y) is then the plain
LITERAL replace of ``" x  y "`` with ``" xy "``:

- every symbol is bounded by spaces on both sides and the pattern
  includes both bounds, so a symbol can never match inside another
  (`` aa  b `` does not contain `` a  b ``);
- the double separator gives adjacent pairs their OWN bounding spaces,
  so left-to-right non-overlapping literal replacement — the exact
  semantics of both Spark ``F.replace`` and DuckDB ``replace`` — equals
  the BPE greedy left-to-right merge pass (``[a,a,a]`` → ``[aa, a]``,
  ``[a,b,a,b]`` → ``[ab, ab]``).

Determinism: counts are exact integers; the argmax tie-breaks by
(count DESC, left ASC, right ASC) under binary UTF-8 collation in both
engines. The learned merge table is a pure function of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

TOKEN_RE = r"[a-z0-9]+"


def word_types(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → word-TYPE table ``(w, freq)`` (the one corpus-sized
    aggregation; everything after is Heaps-small)."""
    return (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _sym_string(w):
    """word → padded double-space symbol string: "abc" → " a  b  c "."""
    return F.concat(
        F.lit(" "), F.array_join(F.split(w, ""), "  "), F.lit(" ")
    )


def bpe_train(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges over the corpus. Returns
    ``(merges, vocab)`` where merges is ``[(left, right, pair_count),
    ...]`` in learned order and vocab is the final word-type table
    ``(w, s, freq)`` with ``s`` the merged symbol string. Stops early if
    no pair remains (fully merged corpus)."""
    wt = word_types(docs, text_col)
    state = wt.select("w", _sym_string(F.col("w")).alias("s"), "freq")
    state = state.persist(StorageLevel.MEMORY_AND_DISK)
    state.count()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        toks = F.split(F.trim("s"), "  ")
        pairs = F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("l"),
                F.element_at(toks, i + 2).alias("r"),
            ),
        )
        top = (
            state.filter(F.size(toks) >= 2)
            .select(F.explode(pairs).alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        l, r, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((l, r, cnt))
        nxt = state.select(
            "w",
            F.replace(
                "s", F.lit(f" {l}  {r} "), F.lit(f" {l}{r} ")
            ).alias("s"),
            "freq",
        ).persist(StorageLevel.MEMORY_AND_DISK)
        nxt.count()
        state.unpersist()
        state = nxt
    return merges, state


def bpe_segment_counts(vocab: DataFrame) -> DataFrame:
    """Final vocab → per-word token count + corpus token totals:
    ``(w, freq, n_tokens)``. The corpus-level BPE token count is
    ``sum(freq * n_tokens)``."""
    return vocab.select(
        "w",
        "freq",
        F.size(F.split(F.trim("s"), "  ")).cast("long").alias("n_tokens"),
    )
