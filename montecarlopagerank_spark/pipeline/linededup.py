"""Corpus-level line deduplication over ``documents`` (C4 / CCNet style).

New-engine scope (the reference ships no text pipeline): the "remove
boilerplate lines repeated across the corpus" pass every web-scale
pretraining pipeline runs (Raffel et al. 2020 §2.2 dedup spans;
Wenzek et al. 2019 CCNet §3.1 line-level dedup; Penedo et al. 2023
RefinedWeb §3.3). A line whose normalized form occurs ``min_dup``+
times corpus-wide is boilerplate (nav bars, cookie banners, license
headers); either every copy is dropped (``keep="none"``, CCNet) or the
single globally-first occurrence survives (``keep="first"``, C4).

Scale shape (the 100 TB plan):

- lines are exploded narrowly from the document scan (no pre-shuffle);
  the dedup key is ``md5`` of the normalized line, so the wide state is
  a fixed-width hash, never the line text.
- corpus counts + first-occurrence are ONE ``groupBy(key)`` with full
  map-side combine — a line repeated 10^9 times costs one partial row
  per task, not a skewed reduce (this is why ``keep="first"`` uses a
  ``min(struct)`` aggregate, NOT a per-key window: a window would sort
  the hot key's 10^9 rows in one partition).
- verdicts re-join the exploded lines by key (hash shuffle), then docs
  reassemble by ``groupBy(doc_id)`` + ``sort_array`` — doc_id keys are
  unskewed by construction.
- short lines (< ``min_chars`` after trim, e.g. blank separators) are
  exempt: they are near-universally duplicated and removing them would
  mangle formatting, so they never enter the count shuffle at all.

Deterministic; exact DuckDB twin in ``contract.py``
(``line_dedup_docs``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def line_dedup(
    docs: DataFrame,
    *,
    min_dup: int = 2,
    keep: str = "first",
    min_chars: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop corpus-duplicated lines from every document.

    A line is *eligible* if its trimmed form has ≥ ``min_chars`` chars;
    eligible lines with corpus-wide normalized-count ≥ ``min_dup`` are
    dropped — all copies (``keep="none"``) or all but the first by
    (doc_id, line_idx) order (``keep="first"``). Ineligible (short)
    lines always survive.

    Returns one row per input document:
    ``(id, n_lines, n_kept, clean_text)`` — ``clean_text`` is the
    surviving lines re-joined by ``\\n`` in original order (empty
    string when nothing survives).
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")

    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_idx", "line"),
    )
    norm = F.lower(F.trim(F.col("line")))
    keyed = lines.withColumn(
        "k", F.when(F.length(norm) >= min_chars, F.md5(norm))
    )
    counts = (
        keyed.filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.min(F.struct(F.col(id_col).alias("d"), F.col("line_idx").alias("i")))
            .alias("first_occ"),
        )
    )
    j = keyed.join(counts, "k", "left")
    survives = F.col("k").isNull() | (F.col("c") < min_dup)
    if keep == "first":
        survives = survives | (
            (F.col("first_occ.d") == F.col(id_col))
            & (F.col("first_occ.i") == F.col("line_idx"))
        )
    kept = (
        j.filter(survives)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("line_idx", "line"))
                    ),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
    )
    totals = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(kept, id_col, "left").select(
        id_col,
        "n_lines",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
