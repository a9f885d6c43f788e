"""PII detection + redaction over a text column.

New-engine scope: the scrubbing pass an LLM training pipeline runs
before anything else touches raw text — find and mask emails, IPv4
addresses, phone-like numbers, and long digit runs (account / card
numbers). Heuristic regex tier only: a production pipeline layers an
NER model on top (that would be a ``pandas_udf`` over the exact same
projection — the Spark shape here is the point).

Scale shape: a single projection over (ids, text) — every detector is a
``regexp_extract_all`` count plus a ``regexp_replace``, all inside
whole-stage codegen, zero shuffles at any corpus size.

Determinism / oracle parity: patterns use only syntax with identical
semantics in Java regex (Spark) and RE2 (DuckDB) — character classes,
bounded repetition, ``\\b`` — no lookaround, no ``\\d`` shorthand.
Masks are applied in a fixed order (email → ipv4 → phone → digit run),
each detector counting on the text as left by the previous mask, so the
DuckDB twin (contract.py ``pii_scrub_events``) reproduces counts and
redacted text byte-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9][0-9() -]{6,}[0-9]"


def digit_run_re(min_digits: int) -> str:
    return r"[0-9]{%d,}" % min_digits


def pii_patterns(min_digits: int = 4) -> list[tuple[str, str, str]]:
    """(kind, mask, pattern) in application order. ``min_digits`` tunes
    the digit-run detector (4 for account-number-ish runs; the driver
    query uses 2 so the synthetic corpus exercises the path)."""
    return [
        ("email", "<EMAIL>", EMAIL_RE),
        ("ipv4", "<IP>", IPV4_RE),
        ("phone", "<PHONE>", PHONE_RE),
        ("digit_run", "<NUM>", digit_run_re(min_digits)),
    ]


def pii_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_cols: tuple[str, ...] = ("doc_id",),
    min_digits: int = 4,
) -> DataFrame:
    """ids + per-kind match counts (``n_email`` …) + ``redacted`` text.

    Counts are taken on the text as left by the previous detector's
    mask (so an email's digits are never double-counted as a digit
    run); ``n_pii`` is the total across kinds.
    """
    cur = F.col(text_col)
    counts = []
    for kind, mask, pat in pii_patterns(min_digits):
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{kind}")
        )
        cur = F.regexp_replace(cur, pat, mask)
    return df.select(
        *id_cols,
        *counts,
        cur.alias("redacted"),
    ).withColumn(
        "n_pii",
        sum(F.col(f"n_{kind}") for kind, _, _ in pii_patterns(min_digits)).cast(
            "long"
        ),
    )
