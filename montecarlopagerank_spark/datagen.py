"""Deterministic synthetic transcripts table (FIXTURES.md F1).

Input shape is the authoritative one from BASELINE.json input_hint:
``conv_id:string, turn_idx:int, role:string, text:string, tool:string,
ts:timestamp``. Generation is seeded and *block-deterministic*: each
conversation's rows are produced by an RNG seeded only by
``(seed, conv_serial)``, so output is byte-identical at any parallelism
and any scale — the distributed generator shards conversations over
``spark.range`` and each task generates its conv ids independently.

Skew is built in on purpose (north_star requirement): conversation
lengths are power-law-ish (many 2-4 turn convs, a few 100+ turn convs)
and tools are Zipf-distributed with a couple of mega-hub tools so the
derived graph has hub vertices.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(
    ["bash", "search", "read_file", "write_file", "browser", "sql", "calc", "plot"]
)
# Zipf-ish tool popularity (hub tools "bash"/"search" dominate → graph skew)
_TOOL_P = np.array([0.42, 0.25, 0.12, 0.08, 0.05, 0.04, 0.02, 0.02])

# text fragments incl. byte-identity edge cases: empty, multibyte UTF-8
# (emoji, CJK), embedded newline/tab, NUL-adjacent controls.
_FRAGMENTS = [
    "",
    "ok",
    "please run the tests",
    "let me check that file\nline two\tand a tab",
    "结果看起来不错 🎉 done",
    "héllo wörld — em-dash …",
    '{"json": true, "n": 3}',
    "x" * 257,
    "多行\n文本\n🧪",
    "trailing space ",
]


def _conv_rows(seed: int, conv_serial: int, epoch_s: int = 1700000000) -> pd.DataFrame:
    """All rows of one conversation. Deterministic in (seed, conv_serial)."""
    rng = np.random.default_rng(np.random.SeedSequence([seed, conv_serial]))
    # power-law-ish length: 2-4 typical, rare 100+ (pareto tail)
    length = int(2 + min(rng.pareto(1.1) * 3.0, 400))
    idx = np.arange(length, dtype=np.int32)
    # roles: alternate user/assistant, ~8% replaced by system/tool
    roles = np.where(idx % 2 == 0, "user", "assistant").astype(object)
    special = rng.random(length) < 0.08
    roles[special] = rng.choice(np.array(["system", "tool"]), size=int(special.sum()))
    # ~20% of turns carry a Zipf-ish tool
    has_tool = rng.random(length) < 0.20
    tools = np.full(length, None, dtype=object)
    tools[has_tool] = rng.choice(TOOLS, size=int(has_tool.sum()), p=_TOOL_P)
    frag = rng.integers(0, len(_FRAGMENTS), size=length)
    texts = np.array(
        [f"{_FRAGMENTS[f]}" if i % 7 else f"[{conv_serial}:{i}] {_FRAGMENTS[f]}"
         for i, f in zip(idx, frag)],
        dtype=object,
    )
    # one rare 10KB+ turn per ~50 convs
    if conv_serial % 50 == 7 and length > 1:
        texts[1] = ("big📦" * 2500) + "\n\tend"
    gaps = rng.integers(1, 120, size=length).cumsum()
    ts = pd.to_datetime(epoch_s + conv_serial * 3600 + gaps, unit="s")
    return pd.DataFrame(
        {
            "conv_id": f"conv-{conv_serial:08d}",
            "turn_idx": idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def generate_transcripts_pdf(n_convs: int = 200, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation (tiny fixtures / unit tests)."""
    return pd.concat(
        [_conv_rows(seed, c) for c in range(n_convs)], ignore_index=True
    )


TRANSCRIPTS_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def transcripts_df(
    spark: SparkSession, n_convs: int = 200, seed: int = 42, parallelism: int | None = None
) -> DataFrame:
    """Distributed deterministic generator: shards conversations over
    ``spark.range`` and generates each shard independently — scales to any
    n_convs without a driver bottleneck, output invariant to parallelism."""
    parts = parallelism or max(1, min(n_convs, 64))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for conv_serial in pdf["id"].tolist():
                yield _conv_rows(seed, int(conv_serial))

    return (
        spark.range(0, n_convs, 1, parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )
