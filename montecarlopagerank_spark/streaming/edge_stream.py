"""Incremental transcript→edge builder (Structured Streaming).

The batch builder (operators/edges.py) derives turn_chain / role_role /
turn_tool edges with a per-conversation lag window — a full re-scan per
run. At 10^12-turn scale the transcripts table is an append-only log, so
the edges should be *maintained incrementally*: each micro-batch emits
exactly the new edges its new turns induce, including the chain edge that
SPANS a batch boundary (last turn of the previous batch → first turn of
the new one). That cross-batch edge is what makes this a genuinely
stateful operator: per conv_id we keep (last_turn_idx, last_role) in the
state store and join it to the head of each new micro-batch group.

Implementation: ``groupBy(conv_id).applyInPandasWithState`` — the state
is two scalars per conversation (O(#convs), compact), each micro-batch
group is sorted by turn_idx inside the Arrow-batched pandas kernel
(vectorized shift(), never per-row Python), and the emitted rows are
EXACTLY the batch builder's ``_typed_edges`` schema, so the accumulated
sink table equals the batch output on the same transcripts — pinned by
tests/test_streaming.py, including a two-batch split that only passes if
state carries across micro-batches.

Ordering contract: per conversation, turns arrive in non-decreasing
turn_idx order ACROSS micro-batches (an append-only log has this
property; within a batch any order is fine — we sort). Rows at or below
the conversation's high-water mark (late duplicates / replays) are
dropped, which makes re-delivery idempotent at the edge level.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

EDGE_SCHEMA = StructType(
    [
        StructField("src_kind", StringType()),
        StructField("src_key", StringType()),
        StructField("dst_kind", StringType()),
        StructField("dst_key", StringType()),
        StructField("kind", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_turn_idx", LongType()),
        StructField("last_role", StringType()),
    ]
)


def _emit_edges(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-conversation kernel: chain new turns onto the stored high-water
    turn, emit the induced edges, advance the state. All column math is
    vectorized pandas (shift/concat); no per-row Python."""
    conv_id = key[0]
    t = pd.concat(list(pdfs), ignore_index=True)
    t = t.sort_values("turn_idx", kind="mergesort")
    if state.exists:
        last_idx, last_role = state.get
    else:
        last_idx, last_role = None, None
    if last_idx is not None:
        t = t[t["turn_idx"] > last_idx]
    if len(t) == 0:
        return
    idx = t["turn_idx"].astype("int64")
    role = t["role"].astype("string")
    tool = t["tool"]
    turn_key = conv_id + "#" + idx.astype(str)
    prev_idx = idx.shift(1)
    prev_role = role.shift(1)
    prev_key = turn_key.shift(1)
    if last_idx is not None:  # stitch onto the previous batch's tail
        prev_idx.iloc[0] = last_idx
        prev_role.iloc[0] = last_role
        prev_key.iloc[0] = f"{conv_id}#{last_idx}"
    has_prev = prev_idx.notna()

    chain = pd.DataFrame(
        {
            "src_kind": "turn",
            "src_key": prev_key[has_prev],
            "dst_kind": "turn",
            "dst_key": turn_key[has_prev],
            "kind": "turn_chain",
        }
    )
    # exact batch mirror: lag(role) IS NOT NULL is the only filter
    # (operators/edges.py role_role branch)
    rr_mask = prev_role.notna()
    role_role = pd.DataFrame(
        {
            "src_kind": "role",
            "src_key": prev_role[rr_mask],
            "dst_kind": "role",
            "dst_key": role[rr_mask],
            "kind": "role_role",
        }
    )
    tt_mask = tool.notna()
    turn_tool = pd.DataFrame(
        {
            "src_kind": "turn",
            "src_key": turn_key[tt_mask],
            "dst_kind": "tool",
            "dst_key": tool[tt_mask],
            "kind": "turn_tool",
        }
    )
    state.update((int(idx.iloc[-1]), None if role.iloc[-1] is pd.NA else str(role.iloc[-1])))
    out = pd.concat([chain, role_role, turn_tool], ignore_index=True)
    if len(out):
        yield out.astype("string")


def stream_typed_edges(transcripts: DataFrame) -> DataFrame:
    """Streaming transcripts(conv_id, turn_idx, role, tool, ...) →
    streaming typed edges (src_kind, src_key, dst_kind, dst_key, kind),
    append mode. The skinny projection keeps ``text`` out of the state
    operator entirely (same text-never-enters-graph-build guarantee as
    the batch builder)."""
    t = transcripts.select("conv_id", "turn_idx", "role", "tool")
    return t.groupBy("conv_id").applyInPandasWithState(
        _emit_edges,
        outputStructType=EDGE_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_edge_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
) -> Any:
    """File-source → file-sink incremental edge maintenance: every new
    parquet file landing in ``input_dir`` (transcript schema) appends its
    induced edges to ``output_dir``. ``availableNow`` drains the backlog
    and stops — rerunning with the same ``checkpoint_dir`` processes only
    files that arrived since the last run (exactly-once per input file),
    which is the 10^12-turn "nightly top-up" shape."""
    src = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp"
        )
        .parquet(input_dir)
    )
    q = (
        stream_typed_edges(src)
        .writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q
