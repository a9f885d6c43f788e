"""Incremental gap-sessionization (Structured Streaming).

The batch operator (pipeline/temporal.py::sessionize) assigns 1-based
per-user session ids with one window pass — a full re-scan per run. On
an append-only event log the assignment is *incrementally maintainable*:
a new event's session id depends only on the user's last seen (ts,
session_id), so per user the state is two scalars and each micro-batch
emits the session ids of exactly its new events. Same design as the
incremental edge builder (edge_stream.py): ``groupBy(user_id).
applyInPandasWithState``, state O(#users), all column math vectorized
numpy/pandas inside the Arrow kernel.

Parity contract: after draining any prefix of the log, the accumulated
sink rows equal batch ``sessionize`` run over that prefix — including
sessions that SPAN a micro-batch boundary (the stored last_us decides
whether the first new event continues or opens a session). Pinned by
tests/test_streaming.py with a split chosen to hit both cases.

Ordering contract: per user, events arrive in non-decreasing (us,
event_id) order ACROSS micro-batches (append-only log); within a batch
any order is fine — the kernel sorts. Rows at or below the user's
(us, event_id) high-water mark are dropped, making replays idempotent.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("us", LongType()),
        StructField("session_id", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_session", LongType()),
    ]
)


def _make_kernel(gap_us: int):
    def _emit_sessions(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        t = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["us", "event_id"], kind="mergesort"
        )
        if state.exists:
            last_us, last_eid, last_sess = state.get
            keep = (t["us"] > last_us) | (
                (t["us"] == last_us) & (t["event_id"] > last_eid)
            )
            t = t[keep]
        else:
            last_us, last_sess = None, 0
        if len(t) == 0:
            return
        us = t["us"].to_numpy(dtype=np.int64)
        prev = np.empty(len(us), dtype=np.int64)
        prev[1:] = us[:-1]
        # first new event: gap vs the stored high-water (or always-new
        # when this user has no state yet — same as lag NULL in batch)
        prev[0] = last_us if last_us is not None else np.iinfo(np.int64).min // 2
        sess = last_sess + np.cumsum((us - prev) > gap_us)
        yield pd.DataFrame(
            {
                "user_id": np.int64(user_id),
                "event_id": t["event_id"].to_numpy(dtype=np.int64),
                "us": us,
                "session_id": sess.astype(np.int64),
            }
        )
        state.update((int(us[-1]), int(t["event_id"].iloc[-1]), int(sess[-1])))

    return _emit_sessions


def stream_sessionize(
    events: DataFrame, gap_us: int = 1_800_000_000
) -> DataFrame:
    """Streaming events(user_id, event_id, ts, ...) → streaming
    ``(user_id, event_id, us, session_id)`` rows, append mode — the
    incremental twin of batch ``sessionize`` (ids 1-based per user in
    (us, event_id) order, new session when the gap exceeds ``gap_us``)."""
    t = events.select(
        "user_id", "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us")
    )
    return t.groupBy("user_id").applyInPandasWithState(
        _make_kernel(gap_us),
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_session_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_us: int = 1_800_000_000,
    await_termination: bool = True,
) -> Any:
    """File-source → file-sink incremental sessionization: every new
    parquet file landing in ``input_dir`` (events schema) appends its
    events' session assignments to ``output_dir``. ``availableNow``
    drains the backlog and stops; rerunning with the same
    ``checkpoint_dir`` processes only new files (exactly-once per input
    file) — the nightly-top-up shape, like run_edge_stream."""
    src = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ).parquet(input_dir)
    q = (
        stream_sessionize(src, gap_us=gap_us)
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
