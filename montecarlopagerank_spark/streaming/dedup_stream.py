"""Ingestion-time exact dedup verdicts (Structured Streaming).

The batch operator (pipeline/dedup.py::dedup_verdicts) labels every
document against the whole corpus — a full re-scan per run. At
ingestion the verdict is *incrementally maintainable*: a new document
is a duplicate iff its exact-dedup key (md5 of normalized text,
computed JVM-side before the shuffle) was seen before, and its keeper
is the first doc that carried the key. Per key the state is two longs
(keeper doc_id + doc_id high-water mark), so state size is
O(#distinct documents) regardless of how many duplicates flow through
— the dedup-on-arrival shape of a training-data ingest pipeline.
Same design as the incremental sessionizer (session_stream.py):
``groupBy(k).applyInPandasWithState``, vectorized pandas inside the
Arrow kernel, never per-row Python outside it.

Parity contract: after draining any prefix of an append-only document
log whose doc_ids are non-decreasing across micro-batches (within a
batch any order — the kernel sorts), the accumulated sink rows equal
batch ``dedup_verdicts`` over that prefix, including duplicate groups
that SPAN micro-batch boundaries (the stored keeper decides). Pinned
by tests/test_streaming.py. Rows at or below the key's doc_id
high-water mark are dropped, making replays idempotent.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StructField,
    StructType,
)

from montecarlopagerank_spark.pipeline.textstats import normalized_text

VERDICT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("keep_id", LongType()),
        StructField("is_dup", BooleanType()),
    ]
)

STATE_SCHEMA = StructType(
    [StructField("keep_id", LongType()), StructField("hwm", LongType())]
)


def _emit_verdicts(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    t = pd.concat(list(pdfs), ignore_index=True).sort_values(
        "doc_id", kind="mergesort"
    )
    if state.exists:
        keep_id, hwm = state.get
        t = t[t["doc_id"] > hwm]
    else:
        keep_id = None
    if len(t) == 0:
        return
    ids = t["doc_id"].to_numpy(dtype=np.int64)
    if keep_id is None:
        keep_id = int(ids[0])
    yield pd.DataFrame(
        {
            "doc_id": ids,
            "keep_id": np.int64(keep_id),
            "is_dup": ids != keep_id,
        }
    )
    state.update((keep_id, int(ids[-1])))


def stream_dedup_verdicts(docs: DataFrame) -> DataFrame:
    """Streaming documents(doc_id, text, ...) → streaming
    ``(doc_id, keep_id, is_dup)`` rows, append mode — the incremental
    twin of batch ``dedup_verdicts`` (keeper = min doc_id per exact
    key, which equals first-seen under the append-only contract)."""
    keyed = docs.select(
        "doc_id",
        F.md5(normalized_text(F.col("text")).cast("binary")).alias("k"),
    )
    return keyed.groupBy("k").applyInPandasWithState(
        _emit_verdicts,
        outputStructType=VERDICT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
) -> Any:
    """File-source → file-sink ingestion dedup: every new parquet file
    landing in ``input_dir`` (documents schema) appends its docs'
    verdicts to ``output_dir``. ``availableNow`` drains the backlog and
    stops; rerunning with the same ``checkpoint_dir`` processes only
    new files (exactly-once per input file)."""
    src = spark.readStream.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).parquet(input_dir)
    q = (
        stream_dedup_verdicts(src)
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
