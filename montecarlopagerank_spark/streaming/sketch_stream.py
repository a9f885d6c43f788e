"""Incremental count-min maintenance over a streaming document log.

The batch sketch (pipeline/textstats.py::count_min_sketch) is an
AGGREGATE, and count-min's defining property is cell-wise mergeability
— so its streaming form needs no keyed state kernel at all: each
micro-batch contributes its own (d, w, c) partial sketch, and
``foreachBatch`` folds it into the stored sketch by cell-wise addition
(the same ``groupBy (d, w) sum`` that built it). State size stays
``depth × width`` counters FOREVER, regardless of how many tokens flow
through — the summary a 10^12-token ingest keeps where exact
vocabulary counts cannot sit anywhere.

Exactly-once: the sink follows checkpoint.py's manifest-after-parquet
convention — the merged sketch lands in a per-batch directory, then an
atomically-replaced ``MANIFEST.json`` commits it. The manifest IS the
retry guard: a ``foreachBatch`` retry of a batch_id the manifest
already records is a no-op. (A separate post-manifest marker file
would reopen the door it closes: a crash between manifest write and
marker write leaves the manifest pointing at a sketch that already
contains the batch while the marker is absent, so the retry would
fold the batch in twice. One commit point, checked and advanced
atomically via tmp + ``os.replace``, closes both that double-count
window and torn-manifest reads.)

Parity contract: after draining any prefix of the document log, the
stored sketch equals the batch ``count_min_sketch`` over exactly that
prefix — cell for cell, regardless of how the prefix was split into
micro-batches (addition is associative). Pinned by
tests/test_streaming.py.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.textstats import count_min_sketch

SKETCH_SCHEMA = "d long, w long, c long"


def _committed(out_dir: str) -> dict | None:
    """The manifest's committed {dir, batch_id}, or None before the
    first commit. Written via tmp + os.replace, so never torn."""
    mf = os.path.join(out_dir, "MANIFEST.json")
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        return json.load(f)


def read_sketch(spark: SparkSession, out_dir: str) -> DataFrame:
    """The last committed sketch (empty if none committed yet)."""
    meta = _committed(out_dir)
    if meta is None:
        return spark.createDataFrame([], SKETCH_SCHEMA)
    return spark.read.parquet(os.path.join(out_dir, meta["dir"]))


def run_sketch_stream(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
    schema: str = "doc_id long, text string",
) -> DataFrame:
    """Drain all currently-available files from ``in_dir``
    (``availableNow``), folding each micro-batch's partial sketch into
    the committed one under ``out_dir``; returns the final sketch."""
    os.makedirs(out_dir, exist_ok=True)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        meta = _committed(out_dir)
        if meta is not None and meta["batch_id"] >= batch_id:
            return  # foreachBatch retry of an already-committed batch: no-op
        part = count_min_sketch(
            batch_df, text_col=text_col, depth=depth, width=width
        )
        merged = (
            read_sketch(spark, out_dir)
            .unionByName(part)
            .groupBy("d", "w")
            .agg(F.sum("c").cast("bigint").alias("c"))
        )
        dest = f"sketch_{batch_id}"
        merged.write.mode("overwrite").parquet(os.path.join(out_dir, dest))
        # manifest-after-parquet: the write is invisible until the rename
        # lands, and the rename is the SINGLE commit+retry-guard point
        tmp = os.path.join(out_dir, "MANIFEST.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"dir": dest, "batch_id": batch_id}, f)
        os.replace(tmp, os.path.join(out_dir, "MANIFEST.json"))

    q = (
        spark.readStream.schema(schema)
        .parquet(in_dir)
        .writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return read_sketch(spark, out_dir)
