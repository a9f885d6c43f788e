"""Stream-stream interval join (Structured Streaming).

The second canonical streaming operator the batch engine can't express
incrementally: joining two UNBOUNDED event streams — here each user's
``view`` events to the ``click`` events that follow within a horizon —
where neither side can be fully buffered. Structured Streaming's
stream-stream inner join (Spark docs, Structured Streaming Programming
Guide §"Stream-stream Joins") makes this viable by requiring
watermarks on BOTH sides plus a time-range join condition, from which
it derives exactly how long each side's rows must be retained in state:
a view can be dropped once the click watermark passes ``view.ts +
horizon``, a click once the view watermark passes ``click.ts``. State
is O(events inside the horizon window), constant in stream length —
the property that makes this run forever against a 10^12-row log.

Inner-join results are emitted as soon as both sides have arrived
(never withheld — only OUTER stream-stream joins wait for the
watermark to declare a row unmatched), so draining any input with
``availableNow`` yields exactly the batch join, PROVIDED no row is
late beyond the watermark delay when the input arrives split across
micro-batches (tests/test_streaming.py pins both the single-batch and
the maxFilesPerTrigger=1 multi-batch drains against the batch twin on
time-ordered files, with ``watermark > horizon``).

All JVM: the join is Spark's symmetric hash join over watermarked
state; no Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from montecarlopagerank_spark.streaming.window_stream import EVENT_SCHEMA


def _sides(events: DataFrame, horizon: str):
    """Rename-disambiguated (views, clicks, join condition) triple shared
    by the batch twin and the stream."""
    v = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("vts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("cts") >= F.col("vts"))
        & (F.col("cts") <= F.expr(f"vts + INTERVAL {horizon}"))
    )
    return v, c, cond


def _project(joined: DataFrame) -> DataFrame:
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        (F.unix_micros("cts") - F.unix_micros("vts")).alias("lag_us"),
    )


def view_click_pairs_batch(
    events: DataFrame, horizon: str = "30 minutes"
) -> DataFrame:
    """Batch twin: every (view, click) pair of the same user with the
    click inside ``[view.ts, view.ts + horizon]`` →
    ``(user_id, view_id, click_id, lag_us)``."""
    v, c, cond = _sides(events, horizon)
    return _project(v.join(c, cond))


def run_join_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain ``input_dir`` (parquet event-log directory, append-only)
    through the watermarked stream-stream interval join and append each
    matched pair to ``output_dir`` exactly once (checkpoint carries the
    join state and file high-water mark; re-running after new files
    land emits only pairs involving the new rows)."""
    src = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        src = src.option("maxFilesPerTrigger", max_files_per_trigger)
    events = src.parquet(input_dir)
    v, c, cond = _sides(events, horizon)
    joined = _project(
        v.withWatermark("vts", watermark).join(
            c.withWatermark("cts", watermark), cond
        )
    )
    (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
