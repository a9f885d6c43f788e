"""Watermarked tumbling-window aggregation (Structured Streaming).

The canonical streaming-analytics operator the batch engine can't
express: event-time windowed counts over an append-only event log with
LATE data, where a window's result must be emitted exactly once — after
the watermark says no more late rows can join it — and never revised.
This is the Structured Streaming "append mode + watermark" contract
(Spark docs, Structured Streaming Programming Guide §"Window Operations
on Event Time"): state holds only open windows, closed windows are
evicted to the sink, so state is O(open windows × group keys) no matter
how long the stream runs — the property that makes this viable against
a 10^12-row log.

Everything is built-in JVM windowing (``F.window`` + hash aggregate
with partial aggregation per micro-batch); no Python in the path at
all — unlike the stateful-kernel streams (edge/session/dedup), this
operator needs nothing ``applyInPandasWithState``-shaped because
Spark's own windowed state store IS the right primitive.

Parity contract (tests/test_streaming.py): after draining any prefix of
the log, the accumulated sink rows equal the batch group-by restricted
to windows whose end <= the stream's event-time high-water minus the
watermark delay — i.e. exactly the closed windows — and a later run
that advances the watermark emits exactly the windows the earlier run
withheld, unchanged. Late rows inside the allowed lateness are counted;
the test injects one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def windowed_counts_batch(
    events: DataFrame, window: str = "1 hour"
) -> DataFrame:
    """Batch twin of the streaming aggregation — identical plan minus
    the watermark: ``(window_start_us:long, event_type, n_events:long,
    sum_value_r6)`` per tumbling event-time window. The window start is
    emitted as epoch MICROSECONDS (long) so the driver's hash compare
    never depends on session-timezone rendering of timestamps."""
    return (
        events.groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value_r6"),
        )
        .select(
            (F.unix_timestamp(F.col("window.start")) * F.lit(1000000))
            .cast("long")
            .alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value_r6",
        )
    )


def run_window_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    slide: str | None = None,
) -> None:
    """Drain ``input_dir`` (parquet event-log directory, append-only)
    with ``availableNow`` and append each CLOSED window's aggregate to
    ``output_dir``. Append output mode + watermark = a window row is
    written exactly once, after event time has moved ``watermark`` past
    its end; re-running after new files land emits only newly-closed
    windows (checkpoint carries the open-window state and the file
    high-water mark)."""
    src = spark.readStream.schema(EVENT_SCHEMA).parquet(input_dir)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    agg = (
        src.withWatermark("ts", watermark)
        .groupBy(win, "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value_r6"),
        )
        .select(
            (F.unix_timestamp(F.col("window.start")) * F.lit(1000000))
            .cast("long")
            .alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value_r6",
        )
    )
    (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def sliding_counts_batch(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Batch twin of the SLIDING-window aggregation (``F.window`` with a
    slide < size assigns each event to size/slide overlapping windows —
    Spark materializes the assignment as an internal explode, still
    whole-stage codegen). Output shape matches windowed_counts_batch."""
    return (
        events.groupBy(F.window("ts", window, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value_r6"),
        )
        .select(
            (F.unix_timestamp(F.col("window.start")) * F.lit(1000000))
            .cast("long")
            .alias("window_start_us"),
            "event_type",
            "n_events",
            "sum_value_r6",
        )
    )
