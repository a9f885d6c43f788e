"""Transcripts source: the engine's primary input table.

Authoritative shape (BASELINE.json input_hint):
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp`` stored as an Iceberg-layout table. In this sandbox the
Iceberg catalog jars are absent, so the reader accepts either an Iceberg
table name (``catalog.db.table``) when the catalog is configured, or a
parquet directory laid out the same way (partitioned by ``conv_bucket``).

``transcripts_from_events`` derives a transcript-shaped view from the
driver's ``events`` table (FIXTURES.md F5) so the DuckDB-oracle contract
can run on driver data: conv_id := user_id, turn_idx := row_number over
(ts, event_id), role := event_type, text := props, tool := event_type
bucketed. Fully SQL-expressible → oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_CONV_BUCKETS = 64  # Iceberg-style bucket(conv_id) partition layout


def read_transcripts(spark: SparkSession, path_or_table: str) -> DataFrame:
    """Read the transcripts table (Iceberg table name or parquet dir)."""
    if "/" not in path_or_table:
        # Iceberg/catalog table name. Requires iceberg-spark-runtime on the
        # classpath; in this sandbox only the parquet layout is exercised.
        return spark.read.table(path_or_table)
    df = spark.read.parquet(path_or_table)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return df.select(*cols)


def write_transcripts(df: DataFrame, path: str, buckets: int = N_CONV_BUCKETS) -> None:
    """Write transcripts in the Iceberg-shaped layout: hash-bucketed by
    conv_id so all turns of a conversation land in one partition directory —
    the same property Iceberg's bucket(conv_id) transform gives, which makes
    the per-conversation window in the edge builder an intra-partition sort
    at read time."""
    (
        df.withColumn("conv_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(buckets)))
        .repartition(buckets, "conv_bucket")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .partitionBy("conv_bucket")
        .parquet(path)
    )


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic transcript-shaped view over the driver's events table.

    conv_id := 'u' || user_id; turn_idx := row_number() over
    (partition by user_id order by ts, event_id) - 1; role := event_type;
    text := props; tool := event_type for every 3rd event else null.
    Mirrors FIXTURES.md F5; the matching ANSI SQL lives in
    __spark_entry__.oracle_sql().
    """
    return transcripts_of_events(spark.read.parquet(f"{sf_dir}/events.parquet"))


def transcripts_of_events(ev: DataFrame) -> DataFrame:
    """The same transcript view over an events DataFrame already in hand
    (any prefix/filter of the log — the incremental-delta consumers)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_id") % 3 == 0, F.col("event_type")).alias("tool"),
        F.col("ts"),
    )


# ts is TIMESTAMP_NTZ: the canonical parquet layout stores naive event
# time (no zone), and the JSONL interchange keeps that exact semantic
TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp_ntz"
)

# ISO-8601 with microseconds — JSON lines keep full timestamp fidelity.
# Spark routes TIMESTAMP (LTZ) columns through timestampFormat and
# TIMESTAMP_NTZ columns through timestampNTZFormat — set BOTH, or an NTZ
# input (parquet timestamps are commonly NTZ) silently falls back to the
# millisecond default and the roundtrip loses microseconds.
_JSON_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_JSON_TS_NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def write_transcripts_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines sink (the interchange format transcripts usually arrive
    in). Timestamps serialize ISO-8601 with microseconds so a roundtrip
    is lossless; everything else is plain JSON scalars."""
    (
        # normalize to NTZ on write (inputs arrive as either LTZ or NTZ;
        # the interchange format carries ONE semantic — naive event time)
        df.select(
            "conv_id", "turn_idx", "role", "text", "tool",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
        )
        .write.mode("overwrite")
        .option("timestampFormat", _JSON_TS_FMT)
        .option("timestampNTZFormat", _JSON_TS_NTZ_FMT)
        .json(path)
    )


def read_transcripts_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines source with the authoritative schema enforced (never
    inferred — schema inference costs an extra full pass at 100 TB and
    can mistype sparse columns like ``tool``)."""
    return (
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("timestampFormat", _JSON_TS_FMT)
        .option("timestampNTZFormat", _JSON_TS_NTZ_FMT)
        .json(path)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )


def write_transcripts_orc(df: DataFrame, path: str) -> None:
    """ORC sink (the other columnar warehouse format Spark ships
    natively); same bucket layout rationale as the parquet writer."""
    df.select("conv_id", "turn_idx", "role", "text", "tool", "ts").write.mode(
        "overwrite"
    ).orc(path)


def read_transcripts_orc(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.orc(path)
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
