"""Source/sink tests: reference text-format compatibility, datagen
determinism, events->transcripts view."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from montecarlopagerank_spark.datagen import transcripts_df
from montecarlopagerank_spark.sources.adjacency_text import (
    edges_from_adjacency,
    read_adjacency_text,
    write_adjacency_text,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def test_adjacency_text_roundtrip(spark, tmp_path):
    adj_in = spark.createDataFrame(
        [(0, [2, 1]), (1, [0]), (2, [])],
        "src long, neighbours array<long>",
    )
    path = str(tmp_path / "adj")
    write_adjacency_text(adj_in, path)
    back = {r["src"]: r["neighbours"] for r in
            read_adjacency_text(spark, path).collect()}
    # neighbours sorted by the writer; dangling row survives as empty list
    assert back == {0: [1, 2], 1: [0], 2: []}


def test_adjacency_parse_no_self_loop_bug(spark, tmp_path):
    """The reference's parser keeps the node's own id as a neighbour
    (MonteCarloPageRank.scala:37, SURVEY.md §2.6 bug 1); ours must not."""
    p = tmp_path / "g.txt"
    p.write_text("7\t8\t9\n8\n9 7\n")
    adj = {r["src"]: r["neighbours"] for r in
           read_adjacency_text(spark, str(p)).collect()}
    assert adj == {7: [8, 9], 8: [], 9: [7]}
    edges = {(r["src"], r["dst"]) for r in
             edges_from_adjacency(read_adjacency_text(spark, str(p))).collect()}
    assert edges == {(7, 8), (7, 9), (9, 7)}


def test_datagen_deterministic_and_shaped(spark):
    a = transcripts_df(spark, n_convs=25, seed=42, parallelism=3)
    b = transcripts_df(spark, n_convs=25, seed=42, parallelism=9)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # parallelism-invariant generation
    assert a.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>"
    )
    # (conv_id, turn_idx) unique; turn_idx 0-based contiguous
    dup = a.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dup == 0
    mx = a.groupBy("conv_id").agg(
        F.max("turn_idx").alias("mx"), F.count("*").alias("n")).collect()
    assert all(r["mx"] == r["n"] - 1 for r in mx)


def test_transcripts_from_events(spark):
    from montecarlopagerank_spark.sources.transcripts import (
        transcripts_from_events,
    )

    ts = transcripts_from_events(spark, SF_DIR)
    assert ts.columns == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert ts.count() > 0
    dup = ts.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dup == 0


def test_transcripts_jsonl_roundtrip_lossless(spark, tmp_path):
    """JSONL sink → source must be lossless: byte-identical text,
    microsecond-exact timestamps (both TIMESTAMP_NTZ semantics), nulls
    in sparse columns preserved."""
    from montecarlopagerank_spark.sources.transcripts import (
        read_transcripts_jsonl,
        write_transcripts_jsonl,
    )

    ts = transcripts_df(spark, n_convs=30, seed=11)
    p = str(tmp_path / "jsonl")
    write_transcripts_jsonl(ts, p)
    back = read_transcripts_jsonl(spark, p)
    a = sorted(map(tuple, ts.select(*back.columns).collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_transcripts_orc_roundtrip_lossless(spark, tmp_path):
    from montecarlopagerank_spark.sources.transcripts import (
        read_transcripts_orc,
        write_transcripts_orc,
    )

    ts = transcripts_df(spark, n_convs=30, seed=12)
    p = str(tmp_path / "orc")
    write_transcripts_orc(ts, p)
    back = read_transcripts_orc(spark, p)
    a = sorted(map(tuple, ts.select(*back.columns).collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
