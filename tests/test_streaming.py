"""Incremental edge maintenance (Structured Streaming) — exact parity
with the batch builder, including state carry across micro-batches."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from montecarlopagerank_spark.datagen import transcripts_df
from montecarlopagerank_spark.operators.edges import _typed_edges
from montecarlopagerank_spark.streaming.edge_stream import run_edge_stream

EDGE_COLS = ["src_kind", "src_key", "dst_kind", "dst_key", "kind"]


def edge_multiset(df):
    return sorted(
        tuple(r[c] for c in EDGE_COLS + ["n"])
        for r in df.groupBy(*EDGE_COLS).agg(F.count("*").alias("n")).collect()
    )


@pytest.fixture()
def transcripts(spark):
    return transcripts_df(spark, n_convs=40, seed=7).persist()


def test_stream_equals_batch_single_batch(spark, tmp_path, transcripts):
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    transcripts.write.parquet(inp)
    run_edge_stream(spark, inp, out, ck)
    got = spark.read.parquet(out)
    want = _typed_edges(transcripts)
    assert edge_multiset(got) == edge_multiset(want)


def test_stream_state_carries_across_batches(spark, tmp_path, transcripts):
    """Split every conversation at turn_idx K: the chain edge K-1 → K only
    exists in the streamed output if per-conv state survives between the
    two availableNow runs."""
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    k = 3
    first = transcripts.filter(F.col("turn_idx") < k)
    second = transcripts.filter(F.col("turn_idx") >= k)
    os.makedirs(inp, exist_ok=True)
    first.write.mode("append").parquet(inp)
    run_edge_stream(spark, inp, out, ck)
    n_first = spark.read.parquet(out).count()
    second.write.mode("append").parquet(inp)
    run_edge_stream(spark, inp, out, ck)

    got = spark.read.parquet(out)
    want = _typed_edges(transcripts)
    assert edge_multiset(got) == edge_multiset(want)
    # the boundary edges were genuinely produced by the second run
    assert got.count() > n_first
    boundary = got.filter(
        (F.col("kind") == "turn_chain")
        & F.col("src_key").endswith(f"#{k - 1}")
        & F.col("dst_key").endswith(f"#{k}")
    )
    assert boundary.count() > 0


def test_stream_drops_replayed_rows(spark, tmp_path, transcripts):
    """Re-delivering already-processed turns must not duplicate edges
    (high-water-mark drop → idempotent at the edge level)."""
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(inp, exist_ok=True)
    transcripts.write.mode("append").parquet(inp)
    run_edge_stream(spark, inp, out, ck)
    transcripts.filter(F.col("turn_idx") < 2).write.mode("append").parquet(inp)
    run_edge_stream(spark, inp, out, ck)
    got = spark.read.parquet(out)
    want = _typed_edges(transcripts)
    assert edge_multiset(got) == edge_multiset(want)
