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


# --------------------------------------------------- streaming sessionize


def _events_fixture(spark):
    """Deterministic events with multi-session users: user u's event k is
    at t0 + k*5min, except every 4th event jumps 2h (gap > 30min opens a
    session)."""
    rows = []
    base = 1_700_000_000_000_000  # µs
    eid = 0
    for u in range(6):
        t = base + u * 1_000_000
        for k in range(12):
            t += 7_200_000_000 if (k % 4 == 0 and k > 0) else 300_000_000
            rows.append((eid, t, u))
            eid += 1
    return spark.createDataFrame(
        [(e, __import__("datetime").datetime.utcfromtimestamp(t / 1e6), u)
         for e, t, u in rows],
        "event_id long, ts timestamp, user_id long",
    ).withColumn("event_type", F.lit("x")).withColumn(
        "value", F.lit(0.0)
    ).withColumn("props", F.lit(""))


def _session_assignments(df):
    return sorted(
        (r["user_id"], r["event_id"], r["session_id"]) for r in df.collect()
    )


def test_session_stream_equals_batch(spark, tmp_path):
    from montecarlopagerank_spark.pipeline.temporal import sessionize
    from montecarlopagerank_spark.streaming.session_stream import (
        run_session_stream,
    )

    ev = _events_fixture(spark).persist()
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    ev.write.parquet(inp)
    run_session_stream(spark, inp, out, ck)
    got = spark.read.parquet(out)
    want = sessionize(ev).select("user_id", "event_id", "session_id")
    assert _session_assignments(got) == _session_assignments(want)
    # the fixture really has multiple sessions per user
    assert want.groupBy("user_id").agg(
        F.max("session_id").alias("m")
    ).agg(F.min("m")).collect()[0][0] == 3


def test_session_stream_state_across_batches(spark, tmp_path):
    """Split users' streams mid-session AND at a session boundary: ids
    only line up with batch if (last_us, last_session) carries over."""
    from montecarlopagerank_spark.pipeline.temporal import sessionize
    from montecarlopagerank_spark.streaming.session_stream import (
        run_session_stream,
    )

    ev = _events_fixture(spark).persist()
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    os.makedirs(inp, exist_ok=True)
    # k=6 splits inside session 2 (events 4..7); k=8 would split at the
    # boundary — cover both by splitting per-user at different points
    first = ev.filter((F.col("event_id") % 12) < (4 + (F.col("user_id") % 2) * 4))
    second = ev.join(first.select("event_id"), "event_id", "left_anti")
    first.write.mode("append").parquet(inp)
    run_session_stream(spark, inp, out, ck)
    second.write.mode("append").parquet(inp)
    run_session_stream(spark, inp, out, ck)
    got = spark.read.parquet(out)
    want = sessionize(ev).select("user_id", "event_id", "session_id")
    assert _session_assignments(got) == _session_assignments(want)
    # replays are dropped: draining the same input again adds nothing
    run_session_stream(spark, inp, out, ck)
    assert spark.read.parquet(out).count() == ev.count()


def _docs_fixture(spark):
    """20 docs, several exact-dup groups (after normalization), some
    spanning the batch split used below."""
    rows = []
    texts = [
        "Alpha  beta gamma",  # norm-dup group A: 0, 7, 15
        "unique one",
        "Delta epsilon",      # group B: 2, 11
        "unique two",
        "alpha beta GAMMA ",  # group A
        "unique three",
    ]
    for i in range(20):
        if i in (7, 15):
            t = texts[0]
        elif i == 11:
            t = texts[2]
        elif i == 4:
            t = texts[4]
        else:
            t = texts[i % 6] if i < 6 else f"filler text {i}"
        rows.append((i, t))
    return spark.createDataFrame(rows, "doc_id long, text string").select(
        "doc_id", "text", F.lit("en").alias("lang"),
        F.lit("s").alias("source"), F.length("text").alias("n_chars"),
    )


def _verdicts(df):
    return sorted(
        (r["doc_id"], r["keep_id"], r["is_dup"]) for r in df.collect()
    )


def test_dedup_stream_equals_batch(spark, tmp_path):
    from montecarlopagerank_spark.pipeline.dedup import dedup_verdicts
    from montecarlopagerank_spark.streaming.dedup_stream import (
        run_dedup_stream,
    )

    docs = _docs_fixture(spark).persist()
    inp, out, ck = (str(tmp_path / d) for d in ("din", "dout", "dck"))
    docs.write.parquet(inp)
    run_dedup_stream(spark, inp, out, ck)
    got = spark.read.parquet(out)
    want = dedup_verdicts(docs)
    assert _verdicts(got) == _verdicts(want)
    # the fixture really contains cross-doc duplicates
    assert want.filter("is_dup").count() >= 3


def test_dedup_stream_state_across_batches(spark, tmp_path):
    """Duplicate groups span the split: verdicts only line up with
    batch if the keeper carries over in state."""
    from montecarlopagerank_spark.pipeline.dedup import dedup_verdicts
    from montecarlopagerank_spark.streaming.dedup_stream import (
        run_dedup_stream,
    )

    docs = _docs_fixture(spark).persist()
    inp, out, ck = (str(tmp_path / d) for d in ("din", "dout", "dck"))
    os.makedirs(inp, exist_ok=True)
    first = docs.filter("doc_id < 6")   # keepers of groups A and B
    second = docs.filter("doc_id >= 6")  # their later duplicates
    first.write.mode("append").parquet(inp)
    run_dedup_stream(spark, inp, out, ck)
    second.write.mode("append").parquet(inp)
    run_dedup_stream(spark, inp, out, ck)
    got = spark.read.parquet(out)
    want = dedup_verdicts(docs)
    assert _verdicts(got) == _verdicts(want)
    # cross-batch duplicate: doc 7 deduped against batch-1 keeper 0
    m = {r["doc_id"]: (r["keep_id"], r["is_dup"]) for r in got.collect()}
    assert m[7] == (0, True) and m[15] == (0, True) and m[11] == (2, True)
    # replays are dropped: draining the same input again adds nothing
    run_dedup_stream(spark, inp, out, ck)
    assert spark.read.parquet(out).count() == docs.count()
