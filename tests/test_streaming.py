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


def _win_rows(df):
    return sorted(
        (r["window_start_us"], r["event_type"], r["n_events"],
         r["sum_value_r6"])
        for r in df.collect()
    )


def _base_us(spark):
    """Epoch microseconds of the fixture origin (2024-03-01 00:00) under
    the SESSION timezone — the same instant the streamed timestamps
    carry, so window-epoch assertions are tz-proof."""
    import datetime as dt

    df = spark.createDataFrame([(dt.datetime(2024, 3, 1),)], "t timestamp")
    return df.select(
        (F.unix_timestamp("t") * 1_000_000).cast("long")
    ).collect()[0][0]


def _mk_events(spark, rows):
    """rows: (event_id, minutes_from_fixture_origin, event_type, value)."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    data = [
        (eid, base + dt.timedelta(minutes=m), eid % 7, et, v, "")
        for eid, m, et, v in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_window_stream_emits_closed_windows_only(spark, tmp_path):
    """availableNow drain of chunk 1 (event time reaching 05:30, 2h
    watermark -> high-water 03:30) must emit EXACTLY the windows ending
    <= 03:30 — the batch twin restricted to closed windows — and
    withhold the open tail."""
    from montecarlopagerank_spark.streaming.window_stream import (
        run_window_stream,
        windowed_counts_batch,
    )

    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    chunk1 = _mk_events(
        spark,
        [
            (0, 10, "view", 1.5), (1, 20, "click", 2.0),
            (2, 70, "view", 3.25), (3, 150, "view", 1.0),
            (4, 155, "click", 4.0), (5, 200, "view", 2.5),
            (6, 330, "view", 0.5),  # 05:30 -> watermark 03:30
        ],
    ).persist()
    import os

    os.makedirs(inp, exist_ok=True)
    chunk1.write.mode("append").parquet(inp)
    run_window_stream(spark, inp, out, ck)
    got1 = spark.read.parquet(out)
    wm1_us = _base_us(spark) + (3 * 3600 + 1800) * 1_000_000
    want1 = windowed_counts_batch(chunk1).filter(
        # window END <= watermark high-water
        F.col("window_start_us") + 3600 * 1_000_000 <= F.lit(wm1_us)
    )
    assert _win_rows(got1) == _win_rows(want1)
    assert got1.count() == 5  # hour 0: view+click, hour 1: view, hour 2: both


def test_window_stream_counts_late_rows_and_never_revises(spark, tmp_path):
    """Run 2 appends a LATE row (03:45 < run-1 max event time, but above
    the checkpointed 03:30 watermark) plus fresh rows advancing the
    watermark to 07:40: the late row must be COUNTED in its 03:00 window
    (emitted this run), run-1's rows must be byte-identical in the sink,
    and the union must equal the batch twin over everything, restricted
    to windows ending <= 07:40."""
    from montecarlopagerank_spark.streaming.window_stream import (
        run_window_stream,
        windowed_counts_batch,
    )

    import os

    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    chunk1 = _mk_events(
        spark,
        [
            (0, 10, "view", 1.5), (1, 70, "click", 2.0),
            (2, 200, "view", 2.5), (3, 330, "view", 0.5),  # wm -> 03:30
        ],
    ).persist()
    os.makedirs(inp, exist_ok=True)
    chunk1.write.mode("append").parquet(inp)
    run_window_stream(spark, inp, out, ck)
    got1 = _win_rows(spark.read.parquet(out))

    chunk2 = _mk_events(
        spark,
        [
            (10, 225, "view", 9.0),   # LATE: 03:45, window [03:00, 04:00)
            (11, 580, "click", 1.0),  # 09:40 -> watermark 07:40
        ],
    ).persist()
    chunk2.write.mode("append").parquet(inp)
    run_window_stream(spark, inp, out, ck)
    got2 = spark.read.parquet(out)

    wm2_us = _base_us(spark) + (7 * 3600 + 40 * 60) * 1_000_000
    want2 = windowed_counts_batch(chunk1.unionByName(chunk2)).filter(
        F.col("window_start_us") + 3600 * 1_000_000 <= F.lit(wm2_us)
    )
    assert _win_rows(got2) == _win_rows(want2)
    # run 1's emissions are still there, unrevised
    assert set(got1) <= set(_win_rows(got2))
    # the late row really landed in the 03:00 window
    h3_us = _base_us(spark) + 3 * 3600 * 1_000_000
    late = [r for r in _win_rows(got2) if r[0] == h3_us and r[1] == "view"]
    assert late == [(h3_us, "view", 2, 11.5)]


# ---------------------------------------------------------------------
# stream-stream interval join (streaming/join_stream.py)
# ---------------------------------------------------------------------

def _jrows(df):
    return sorted(
        (r["user_id"], r["view_id"], r["click_id"], r["lag_us"])
        for r in df.collect()
    )


def _mk_vc_events(spark, rows):
    """rows: (event_id, minutes_from_origin, user_id, event_type)."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    data = [
        (eid, base + dt.timedelta(minutes=m), uid, et, 1.0, "")
        for eid, m, uid, et in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


_VC_ROWS = [
    # user 1: view at 0 catches clicks at 10 and 29, not 31 (horizon 30m)
    (1, 0, 1, "view"), (2, 10, 1, "click"), (3, 29, 1, "click"),
    (4, 31, 1, "click"),
    # user 2: click before its view never matches; view at 40 catches 55
    (5, 35, 2, "click"), (6, 40, 2, "view"), (7, 55, 2, "click"),
    # user 3: two views share one click (both pairs emitted)
    (8, 60, 3, "view"), (9, 70, 3, "view"), (10, 80, 3, "click"),
    # cross-user never matches
    (11, 90, 4, "view"), (12, 95, 5, "click"),
    # noise types are filtered out
    (13, 91, 4, "purchase"), (14, 92, 4, "error"),
]


def test_join_stream_equals_batch_single_batch(spark, tmp_path):
    from montecarlopagerank_spark.streaming.join_stream import (
        run_join_stream,
        view_click_pairs_batch,
    )

    ev = _mk_vc_events(spark, _VC_ROWS)
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    ev.coalesce(1).write.parquet(inp)
    run_join_stream(spark, inp, out, ck)
    want = _jrows(view_click_pairs_batch(ev))
    assert _jrows(spark.read.parquet(out)) == want
    # sanity: the fixture exercises every rule
    assert [(u, v, c) for u, v, c, _ in want] == [
        (1, 1, 2), (1, 1, 3), (2, 6, 7), (3, 8, 10), (3, 9, 10)]


def test_join_stream_multibatch_and_incremental(spark, tmp_path):
    """Time-ordered files drained one per micro-batch (watermark state
    carried across batches), then NEW files appended and re-drained:
    the accumulated sink equals the full batch join, each pair exactly
    once."""
    from montecarlopagerank_spark.streaming.join_stream import (
        run_join_stream,
        view_click_pairs_batch,
    )

    ev = _mk_vc_events(spark, _VC_ROWS)
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    # stage chunk 1 (t < 50) and chunk 2 (t >= 50) as separate files
    c1 = ev.filter(F.col("event_id") <= 6).coalesce(1)
    c2 = ev.filter(F.col("event_id") > 6).coalesce(1)
    c1.write.parquet(inp)
    run_join_stream(spark, inp, out, ck, max_files_per_trigger=1)
    got1 = _jrows(spark.read.parquet(out))
    # pairs fully inside chunk 1 are already out
    assert [(u, v, c) for u, v, c, _ in got1] == [(1, 1, 2), (1, 1, 3)]
    c2.write.mode("append").parquet(inp)
    run_join_stream(spark, inp, out, ck, max_files_per_trigger=1)
    assert _jrows(spark.read.parquet(out)) == _jrows(view_click_pairs_batch(ev))


def test_sliding_window_stream_equals_closed_batch_windows(spark, tmp_path):
    """Sliding (1h every 15m) availableNow drain: the sink must equal the
    batch sliding aggregation restricted to windows whose END <= event-
    time high-water minus the 2h watermark (closed windows only)."""
    from montecarlopagerank_spark.streaming.window_stream import (
        run_window_stream,
        sliding_counts_batch,
    )

    rows = [(i, 15 * i, "view" if i % 2 else "click", float(i)) for i in range(40)]
    ev = _mk_events(spark, rows)
    inp, out, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    ev.coalesce(1).write.parquet(inp)
    run_window_stream(spark, inp, out, ck, slide="15 minutes")
    base = _base_us(spark)
    hi_us = base + 15 * 39 * 60_000_000  # event-time high water
    cutoff = hi_us - 2 * 3600_000_000  # watermark
    want = sorted(
        (r["window_start_us"], r["event_type"], r["n_events"], r["sum_value_r6"])
        for r in sliding_counts_batch(ev, "1 hour", "15 minutes").collect()
        if r["window_start_us"] + 3600_000_000 <= cutoff
    )
    got = sorted(
        (r["window_start_us"], r["event_type"], r["n_events"], r["sum_value_r6"])
        for r in spark.read.parquet(out).collect()
    )
    assert got == want and len(got) > 0


def _sketch_dict(df):
    return {(r.d, r.w): r.c for r in df.collect()}


def test_sketch_stream_equals_batch_across_batches(spark, tmp_path):
    """Cell-wise merged micro-batch sketches equal the one-shot batch
    sketch over the same corpus, however the corpus was split."""
    from montecarlopagerank_spark.pipeline.textstats import count_min_sketch
    from montecarlopagerank_spark.streaming.sketch_stream import (
        run_sketch_stream,
    )

    docs = _docs_fixture(spark).persist()
    inp, out, ck = (str(tmp_path / d) for d in ("sin", "sout", "sck"))
    os.makedirs(inp, exist_ok=True)
    docs.filter("doc_id < 6").write.mode("append").parquet(inp)
    got1 = run_sketch_stream(spark, inp, out, ck, depth=3, width=64)
    want1 = count_min_sketch(docs.filter("doc_id < 6"), depth=3, width=64)
    assert _sketch_dict(got1) == _sketch_dict(want1)

    docs.filter("doc_id >= 6").write.mode("append").parquet(inp)
    got2 = run_sketch_stream(spark, inp, out, ck, depth=3, width=64)
    want2 = count_min_sketch(docs, depth=3, width=64)
    assert _sketch_dict(got2) == _sketch_dict(want2)

    # re-draining with nothing new is the identity (exactly-once)
    got3 = run_sketch_stream(spark, inp, out, ck, depth=3, width=64)
    assert _sketch_dict(got3) == _sketch_dict(want2)
