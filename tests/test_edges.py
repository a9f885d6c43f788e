"""Transcript -> edge builder + vertex dictionary tests (SURVEY.md §5.2
item 1) and the per-turn text byte-identity invariant (item 4,
BASELINE.json input_hint's per-row invariant)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from montecarlopagerank_spark.datagen import transcripts_df
from montecarlopagerank_spark.operators.edges import (
    _typed_edges,
    build_vertex_dict,
    degrees,
    transcript_edges,
)

TS_SCHEMA = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"


def tiny_transcripts(spark):
    rows = [
        ("c1", 0, "user", "hi", None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "hello", "bash", "2024-01-01 00:00:01"),
        ("c1", 2, "user", "bye", None, "2024-01-01 00:00:02"),
        ("c2", 0, "user", "solo turn", None, "2024-01-01 01:00:00"),
        ("c3", 5, "system", "x", "search", "2024-01-01 02:00:00"),
        ("c3", 9, "user", "y", "bash", "2024-01-01 02:00:05"),
    ]
    df = spark.createDataFrame(
        [(c, i, r, t, tool, None) for c, i, r, t, tool, _ in rows],
        TS_SCHEMA,
    )
    return df


def test_turn_chain_edges(spark):
    ts = tiny_transcripts(spark)
    edges, vertices = transcript_edges(ts, kinds=["turn_chain"])
    vmap = {(r["kind"], r["key"]): r["vid"] for r in vertices.collect()}
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    expect = {
        (vmap[("turn", "c1#0")], vmap[("turn", "c1#1")]),
        (vmap[("turn", "c1#1")], vmap[("turn", "c1#2")]),
        # c2 single turn: no chain edge; c3 non-contiguous turn_idx still chains
        (vmap[("turn", "c3#5")], vmap[("turn", "c3#9")]),
    }
    assert got == expect


def test_role_and_tool_edges(spark):
    ts = tiny_transcripts(spark)
    edges, vertices = transcript_edges(ts)
    vmap = {(r["kind"], r["key"]): r["vid"] for r in vertices.collect()}
    by_kind = {
        k: {
            (r["src"], r["dst"])
            for r in edges.filter(F.col("kind") == k).collect()
        }
        for k in ["role_role", "turn_tool"]
    }
    assert by_kind["role_role"] == {
        (vmap[("role", "user")], vmap[("role", "assistant")]),
        (vmap[("role", "assistant")], vmap[("role", "user")]),
        (vmap[("role", "system")], vmap[("role", "user")]),
    }
    assert by_kind["turn_tool"] == {
        (vmap[("turn", "c1#1")], vmap[("tool", "bash")]),
        (vmap[("turn", "c3#5")], vmap[("tool", "search")]),
        (vmap[("turn", "c3#9")], vmap[("tool", "bash")]),
    }


def test_vertex_dict_dense_and_deterministic(spark):
    ts = transcripts_df(spark, n_convs=30, seed=42)
    _, v1 = transcript_edges(ts)
    rows1 = sorted((r["vid"], r["kind"], r["key"]) for r in v1.collect())
    n = len(rows1)
    assert sorted(r[0] for r in rows1) == list(range(n))  # dense [0, n)
    # identical ids regardless of physical partitioning (SURVEY.md §7.3)
    _, v2 = transcript_edges(ts.repartition(7))
    rows2 = sorted((r["vid"], r["kind"], r["key"]) for r in v2.collect())
    assert rows1 == rows2
    # stable under different bucket counts? ids may differ; same cardinality
    v3 = build_vertex_dict(_typed_edges(ts), buckets=7)
    assert v3.count() == n
    assert v3.select("vid").distinct().count() == n


def test_degrees_closed_vertex_set(spark):
    ts = tiny_transcripts(spark)
    edges, vertices = transcript_edges(ts)
    deg = degrees(edges, vertices)
    assert deg.count() == vertices.count()
    sums = deg.agg(F.sum("out_deg"), F.sum("in_deg")).collect()[0]
    ne = edges.count()
    assert sums[0] == ne and sums[1] == ne
    # tool vertices are sinks: out_deg 0 (dangling, reference empty-array case)
    vm = {r["key"]: r["vid"] for r in vertices.filter("kind='tool'").collect()}
    dm = {r["v"]: r["out_deg"] for r in deg.collect()}
    assert all(dm[v] == 0 for v in vm.values())


def sha_of_turns(df) -> str:
    rows = df.select("conv_id", "turn_idx", "text").collect()
    h = hashlib.sha256()
    for r in sorted(rows, key=lambda r: (r["conv_id"], r["turn_idx"])):
        h.update(repr((r["conv_id"], r["turn_idx"], r["text"])).encode())
    return h.hexdigest()


def test_text_byte_identity_through_pipeline(spark, tmp_path):
    """Per-turn text must survive the full graph pipeline byte-identical
    under stable turn ordering (BASELINE.json input_hint). The datagen
    fixture includes empty strings, emoji/CJK multibyte, embedded
    newline/tab, and a 10KB+ turn."""
    ts = transcripts_df(spark, n_convs=60, seed=42)
    before = sha_of_turns(ts)
    # run the full graph build, write transcripts through the Iceberg-shaped
    # sink, and read back — text rides along relational ops only
    from montecarlopagerank_spark.sources.transcripts import (
        read_transcripts,
        write_transcripts,
    )

    path = str(tmp_path / "transcripts")
    write_transcripts(ts, path)
    back = read_transcripts(spark, path)
    edges, vertices = transcript_edges(back)
    edges.count()  # force the graph build
    after = sha_of_turns(back)
    assert before == after
    # and the original frame joined to its vertex ids preserves text too
    turn_keys = back.select(
        "conv_id", "turn_idx", "text",
        F.concat("conv_id", F.lit("#"), F.col("turn_idx").cast("string")).alias("key"),
    )
    joined = turn_keys.join(
        vertices.filter("kind='turn'"), "key", "left"
    ).select("conv_id", "turn_idx", "text")
    assert sha_of_turns(joined) == before


def test_vertex_features_closed_form(spark):
    """Star 0-{1,2,3} plus a dangling self-loop vertex: every feature has
    a closed form."""
    from montecarlopagerank_spark.operators.edges import vertex_features

    e = spark.createDataFrame(
        [(0, 1), (0, 2), (3, 0), (4, 4), (0, 1)], "src long, dst long"
    )
    got = {r["v"]: r for r in vertex_features(e).collect()}
    c = got[0]
    assert (c["out_deg"], c["in_deg"], c["deg"]) == (3, 1, 3)
    assert c["mean_nbr_deg"] == 1.0 and c["wedges"] == 0
    leaf = got[1]
    assert (leaf["deg"], leaf["mean_nbr_deg"], leaf["wedges"]) == (1, 3.0, 2)
    lonely = got[4]  # self-loop only: no undirected neighbors
    assert (lonely["deg"], lonely["mean_nbr_deg"], lonely["wedges"]) == (0, 0.0, 0)
