"""hash_split / mixture_sample / chunk_text (pipeline/sampling.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.sampling import (
    chunk_text,
    pack_sequences,
    stratified_sample,
    hash_split,
    mixture_sample,
)

SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t, f"src{i % 3}") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )


def test_hash_split_proportions_and_coverage(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    out = hash_split(df, key_col="doc_id", splits=SPLITS)
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 10_000
    assert abs(counts["train"] / 10_000 - 0.8) < 0.02
    assert abs(counts["val"] / 10_000 - 0.1) < 0.01
    assert abs(counts["test"] / 10_000 - 0.1) < 0.01


def test_hash_split_deterministic_and_order_free(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = dict(hash_split(df, key_col="doc_id", splits=SPLITS)
             .select("doc_id", "split").collect())
    shuffled = df.orderBy(F.xxhash64("doc_id")).repartition(7)
    b = dict(hash_split(shuffled, key_col="doc_id", splits=SPLITS)
             .select("doc_id", "split").collect())
    assert a == b


def test_hash_split_validates_fractions(spark):
    df = spark.range(1).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, key_col="doc_id", splits={"a": 0.5, "b": 0.4})


def test_mixture_sample_extremes_and_default(spark):
    df = docs_df(spark, [f"t{i}" for i in range(300)])
    none_kept = mixture_sample(
        df, source_col="source", key_col="doc_id",
        weights={"src0": 0.0, "src1": 0.0, "src2": 0.0},
    )
    assert none_kept.count() == 0
    all_kept = mixture_sample(
        df, source_col="source", key_col="doc_id", weights={"src0": 1.0},
        default_weight=1.0,
    )
    assert all_kept.count() == 300
    only_src1_dropped = mixture_sample(
        df, source_col="source", key_col="doc_id", weights={"src1": 0.0},
        default_weight=1.0,
    )
    assert only_src1_dropped.filter(F.col("source") == "src1").count() == 0
    assert only_src1_dropped.count() == 200


def test_mixture_sample_monotone_in_weight(spark):
    # same salt ⇒ kept set at weight w1 ⊆ kept set at w2 ≥ w1
    df = docs_df(spark, [f"t{i}" for i in range(600)])
    low = {r.doc_id for r in mixture_sample(
        df, source_col="source", key_col="doc_id",
        weights={f"src{i}": 0.2 for i in range(3)}).select("doc_id").collect()}
    high = {r.doc_id for r in mixture_sample(
        df, source_col="source", key_col="doc_id",
        weights={f"src{i}": 0.6 for i in range(3)}).select("doc_id").collect()}
    assert low <= high
    assert 0 < len(low) < len(high) < 600


def test_mixture_sample_validates_weights(spark):
    df = docs_df(spark, ["x"])
    with pytest.raises(ValueError):
        mixture_sample(df, source_col="source", key_col="doc_id",
                       weights={"src0": 1.5})


def test_chunk_text_nonoverlapping_reconstructs(spark):
    texts = ["abcdefghij", "xyz", "a" * 25]
    df = docs_df(spark, texts)
    out = chunk_text(df, id_col="doc_id", text_col="text", size=4).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, []).append(r.chunk)
    for i, t in enumerate(texts):
        assert "".join(by_doc[i]) == t
        assert len(by_doc[i]) == (len(t) + 3) // 4


def test_chunk_text_overlapping_matches_python_slices(spark):
    t = "the quick brown fox jumps over the lazy dog"
    df = docs_df(spark, [t])
    out = chunk_text(df, id_col="doc_id", text_col="text", size=10, stride=6)
    got = {r.chunk_idx: r.chunk for r in out.collect()}
    starts = range(0, len(t), 6)
    assert got == {i: t[s:s + 10] for i, s in enumerate(starts)}
    assert all(r.chunk_len == len(got[r.chunk_idx]) for r in out.collect())


def test_chunk_text_empty_text_single_empty_chunk(spark):
    df = docs_df(spark, [""])
    out = chunk_text(df, id_col="doc_id", text_col="text", size=5).collect()
    assert len(out) == 1 and out[0].chunk == "" and out[0].chunk_len == 0


def test_chunk_text_validates_args(spark):
    df = docs_df(spark, ["x"])
    with pytest.raises(ValueError):
        chunk_text(df, id_col="doc_id", text_col="text", size=0)


def test_bottomk_sample_deterministic_and_composable(spark):
    from montecarlopagerank_spark.pipeline.sampling import bottomk_sample

    df = spark.createDataFrame([(i, f"d{i}") for i in range(500)], "id long, t string")
    s1 = sorted(r["id"] for r in bottomk_sample(df, key_col="id", k=50).collect())
    s2 = sorted(r["id"] for r in bottomk_sample(df, key_col="id", k=50).collect())
    assert s1 == s2 and len(s1) == 50
    # python twin: k smallest (md5('sample:'+id) prefix, id)
    import hashlib
    def bucket(i):
        return int(hashlib.md5(f"sample:{i}".encode()).hexdigest()[:8], 16)
    want = sorted(sorted(range(500), key=lambda i: (bucket(i), i))[:50])
    assert s1 == want
    # bottom-k composes under union: bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B))
    a, b = df.filter("id < 250"), df.filter("id >= 250")
    comp = bottomk_sample(
        bottomk_sample(a, key_col="id", k=50).unionByName(
            bottomk_sample(b, key_col="id", k=50)),
        key_col="id", k=50)
    assert sorted(r["id"] for r in comp.collect()) == want
    # k > n degenerates to the full set
    assert bottomk_sample(df, key_col="id", k=10_000).count() == 500


def test_induced_subgraph_consistent_and_nested(spark):
    from montecarlopagerank_spark.pipeline.sampling import (
        BUCKETS,
        induced_subgraph,
    )
    import hashlib

    pairs = [(i, (i * 13 + 3) % 100) for i in range(300)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    small = {(r["src"], r["dst"]) for r in induced_subgraph(e, 0.3).collect()}
    big = {(r["src"], r["dst"]) for r in induced_subgraph(e, 0.7).collect()}
    assert small <= big  # samples nest
    # python twin: exact membership
    def keep(v, cut):
        return int(hashlib.md5(f"subg:{v}".encode()).hexdigest()[:8], 16) < cut
    cut = int(0.3 * BUCKETS)
    want = {(a, b) for a, b in pairs if keep(a, cut) and keep(b, cut)}
    assert small == want


def pack_naive(rows, budget):
    """Python twin: md5-ordered concat-and-split."""
    import hashlib

    order = sorted(
        rows, key=lambda r: (hashlib.md5(str(r[0]).encode()).hexdigest(), r[0])
    )
    out, off = {}, 0
    for i, t in order:
        n = 0 if t.strip() == "" else len(t.split())
        first = off // budget
        last = (off + max(n, 1) - 1) // budget
        out[i] = (n, off, first, last, last - first + 1)
        off += n
    return out


def pack_rows(df_out):
    return {
        r.doc_id: (r.n_tok, r.tok_start, r.chunk_first, r.chunk_last, r.n_chunks)
        for r in df_out.collect()
    }


def test_pack_sequences_matches_python_twin(spark):
    texts = [("tok " * (i % 9)).strip() for i in range(60)]  # incl. empties
    rows = [(i, t) for i, t in enumerate(texts)]
    out = pack_sequences(
        docs_df(spark, texts), id_col="doc_id", text_col="text", budget=10
    )
    assert pack_rows(out) == pack_naive(rows, 10)


def test_pack_sequences_bucket_count_invariant(spark):
    # the distributed prefix sum must give the same global offsets at
    # any bucketing granularity (bucket ranges are md5-prefix ranges)
    texts = [f"w{i} " * (i % 5) for i in range(40)]
    df = docs_df(spark, texts)
    a = pack_rows(
        pack_sequences(df, id_col="doc_id", text_col="text", budget=7, n_buckets=1)
    )
    b = pack_rows(
        pack_sequences(df, id_col="doc_id", text_col="text", budget=7, n_buckets=256)
    )
    assert a == b


def test_pack_sequences_conservation_and_contiguity(spark):
    texts = [("x " * (3 * i + 1)).strip() for i in range(30)]
    out = sorted(
        pack_sequences(
            docs_df(spark, texts), id_col="doc_id", text_col="text", budget=16
        ).collect(),
        key=lambda r: r.tok_start,
    )
    # offsets tile the stream: each doc starts where the previous ended
    off = 0
    for r in out:
        assert r.tok_start == off
        off += r.n_tok
    assert off == sum(len(t.split()) for t in texts)
    # spans consistent with the budget
    for r in out:
        assert r.chunk_first == r.tok_start // 16
        assert r.n_chunks == r.chunk_last - r.chunk_first + 1


def test_pack_sequences_validates_args(spark):
    df = docs_df(spark, ["a"])
    with pytest.raises(ValueError):
        pack_sequences(df, id_col="doc_id", text_col="text", budget=0)
    with pytest.raises(ValueError):
        pack_sequences(df, id_col="doc_id", text_col="text", budget=8, n_buckets=3)


def strat_naive(rows, frac):
    """Python twin: per-stratum round-half-up(frac*n) min-md5 keys."""
    import hashlib
    import math

    by_s: dict = {}
    for key, s in rows:
        by_s.setdefault(s, []).append(key)
    kept = set()
    for s, keys in by_s.items():
        k = math.floor(frac * len(keys) + 0.5)
        order = sorted(
            keys, key=lambda x: (hashlib.md5(f"strat:{x}".encode()).hexdigest(), x)
        )
        kept.update((x, s) for x in order[:k])
    return kept


def test_stratified_exact_sizes_and_membership(spark):
    rows = [(i, f"s{i % 4}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = stratified_sample(
        df, strata_col="source", key_col="doc_id", frac=0.3
    ).collect()
    got = {(r.doc_id, r.source) for r in out}
    assert got == strat_naive(rows, 0.3)
    from collections import Counter

    sizes = Counter(s for _, s in got)
    assert all(v == 15 for v in sizes.values())  # round(0.3*50)=15 per stratum


def test_stratified_nested_in_frac(spark):
    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    small = {
        (r.doc_id, r.source)
        for r in stratified_sample(
            df, strata_col="source", key_col="doc_id", frac=0.2
        ).collect()
    }
    big = {
        (r.doc_id, r.source)
        for r in stratified_sample(
            df, strata_col="source", key_col="doc_id", frac=0.6
        ).collect()
    }
    assert small <= big


def test_stratified_validates_frac(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        stratified_sample(df, strata_col="source", key_col="doc_id", frac=1.5)


def rewire_naive(pairs):
    import hashlib

    def h(salt, s, d):
        return hashlib.md5(f"{salt}#{s}#{d}".encode()).hexdigest()

    srcs = [
        s for s, d in sorted(pairs, key=lambda e: (h("s", *e), e[0], e[1]))
    ]
    dsts = [
        d for s, d in sorted(pairs, key=lambda e: (h("d", *e), e[0], e[1]))
    ]
    return dict(enumerate(zip(srcs, dsts)))


def test_rewire_preserves_degrees_and_matches_twin(spark):
    from collections import Counter

    from montecarlopagerank_spark.operators.nullmodel import rewire_configuration

    rng = random.Random(61)
    pairs = [(rng.randint(0, 15), rng.randint(0, 15)) for _ in range(80)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = rewire_configuration(df).collect()
    assert len(out) == len(pairs)
    # exact multiset preservation of sources and of destinations
    assert Counter(r.src for r in out) == Counter(s for s, _ in pairs)
    assert Counter(r.dst for r in out) == Counter(d for _, d in pairs)
    assert {r.pos: (r.src, r.dst) for r in out} == rewire_naive(pairs)


def upsample_naive(rows, weights, default=1.0):
    import hashlib

    out = {}
    for key, s in rows:
        w = weights.get(s, default)
        whole = int(w)
        thr = int((w - whole) * (1 << 32))
        b = int(hashlib.md5(f"up:{key}".encode()).hexdigest()[:8], 16)
        copies = whole + (1 if b < thr else 0)
        if copies:
            out[(key, s)] = copies
    return out


def test_upsample_repeat_multiplicities_and_twin(spark):
    from collections import Counter

    from montecarlopagerank_spark.pipeline.sampling import upsample_repeat

    rows = [(i, f"s{i % 3}") for i in range(300)]
    weights = {"s0": 2.5, "s1": 1.0, "s2": 0.4}
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = upsample_repeat(
        df, source_col="source", key_col="doc_id", weights=weights
    ).collect()
    got = Counter((r.doc_id, r.source) for r in out)
    assert dict(got) == upsample_naive(rows, weights)
    # copy_idx is 0..copies-1 per row
    by_key: dict = {}
    for r in out:
        by_key.setdefault((r.doc_id, r.source), set()).add(r.copy_idx)
    assert all(s == set(range(len(s))) for s in by_key.values())
    # expected multiplicities: s0 rows ≥ 2 copies, s1 exactly 1, s2 ∈ {0, 1}
    for (i, s), c in got.items():
        if s == "s0":
            assert c in (2, 3)
        elif s == "s1":
            assert c == 1
        else:
            assert c == 1
    # weight-0.4 stratum drops ~60% of its rows entirely
    kept_s2 = sum(1 for (_, s) in got if s == "s2")
    assert 20 <= kept_s2 <= 60


def test_upsample_validates_weights(spark):
    from montecarlopagerank_spark.pipeline.sampling import upsample_repeat

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with pytest.raises(ValueError):
        upsample_repeat(
            df, source_col="source", key_col="doc_id", weights={"a": -0.5}
        )
