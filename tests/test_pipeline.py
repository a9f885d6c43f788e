"""Training-data pipeline tests: dedup, similarity, text stats,
multimodal plumbing. Oracles are pure-Python recomputations on collected
tiny inputs."""

from __future__ import annotations

import itertools
import math
import os

import pytest
from pyspark.sql import functions as F

from montecarlopagerank_spark.pipeline.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    simhash_near_dupes,
)
from montecarlopagerank_spark.pipeline.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dupes,
)
from montecarlopagerank_spark.pipeline.textstats import (
    doc_fingerprint,
    langid_heuristic,
    quality_score,
    token_stats,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()


def test_token_stats(spark):
    d = spark.createDataFrame(
        [(0, "hello world  foo"), (1, ""), (2, "  a  ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_stats(d).collect()}
    assert got[0]["n_tokens"] == 3 and got[0]["n_chars"] == 16
    assert got[1]["n_tokens"] == 0
    assert got[2]["n_tokens"] == 1
    assert got[0]["n_bpe_est"] == 4  # ceil(16/4)


def test_quality_score_bounds(docs):
    rows = quality_score(docs).collect()
    assert all(0.0 <= r["quality"] <= 1.0 for r in rows)
    assert len(rows) == docs.count()


def test_langid_heuristic(spark):
    d = spark.createDataFrame(
        [
            (0, "plain english text here"),
            (1, "这是中文文本这是中文文本"),
            (2, "Привет мир Привет мир"),
            (3, "héllò wörld àççénts éverywhère"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pred_lang"] for r in langid_heuristic(d).collect()}
    assert got == {0: "en", 1: "zh", 2: "ru", 3: "latin-acc"}


def test_doc_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, "hello world!")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in doc_fingerprint(d).collect()}
    assert got[0]["md5_norm"] == got[1]["md5_norm"]  # case+ws normalized
    assert got[0]["md5_norm"] != got[2]["md5_norm"]
    assert got[0]["rolling_hash"] == got[1]["rolling_hash"]


def test_exact_dedup(spark):
    d = spark.createDataFrame(
        [(0, "same Doc"), (1, "same  doc"), (2, "unique")],
        "doc_id long, text string",
    )
    got = {r["keep_id"]: r for r in exact_dedup(d).collect()}
    assert got[0]["n_copies"] == 2 and got[0]["doc_ids"] == [0, 1]
    assert got[2]["n_copies"] == 1


@pytest.fixture(scope="module")
def dup_docs(spark):
    """Base docs + near-duplicates (one word changed) + unrelated docs."""
    base = ("spark engine builds graph tables from transcripts and runs "
            "pagerank over the resulting edges with checkpoint support")
    near = base.replace("checkpoint", "restart")
    other = ("completely different content about cooking pasta with "
             "tomatoes basil garlic and olive oil on sunday evening")
    return spark.createDataFrame(
        [(0, base), (1, near), (2, other), (3, base + " extra tail"),
         (4, "tiny"), (5, other)],
        "doc_id long, text string",
    )


def test_minhash_finds_near_dupes(spark, dup_docs):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in minhash_dedup_pairs(
        dup_docs, jaccard_threshold=0.5).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] >= 0.5
    assert (0, 3) in pairs  # containment-ish
    # exact dupes (2, 5) are collapsed by the exact-dedup pre-pass (the
    # composition: full closure = exact groups ∪ representative pairs)
    assert (2, 5) not in pairs
    got = {r["keep_id"]: r for r in exact_dedup(dup_docs).collect()}
    assert got[2]["doc_ids"] == [2, 5]
    # legacy single-pass behaviour still available and finds the pair
    raw = {(r["a"], r["b"]): r["jaccard"] for r in minhash_dedup_pairs(
        dup_docs, jaccard_threshold=0.5, dedup_exact_first=False).collect()}
    assert (2, 5) in raw and raw[(2, 5)] == 1.0
    assert not any({a, b} == {0, 2} for a, b in pairs)


def test_minhash_signature_properties(spark, dup_docs):
    sigs = {r["doc_id"]: r["sig"] for r in
            minhash_signatures(dup_docs, num_hashes=32).collect()}
    assert all(len(s) == 32 for s in sigs.values())
    assert sigs[2] == sigs[5]  # identical docs -> identical signatures
    # signature agreement approximates jaccard: near-dupes mostly agree
    agree = sum(a == b for a, b in zip(sigs[0], sigs[1])) / 32
    assert agree > 0.4
    # candidates are a superset relation check
    cands = {(r["a"], r["b"]) for r in minhash_lsh_candidates(
        minhash_signatures(dup_docs), bands=16, rows_per_band=4).collect()}
    assert (2, 5) in cands


def test_ngram_jaccard_exact(spark, dup_docs):
    pairs = spark.createDataFrame([(2, 5), (0, 2)], "a long, b long")
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           ngram_jaccard(dup_docs, pairs).collect()}
    assert got[(2, 5)] == 1.0
    assert got[(0, 2)] < 0.05


def test_simhash_properties(spark, dup_docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(dup_docs).collect()}
    assert sigs[2] == sigs[5]
    ham01 = bin((sigs[0] ^ sigs[1]) & (2**64 - 1)).count("1")
    ham02 = bin((sigs[0] ^ sigs[2]) & (2**64 - 1)).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated
    dupes = {(r["a"], r["b"]) for r in
             simhash_near_dupes(dup_docs, max_hamming=3).collect()}
    assert (2, 5) in dupes


def test_simhash_recall_guarantee(spark, docs):
    """Pigeonhole guarantee pinned: with the default bands (> max_hamming
    equal chunks), EVERY pair within the Hamming threshold must be found.
    Brute-force Hamming over the first 60 docs is the oracle."""
    sub = docs.filter("doc_id < 60")
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(sub).collect()}
    max_h = 7
    expect = set()
    for a, b in itertools.combinations(sorted(sigs), 2):
        if bin((sigs[a] ^ sigs[b]) & (2**64 - 1)).count("1") <= max_h:
            expect.add((a, b))
    got = {(r["a"], r["b"]) for r in
           simhash_near_dupes(sub, max_hamming=max_h).collect()}
    assert got == expect  # recall 1.0 by construction, precision exact

    # bands that cannot cover the threshold are rejected, never silent
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dupes(sub, max_hamming=8, bands=4)


def test_minhash_identical_cluster_no_blowup(spark):
    """1000 byte-identical docs: exact-dedup-first collapses them to one
    representative, so LSH sees 1 doc instead of emitting bands*c^2 ~ 16M
    candidate rows (VERDICT r1 'What's wrong' #2)."""
    n = 1000
    d = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate document body repeated verbatim").alias(
            "text"),
    )
    pairs = minhash_dedup_pairs(d, jaccard_threshold=0.5)
    assert pairs.count() == 0  # identical cluster handled by exact_dedup
    groups = exact_dedup(d).collect()
    assert len(groups) == 1 and groups[0]["n_copies"] == n

    # with exact-dedup off, the bucket cap still bounds the fan-out
    capped = minhash_dedup_pairs(
        d, jaccard_threshold=0.5, dedup_exact_first=False, max_bucket_size=50)
    assert capped.count() == 0  # oversized buckets dropped, not exploded


def test_minhash_bucket_cap_keeps_small_buckets(spark, dup_docs):
    """The cap must not disturb ordinary buckets: same result with a cap
    far above any bucket size."""
    base = {(r["a"], r["b"]) for r in minhash_dedup_pairs(
        dup_docs, jaccard_threshold=0.5, max_bucket_size=None).collect()}
    capped = {(r["a"], r["b"]) for r in minhash_dedup_pairs(
        dup_docs, jaccard_threshold=0.5, max_bucket_size=1000).collect()}
    assert base == capped


def brute_topk_py(rows, qid, k):
    import numpy as np

    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in rows}
    q = vecs[qid] / np.linalg.norm(vecs[qid])
    scored = []
    for vid, v in vecs.items():
        if vid == qid:
            continue
        scored.append((round(float(np.dot(q, v / np.linalg.norm(v))), 6), -vid))
    scored.sort(reverse=True)
    return [(-nid, s) for s, nid in scored[:k]]


def test_cosine_topk_bruteforce_vs_numpy(spark, emb):
    rows = emb.collect()
    q = emb.filter("vec_id in (0, 1)")
    got = cosine_topk_bruteforce(emb, q, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["neighbour_id"], r["cos_sim"]))
    for qid in (0, 1):
        expect = brute_topk_py(rows, qid, 5)
        assert by_q[qid] == expect, f"query {qid}"


def test_cosine_topk_lsh_recall(spark, emb):
    """LSH is approximate: require >=60% recall@10 vs brute force over 8
    queries (4 planes x 8 tables + multiprobe on 500 vectors)."""
    q = emb.filter("vec_id < 8")
    exact = cosine_topk_bruteforce(emb, q, k=10).collect()
    approx = cosine_topk_lsh(emb, q, k=10, n_planes=4, n_tables=8).collect()
    ex, ap = {}, {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbour_id"])
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["neighbour_id"])
    recall = sum(len(ex[q] & ap.get(q, set())) for q in ex) / sum(
        len(v) for v in ex.values())
    assert recall >= 0.6, f"recall {recall}"


def test_embedding_near_dupes(spark, emb):
    """Plant a near-identical copy of vec 0; the near-dup op must find it."""
    v0 = emb.filter("vec_id = 0").collect()[0]["embedding"]
    tweaked = [x + (0.001 if i == 0 else 0.0) for i, x in enumerate(v0)]
    planted = emb.unionByName(
        emb.sparkSession.createDataFrame(
            [(99999, tweaked, 0)], "vec_id long, embedding array<float>, label int")
    )
    pairs = {(r["a"], r["b"]) for r in
             embedding_near_dupes(planted, threshold=0.99).collect()}
    assert (0, 99999) in pairs


def test_multimodal_plumbing(spark):
    from montecarlopagerank_spark.pipeline.multimodal import (
        decode_stub,
        fake_decode,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30, parts=3).persist()
    assert media.count() == 30
    feats = fake_decode(media, dim=16).collect()
    assert len(feats) == 30
    assert all(len(r["feature"]) == 16 and r["n_bytes"] > 0 for r in feats)
    # deterministic across parallelism
    feats2 = fake_decode(synthetic_media(spark, n=30, parts=7), dim=16).collect()
    d1 = {r["media_id"]: list(r["feature"]) for r in feats}
    d2 = {r["media_id"]: list(r["feature"]) for r in feats2}
    assert d1 == d2
    # frame sampling expands video rows only
    frames = sample_frames(media, every_nth=2).collect()
    vids = media.filter("kind = 'video'").select(
        "media_id", "meta.n_frames").collect()
    expect_rows = sum(math.ceil(r["n_frames"] / 2) for r in vids)
    assert len(frames) == expect_rows
    # the real-decoder slot raises cleanly at execution
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        decode_stub(media).collect()
    media.unpersist()


def test_bmp_wav_codecs_roundtrip():
    """Pure-numpy BMP/WAV codecs: encode → decode is the identity."""
    import numpy as np

    from montecarlopagerank_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(5)
    for w, h in [(1, 1), (3, 2), (5, 7), (16, 16)]:  # odd widths hit padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(mm.decode_bmp(mm.encode_bmp(px)), px), (w, h)
    samples = rng.integers(-32768, 32767, size=1234, dtype=np.int16)
    got, sr = mm.decode_wav(mm.encode_wav(samples, 8000))
    assert sr == 8000
    assert np.allclose(got, samples.astype(np.float64) / 32768.0)


def test_png_codec_roundtrip_and_all_filters():
    """encode_png → decode_png is the identity; decode_png reconstructs
    every PNG scanline filter type (hand-filtered raw stream so Sub/
    Average/Paeth paths are exercised, not just our filter-0 encoder)."""
    import struct
    import zlib

    import numpy as np

    from montecarlopagerank_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (3, 2), (5, 7), (16, 16)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(mm.decode_png(mm.encode_png(px)), px), (w, h)

    # hand-build a 5-row RGB PNG using filters 0..4 (one per row)
    px = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8).astype(np.int64)
    bpp, stride = 3, 18
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for r, f in enumerate([0, 1, 2, 3, 4]):
        cur = px[r].reshape(-1)
        left = np.concatenate([np.zeros(bpp, np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, np.int64), prev[:-bpp]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        raw += bytes([f]) + (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0)
    blob = (
        mm.PNG_SIG
        + mm._png_chunk(b"IHDR", ihdr)
        + mm._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + mm._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(mm.decode_png(blob), px.astype(np.uint8))
    # and the shared image feature is decoder-agnostic: same pixels,
    # same feature through BMP and PNG
    q = rng.integers(0, 256, size=(9, 4, 3), dtype=np.uint8)
    fb = mm._bmp_feature(mm.encode_bmp(q))
    fp = mm._png_feature(mm.encode_png(q))
    assert np.array_equal(fb, fp)


def test_real_decode_known_features():
    """Real features from known content: a solid-colour BMP has exact
    channel means/zero stds; a 0.5-amplitude sine WAV has rms ~0.5/sqrt(2)
    and zcr ~2*f0/sr."""
    import numpy as np

    from montecarlopagerank_spark.pipeline import multimodal as mm

    px = np.zeros((8, 8, 3), dtype=np.uint8)
    px[:, :, 0] = 200  # solid red-ish
    f = mm._bmp_feature(mm.encode_bmp(px))
    assert len(f) == mm.FEATURE_DIM
    assert f[2] == pytest.approx(200 / 255, abs=1e-6)  # mean R
    assert f[3] == pytest.approx(0.0, abs=1e-6)        # mean G
    assert f[5] == pytest.approx(0.0, abs=1e-6)        # std R
    sr, f0, n = 8000, 400, 8000
    t = np.arange(n) / sr
    wav = mm.encode_wav((0.5 * np.sin(2 * np.pi * f0 * t) * 32767).astype(np.int16), sr)
    g = mm._wav_feature(wav)
    assert g[2] == pytest.approx(0.5 / math.sqrt(2), abs=0.01)  # rms
    assert g[4] == pytest.approx(2 * f0 / sr, abs=0.01)         # zcr


def test_real_decode_spark_path(spark):
    """real_decode over the synthetic real-media table: every kind gets a
    real decoder (BMP/PNG/JPEG rotating for stills, WAV for audio,
    DIB-AVI for video); deterministic across partitioning."""
    from montecarlopagerank_spark.pipeline.multimodal import (
        real_decode,
        synthetic_media,
        synthetic_real_media,
    )

    rows = real_decode(synthetic_real_media(spark, n=24, parts=3)).collect()
    assert len(rows) == 24
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r["kind"], set()).add(r["decoder"])
    assert by_kind == {
        "image": {"bmp", "png", "jpeg"},  # fixtures rotate the real codecs
        "audio": {"wav"},
        "video": {"avi"},
    }
    assert all(len(r["feature"]) == 16 for r in rows)
    rows2 = real_decode(synthetic_real_media(spark, n=24, parts=5)).collect()
    d1 = {r["media_id"]: list(r["feature"]) for r in rows}
    d2 = {r["media_id"]: list(r["feature"]) for r in rows2}
    assert d1 == d2
    # strict mode refuses blobs with no stdlib codec (opaque random bytes)
    with pytest.raises(Exception, match="NotImplementedError|no pure-stdlib"):
        real_decode(
            synthetic_media(spark, n=6, parts=2), fallback=False
        ).collect()


def test_avi_codec_roundtrip_and_frame_sampling(spark):
    """encode_avi → decode_avi is the identity (odd widths hit DIB row
    padding); sample_frames_real emits the shared _image_feature of every
    every_nth-th decoded frame — equal to computing it locally."""
    import numpy as np

    from montecarlopagerank_spark.pipeline import multimodal as mm

    rng = np.random.default_rng(11)
    for n, w, h in [(1, 1, 1), (3, 5, 2), (2, 7, 7), (4, 16, 9)]:
        fr = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        got, fps = mm.decode_avi(mm.encode_avi(fr, fps=10))
        assert np.array_equal(got, fr), (n, w, h)
        assert fps == pytest.approx(10.0)
    # a single-frame AVI agrees with the BMP of the same pixels on the
    # overlapping feature components (RGB channel means), and has zero
    # motion energy
    px = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    fa = mm._avi_feature(mm.encode_avi(px[None, ...]))
    fb = mm._bmp_feature(mm.encode_bmp(px))
    assert fa[5] == 0.0  # single frame → zero motion energy
    assert np.allclose(fa[6:9], fb[2:5], atol=1e-6)  # RGB means agree
    # Spark path: frame rows match a local replay frame-for-frame
    media = mm.synthetic_real_media(spark, n=18, parts=3)
    got_rows = mm.sample_frames_real(media, every_nth=2).collect()
    assert got_rows and all(r["decoder"] == "avi" for r in got_rows)
    local = {}
    for r in media.filter("kind = 'video'").collect():
        frames, _ = mm.decode_avi(bytes(r["content"]))
        for fi in range(0, len(frames), 2):
            local[(r["media_id"], fi)] = mm._image_feature(frames[fi])
    assert len(got_rows) == len(local)
    for r in got_rows:
        want = local[(r["media_id"], r["frame_idx"])]
        assert np.array_equal(np.array(r["frame_feature"], dtype=np.float32),
                              want)


def test_unigram_lm_closed_form(spark):
    """Corpus 'a a b' + 'b c': p(a)=p(b)=2/5, p(c)=1/5; per-doc mean
    -ln p matches hand arithmetic; perplexity = exp(ce)."""
    import math

    from montecarlopagerank_spark.pipeline.lmscore import unigram_lm_scores

    docs = spark.createDataFrame(
        [("d1", "A a b!"), ("d2", "b, c"), ("d3", "...")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in unigram_lm_scores(docs).collect()}
    assert set(got) == {"d1", "d2"}  # d3 has no tokens -> absent
    ce1 = -(2 * math.log(0.4) + math.log(0.4)) / 3
    ce2 = -(math.log(0.4) + math.log(0.2)) / 2
    assert got["d1"]["n_tokens"] == 3
    assert got["d1"]["cross_entropy"] == pytest.approx(ce1, rel=1e-12)
    assert got["d2"]["cross_entropy"] == pytest.approx(ce2, rel=1e-12)
    assert got["d2"]["perplexity"] == pytest.approx(math.exp(ce2), rel=1e-12)


def test_unigram_lm_uniform_corpus(spark):
    """All-distinct tokens: every doc's perplexity equals vocab size."""
    from montecarlopagerank_spark.pipeline.lmscore import unigram_lm_scores

    docs = spark.createDataFrame(
        [("d1", "w1 w2 w3"), ("d2", "w4 w5")], "doc_id string, text string"
    )
    for r in unigram_lm_scores(docs).collect():
        assert r["perplexity"] == pytest.approx(5.0, rel=1e-12)


def test_bigram_lm_closed_form(spark):
    """Corpus 'a b a b' + 'a b c' (+ 'solo'): bigram counts c(a,b)=3,
    c(b,a)=1, c(b,c)=1; contexts c(a·)=3, c(b·)=2; the unigram fallback
    is over ALL docs' tokens — a:3 b:3 c:1 solo:1, total 8 ('solo' has
    no bigram so d3 is unscored, but its token IS corpus evidence).
    Hand-check interpolated p for every bigram position at lam=0.7."""
    import math

    from montecarlopagerank_spark.pipeline.lmscore import bigram_lm_scores

    docs = spark.createDataFrame(
        [("d1", "A b a B!"), ("d2", "a b, c"), ("d3", "solo"), ("d4", "")],
        "doc_id string, text string",
    )
    got = {r["doc_id"]: r for r in bigram_lm_scores(docs, lam=0.7).collect()}
    assert set(got) == {"d1", "d2"}
    lam, om = 0.7, 1.0 - 0.7
    p_ab = lam * 3 / 3 + om * 3 / 8
    p_ba = lam * 1 / 2 + om * 3 / 8
    p_bc = lam * 1 / 2 + om * 1 / 8
    ce1 = -(math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    ce2 = -(math.log(p_ab) + math.log(p_bc)) / 2
    assert got["d1"]["n_bigrams"] == 3
    assert got["d1"]["cross_entropy"] == pytest.approx(ce1, rel=1e-12)
    assert got["d2"]["n_bigrams"] == 2
    assert got["d2"]["cross_entropy"] == pytest.approx(ce2, rel=1e-12)
    assert got["d2"]["perplexity"] == pytest.approx(math.exp(ce2), rel=1e-12)


def test_dedup_clusters_chain_and_singletons(spark):
    """Pairs (1,2),(2,3) chain into ONE cluster with min-id survivor;
    untouched docs are their own singleton cluster, keep=true."""
    from montecarlopagerank_spark.pipeline.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame([(2, 1), (2, 3), (5, 6)], "a long, b long")
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in
           dedup_clusters(spark, docs, pairs).collect()}
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (5, True), 6: (5, False),
    }


def test_dedup_clusters_keep_filter_is_exact_dedup_on_clique(spark):
    """On a clique of pairs, exactly one survivor remains."""
    import itertools

    from montecarlopagerank_spark.pipeline.dedup import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(10, 15)], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in itertools.combinations(range(10, 15), 2)],
        "a long, b long",
    )
    kept = [r["doc_id"] for r in
            dedup_clusters(spark, docs, pairs).filter("keep").collect()]
    assert kept == [10]


def test_corpus_vocab_stats_exact_and_sketch_band(spark):
    """Exact counts on a known corpus; the HLL approx stays within 3·rsd
    of exact (rsd=1%)."""
    from montecarlopagerank_spark.pipeline.textstats import corpus_vocab_stats

    docs = spark.createDataFrame(
        [("a", "x y x"), ("b", "y z!"), ("c", "")],
        "doc_id string, text string",
    )
    r = corpus_vocab_stats(docs).collect()[0]
    assert (r["n_docs"], r["total_tokens"], r["n_distinct"]) == (3, 5, 3)
    assert r["ttr_r6"] == 0.6
    # sketch band on a larger vocabulary
    big = spark.range(0, 20000).select(
        F.col("id").cast("string").alias("doc_id"),
        F.concat(F.lit("tok"), F.col("id").cast("string")).alias("text"),
    )
    b = corpus_vocab_stats(big).collect()[0]
    assert b["n_distinct"] == 20000
    assert abs(b["n_distinct_approx"] - 20000) <= 3 * 0.01 * 20000


def test_group_top_terms_deterministic_order(spark):
    from montecarlopagerank_spark.pipeline.textstats import group_top_terms

    df = spark.createDataFrame(
        [("a", "x x y z"), ("a", "y x"), ("b", "q q q w")],
        "grp string, text string")
    got = [(r["grp"], r["rank"], r["term"], r["cnt"])
           for r in group_top_terms(df, "grp", k=2).orderBy("grp", "rank").collect()]
    assert got == [("a", 1, "x", 3), ("a", 2, "y", 2),
                   ("b", 1, "q", 3), ("b", 2, "w", 1)]


def test_readability_closed_form(spark):
    from montecarlopagerank_spark.pipeline.textstats import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. It sat there!"), (2, "xyz")],
        "doc_id long, text string")
    got = {r["doc_id"]: r for r in readability(df).collect()}
    r = got[1]
    # 6 words, 2 sentences; syllables: the=1 cat=1 sat.=1 it=1 sat=1 there!=2
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 2, 7)
    import pytest as _pt
    assert r["fk_grade_r4"] == _pt.approx(
        round(0.39 * 3 + 11.8 * (7 / 6) - 15.59, 4), abs=1e-9)
    # vowel-less word still counts 1 syllable; no sentence mark -> 1
    assert (got[2]["n_words"], got[2]["n_sentences"], got[2]["n_syllables"]) == (1, 1, 1)


def test_jpeg_codec_roundtrip_and_structure():
    """The from-scratch baseline JPEG codec (pipeline/jpeg.py): PSNR
    floors on smooth/noise content, marker structure, greyscale and
    non-multiple-of-8 dimensions, and loud rejection of unsupported
    processes."""
    import numpy as np

    from montecarlopagerank_spark.pipeline.jpeg import decode_jpeg, encode_jpeg

    x, y = np.meshgrid(np.arange(48), np.arange(40))
    img = np.stack(
        [
            (x * 3 + y) % 256,
            128 + 80 * np.sin(x / 6.0) * np.cos(y / 5.0),
            np.clip(255 - x * 2 - y, 0, 255),
        ],
        axis=-1,
    ).astype(np.uint8)
    data = encode_jpeg(img, quality=90)
    assert data[:3] == b"\xff\xd8\xff" and data[-2:] == b"\xff\xd9"
    out = decode_jpeg(data)
    assert out.shape == img.shape
    mse = float(np.mean((out.astype(float) - img.astype(float)) ** 2))
    assert 10 * np.log10(255**2 / mse) > 40  # smooth content, q90

    # higher quality ⇒ monotonically no-worse reconstruction
    worse = decode_jpeg(encode_jpeg(img, quality=40))
    mse40 = float(np.mean((worse.astype(float) - img.astype(float)) ** 2))
    assert mse40 >= mse

    # greyscale + dims not divisible by 8 (edge-replicated padding)
    g = (x * 5 % 256).astype(np.uint8)[:37, :43]
    og = decode_jpeg(encode_jpeg(g, quality=85))
    assert og.shape == (37, 43, 3)
    assert np.array_equal(og[..., 0], og[..., 1])  # grey replicated
    gm = float(np.mean((og[..., 0].astype(float) - g.astype(float)) ** 2))
    assert 10 * np.log10(255**2 / gm) > 35

    # pure noise still round-trips reasonably at q90
    rng = np.random.RandomState(5)
    n = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    dn = decode_jpeg(encode_jpeg(n, quality=90))
    nm = float(np.mean((dn.astype(float) - n.astype(float)) ** 2))
    assert 10 * np.log10(255**2 / nm) > 25

    # unsupported processes are rejected loudly, not mis-decoded
    import pytest as _pytest

    bad = bytearray(encode_jpeg(g, quality=85))
    i = bytes(bad).find(b"\xff\xc0")
    bad[i + 1] = 0xC2  # masquerade as progressive SOF2
    with _pytest.raises(NotImplementedError):
        decode_jpeg(bytes(bad))
    with _pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")


def test_count_min_sketch_exact_and_overestimating(spark):
    """Sketch counters equal the python twin exactly; the CM estimate
    (min over rows) upper-bounds every true token count, with equality
    when width ≫ vocabulary (no collisions)."""
    import hashlib
    from collections import Counter

    from montecarlopagerank_spark.pipeline.textstats import count_min_sketch

    texts = [
        "a b b c c c d d d d",
        "the quick brown fox and the lazy dog",
        "a a the the",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    truth = Counter(t for s in texts for t in s.split())
    D, W = 3, 128
    got = {
        (r.d, r.w): r.c
        for r in count_min_sketch(df, depth=D, width=W).collect()
    }

    def h(d, t):
        return int(hashlib.md5(f"cm:{d}:{t}".encode()).hexdigest()[:8], 16) % W

    want: dict = {}
    for t, n in truth.items():
        for d in range(D):
            k = (d, h(d, t))
            want[k] = want.get(k, 0) + n
    assert got == want
    # estimates: min over rows ≥ truth, == truth when no collisions
    for t, n in truth.items():
        est = min(got[(d, h(d, t))] for d in range(D))
        assert est >= n
    # total mass conserved per row
    total = sum(truth.values())
    for d in range(D):
        assert sum(c for (dd, _), c in got.items() if dd == d) == total
