"""Deduplication operators over ``documents(doc_id, text, ...)``.

Four families, each picked for a different scale/recall point:

* **exact** — hash-groupBy on normalized text. One shuffle on a short hash
  key; at 100 TB this is the cheapest pass and always runs first.
* **MinHash + LSH** — shingle → K minhashes → B bands → bucket join.
  Entirely ``pyspark.sql.functions`` (higher-order array functions), no
  Python: the signature build is one explode + one groupBy with K min()
  aggregates (partial-aggregable, skew-free because doc_id is unique);
  banding turns the O(n²) pair problem into per-bucket joins. Candidates
  are verified with exact shingle Jaccard before being called duplicates.
* **SimHash** — 64-bit signature assembled from per-token xxhash64 bit
  votes (64 conditional sums — wide but codegen'd); near-dupes = equal
  band keys then Hamming ≤ threshold via bit_count(a XOR b).
* **embedding near-dup** — see ``similarity.embedding_near_dupes``.

Scale notes: every candidate generator keys its final join on a *bucket*
value whose fan-in is bounded by design (band width r controls bucket
size distribution); the verify joins carry only (doc_id, shingle-array)
projections. Nothing here collects to the driver.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from montecarlopagerank_spark.pipeline.textstats import normalized_text

log = logging.getLogger(__name__)


# ---------------------------------------------------------------- exact
def exact_dedup(docs: DataFrame) -> DataFrame:
    """Groups of byte-identical (after normalization) documents:
    ``(keep_id, n_copies, dup_ids)``. keep = min doc_id (deterministic)."""
    key = F.md5(normalized_text(F.col("text")).cast("binary"))
    return (
        docs.select(F.col("doc_id"), key.alias("k"))
        .groupBy("k")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .select("keep_id", "n_copies", "doc_ids")
    )


def dedup_verdicts(docs: DataFrame) -> DataFrame:
    """Per-document ingestion verdict: ``(doc_id, keep_id, is_dup)`` —
    one row per input doc, keeper = min doc_id sharing the exact-dedup
    key. The batch twin of streaming/dedup_stream.py (keeper = first
    seen under an append-only doc_id-ordered log). Scale shape: one
    map-side-combined min-groupBy on the key plus one shuffle_hash
    re-join on the same key (co-partitioned, AQE reuses the exchange);
    the key never leaves the JVM."""
    key = F.md5(normalized_text(F.col("text")).cast("binary"))
    keyed = docs.select("doc_id", key.alias("k"))
    keepers = keyed.groupBy("k").agg(F.min("doc_id").alias("keep_id"))
    return keyed.join(keepers.hint("shuffle_hash"), "k").select(
        "doc_id",
        "keep_id",
        (F.col("doc_id") != F.col("keep_id")).alias("is_dup"),
    )


# ------------------------------------------------------------- minhash
def _shingles(text: Column, n: int) -> Column:
    """Distinct word n-gram shingles of the normalized text. The token
    array is let-bound through a 1-element array+transform so the split
    runs once per row, not once per gram (no codegen CSE inside
    higher-order-function lambdas — see contamination.word_shingles)."""

    def grams(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        return F.array_distinct(
            F.when(
                k > 0,
                F.transform(
                    F.sequence(F.lit(0), k - 1),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
                ),
            ).otherwise(F.array(F.array_join(toks, " ")))
        )

    toks0 = F.split(normalized_text(text), " ")
    return F.element_at(F.transform(F.array(toks0), grams), 1)


def shingle_sets(docs: DataFrame, shingle_n: int = 3) -> DataFrame:
    return docs.select(
        "doc_id", _shingles(F.col("text"), shingle_n).alias("shingles")
    )


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, shingle_n: int = 3
) -> DataFrame:
    """``(doc_id, sig array<long>[num_hashes])``. Permutation i is
    xxhash64(shingle, i) — independent-ish hash family, all JVM-side.
    Shape: explode shingles (narrow) → K min() aggregates keyed by doc_id
    (one shuffle, partial agg does most work map-side)."""
    return minhash_signatures_from_shingles(
        shingle_sets(docs, shingle_n), num_hashes
    )


def minhash_signatures_from_shingles(
    sh: DataFrame, num_hashes: int = 64
) -> DataFrame:
    """Signatures from an already-built ``(doc_id, shingles)`` table —
    lets callers that also need the shingle sets for exact-Jaccard verify
    (``minhash_dedup_pairs``) shingle the corpus exactly once."""
    exploded = sh.select("doc_id", F.explode("shingles").alias("sh"))
    hashed = exploded.select(
        "doc_id",
        *[F.xxhash64("sh", F.lit(i)).alias(f"h{i}") for i in range(num_hashes)],
    )
    agg = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )
    return agg.select(
        "doc_id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_candidates(
    signatures: DataFrame,
    bands: int = 16,
    rows_per_band: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Band the signatures and emit candidate pairs (a < b) sharing ≥1
    band bucket. Self-join per (band, bucket-hash); bucket key is a hash of
    the band slice so the shuffle key is a fixed-width long.

    ``max_bucket_size`` caps the per-bucket self-join fan-out: a bucket of
    c docs emits c² join rows, so a cluster of c near-identical documents
    otherwise costs bands·c² rows (the classic 100 TB LSH blowup). Buckets
    larger than the cap are dropped from candidate generation — compose
    with ``exact_dedup`` (see ``minhash_dedup_pairs``) so byte-identical
    clusters never reach LSH, and use ``lsh_bucket_profile`` to audit what
    a cap would drop. The cap is never silent: callers of
    ``minhash_dedup_pairs`` get a log line stating the cap in force."""
    banded = signatures.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice("sig", b * rows_per_band + 1, rows_per_band)),
            )
        ).alias("band", "bucket"),
    )
    if max_bucket_size is not None:
        # rides the same (band, bucket) shuffle the self-join needs
        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("bsz", F.count("*").over(w))
            .filter(F.col("bsz") <= max_bucket_size)
            .drop("bsz")
        )
    left = banded.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("a")
    )
    right = banded.select(
        F.col("band"), F.col("bucket"), F.col("doc_id").alias("b")
    )
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def lsh_bucket_profile(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """``(band, bucket, size)`` for auditing LSH bucket skew / choosing a
    ``max_bucket_size`` cap ("no silent caps": run this to see exactly
    which buckets a cap would drop and how many docs they hold)."""
    return (
        signatures.select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(bands - 1)),
                    lambda b: F.hash(
                        F.slice("sig", b * rows_per_band + 1, rows_per_band)
                    ),
                )
            ).alias("band", "bucket"),
        )
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("size"))
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    shingle_n: int = 3,
    bands: int = 16,
    rows_per_band: int = 4,
    jaccard_threshold: float = 0.8,
    dedup_exact_first: bool = True,
    max_bucket_size: int | None = 10_000,
) -> DataFrame:
    """End-to-end near-dup pairs ``(a, b, jaccard)``: LSH candidates
    verified with exact shingle Jaccard (array_intersect/array_union on the
    distinct shingle sets).

    Scale guards against the bands·c² candidate blowup on clusters of c
    (near-)identical documents (real corpora run 20-40% exact dupes):

    * ``dedup_exact_first`` (default) collapses byte-identical groups to
      their min-doc_id representative before LSH, so exact-copy clusters
      contribute ONE doc each. Returned pairs are between representatives;
      the full duplicate closure = ``exact_dedup`` groups ∪ these pairs
      (every member of group g is a near-dup of whatever its
      representative pairs with — Jaccard is invariant under identical
      text).
    * ``max_bucket_size`` drops pathological buckets that still exceed the
      cap (e.g. boilerplate-template clusters that differ in a few bytes).
      Never silent: logged here, auditable via ``lsh_bucket_profile``.
    """
    if dedup_exact_first:
        reps = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
        docs = docs.join(reps, "doc_id")
    if max_bucket_size is not None:
        log.info(
            "minhash_dedup_pairs: LSH buckets with more than %d docs are "
            "dropped from candidate generation (audit with lsh_bucket_profile)",
            max_bucket_size,
        )
    # ONE shingling pass: the persisted shingle table feeds both the
    # signature build and the verify join (unpersisted shapes re-shingled
    # the corpus twice — a measured 1.5× on the sf0.1 bench). The cache
    # fills during the caller's single action and both consumers share it.
    sh = shingle_sets(docs, shingle_n).persist(StorageLevel.MEMORY_AND_DISK)
    sigs = minhash_signatures_from_shingles(sh, num_hashes)
    cands = minhash_lsh_candidates(sigs, bands, rows_per_band, max_bucket_size)
    a_sh = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sh_a"))
    b_sh = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        cands.join(a_sh, "a")
        .join(b_sh, "b")
        .select("a", "b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def ngram_jaccard(
    docs: DataFrame, pairs: DataFrame, shingle_n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for given ``(a, b)`` pairs."""
    sh = shingle_sets(docs, shingle_n)
    a_sh = sh.select(F.col("doc_id").alias("a"), F.col("shingles").alias("sh_a"))
    b_sh = sh.select(F.col("doc_id").alias("b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return pairs.join(a_sh, "a").join(b_sh, "b").select(
        "a", "b", F.round(jac, 6).alias("jaccard")
    )


# ------------------------------------------------------------- simhash
def simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """``(doc_id, simhash long)`` — per-token xxhash64, each of the 64 bit
    positions votes +1/−1, signature bit = sign of the vote sum. The 64
    conditional sums are one wide codegen'd aggregate; the bit assembly
    sums non-overlapping powers of two (bit 63 lands on the long sign bit —
    Java wrap semantics give the right bit pattern)."""
    toks = F.split(normalized_text(F.col("text")), " ")
    exploded = docs.select("doc_id", F.explode(toks).alias("tok")).select(
        "doc_id", F.xxhash64("tok").alias("th")
    )
    votes = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftrightunsigned("th", i).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"b{i}")
            for i in range(bits)
        ]
    )
    sig = None
    for i in range(bits):
        term = F.when(
            F.col(f"b{i}") >= 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        sig = term if sig is None else sig + term
    return votes.select("doc_id", sig.alias("simhash"))


def simhash_near_dupes(
    docs: DataFrame,
    max_hamming: int = 7,
    bands: int | None = None,
    bits: int = 64,
) -> DataFrame:
    """Near-dup pairs by SimHash: block on ``bands`` equal bit chunks (a
    pair within Hamming ≤ bands−1 must agree on ≥1 chunk — pigeonhole),
    then verify ``bit_count(a XOR b) ≤ max_hamming``.

    ``bands`` defaults to the smallest divisor of ``bits`` that is
    > ``max_hamming``, so the pigeonhole guarantee always covers the
    requested threshold (recall = 1.0 by construction, pinned by
    tests/test_pipeline.py::test_simhash_recall_guarantee). Passing an
    explicit ``bands`` ≤ ``max_hamming`` raises rather than silently
    missing pairs whose differing bits spread across every chunk."""
    if bands is None:
        bands = next(b for b in range(max_hamming + 1, bits + 1) if bits % b == 0)
    if bands <= max_hamming:
        raise ValueError(
            f"bands={bands} cannot guarantee recall at max_hamming={max_hamming}: "
            f"need bands > max_hamming (pigeonhole)"
        )
    sigs = simhash(docs, bits)
    chunk = bits // bands
    chunks = F.array(
        *[
            F.shiftrightunsigned("simhash", b * chunk).bitwiseAND(
                F.lit((1 << chunk) - 1)
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(chunks).alias("band", "chunk_val"),
    )
    left = banded.select("band", "chunk_val", F.col("doc_id").alias("a"),
                         F.col("simhash").alias("sig_a"))
    right = banded.select("band", "chunk_val", F.col("doc_id").alias("b"),
                          F.col("simhash").alias("sig_b"))
    return (
        left.join(right, ["band", "chunk_val"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b",
            F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def dedup_clusters(
    spark: SparkSession,
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs → clusters → keep-list: the step that actually
    DROPS duplicates. ``pairs(a, b)`` from any detector above
    (minhash_dedup_pairs, simhash_near_dupes, ngram_jaccard ≥ threshold,
    embedding_near_dupes) is a similarity graph; near-duplication is not
    transitive, but production dedup treats its transitive closure as
    the duplicate cluster anyway (MinHash dedup in Brown et al. 2020
    appx A; Penedo et al. 2023 RefinedWeb §3.3 both cluster-then-keep-
    one) — chains of pairwise near-dups are one boilerplate family.

    Clusters come from the graph half of this engine:
    :func:`~montecarlopagerank_spark.algos.components.connected_components`
    (small-star/large-star — O(log n) rounds at any scale, no driver-side
    union-find). cluster_id = min doc id of the component; ``keep`` =
    this doc IS that minimum (exactly one survivor per cluster,
    deterministic). Docs in no pair are their own singleton cluster,
    keep = true. Output: ``(doc_id, cluster_id, keep:boolean)`` —
    filter ``keep`` to materialize the deduplicated corpus.
    """
    from montecarlopagerank_spark.algos.components import connected_components

    e = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    labels = connected_components(spark, e)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            labels.withColumnRenamed("v", "doc_id").hint("shuffle_hash"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )
