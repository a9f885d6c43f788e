"""Deterministic sampling / splitting / chunking for training-data prep.

New-engine scope: the three operations every large-scale LLM data
pipeline runs between dedup and tokenization —

- ``hash_split``: train/val/test assignment that is a pure function of
  the row key (md5 bucket), so it is stable across reruns, cluster
  sizes, and row order, and any later job can re-derive the split
  without a membership table. No shuffle: a projection the optimizer
  pushes into the scan stage.
- ``mixture_sample``: per-source down/up-weighting (the "data mixture"
  step) by comparing the same kind of hash bucket against a per-source
  keep fraction. A pure filter — at 100 TB this is the difference
  between a full-pass filter and a join against a sampled-id table.
- ``chunk_text``: fixed-width (optionally overlapping) context-window
  chunking via ``sequence + posexplode + substr`` — a narrow,
  shuffle-free explosion whose output size is len/stride per doc.

Hashing is md5-based (not xxhash64) so the DuckDB oracle can reproduce
the buckets bit-exactly: Spark ``conv(substr(md5(k),1,8),16,10)`` ==
DuckDB ``('0x' || substr(md5(k),1,8))::UBIGINT`` (contract.py twins).
md5 is ~2× slower than xxhash64 per row but both are scan-stage
codegen; swap the bucket fn for xxhash64 in production if oracle
parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BUCKETS = 1 << 32  # md5 prefix space: first 8 hex chars


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Deterministic bucket in [0, 2^32) from the md5 of salt+key."""
    s = F.concat(F.lit(salt), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def hash_split(
    df: DataFrame,
    *,
    key_col: str,
    splits: dict[str, float],
    salt: str = "split:",
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with
    probability ~= its fraction, as a pure function of the key.

    ``splits`` is name → fraction in insertion order; fractions must sum
    to ~1 (the last split absorbs rounding). Rows with equal keys land
    in the same split by construction — dedup BEFORE splitting if leak-
    freedom across splits is required for duplicate texts.
    """
    fracs = list(splits.values())
    if not fracs or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {splits}")
    b = hash_bucket(F.col(key_col), salt)
    names = list(splits)
    expr = F.lit(names[-1])
    cum = 0.0
    thresholds = []
    for frac in fracs[:-1]:
        cum += frac
        thresholds.append(int(cum * BUCKETS))
    for name, thr in reversed(list(zip(names[:-1], thresholds))):
        expr = F.when(b < thr, name).otherwise(expr)
    return df.withColumn("split", expr)


def split_thresholds(splits: dict[str, float]) -> list[tuple[str, int]]:
    """(name, upper_bound_bucket) pairs for the SQL oracle twin."""
    out, cum = [], 0.0
    for name, frac in list(splits.items())[:-1]:
        cum += frac
        out.append((name, int(cum * BUCKETS)))
    return out


def mixture_sample(
    df: DataFrame,
    *,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "mix:",
) -> DataFrame:
    """Keep each row with per-source probability ``weights[source]``
    (``default_weight`` for unlisted sources), deterministically by key
    hash. Down-weighting only (fractions in [0, 1]); up-sampling is a
    separate explode-by-repeat op. Pure filter, no shuffle."""
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0,1], got {w}")
    b = hash_bucket(F.col(key_col), salt)
    thr = F.lit(int(default_weight * BUCKETS))
    for src in sorted(weights):
        thr = F.when(F.col(source_col) == src, int(weights[src] * BUCKETS)).otherwise(thr)
    return df.filter(b < thr)


def chunk_text(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    size: int,
    stride: int | None = None,
) -> DataFrame:
    """Explode each document into fixed-width character windows of
    ``size`` starting every ``stride`` chars (defaults to ``size`` =
    non-overlapping). Emits (id, chunk_idx, chunk_len, chunk) — narrow
    plan, no shuffle; downstream tokenization maps over chunks."""
    stride = stride or size
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(text_col), F.lit(1)), F.lit(stride)
    )
    exploded = df.select(
        F.col(id_col), F.col(text_col), F.posexplode(starts).alias("chunk_idx", "_start")
    )
    chunk = F.col(text_col).substr(F.col("_start"), F.lit(size))
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.length(chunk).cast("long").alias("chunk_len"),
        chunk.alias("chunk"),
    )


def bottomk_sample(
    df: DataFrame,
    *,
    key_col: str,
    k: int,
    salt: str = "sample:",
) -> DataFrame:
    """Exact uniform k-sample without replacement: keep the k rows whose
    ``md5(salt + key)`` bucket is smallest (ties by key). Deterministic
    — a pure function of the key set, so reruns, engines, and cluster
    sizes agree row-for-row, and appending new rows perturbs membership
    only at the bucket boundary (the classic bottom-k sketch property:
    the sample composes under union by re-taking the bottom k).

    Scale shape: ORDER BY + LIMIT compiles to TakeOrderedAndProject —
    each partition keeps a k-row heap, the driver merges P·k rows; no
    global sort, no O(n) shuffle."""
    if k <= 0:
        raise ValueError("k must be positive")
    b = hash_bucket(F.col(key_col), salt)
    return (
        df.withColumn("_bucket", b)
        .orderBy("_bucket", key_col)
        .limit(k)
        .drop("_bucket")
    )


def induced_subgraph(
    edges: DataFrame,
    frac: float,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    salt: str = "subg:",
) -> DataFrame:
    """Vertex-induced subgraph sample: keep a vertex iff its md5 bucket
    falls under ``frac`` (the same bucket space as hash_split), keep an
    edge iff BOTH endpoints survive — the consistent way to develop
    against a sample of a 100 TB graph (every job re-derives the same
    membership from the key; expected edge retention is frac² under
    independence, and monotone: a bigger frac strictly grows the
    subgraph, so samples nest).

    Scale shape: a pure scan-stage filter on two hash expressions —
    no membership table, no join, no shuffle."""
    cut = int(frac * BUCKETS)
    return edges.filter(
        (hash_bucket(F.col(src_col), salt) < cut)
        & (hash_bucket(F.col(dst_col), salt) < cut)
    )


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    budget: int,
    n_buckets: int = 256,
) -> DataFrame:
    """GPT-style concat-and-split sequence packing: documents are laid
    end-to-end in a deterministic global order (md5 of the id, ties by
    id) and the resulting token stream is cut into fixed ``budget``-token
    training chunks — a document may straddle a chunk boundary (Brown et
    al. 2020 §2.3's packing; the alternative, greedy first-fit binning,
    is order-sensitive and not reproducible across engines). Token count
    is the whitespace convention shared with ``textstats.token_stats``.

    Emits per doc: ``n_tok``, ``tok_start`` (global exclusive prefix
    offset), ``chunk_first``/``chunk_last`` (the budget-sized chunks the
    doc's tokens land in; an empty doc is pinned to the chunk at its
    offset), ``n_chunks`` spanned.

    Scale shape — a distributed prefix sum, NOT a global window: a
    single-partition ``Window.orderBy`` would funnel the corpus through
    one task. Instead the md5 order is split into ``n_buckets`` ranges
    by the hash's leading byte(s) (a PREFIX of the sort key, so bucket
    order == global order), per-bucket token subtotals reduce to
    ``n_buckets`` rows on the driver, exclusive bucket bases go back via
    a broadcast join, and the intra-bucket offset is a per-bucket window
    over ~corpus/n_buckets rows. One shuffle (the window), one B-row
    reduce, one broadcast: holds at 100 TB with n_buckets sized to taste.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    if not 1 <= n_buckets <= 65536 or n_buckets & (n_buckets - 1):
        raise ValueError("n_buckets must be a power of two in [1, 65536]")
    # leading hex chars of the md5 ARE the bucket: fixed-width lowercase
    # hex compares identically as text and as number, so ordering by
    # (bucket, h) equals ordering by h alone
    n_hex = max(1, (n_buckets - 1).bit_length() + 3 >> 2)
    h = F.md5(F.col(id_col).cast("string"))
    toks = F.split(F.trim(text_col), r"\s+")
    n_tok = (
        F.when(F.length(F.trim(text_col)) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .cast("long")
    )
    d = df.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        h.alias("_h"),
        F.conv(F.substring(h, 1, n_hex), 16, 10).cast("long").alias("_b"),
    )
    # B-row exclusive prefix over bucket subtotals (driver-side scalar
    # work; ≤65536 rows by construction)
    sub = {
        r["_b"]: r["s"]
        for r in d.groupBy("_b").agg(F.sum("n_tok").alias("s")).collect()
    }
    bases, acc = [], 0
    for b in sorted(sub):
        bases.append((b, acc))
        acc += sub[b]
    spark = df.sparkSession
    base_df = spark.createDataFrame(bases or [(0, 0)], "_b long, _base long")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("_b")
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.col("_base") + F.sum("n_tok").over(w) - F.col("n_tok")).alias(
        "tok_start"
    )
    last_tok = F.col("tok_start") + F.greatest(F.col("n_tok"), F.lit(1)) - F.lit(1)
    return (
        d.join(F.broadcast(base_df), "_b")
        .select(id_col, "n_tok", "_h", "_b", start)
        .withColumn("chunk_first", F.floor(F.col("tok_start") / budget))
        .withColumn("chunk_last", F.floor(last_tok / budget))
        .withColumn(
            "n_chunks", F.col("chunk_last") - F.col("chunk_first") + F.lit(1)
        )
        .drop("_h", "_b")
    )


def _global_rank(
    df: DataFrame,
    *,
    h_col: str,
    tie_cols: list[str],
    part_cols: list[str] | None = None,
    n_buckets: int = 256,
    out_col: str = "pos",
) -> DataFrame:
    """0-based global rank of every row under ``ORDER BY (h, ties)``
    (within each ``part_cols`` group if given) WITHOUT a single-partition
    window: ``h`` must be a lowercase fixed-width hex column (md5), whose
    leading byte(s) define bucket ranges that are PREFIX ranges of the
    sort order, so rank = (exclusive count of earlier buckets, computed
    driver-side from a ≤ groups×n_buckets-row aggregate) + intra-bucket
    ``row_number``. The same distributed-prefix shape as
    :func:`pack_sequences`, generalized to ranks and partitioned use.

    Rows tying on ``(h, ties)`` receive distinct but arbitrarily-ordered
    ranks — callers must be tie-interchangeable (identical payload within
    a tie group) for cross-engine determinism."""
    from pyspark.sql import Window

    n_hex = max(1, (n_buckets - 1).bit_length() + 3 >> 2)
    part_cols = list(part_cols or [])
    d = df.withColumn(
        "_rb", F.conv(F.substring(h_col, 1, n_hex), 16, 10).cast("long")
    )
    counts = (
        d.groupBy(*part_cols, "_rb").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    # exclusive prefix within each part group, bucket-ascending
    by_part: dict = {}
    for r in counts:
        key = tuple(r[c] for c in part_cols)
        by_part.setdefault(key, []).append((r["_rb"], r["_n"]))
    bases = []
    for key, lst in by_part.items():
        acc = 0
        for b, n in sorted(lst):
            bases.append((*key, b, acc))
            acc += n
    # base frame typed like the part columns (empty input → empty frame)
    base_schema = (
        ", ".join(f"{c} {df.schema[c].dataType.simpleString()}" for c in part_cols)
        + (", " if part_cols else "")
        + "_rb long, _base long"
    )
    base_df = df.sparkSession.createDataFrame(bases, base_schema)
    w = Window.partitionBy(*part_cols, "_rb").orderBy(h_col, *tie_cols)
    return (
        d.join(F.broadcast(base_df), [*part_cols, "_rb"])
        .withColumn(out_col, F.col("_base") + F.row_number().over(w) - 1)
        .drop("_rb", "_base")
    )


def stratified_sample(
    df: DataFrame,
    *,
    strata_col: str,
    key_col: str,
    frac: float,
    salt: str = "strat:",
    n_buckets: int = 256,
) -> DataFrame:
    """Exact-size stratified sample: from each stratum of size n keep
    exactly ``round-half-up(frac·n)`` rows — the ones with the smallest
    ``md5(salt + key)`` — so every stratum is represented at precisely
    the target rate (the balanced-eval-set need ``mixture_sample``'s
    threshold filter only hits in expectation). Deterministic: a pure
    function of the key set per stratum; nested for growing ``frac``
    within a fixed stratum (bottom-k property).

    Scale shape: a stratum can be 10^10 rows, so NO per-stratum global
    window — per-(stratum, md5-prefix-bucket) ``row_number`` plus
    driver-side exclusive bucket bases (``_global_rank``: the aggregate
    the driver sees is ≤ strata·n_buckets rows), one shuffle; the
    per-stratum sizes ride the same aggregate."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"frac must be in [0, 1], got {frac}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    d = df.withColumn("_h", h)
    ranked = _global_rank(
        d, h_col="_h", tie_cols=[key_col], part_cols=[strata_col],
        n_buckets=n_buckets,
    )
    sizes = (
        d.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("_k", F.floor(F.lit(frac) * F.col("_n") + F.lit(0.5)))
        .select(strata_col, "_k")
    )
    return (
        ranked.join(F.broadcast(sizes), strata_col)
        .filter(F.col("pos") < F.col("_k"))
        .drop("_h", "pos", "_k")
    )


def upsample_repeat(
    df: DataFrame,
    *,
    source_col: str,
    key_col: str,
    weights: dict[str, float],
    default_weight: float = 1.0,
    salt: str = "up:",
) -> DataFrame:
    """Deterministic per-source UP-sampling by repetition — the other
    half of the data-mixture step (``mixture_sample`` handles w ≤ 1):
    a row with source weight w is emitted ``⌊w⌋`` times plus one more
    iff its md5 bucket falls under ``frac(w)`` — so expected multiplicity
    is exactly w, the realized multiplicity is a pure function of the
    key (reruns/engines/cluster sizes agree row-for-row), and w ≤ 1
    degenerates to ``mixture_sample``'s keep-filter with one copy.
    Emits the input columns plus ``copy_idx`` (0-based).

    Scale shape: a scan-stage ``explode`` of a per-row integer sequence
    — no shuffle, no join; output size is Σ w(source)·n(source), the
    mixture's intended epoch size."""
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"weight for {s!r} must be ≥ 0, got {w}")
    if default_weight < 0:
        raise ValueError(f"default_weight must be ≥ 0, got {default_weight}")
    b = hash_bucket(F.col(key_col), salt)

    def parts(w: float) -> tuple[int, int]:
        whole = int(w)
        return whole, int((w - whole) * BUCKETS)

    d_whole, d_thr = parts(default_weight)
    whole = F.lit(d_whole)
    thr = F.lit(d_thr)
    for src in sorted(weights):
        sw, st = parts(weights[src])
        whole = F.when(F.col(source_col) == src, F.lit(sw)).otherwise(whole)
        thr = F.when(F.col(source_col) == src, F.lit(st)).otherwise(thr)
    copies = whole + (b < thr).cast("int")
    seq = F.when(
        copies > 0, F.sequence(F.lit(0), copies - F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    # explode must be the top-level expression; the long cast follows
    return df.withColumn("copy_idx", F.explode(seq)).withColumn(
        "copy_idx", F.col("copy_idx").cast("long")
    )
