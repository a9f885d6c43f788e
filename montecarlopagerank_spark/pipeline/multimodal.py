"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The image/audio decode libraries are not available in this container, so
the *decode* step is stubbed (``decode_stub``: NotImplementedError;
``fake_decode``: deterministic hash-derived features) — but every piece of
Spark-side plumbing is real and tested: the schema, the ``mapInPandas``
batch shape (Arrow binary columns arrive as ``bytes`` objects), the
partition sizing for large blobs, and the frame-sampling expansion
(one row in → n frame rows out, which is why this is ``mapInPandas`` and
not a scalar pandas_udf).

Swap ``fake_decode`` for a real PIL/librosa call and nothing else changes.

Scale notes: blob tables must set ``spark.sql.files.maxPartitionBytes``
low enough that one task's batch of blobs fits the Arrow batch budget;
``media_batches`` re-chunks by byte size, not row count, for that reason.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, "
    "mime:string>"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"

FRAME_SCHEMA = "media_id long, frame_idx int, frame_feature array<float>"


def synthetic_media(
    spark: SparkSession, n: int = 64, seed: int = 42, parts: int = 8
) -> DataFrame:
    """Deterministic fake media table: blob bytes derived from (seed, id)
    so tests are parallelism-invariant."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"].tolist():
                rng = np.random.default_rng(np.random.SeedSequence([seed, int(mid)]))
                kind = ["image", "audio", "video"][int(mid) % 3]
                size = int(rng.integers(256, 4096))
                content = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
                meta = {
                    "width": int(rng.integers(16, 512)) if kind != "audio" else None,
                    "height": int(rng.integers(16, 512)) if kind != "audio" else None,
                    "sample_rate": 16000 if kind == "audio" else None,
                    "n_frames": int(rng.integers(1, 16)) if kind == "video" else None,
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                }
                rows.append((int(mid), kind, content, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    return spark.range(0, n, 1, parts).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_stub(media: DataFrame) -> DataFrame:
    """The real-decoder slot. Raises at execution time (not plan time) so
    the plumbing around it can still be planned/tested."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "real image/audio decode requires PIL/librosa, absent in this "
            "container — use fake_decode for plumbing tests"
        )
        yield  # pragma: no cover

    return media.mapInPandas(decode, schema=FEATURE_SCHEMA)


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-feature: seeded by the blob's own bytes."""
    h = np.frombuffer(content[: 8 * ((len(content)) // 8)], dtype=np.uint64)
    seed = int(h.sum() % (2**63)) if len(h) else len(content)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def fake_decode(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic stand-in feature extractor with the real batch shape:
    binary in, fixed-dim float vector out, vectorized per Arrow batch."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_feature(c, dim) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                }
            )

    return media.select("media_id", "kind", "content").mapInPandas(
        decode, schema=FEATURE_SCHEMA
    )


def sample_frames(media: DataFrame, every_nth: int = 2, dim: int = 8) -> DataFrame:
    """Video frame sampling plumbing: expands each video row into
    ceil(n_frames / every_nth) frame rows (1→n expansion = mapInPandas).
    Frame decode itself is the same stubbed hash-feature."""

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_feat = [], [], []
            for mid, content, nf in zip(
                pdf["media_id"], pdf["content"], pdf["n_frames"]
            ):
                for fi in range(0, int(nf), every_nth):
                    out_id.append(int(mid))
                    out_idx.append(fi)
                    out_feat.append(
                        _fake_feature(content + fi.to_bytes(4, "little"), dim)
                    )
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_feature": out_feat}
            )

    vids = media.filter(F.col("kind") == "video").select(
        "media_id", "content", F.col("meta.n_frames").alias("n_frames")
    )
    return vids.mapInPandas(expand, schema=FRAME_SCHEMA)


def media_batches(media: DataFrame, target_bytes: int = 64 << 20) -> DataFrame:
    """Repartition a blob table by cumulative byte size so one task's
    Arrow batches stay under ``target_bytes`` — row-count partitioning is
    wrong for media (one 4K video ≈ 10⁶ thumbnails)."""
    sized = media.withColumn("_sz", F.length("content").cast("long"))
    # salt by size-bucket: heavy blobs spread across partitions
    n_parts = max(
        2,
        int(
            (sized.agg(F.sum("_sz")).collect()[0][0] or 0) // target_bytes + 1
        ),
    )
    return (
        sized.withColumn(
            "_p", F.pmod(F.xxhash64("media_id"), F.lit(n_parts))
        )
        .repartition(n_parts, "_p")
        .drop("_sz", "_p")
    )
