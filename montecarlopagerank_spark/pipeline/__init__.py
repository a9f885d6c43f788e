"""Large-scale training-data pipeline operators (beyond the reference's
graph surface): deduplication, similarity search, text analysis, and
multimodal column plumbing — all designed for the 100 TB case: built-in
pyspark.sql.functions (whole-stage codegen) for every hot path, Arrow
batched pandas only where an algorithm genuinely needs numpy."""

from montecarlopagerank_spark.pipeline.dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_candidates,
    minhash_dedup_pairs,
    simhash,
    simhash_near_dupes,
)
from montecarlopagerank_spark.pipeline.similarity import (  # noqa: F401
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_near_dupes,
)
from montecarlopagerank_spark.pipeline.textstats import (  # noqa: F401
    doc_fingerprint,
    langid_heuristic,
    quality_score,
    token_stats,
)
