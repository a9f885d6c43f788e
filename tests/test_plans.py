"""Physical-plan audits: the anti-patterns SURVEY.md §4 bans must stay
banned. These read the optimized/executed plan text of representative
driver queries and assert

- NO row-at-a-time Python (`BatchEvalPython` / `PythonUDF`) anywhere —
  the only Python in the engine is Arrow-batched (`mapInPandas` /
  `applyInPandas` kernels, which show up as ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas nodes and are allowed);
- column pruning reaches the parquet scan (ReadSchema of a 2-column
  projection does not read `text`);
- predicate pushdown reaches the parquet scan (PushedFilters non-empty
  for a filtered read).
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().toString()


# lazy (non-iterative) driver queries whose returned DataFrame is the
# whole computation — iterative algos execute internally and are audited
# by their own one-job-per-superstep tests
LAZY_QUERIES = [
    "transcripts_view",
    "turn_chain_edges",
    "degree_top20",
    "token_stats",
    "quality_score",
    "bigram_lm",
    "vertex_features",
    "ngram_jaccard_pairs",
    "windowed_event_counts",
    "sliding_event_counts",
    "induced_subgraph_counts",
    "negative_edges",
    "bottomk_sample_docs",
    "tfidf_top_terms",
    "sessionize_events",
]


@pytest.mark.parametrize("name", LAZY_QUERIES)
def test_no_row_python_in_plan(spark, name):
    from montecarlopagerank_spark.contract import QUERIES

    plan = _plan(QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, name  # row-at-a-time Python
    # PythonUDF outside an Arrow node is the same smell under another name
    for line in plan.splitlines():
        if "PythonUDF" in line:
            assert "Arrow" in line or "InPandas" in line, (name, line)


def test_column_pruning_reaches_scan(spark):
    """A 2-column projection of documents must not read `text`.

    clearCache first: if any earlier test persisted the bare documents
    scan, Spark's cached-plan substitution would serve this read from
    the InMemoryRelation — whose embedded FileScan string still shows
    the ORIGINAL (empty) pushdown — and the assertion would probe the
    cache, not the optimizer."""
    spark.catalog.clearCache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(docs.select("doc_id", "lang"))
    import re

    m = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert m and "text" not in m.group(1), m and m.group(1)


def test_predicate_pushdown_reaches_scan(spark):
    spark.catalog.clearCache()  # same cached-plan-substitution guard as above
    plan = _plan(
        spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
            "n_chars > 100"
        )
    )
    assert "PushedFilters: [" in plan
    import re

    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "n_chars" in m.group(1), m and m.group(1)
