"""Tests: corpus-level line dedup (pipeline/linededup.py) — C4/CCNet
boilerplate removal semantics on handcrafted multi-line documents."""

from __future__ import annotations

import pytest

from montecarlopagerank_spark.pipeline.linededup import line_dedup

BOILER = "subscribe to our newsletter today"


def docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def by_id(df):
    return {r["doc_id"]: r for r in df.collect()}


@pytest.fixture(scope="module")
def corpus(spark):
    return docs_df(
        spark,
        [
            f"unique opening line zero\n{BOILER}\nunique closing line zero",
            f"{BOILER}\nunique middle line one\nok\n{BOILER}",
            "all original content here\nnothing repeated in this doc",
            BOILER,
        ],
    )


def test_keep_first_keeps_exactly_one_copy(spark, corpus):
    out = by_id(line_dedup(corpus, min_dup=2, keep="first"))
    # the (doc_id, line_idx)-min occurrence is doc 0 line 1
    assert out[0]["clean_text"].split("\n") == [
        "unique opening line zero",
        BOILER,
        "unique closing line zero",
    ]
    # every other copy is gone; 'ok' is short-line exempt
    assert out[1]["clean_text"].split("\n") == ["unique middle line one", "ok"]
    assert out[1]["n_lines"] == 4 and out[1]["n_kept"] == 2
    assert out[3]["clean_text"] == "" and out[3]["n_kept"] == 0
    assert out[3]["n_lines"] == 1


def test_keep_none_drops_all_copies(spark, corpus):
    out = by_id(line_dedup(corpus, min_dup=2, keep="none"))
    assert BOILER not in out[0]["clean_text"]
    assert out[0]["n_kept"] == 2
    assert out[3]["clean_text"] == ""


def test_untouched_doc_roundtrips_bytewise(spark, corpus):
    out = by_id(line_dedup(corpus, min_dup=2, keep="first"))
    assert out[2]["clean_text"] == (
        "all original content here\nnothing repeated in this doc"
    )
    assert out[2]["n_kept"] == out[2]["n_lines"] == 2


def test_min_dup_threshold(spark, corpus):
    # min_dup=4: the boilerplate occurs 4 times → still removed;
    # min_dup=5: below threshold → everything survives
    out4 = by_id(line_dedup(corpus, min_dup=4, keep="none"))
    assert BOILER not in out4[0]["clean_text"]
    out5 = by_id(line_dedup(corpus, min_dup=5, keep="none"))
    assert sum(r["n_kept"] for r in out5.values()) == sum(
        r["n_lines"] for r in out5.values()
    )


def test_short_lines_exempt_even_when_duplicated(spark):
    docs = docs_df(spark, ["---\nreal line of content", "---\nother content line"])
    out = by_id(line_dedup(docs, min_dup=2, keep="none", min_chars=5))
    assert out[0]["clean_text"].split("\n")[0] == "---"
    assert out[1]["clean_text"].split("\n")[0] == "---"


def test_normalization_case_and_trim(spark):
    # dedup key is lower(trim(line)): case/padding variants collide,
    # but the SURVIVING line keeps its original bytes
    docs = docs_df(spark, ["  Hello World Line  \nkeep me alpha", "hello world line"])
    out = by_id(line_dedup(docs, min_dup=2, keep="first"))
    assert out[0]["clean_text"].split("\n") == [
        "  Hello World Line  ",
        "keep me alpha",
    ]
    assert out[1]["clean_text"] == ""


def test_keep_validation(spark, corpus):
    with pytest.raises(ValueError):
        line_dedup(corpus, keep="last")
