"""Tokenizer parity: native Catalyst expressions vs the Python reference
semantics (reference service/build_text_index.py:106-111 /
service/text_search.py:110-123), incl. unicode \\w and punctuation edges."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.config import load_stopwords
from search_engine_spark.functions.tokenize import index_tokens_col, tokens_col
from search_engine_spark.oracle.pyref import oracle_tokenize_index, oracle_tokenize_query

EDGE_TEXTS = [
    "Hello, World! It's a test.",
    "café naïve über señor",
    "don't stop-believing x-y_z v1.2.3",
    "C++ and a_b; foo.bar e.g. i.e. 80%",
    "   leading  and   trailing   ",
    "",
    "a b c d",  # single-char tokens
    "the and of to in",  # all stopwords
    "tab\tchar new\nline quo\"te",
    "UPPER lower MiXeD",
    "unicode: ¿qué? — em–dash … ellipsis",
    "digits 123 mixed a1b2 12ab",
]


@pytest.fixture(scope="module")
def tokens_result(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(EDGE_TEXTS)], "id int, text string")
    rows = (
        df.select(
            "id",
            tokens_col(F.col("text")).alias("qtoks"),
            index_tokens_col(F.col("text")).alias("itoks"),
        )
        .orderBy("id")
        .collect()
    )
    return rows


def test_query_tokens_match_python(tokens_result):
    for row in tokens_result:
        assert row["qtoks"] == oracle_tokenize_query(EDGE_TEXTS[row["id"]]), EDGE_TEXTS[row["id"]]


def test_index_tokens_match_python(tokens_result):
    stop = load_stopwords()
    for row in tokens_result:
        assert row["itoks"] == oracle_tokenize_index(EDGE_TEXTS[row["id"]], stop), EDGE_TEXTS[row["id"]]


def test_corpus_tokens_match_python(spark, tiny_pages, tiny_corpus_local):
    """Whole-corpus parity on the synthetic fixture (incl. punct-rich docs)."""
    stop = load_stopwords()
    got = {
        r["url"]: r["toks"]
        for r in tiny_pages.select("url", index_tokens_col(F.col("text")).alias("toks")).collect()
    }
    for rec in tiny_corpus_local:
        assert got[rec["url"]] == oracle_tokenize_index(rec["text"], stop), rec["url"]
