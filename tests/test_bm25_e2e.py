"""Minimum end-to-end slice (SURVEY.md §7.2): synthetic pages -> Spark index
-> BM25 top-k, rank-identical + score-identical (1e-9) vs the pure-Python
oracle under the deterministic tie policy (score desc, url asc)."""

from __future__ import annotations

import pytest

from search_engine_spark.config import DEFAULT_CONFIG, load_stopwords
from search_engine_spark.operators.corpus_stats import build_bm25_index
from search_engine_spark.operators.scoring import search_topk
from search_engine_spark.oracle.pyref import (
    build_oracle_index,
    oracle_search,
    oracle_tokenize_query,
)
from search_engine_spark.sources.synth import REFERENCE_QUERY_SET


@pytest.fixture(scope="module")
def spark_index(tiny_pages):
    idx = build_bm25_index(tiny_pages, doc_col="url", text_col="text").cache()
    yield idx
    idx.unpersist()


@pytest.fixture(scope="module")
def oracle_index(tiny_corpus_local):
    docs = [(r["url"], r["text"]) for r in tiny_corpus_local if r["text"].strip()]
    return build_oracle_index(docs, load_stopwords())


def test_corpus_scalars(spark_index, oracle_index):
    assert spark_index.corpus_size == oracle_index.corpus_size
    assert spark_index.avgdl == pytest.approx(oracle_index.avgdl, abs=1e-9)
    assert spark_index.average_idf == pytest.approx(oracle_index.average_idf, abs=1e-9)


def test_doc_len(spark_index, oracle_index):
    got = {r["doc_id"]: r["doc_len"] for r in spark_index.doc_stats.collect()}
    want = dict(zip(oracle_index.urls, oracle_index.doc_len))
    assert got == want


def test_idf(spark_index, oracle_index):
    got = {r["term"]: r["idf"] for r in spark_index.term_stats.collect()}
    assert set(got) == set(oracle_index.idf)
    for t, v in oracle_index.idf.items():
        assert got[t] == pytest.approx(v, abs=1e-9), t


def test_postings_match_doc_freqs(spark_index, oracle_index):
    got: dict[str, dict[str, int]] = {}
    for r in spark_index.postings.collect():
        got.setdefault(r["doc_id"], {})[r["term"]] = r["tf"]
    for url, freqs in zip(oracle_index.urls, oracle_index.doc_freqs):
        assert got.get(url, {}) == freqs, url


@pytest.mark.parametrize("query", REFERENCE_QUERY_SET)
def test_topk_rank_identical_no_fuzzy(spark_index, oracle_index, query):
    tokens = oracle_tokenize_query(query)
    got = [
        (r["doc_id"], r["score"])
        for r in search_topk(spark_index, tokens).orderBy("rank").collect()
    ]
    want = oracle_search(oracle_index, query, use_fuzzy=False)
    assert [u for u, _ in got] == [u for u, _ in want], query
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), query


def test_zero_pad_when_fewer_than_k_match(spark_index, oracle_index):
    """df=1 term matches 1 doc; reference top-5 contains 4 zero-score docs."""
    got = search_topk(spark_index, ["xylophonium"]).orderBy("rank").collect()
    want = oracle_search(oracle_index, "xylophonium", use_fuzzy=False)
    assert len(got) == len(want) == 5
    assert [r["doc_id"] for r in got] == [u for u, _ in want]
    assert sum(1 for r in got if r["score"] == 0.0) == 4
