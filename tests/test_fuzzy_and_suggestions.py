"""Fuzzy expansion + suggestion path parity: Spark engine vs pure-Python
oracle, incl. the full search_with_suggestions lifecycle (§3.2)."""

from __future__ import annotations

import pytest

from search_engine_spark.config import load_stopwords
from search_engine_spark.engine import SearchEngine
from search_engine_spark.operators.corpus_stats import build_bm25_index
from search_engine_spark.operators.fuzzy_expand import expand_query_tokens
from search_engine_spark.oracle.pyref import (
    build_oracle_index,
    indel_ratio,
    oracle_expand_query,
    oracle_search,
    oracle_search_with_suggestions,
    oracle_word_suggestions,
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


@pytest.fixture(scope="module")
def engine(spark_index):
    return SearchEngine(spark_index)


def test_indel_ratio_known_values():
    # fuzz.ratio ground truths (normalized Indel)
    assert indel_ratio("pandas", "pandas") == 100.0
    assert indel_ratio("", "") == 100.0
    assert indel_ratio("abc", "") == 0.0
    # LCS('padas','pandas')=5 -> 2*5/11
    assert indel_ratio("padas", "pandas") == pytest.approx(200 * 5 / 11)
    # transposition costs 2 edits in Indel: LCS('whta','what')=3 -> 75
    assert indel_ratio("whta", "what") == pytest.approx(75.0)


@pytest.mark.parametrize("query", ["w000 w00111", "w0042 quartzine don't", "xylophonium", "ubiquitone w0001"])
def test_expansion_matches_oracle(spark_index, oracle_index, query):
    from search_engine_spark.functions.tokenize import query_tokens_py

    got = expand_query_tokens(spark_index, query_tokens_py(query))
    want = oracle_expand_query(oracle_index, query)
    assert got == want, query


@pytest.mark.parametrize("query", REFERENCE_QUERY_SET)
def test_fuzzy_search_matches_oracle(engine, oracle_index, query):
    got = [(r["doc_id"], r["score"]) for r in engine.search(query).orderBy("rank").collect()]
    want = oracle_search(oracle_index, query, use_fuzzy=True)
    assert [u for u, _ in got] == [u for u, _ in want], query
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), query


@pytest.mark.parametrize("word", ["w000", "w00111", "zzqqxx", "xylophoniun", "ubiquiton"])
def test_word_suggestions_match_oracle(engine, oracle_index, word):
    got = engine.word_suggestions(word)
    want = oracle_word_suggestions(oracle_index, word)
    assert [w for w, _ in got] == [w for w, _ in want], word
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), word


@pytest.mark.parametrize(
    "query",
    [
        "w000 w00111",            # misspellings -> suggestion rewrite + re-search
        "whta is w0040, hw ues w0041?",  # reference-style smoke query
        "w0000 w0001",            # all in vocab: no suggestions
        "zzqqxx",                 # OOV with (possibly) no match
    ],
)
def test_search_with_suggestions_matches_oracle(engine, oracle_index, query):
    got = engine.search_with_suggestions(query)
    want = oracle_search_with_suggestions(oracle_index, query)
    assert got["suggested_query"] == want["suggested_query"], query
    assert got["used_suggestion"] == want["used_suggestion"]
    got_rows = [(r["doc_id"], r["score"]) for r in got["results"].orderBy("rank").collect()]
    assert [u for u, _ in got_rows] == [u for u, _ in want["results"]], query
    for (_, gs), (_, ws) in zip(got_rows, want["results"]):
        assert gs == pytest.approx(ws, abs=1e-9)
    got_suggs = {w: [s for s, _ in v] for w, v in got["suggestions"].items()}
    want_suggs = {w: [s for s, _ in v] for w, v in want["suggestions"].items()}
    assert got_suggs == want_suggs


def test_typo_pattern_reference_quirks():
    """A8: _has_common_typo_pattern parity incl. the reference's quirks
    (text_search.py:327-387)."""
    from search_engine_spark.operators.fuzzy_expand import has_common_typo_pattern

    assert has_common_typo_pattern("panddas", "pandas")  # repeated-letter dup
    assert has_common_typo_pattern("padnas", "pandas")   # transposed pair
    assert has_common_typo_pattern("c0de", "code")       # leet substitution
    assert not has_common_typo_pattern("ab", "abc")      # len < 3 guard
    # quirk: zero shared characters -> empty subsequences -> vacuous True
    assert has_common_typo_pattern("xyz", "qwp")


def test_likely_misspelling_decision_core():
    """A8 frequency rules (text_search.py:295-326): in-vocab never; OOV
    with seen suggestion always; 10x df-ratio branch."""
    from search_engine_spark.operators.fuzzy_expand import likely_misspelling_from_stats

    assert not likely_misspelling_from_stats(True, True, 50, 5000)   # in vocab
    assert likely_misspelling_from_stats(False, True, 0, 0)          # typo pattern
    assert likely_misspelling_from_stats(False, False, 0, 1)         # seen vs unseen
    assert likely_misspelling_from_stats(False, False, 3, 31)        # >10x
    assert not likely_misspelling_from_stats(False, False, 3, 30)    # ==10x is not >
    assert not likely_misspelling_from_stats(False, False, 0, 0)     # both unseen


def test_is_likely_misspelling_on_index(spark_index):
    """Planted low-df typo: the df lookups go through term_stats (one
    broadcast join), matching the reference's per-doc scans exactly."""
    from search_engine_spark.operators.fuzzy_expand import (
        is_likely_misspelling,
        term_dfs,
    )

    vocab_term = spark_index.term_stats.orderBy("term").first()["term"]
    dfs = term_dfs(spark_index, [vocab_term, "zzqqxxnotaword"])
    assert dfs[vocab_term] > 0 and dfs["zzqqxxnotaword"] == 0
    # in-vocab original -> never a misspelling (reference :306-308)
    assert not is_likely_misspelling(spark_index, vocab_term, "anything")
    # OOV original with an in-vocab suggestion -> always true (freq rule)
    assert is_likely_misspelling(spark_index, "zzqqxxnotaword", vocab_term)
