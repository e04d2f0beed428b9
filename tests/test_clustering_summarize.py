"""Clustering pipeline invariants + summarizer semantics."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.clustering import (
    cluster_documents,
    cluster_keywords,
    cluster_sizes,
    doc_token_arrays,
    file_type_histogram,
)
from search_engine_spark.operators.summarize import (
    split_sentences,
    summarize_docs,
    summarize_py,
)


def test_split_sentences_abbreviations():
    text = "Mr. Smith went home. He saw Dr. Jones! Was it late? Yes it was."
    got = split_sentences(text)
    assert got == ["Mr. Smith went home", "He saw Dr. Jones", "Was it late", "Yes it was."]


def test_summarize_short_doc_verbatim():
    text = "One sentence only."
    assert summarize_py(text, 3) == text


def test_summarize_selects_and_reorders():
    # repeated-topic sentences score higher than the outlier
    text = (
        "Apples are red fruit and apples taste sweet. "
        "Apples grow on apple trees with red fruit. "
        "Quantum flux capacitors discombobulate. "
        "Red apples are the sweetest fruit of all. "
        "Apple trees bear fruit in autumn season."
    )
    out = summarize_py(text, 2)
    sents = split_sentences(text)
    # output preserves original order and is a subset
    out_sents = [s for s in sents if s.rstrip(".") in out or s in out]
    assert len([s for s in sents if s in out or s.rstrip(".") in out]) >= 1
    assert "Quantum flux" not in out


def test_summarize_docs_spark(spark):
    rows = [
        (1, "First point made here. Second thought follows now. Third idea closes out. Fourth one extra."),
        (2, "Tiny doc."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["summary"] for r in summarize_docs(df, 2).collect()}
    assert got[2] == "Tiny doc."
    assert got[1] == summarize_py(rows[0][1], 2)


@pytest.fixture(scope="module")
def labels(spark, tiny_pages):
    return cluster_documents(tiny_pages, n_clusters=3, doc_col="url", text_col="text").cache()


def test_cluster_labels_cover_nonempty_docs(tiny_pages, labels):
    tokenized = doc_token_arrays(tiny_pages, doc_col="url", text_col="text")
    assert labels.count() == tokenized.count()
    assert labels.select("cluster_id").distinct().count() <= 3


def test_cluster_deterministic(spark, tiny_pages, labels):
    again = cluster_documents(tiny_pages, n_clusters=3, doc_col="url", text_col="text")
    a = {r["doc_id"]: r["cluster_id"] for r in labels.collect()}
    b = {r["doc_id"]: r["cluster_id"] for r in again.collect()}
    assert a == b


def test_cluster_sizes_and_keywords(tiny_pages, labels):
    sizes = {r["cluster_id"]: r["n_docs"] for r in cluster_sizes(labels).collect()}
    assert sum(sizes.values()) == labels.count()
    tokenized = doc_token_arrays(tiny_pages, doc_col="url", text_col="text")
    kws = cluster_keywords(labels, tokenized, top_n=5).collect()
    by_cluster: dict[int, list] = {}
    for r in kws:
        by_cluster.setdefault(r["cluster_id"], []).append(r["rank"])
    for cid, ranks in by_cluster.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), cid


def test_file_type_histogram(spark):
    df = spark.createDataFrame(
        [(1, "aaa", "html"), (2, "bbbb", "html"), (3, "cc", "pdf")],
        "doc_id long, text string, source string",
    )
    got = {r["file_type"]: (r["n_docs"], r["avg_len"]) for r in file_type_histogram(df).collect()}
    assert got["html"][0] == 2 and got["pdf"][0] == 1
    assert got["html"][1] == pytest.approx(3.5)
