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


def test_cluster_preprocess_spark_matches_python(spark):
    """F10: the native regexp chain == the pure-Python twin (which mirrors
    reference service/document_clustering.py:307-318)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.clustering import (
        cluster_preprocess_col,
        cluster_preprocess_py,
    )

    samples = [
        "Upgrade to v2.3.1 released 2024-01-15 after 30 days of testing!",
        "snake_case and kebab-case plus CamelCase words, punct: a.b,c;d",
        "versions 1.2.3 10.20.30 dates 1999-12-31 not-a-date 99-12-31",
        "3 months 12 years 1 day mixed 5days",
        "  spaced   out\ttabs\nnewlines  ",
        # non-ASCII: (?U) in the Java patterns must keep accented letters
        # and Unicode digits exactly like Python re (ADVICE r02)
        "café naïve Zürich söñg-title under_scored première!",
        "unicode digits ١٢٣ date 2024-01-15 and nbsp space",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    got = [
        [x for x in r["toks"] if x != ""]
        for r in df.select(
            F.split(cluster_preprocess_col(F.col("t")), r"(?U)\s+").alias("toks")
        ).collect()
    ]
    want = [cluster_preprocess_py(s) for s in samples]
    assert got == want


def test_token_filter_and_custom_tokenizer():
    """F11/F12 reference parity (document_clustering.py:274-295)."""
    from search_engine_spark.operators.clustering import (
        custom_tokenize_py,
        token_filter_py,
    )

    assert token_filter_py("spark")
    assert not token_filter_py("ab")          # len < 3
    assert not token_filter_py("123")         # pure number
    assert not token_filter_py("v2")          # version tag
    assert not token_filter_py("abc1")        # mixed alphanumeric
    # camelCase splits, then filtered
    assert custom_tokenize_py("SparkContext runsJobs") == ["spark", "context", "runs", "jobs"]
    assert custom_tokenize_py("HTTPServer") == ["http", "server"]  # acronym split
    assert custom_tokenize_py("plain words here") == ["plain", "words", "here"]


def test_cluster_keywords_full_matches_oracle(spark):
    """A12 full scorer == pure-Python oracle under the shared deterministic
    policies (synthetic labels + synthetic word vectors on both sides)."""
    import numpy as np
    import pytest as _pt

    from search_engine_spark.config import DEFAULT_CONFIG
    from search_engine_spark.operators.clustering import cluster_keywords_full
    from search_engine_spark.oracle.pyref import oracle_cluster_keywords

    texts = {
        1: "apache spark shuffle executor spark spark cluster scheduling memory",
        2: "spark executor partitions shuffle broadcast join memory tuning guide",
        3: "executor memory spills shuffle partitions skew salting spark notes",
        4: "gardening tulips roses soil compost watering tulips pruning spring",
        5: "roses compost garden soil mulch watering flowers tulips blooming",
        6: "cooking pasta sauce garlic olive oil basil pasta recipes dinner",
        7: "garlic basil pasta oven baking bread dinner sauce italian cooking",
    }
    urls = {i: f"https://ex.org/{'spark' if i <= 3 else 'garden' if i <= 5 else 'food'}/{i}.html" for i in texts}
    labels = {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 2, 7: 2}
    all_terms = sorted(
        {
            w
            for t in texts.values()
            for w in t.lower().split()
            if len(w) > 2 and w not in DEFAULT_CONFIG.stopwords
        }
    )
    rng = np.random.RandomState(7)
    vectors = {t: rng.standard_normal(16).tolist() for t in all_terms}

    docs_df = spark.createDataFrame(
        [(i, texts[i], urls[i]) for i in texts], "doc_id long, text string, url string"
    )
    labels_df = spark.createDataFrame(
        [(i, labels[i]) for i in texts], "doc_id long, cluster_id int"
    )
    wv_df = spark.createDataFrame(
        [(t, v) for t, v in vectors.items()], "word string, vector array<double>"
    )
    got_df = cluster_keywords_full(
        docs_df, labels_df, wv_df, DEFAULT_CONFIG, top_n=5, url_col="url"
    )
    got: dict[int, list] = {}
    for r in got_df.orderBy("cluster_id", "rank").collect():
        got.setdefault(r["cluster_id"], []).append((r["term"], r["score"]))
    want = oracle_cluster_keywords(
        texts, labels, vectors, DEFAULT_CONFIG.stopwords, top_n=5, urls=urls
    )
    assert set(got) == set(want)
    for cid in want:
        assert [t for t, _ in got[cid]] == [t for t, _ in want[cid]], cid
        for (_, a), (_, b) in zip(got[cid], want[cid]):
            assert a == _pt.approx(b, abs=1e-9)
    # the path bonus must actually fire: every cluster's url carries its
    # topic word, so at least one cluster keyword scores >= 0.4 * 2.0
    assert any(s >= 0.8 for kws in want.values() for _, s in kws)


def test_descriptive_cluster_name():
    from search_engine_spark.operators.clustering import descriptive_cluster_name

    assert descriptive_cluster_name(["spark", "shuffle"]) == "Spark_Shuffle"
    assert descriptive_cluster_name([]) == "Cluster"
    assert descriptive_cluster_name(["v2x9", "data"], max_keywords=2) == "VX_Data"


def test_cluster_artifacts_roundtrip(spark, tiny_pages, labels, tmp_path):
    """S10: write browsable artifacts, read back, verify equality."""
    from search_engine_spark.operators.cluster_artifacts import (
        load_clustering_artifacts,
        save_clustering_artifacts,
    )
    from search_engine_spark.operators.clustering import doc_token_arrays

    tokenized = doc_token_arrays(tiny_pages, doc_col="url", text_col="text")
    kw = cluster_keywords(labels, tokenized, top_n=3)
    path = str(tmp_path / "artifacts")
    docs = tiny_pages.join(labels.select("doc_id"), tiny_pages.url == labels.doc_id, "left_semi")
    manifest = save_clustering_artifacts(
        path, docs, labels, kw, doc_col="url", text_col="text", url_col="url"
    )
    browsable, clusters, metadata, summary = load_clustering_artifacts(spark, path)
    n_labeled = labels.count()
    assert manifest["rows_written"] == n_labeled
    assert browsable.count() == n_labeled
    assert summary["total_documents"] == docs.count()
    assert summary["num_clusters"] == len(clusters)
    assert sum(c["size"] for c in clusters.values()) == n_labeled
    assert sum(int(v) for v in summary["documents_per_cluster"].values()) == n_labeled
    # per-cluster browsable rows match the recorded sizes, previews exist
    sizes_read = {
        r["cluster_name"]: r["n"]
        for r in browsable.groupBy("cluster_name").count().withColumnRenamed("count", "n").collect()
    }
    assert sizes_read == {name: c["size"] for name, c in clusters.items()}
    assert browsable.filter("preview is null").count() == 0


def test_file_type_histogram(spark):
    df = spark.createDataFrame(
        [(1, "aaa", "html"), (2, "bbbb", "html"), (3, "cc", "pdf")],
        "doc_id long, text string, source string",
    )
    got = {r["file_type"]: (r["n_docs"], r["avg_len"]) for r in file_type_histogram(df).collect()}
    assert got["html"][0] == 2 and got["pdf"][0] == 1
    assert got["html"][1] == pytest.approx(3.5)
