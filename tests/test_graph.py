"""Graph operators: undirected dedup quirk, PageRank vs oracle, document
weights, and the weighted end-to-end BM25 pipeline."""

from __future__ import annotations

import pytest

from search_engine_spark.config import load_stopwords
from search_engine_spark.operators.corpus_stats import build_bm25_index
from search_engine_spark.operators.graph import (
    dedup_edges_undirected,
    doc_rank_score_col,
    docs_with_weights,
    pagerank,
    top_linked_pages,
)
from search_engine_spark.operators.scoring import search_topk
from search_engine_spark.oracle.pyref import (
    build_oracle_index,
    doc_rank_score,
    oracle_search,
    pagerank_oracle,
)
from search_engine_spark.sources.synth import synth_graph_edges


@pytest.fixture(scope="module")
def graph(spark):
    nodes, edges = synth_graph_edges(100)
    ndf = spark.createDataFrame(nodes)
    edf = spark.createDataFrame(edges)
    return nodes, edges, ndf, edf


def _dedup_local(edges):
    seen, out = set(), []
    for e in edges:
        k = frozenset((e["src"], e["dst"]))
        if k not in seen:
            seen.add(k)
            out.append(e)
    return out


def test_undirected_dedup_first_wins(graph):
    nodes, edges, ndf, edf = graph
    got = {
        (r["src"], r["dst"]): r["weight"]
        for r in dedup_edges_undirected(edf, seq_col="seq").collect()
    }
    want = {(e["src"], e["dst"]): e["weight"] for e in _dedup_local(edges)}
    assert got == want
    # the reciprocal pair collapsed to its first occurrence
    assert len(got) == len(want) < len(edges)


@pytest.fixture(scope="module")
def spark_ranks(graph):
    nodes, edges, ndf, edf = graph
    ranks = pagerank(ndf, dedup_edges_undirected(edf, seq_col="seq")).cache()
    ranks.count()
    return ranks


def test_pagerank_matches_oracle(graph, spark_ranks):
    nodes, edges, ndf, edf = graph
    ded = _dedup_local(edges)
    want = pagerank_oracle(
        [n["id"] for n in nodes], [(e["src"], e["dst"], e["weight"]) for e in ded]
    )
    got = {r["id"]: r["final_rank"] for r in spark_ranks.collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_top_linked_pages(graph):
    nodes, edges, ndf, edf = graph
    ded = _dedup_local(edges)
    indeg: dict[str, int] = {}
    for e in ded:
        indeg[e["dst"]] = indeg.get(e["dst"], 0) + 1
    want = sorted(indeg.items(), key=lambda x: (-x[1], x[0]))[:5]
    got = [
        (r["id"], r["degree"])
        for r in top_linked_pages(
            dedup_edges_undirected(edf, seq_col="seq"), ndf, "in", 5
        ).collect()
    ]
    assert got == want


def test_doc_rank_score_formula(spark):
    from pyspark.sql import functions as F

    rows = [
        # (final, initial, weight, clen, code, links)
        (0.5, 0.3, 1.1, 6000, 4, 30),
        (None, None, None, 0, 0, 0),      # no rank fields -> 1.0
        (0.0, 0.0, 0.0, 0, 0, 0),         # floor 0.1
        (None, 0.9, None, 2500, 12, 5),   # partial fields
        (0.2, 1.0, 1.0, None, None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "final_rank double, initial_rank double, weight double, "
        "content_length long, code_blocks long, outbound_links long",
    )
    got = [
        r["w"]
        for r in df.select(
            doc_rank_score_col(
                F.col("final_rank"), F.col("initial_rank"), F.col("weight"),
                F.col("content_length"), F.col("code_blocks"), F.col("outbound_links"),
            ).alias("w")
        ).collect()
    ]
    for g, row in zip(got, rows):
        want = doc_rank_score(
            row[0], row[1], row[2], row[3] or 0, row[4] or 0, row[5] or 0
        )
        assert g == pytest.approx(want, abs=1e-12), row


def test_weighted_search_end_to_end(spark, tiny_pages, tiny_corpus_local, graph, spark_ranks):
    """Full pipeline: PageRank -> doc weights -> weighted BM25 == oracle."""
    nodes, edges, ndf, edf = graph
    weighted_pages = docs_with_weights(tiny_pages, ndf, spark_ranks)
    idx = build_bm25_index(
        weighted_pages, doc_col="url", text_col="text", weight_col="doc_weight"
    ).cache()

    # oracle weights from the oracle pagerank
    orank = pagerank_oracle(
        [n["id"] for n in nodes],
        [(e["src"], e["dst"], e["weight"]) for e in _dedup_local(edges)],
    )
    node_by_url = {n["url"]: n for n in nodes}
    docs, weights = [], []
    for rec in tiny_corpus_local:
        if not rec["text"].strip():
            continue
        docs.append((rec["url"], rec["text"]))
        node = node_by_url.get(rec["url"])
        if node is None:
            weights.append(1.0)
        else:
            weights.append(
                doc_rank_score(
                    orank.get(node["id"]),
                    node["initial_rank"],
                    node["weight"],
                    node["content_length"],
                    node["code_blocks"],
                    node["outbound_links"],
                )
            )
    oidx = build_oracle_index(docs, load_stopwords(), doc_weights=weights)

    from search_engine_spark.functions.tokenize import query_tokens_py

    for query in ["w0000 w0001", "xylophonium", "w0042 quartzine don't"]:
        got = [
            (r["doc_id"], r["score"])
            for r in search_topk(idx, query_tokens_py(query)).orderBy("rank").collect()
        ]
        want = oracle_search(oidx, query, use_fuzzy=False)
        assert [u for u, _ in got] == [u for u, _ in want], query
        for (_, gs), (_, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), query
    idx.unpersist()
