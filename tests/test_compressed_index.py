"""Materialized compressed index: round-trip vs the logical path + oracle,
resume-from-manifest semantics, and block-max pruning equivalence."""

from __future__ import annotations

import json
import os

import pytest

from search_engine_spark.config import EngineConfig
from search_engine_spark.functions.tokenize import query_tokens_py
from search_engine_spark.index.build import build_compressed_index
from search_engine_spark.index.query import CompressedIndex
from search_engine_spark.operators.corpus_stats import build_bm25_index
from search_engine_spark.operators.scoring import search_topk
from search_engine_spark.sources.synth import REFERENCE_QUERY_SET

CFG = EngineConfig(block_size=16, index_partitions=8)  # small blocks -> many


@pytest.fixture(scope="module")
def index_path(tmp_path_factory, tiny_pages):
    path = str(tmp_path_factory.mktemp("cindex"))
    build_compressed_index(tiny_pages, path, CFG, doc_col="url", text_col="text")
    return path


@pytest.fixture(scope="module")
def cindex(spark, index_path):
    return CompressedIndex(spark, index_path, CFG)


@pytest.fixture(scope="module")
def logical(tiny_pages):
    return build_bm25_index(tiny_pages, CFG, doc_col="url", text_col="text").cache()


def test_manifest_complete(index_path):
    with open(os.path.join(index_path, "_MANIFEST.json")) as f:
        m = json.load(f)
    for stage in ("doc_dim", "term_stats", "corpus", "postings"):
        assert m["stages"][stage]["complete"], stage
    assert m["stages"]["postings"]["blocks"] > 0
    assert os.path.exists(os.path.join(index_path, "manifests", "postings_files.json"))


def test_scalars_match(cindex, logical):
    assert cindex.corpus_size == logical.corpus_size
    assert cindex.avgdl == pytest.approx(logical.avgdl, abs=1e-12)


@pytest.mark.parametrize("query", REFERENCE_QUERY_SET)
def test_search_matches_logical_path(cindex, logical, query):
    tokens = query_tokens_py(query)
    want = [
        (r["doc_id"], r["score"])
        for r in search_topk(logical, tokens).orderBy("rank").collect()
    ]
    got = [
        (r["doc_id"], r["score"])
        for r in cindex.search_topk(tokens).orderBy("rank").collect()
    ]
    assert [u for u, _ in got] == [u for u, _ in want], query
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9), query


@pytest.mark.parametrize("query", ["w0000 w0001", "w0042 quartzine don't", "xylophonium"])
def test_wand_identical_to_full_decode(cindex, query):
    tokens = query_tokens_py(query)
    full = [(r["doc_id"], r["score"]) for r in cindex.search_topk(tokens, use_wand=False).orderBy("rank").collect()]
    wand = [(r["doc_id"], r["score"]) for r in cindex.search_topk(tokens, use_wand=True).orderBy("rank").collect()]
    assert [u for u, _ in full] == [u for u, _ in wand]
    for (_, a), (_, b) in zip(full, wand):
        assert a == pytest.approx(b, abs=1e-9)


def test_resume_skips_completed_stages(spark, tiny_pages, index_path):
    """Re-running the build on the same input is a no-op (manifest hit)."""
    before = os.path.getmtime(os.path.join(index_path, "_MANIFEST.json"))
    m = build_compressed_index(tiny_pages, index_path, CFG, doc_col="url", text_col="text")
    after = os.path.getmtime(os.path.join(index_path, "_MANIFEST.json"))
    assert before == after  # nothing rewritten
    assert all(m["stages"][s]["complete"] for s in ("doc_dim", "term_stats", "corpus", "postings"))


def test_resume_rebuilds_missing_stage(spark, tiny_pages, index_path):
    """Marking one stage incomplete rebuilds exactly that stage."""
    mf = os.path.join(index_path, "_MANIFEST.json")
    with open(mf) as f:
        m = json.load(f)
    m["stages"]["postings"]["complete"] = False
    with open(mf, "w") as f:
        json.dump(m, f)
    doc_dim_mtime = os.path.getmtime(os.path.join(index_path, "doc_dim", "_SUCCESS"))
    m2 = build_compressed_index(tiny_pages, index_path, CFG, doc_col="url", text_col="text")
    assert m2["stages"]["postings"]["complete"]
    # doc_dim untouched
    assert os.path.getmtime(os.path.join(index_path, "doc_dim", "_SUCCESS")) == doc_dim_mtime


def test_resume_after_interrupt_equals_fresh_build(spark, tiny_pages, index_path, tmp_path):
    """Kill-and-resume equivalence (SURVEY §5.3.4): wipe the artifacts of
    the stages 'in flight' at the simulated crash, resume, and require the
    resumed index to answer queries identically to the uninterrupted one."""
    import shutil

    from search_engine_spark.functions.tokenize import query_tokens_py

    path2 = str(tmp_path / "interrupted")
    build_compressed_index(tiny_pages, path2, CFG, doc_col="url", text_col="text")
    # simulate a crash mid-way: postings + term_stats never committed
    mf = os.path.join(path2, "_MANIFEST.json")
    with open(mf) as f:
        m = json.load(f)
    for stage in ("postings", "term_stats"):
        m["stages"][stage]["complete"] = False
    with open(mf, "w") as f:
        json.dump(m, f)
    shutil.rmtree(os.path.join(path2, "postings"))
    shutil.rmtree(os.path.join(path2, "term_stats"))

    m2 = build_compressed_index(tiny_pages, path2, CFG, doc_col="url", text_col="text")
    assert all(m2["stages"][s]["complete"] for s in ("doc_dim", "term_stats", "corpus", "postings"))

    a = CompressedIndex(spark, index_path, CFG)
    b = CompressedIndex(spark, path2, CFG)
    for q in ["w0000 w0001", "xylophonium", "ubiquitone"]:
        toks = query_tokens_py(q)
        ra = [(r["doc_id"], r["score"]) for r in a.search_topk(toks).orderBy("rank").collect()]
        rb = [(r["doc_id"], r["score"]) for r in b.search_topk(toks).orderBy("rank").collect()]
        assert ra == rb, q


def test_input_change_invalidates_manifest(spark, tiny_pages, tmp_path):
    path = str(tmp_path / "cidx2")
    sub = tiny_pages.limit(40)
    m1 = build_compressed_index(sub, path, CFG, doc_col="url", text_col="text")
    d1 = m1["input_digest"]
    sub2 = tiny_pages.limit(50)
    m2 = build_compressed_index(sub2, path, CFG, doc_col="url", text_col="text")
    assert m2["input_digest"] != d1
    assert all(m2["stages"][s]["complete"] for s in ("doc_dim", "term_stats", "corpus", "postings"))


def test_wand_identical_on_skewed_corpus_with_active_pruning(spark, tmp_path):
    """The base corpus never prunes (iid docs -> flat block maxima), so the
    suite's other WAND tests exercise the fallback path. The site-structured
    skewed corpus prunes for real; assert (a) pruning is ACTIVE for a topic
    query (kept < total surviving blocks) and (b) WAND stays result-identical
    through the partial/finalist/rescore pipeline it uniquely exercises."""
    from pyspark.sql import functions as F

    from search_engine_spark.sources.synth import synth_pages_skewed_df

    from collections import Counter

    from search_engine_spark.sources.synth import (
        SITE_PAGES,
        gen_skewed_page_record,
        synth_pages_skewed_df,
    )

    cfg = EngineConfig(block_size=16, index_partitions=8)
    path = str(tmp_path / "skewed_idx")
    n_sites = 8
    pages = synth_pages_skewed_df(spark, n_sites * SITE_PAGES)
    build_compressed_index(pages, path, cfg, doc_col="url", text_col="text")
    ci = CompressedIndex(spark, path, cfg)

    # multi-term theta only approaches sum(per-term maxima) when ONE doc
    # is near-max on every query term simultaneously — i.e. a tf-saturated
    # spam page. Find the fixture's spam-farm site (its pages draw from 8
    # focus terms, so distinct w-tokens <= 8) and query that page's top
    # tokens; off-topic sites' tf~1 blocks then fall below theta - slack.
    spam_page = None
    for s in range(n_sites):
        txt = gen_skewed_page_record(s * SITE_PAGES)["text"]
        w = [t for t in txt.split() if t.startswith("w") and len(t) == 5]
        if len(set(w)) <= 8:
            spam_page = w
            break
    assert spam_page is not None, "seed-42 fixture: spam site within 8 sites"
    # TWO terms: each spam page focuses 8 random terms of its topic's 32,
    # so ~5% of the farm's pages cover any given pair at tf~37 — enough
    # docs that theta(k=10) is a both-terms spam score, which prunes every
    # tf~1 tail block. A 3-term query's theta would be a 2-of-3 score
    # (too few pages focus all 3) and pruning would not trigger.
    query = [t for t, _ in Counter(spam_page).most_common(2)]

    # (a) pruning active: _wand_scores proceeds past every fallback (the
    # fallback paths return before the survivor-partials cache is set)
    ci._wand_scores(dict(Counter(query)), 10)
    assert getattr(ci, "_wand_cache", None) is not None
    ci._wand_cache.unpersist()
    ci._wand_cache = None

    # (b) result identity through the partial/finalist/rescore pipeline
    full = [
        (r["doc_id"], round(r["score"], 9))
        for r in ci.search_topk(query, use_wand=False).orderBy("rank").collect()
    ]
    wand = [
        (r["doc_id"], round(r["score"], 9))
        for r in ci.search_topk(query, use_wand=True).orderBy("rank").collect()
    ]
    assert full == wand and len(full) > 0
