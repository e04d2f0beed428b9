"""Crawl-frontier operators: URL normalization vs urllib, validity
predicate, BFS frontier rounds, crawl metrics."""

from __future__ import annotations

from urllib.parse import urldefrag, urljoin

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.crawl import (
    crawl_metrics,
    frontier_round,
    normalize_url_udf,
    valid_url_col,
)

BASE = "https://site.example/docs/page.html"
HREFS = [
    "other.html",
    "/abs/path.html",
    "../up.html",
    "https://site.example/x.html#frag",
    "page.html#sec",
    "mailto:someone@example.com",
    "image.PNG",
    "",
]


def test_normalize_matches_urllib(spark):
    df = spark.createDataFrame([(BASE, h) for h in HREFS], "base string, href string")
    got = [r["u"] for r in df.select(normalize_url_udf("base", "href").alias("u")).collect()]
    want = [urldefrag(urljoin(BASE, h)).url for h in HREFS]
    assert got == want


def test_valid_url_predicate(spark):
    rows = [
        ("https://site.example/a.html", True),
        ("https://site.example/img.png", False),   # extension blocklist
        ("https://other.example/a.html", False),   # wrong domain
        ("mailto:x@example.com", False),           # scheme
        ("https://site.example/style.CSS", False), # case-insensitive ext
        ("", False),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [
        r["ok"]
        for r in df.select(valid_url_col(F.col("url"), "https://site.example").alias("ok")).collect()
    ]
    assert got == [ok for _, ok in rows]


def test_frontier_bfs_round(spark):
    links = spark.createDataFrame(
        [
            ("https://s.example/a", "b.html"),
            ("https://s.example/a", "c.html#x"),
            ("https://s.example/b", "c.html"),
            ("https://s.example/b", "mailto:z"),
            ("https://s.example/z", "unreached.html"),
        ],
        "src_url string, href string",
    )
    frontier = spark.createDataFrame([("https://s.example/a",), ("https://s.example/b",)], "url string")
    visited = spark.createDataFrame([("https://s.example/a",), ("https://s.example/c.html",)], "url string")
    got = sorted(r["url"] for r in frontier_round(links, frontier, visited, "https://s.example").collect())
    # b.html new; c.html already visited; mailto filtered; z's link unreachable
    assert got == ["https://s.example/b.html"]


def test_crawl_metrics(spark):
    df = spark.createDataFrame(
        [(1000, 0.2), (3000, 0.4), (2000, 0.6)], "size long, request_time double"
    )
    r = crawl_metrics(df).collect()[0]
    assert r["n_pages"] == 3
    assert r["avg_page_size"] == pytest.approx(2000.0)
    assert r["total_bytes"] == 6000
    assert r["avg_request_time"] == pytest.approx(0.4)
