"""HTML extraction byte-identity invariant + title extraction + salted
aggregation equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.functions.html_extract import (
    extract_text_py,
    extract_text_udf,
    extract_title_py,
    extract_title_udf,
)
from search_engine_spark.operators.skew import (
    head_keys,
    salted_collect_list,
    salted_count_distinct,
)

EDGE_HTML = [
    b"<html><head><title>T</title><script>var x=1;</script><style>.a{}</style></head><body><p>hello  world</p></body></html>",
    b"<p>a<b>b</b>c</p>",                              # adjacent inline text
    b"<p>ent &amp; ities &lt;ok&gt; &#65;</p>",        # charrefs decoded
    b"<div>keep</div><!-- comment gone --><div>this</div>",
    b"<script>only script</script>",                   # empty after skip
    b"",                                               # empty doc
    b"<p>unclosed <div>nested",                        # lenient parsing
    b"<body>caf\xc3\xa9 na\xc3\xafve</body>",          # utf-8
    b"<style>bad { <p>not text</p> } </style><p>real</p>",
]

EXPECTED = [
    "T hello world",
    "a b c",
    "ent & ities <ok> A",
    "keep this",
    "",
    "",
    "unclosed nested",
    "café naïve",
    "real",
]


def test_extract_text_unit_cases():
    for html, want in zip(EDGE_HTML, EXPECTED):
        assert extract_text_py(html) == want, html


def test_extract_text_udf_matches_python(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(EDGE_HTML)], "id int, html binary"
    )
    rows = df.select("id", extract_text_udf(F.col("html")).alias("t")).orderBy("id").collect()
    for r in rows:
        assert r["t"] == extract_text_py(EDGE_HTML[r["id"]])


def test_per_url_byte_identity_invariant(tiny_pages):
    """input_hint invariant: engine_extract(html) == text for every url."""
    mismatches = (
        tiny_pages.select(
            "url", "text", extract_text_udf(F.col("html")).alias("extracted")
        )
        .filter(F.col("text") != F.col("extracted"))
        .count()
    )
    assert mismatches == 0


@pytest.mark.skipif(
    not pytest.importorskip("importlib").util.find_spec("bs4"),
    reason="bs4 not installed in this environment",
)
def test_extraction_matches_bs4_if_available(tiny_pages):
    """When bs4 exists, cross-check byte-identity against BeautifulSoup."""
    import re

    from bs4 import BeautifulSoup

    for r in tiny_pages.select("url", "html").limit(30).collect():
        soup = BeautifulSoup(bytes(r["html"]).decode("utf-8"), "html.parser")
        for el in soup(["script", "style"]):
            el.decompose()
        want = re.sub(r"\s+", " ", soup.get_text(" ", strip=True)).strip()
        assert extract_text_py(r["html"]) == want, r["url"]


def test_extract_title():
    assert extract_title_py(b"<title>My Title</title><h1>H</h1>") == "My Title"
    assert extract_title_py(b"<body><h1>Fallback H1</h1></body>") == "Fallback H1"
    assert extract_title_py(b"<p>nothing</p>") == ""


def test_extract_title_udf(tiny_pages):
    rows = tiny_pages.select("url", extract_title_udf(F.col("html")).alias("t")).limit(10).collect()
    for r in rows:
        assert r["t"].startswith("Synth page "), r


def test_page_features(spark):
    from search_engine_spark.functions.html_extract import (
        extract_page_features_py,
        with_page_features,
    )

    html = (
        b"<html><head><title>T</title><script>x()</script></head><body>"
        b"<h1>a</h1><h2>b</h2><h3>c</h3><pre><code>z</code></pre>"
        b'<a href="/x">l1</a><a href="/y">l2</a><a>no-href</a><p>body text</p></body></html>'
    )
    cl, h, c, l = extract_page_features_py(html)
    assert h == 3
    assert c == 2  # pre + code
    assert l == 2  # only href'd anchors
    assert cl > 0  # script text excluded
    df = spark.createDataFrame([(1, html)], "id int, html binary")
    r = with_page_features(df).select("features.*").collect()[0]
    assert (r["headers_count"], r["code_blocks"], r["outbound_links"]) == (3, 2, 2)


def test_page_features_feed_doc_weight(spark, tiny_pages):
    """C8 -> A6: weights computed straight from raw HTML features."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.html_extract import with_page_features
    from search_engine_spark.operators.graph import doc_rank_score_col

    feats = with_page_features(tiny_pages.limit(20))
    weighted = feats.select(
        "url",
        doc_rank_score_col(
            F.lit(None).cast("double"), F.lit(0.5), F.lit(1.0),
            F.col("features.content_length"), F.col("features.code_blocks"),
            F.col("features.outbound_links"),
        ).alias("w"),
    ).collect()
    assert all(0.1 <= r["w"] <= 2.0 for r in weighted)


def test_salted_collect_list_equivalence(spark):
    df = spark.createDataFrame(
        [(i % 3, f"v{i:03d}") for i in range(300)], "k int, v string"
    )
    plain = {
        r["k"]: sorted(r["vs"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("vs")).collect()
    }
    salted = {
        r["k"]: list(r["values"])
        for r in salted_collect_list(df, "k", "v", salt_buckets=8).collect()
    }
    assert plain == salted


def test_salted_count_distinct_equivalence(spark):
    df = spark.createDataFrame(
        [(i % 5, f"v{i % 37}") for i in range(1000)], "k int, v string"
    )
    plain = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    salted = {r["k"]: r["n_distinct"] for r in salted_count_distinct(df, "k", "v").collect()}
    assert plain == salted


def test_head_keys(spark):
    df = spark.createDataFrame(
        [(("hot" if i % 10 else "cold"), i) for i in range(1000)], "k string, v int"
    )
    hot = [r["k"] for r in head_keys(df, "k", threshold=500).collect()]
    assert hot == ["hot"]


# ------------------------------------------------ skewed (site-structured) corpus


def test_skewed_corpus_deterministic_and_site_structured(spark):
    """The WAND-regime fixture is a pure function of page_id (identical at
    any parallelism) and actually carries the structure it promises:
    contiguous-id sites sharing a topic vocabulary, and spam-farm sites
    whose pages are tf-saturated repeats of few topic terms."""
    from search_engine_spark.sources.synth import (
        SITE_PAGES,
        gen_skewed_page_record,
        synth_pages_skewed_df,
    )

    a = synth_pages_skewed_df(spark, 1100, partitions=2).collect()
    b = synth_pages_skewed_df(spark, 1100, partitions=7).collect()
    assert sorted(r["url"] for r in a) == sorted(r["url"] for r in b)
    ta = {r["url"]: r["text"] for r in a}
    tb = {r["url"]: r["text"] for r in b}
    assert ta == tb  # partitioning-independent
    # local record function agrees with the distributed one
    rec = gen_skewed_page_record(17)
    assert ta[rec["url"]] == rec["text"]
    # urls sort by site, sites are SITE_PAGES contiguous ids
    assert rec["url"].startswith(f"https://site{17 // SITE_PAGES:06d}.example/")
    # same-site pages share a topic vocabulary: the w-token sets of two
    # pages of one site overlap far more than pages of different sites
    def wtoks(pid):
        return {t for t in gen_skewed_page_record(pid)["text"].split() if t.startswith("w") and len(t) == 5}

    same = len(wtoks(0) & wtoks(1))
    cross = max(
        len(wtoks(0) & wtoks(SITE_PAGES * s + 1)) for s in (1, 2)
    )
    assert same > cross
