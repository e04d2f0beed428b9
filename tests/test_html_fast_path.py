"""Differential tests for the regex fast path in html_extract.

The contract is EXACTNESS: for every input, extract_text_py (fast path +
parser fallback) must equal the pure html.parser path byte-for-byte. The
fast path is allowed to bail (return None) — never to differ.

Reference extraction semantics: service/build_text_index.py:113-128
(BeautifulSoup get_text contract, reproduced by the parser path; see
html_extract module docstring).
"""

from __future__ import annotations

import random

import pytest

from search_engine_spark.functions.html_extract import (
    _fast_extract,
    _parser_extract,
    extract_text_py,
)

HAND_CASES = [
    '<html><head><title>T</title><script>junk(); var x = 1 &amp;&amp; 2;'
    "</script><style>.x{color:red}</style></head><body><h1>H</h1>"
    "<p>body text</p><!-- comment ignored --></body></html>",
    "a<!--c-->b",
    "a<b>c",
    "a&amp;b",
    "x &lt;tag&gt; y",
    '<a href="x>y">link</a>t',
    "<a href='q>z'>l</a>",
    "<p class=\"a\" id='b'>t</p>",
    "plain text only",
    "",
    "<script>a</script>rest",
    "<SCRIPT>x</SCRIPT>ok",
    '<script src="a">b</script>c',
    "<p>a<br/>b</p>",
    "broken < tag",
    "<",
    "a<![CDATA[x]]>b",
    "<?php echo 1 ?>x",
    "<!DOCTYPE html><p>d</p>",
    "<script>unclosed",
    "text &notareal; entity",
    "&#65;&#x42;c",
    "&nbsp;pad&nbsp;",
    'Mr. &quot;Q&quot;',
    '<p title="a<b">t</p>',
    "<style>p{}</style><p>s</p>",
    '<script>var s = "</scr" + "ipt>";</script>after',
    "<div>a<div>b</div></div>",
    "<em>e</em>\n\t<strong>s</strong>",
    "<p>&amp;amp;</p>",
    "<br>a<hr>b",
    "<p >sp</p >",
    "</p>orphan",
    "a &#; b",
    "&",
    "a&&b",
    "<script></script><p>x</p>",
    "<title>T&amp;T</title>body",
    "<!-->",
    "<!--->x",
    "<scripty>s</scripty>",
    "</ script>",
    "<script >x</ script>y</script>z",
    "</script foo>",
    "</scriptX>",
    "<script>x</script foo>y</script>z",
    '<script a="</script>">x',
    "<script>a<script>b</script>c</script>",
    "café <p>naïve</p> İstanbul",
]

FRAGS = [
    "<p>", "</p>", "text", " ", "&amp;", "<script>", "</script>",
    '<script a="</script>">', '<script src="u">', "x>y", '<a href="u">',
    "</a>", "<!--", "-->", "<br/>", "&#65;", '"', "'", "<", ">", "&nbsp;",
    "<style>", "</style>", "z", "\n", '<b c="k">', "<img src=u>",
    '<script>v="</scr"+"ipt>"</script>', "<!-->", "<SCRIPT >", "</SCRIPT>",
    '<style a=">">', "w", "<script>a<script>b</script>c</script>", "<p =>",
    "<a b='c'>", "<scripty>s</scripty>", "<x y'>", "</ script>",
    "<script >x</ script>y", "</script foo>", "</scriptX>", "</ScRiPt  >",
    "<script>x</script foo>y</script>z",
]

SOUP_ALPHABET = "<>/!-\"'&;ab s\tp#xcript styleSCRIPT="

# Adversarial corpus (VERDICT r03 #5: bs4 is uninstallable here, so parity
# hardening is differential vs the stdlib parser on the constructs where
# HTML dialects disagree): malformed markup, entity/charref edges, CDATA,
# conditional comments, nested/overlapping script-style, tag soup.
ADVERSARIAL_CASES = [
    # html.parser ends comments at '--\s*>' (_markupbase._commentclose),
    # not just '-->' — regression for the fast-path fix
    "<!-- < > -- >still comment? -->tail",
    "<!-- -- >x",
    "<!-- a --  >b",
    "<!----->y",
    "<!-- nested <!-- comment -->out",
    # comment/script literal INSIDE an unclosed tag: span removal must not
    # glue a fake tag from the '<' before and '>' after (regression)
    "<a<!--x!-->!--  >",
    "<a<!--x-->",
    "<p <script>a</script>>b",
    # conditional comments
    "<!--[if IE]>old ie<![endif]-->after",
    "<!--[if !IE]><p>not ie</p><![endif]-->x",
    # CDATA (html.parser exposes it as unknown decl; fast path must bail)
    "a<![CDATA[<p>hidden</p>]]>b",
    "a<![CDATA[unterminated",
    # nested / overlapping script-style
    "<style><script>alert(1)</script></style>visible",
    "<script><style>p{}</style></script>shown",
    "<script>/* </style> inside script */</script>v",
    "<script type='text/javascript'>if (a<b && b>c) {}</script>code",
    "<script defer async>x</script>y",
    "<STYLE TYPE='text/css'>c</STYLE>u",
    "<style\n>css</style>t",
    # entity / charref edges
    "&#x110000;over &#xD800;surrogate &#0;nul",
    "&copy no-semi &ampx &unknown;",
    "&#38;#60;double",
    "&amp;amp;&AMP;&aMp;",
    # malformed tags and attributes
    "<p\nclass='x'\nid='y'>multi\nline</p>",
    "<p/ >selfclose</p>",
    "</p attr='x'>weirdclose",
    "<p title='unclosed>t</p>",
    "<div data-x='<'>angle attr</div>",
    "<!DOCTYPE <p>bogus</p>",
    "<?xml version='1.0'?><p>pi</p>",
    "a\x00b<p>null</p>",
    "<p>ok</p><script>trailing",
]

# Constructs where the fast path MUST be conservative (bail to the parser):
# verified suspicious shapes it cannot bound exactly.
MUST_BAIL = [
    "a<![CDATA[<p>hidden</p>]]>b",   # markup hidden inside CDATA
    "a<![CDATA[unterminated",
    "<?xml version='1.0'?><p>pi</p>",  # processing instruction
    "<!DOCTYPE <p>bogus</p>",          # bogus declaration
    "<p title='unclosed>t</p>",        # quote/angle ambiguity
    "<div data-x='<'>angle attr</div>",
    "<p>ok</p><script>trailing",       # unterminated CDATA element
    "<script>unclosed",
    "<!--unterminated",
    "</script>stray end tag",
    "<a<!--x-->",                      # construct inside an open tag
    "<!-->",                           # degenerate comments
    "<!--->x",
]


def test_hand_cases_exact():
    for c in HAND_CASES:
        fast = _fast_extract(c)
        slow = _parser_extract(c)
        if fast is not None:
            assert fast == slow, c
        assert extract_text_py(c) == slow, c


def test_adversarial_cases_exact():
    """Every adversarial construct: fast path equals the parser when it
    engages, and extract_text_py always equals the parser."""
    for c in ADVERSARIAL_CASES:
        slow = _parser_extract(c)
        fast = _fast_extract(c)
        if fast is not None:
            assert fast == slow, c
        assert extract_text_py(c) == slow, c


def test_fast_path_is_conservative_on_suspicious_constructs():
    """Any construct the regex model can't bound exactly must route to the
    parser — never produce its own (possibly divergent) answer."""
    for c in MUST_BAIL:
        assert _fast_extract(c) is None, f"fast path should bail on {c!r}"


def test_adversarial_fragment_fuzz_exact():
    """Recombination fuzz over the adversarial alphabet (comment-close
    variants, unclosed tags, CDATA, PIs): exactness whenever the fast path
    engages."""
    frags = [
        "<!--", "-- >", "-->", "--  >", "a", " ", "<p>", "</p>", "<!--x",
        "-- -", "<", ">", "!", "-", "<a", "<script>", "</script>",
        "<style>", "</style>", "&amp;", "&#65;", "'", '"', "=",
        "<a href='u'>", "<p =>", "<script >x</ script>y", "<![CDATA[",
        "]]>", "<!DOCTYPE", "?>", "<?",
    ]
    rng = random.Random(5)
    diffs, hits = [], 0
    for _ in range(8000):
        c = "".join(rng.choices(frags, k=rng.randint(1, 16)))
        fast = _fast_extract(c)
        if fast is None:
            continue
        hits += 1
        if fast != _parser_extract(c):
            diffs.append(c)
    assert not diffs, diffs[:3]
    assert hits > 500  # the fast path must still engage often enough


@pytest.mark.parametrize("seed", [37, 41])
def test_fragment_fuzz_exact(seed):
    rng = random.Random(seed)
    diffs = []
    for _ in range(4000):
        c = "".join(rng.choices(FRAGS, k=rng.randint(1, 22)))
        fast = _fast_extract(c)
        if fast is None:
            continue
        if fast != _parser_extract(c):
            diffs.append(c)
    assert not diffs, diffs[:3]


def test_char_soup_fuzz_exact():
    rng = random.Random(101)
    diffs = []
    for _ in range(4000):
        c = "".join(rng.choices(SOUP_ALPHABET, k=rng.randint(0, 70)))
        fast = _fast_extract(c)
        if fast is None:
            continue
        if fast != _parser_extract(c):
            diffs.append(c)
    assert not diffs, diffs[:3]


def test_synth_corpus_hits_fast_path_and_matches():
    from search_engine_spark.sources.synth import (
        gen_page_record,
        gen_skewed_page_record,
    )

    rows = [gen_page_record(i, 500) for i in range(500)]
    rows += [gen_skewed_page_record(i) for i in range(200)]
    for r in rows:
        h = r["html"]
        if not isinstance(h, str):
            h = bytes(h).decode("utf-8", errors="replace")
        fast = _fast_extract(h)
        assert fast is not None, f"fast path bailed on synth page {r['url']}"
        assert fast == _parser_extract(h) == r["text"]


def test_bytes_and_none_inputs():
    assert extract_text_py(None) == ""
    assert extract_text_py(b"<p>bytes</p>") == "bytes"
    assert extract_text_py(b"\xff<p>bad utf8</p>") == _parser_extract(
        b"\xff<p>bad utf8</p>".decode("utf-8", errors="replace")
    )
