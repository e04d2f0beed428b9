"""HTML -> text extraction, byte-identical per url (the F1 invariant).

The reference extracts text with BeautifulSoup:
    soup = BeautifulSoup(html, 'html.parser')
    decompose all <script>/<style>; soup.get_text(' ', strip=True);
    re.sub(r'\\s+', ' ', text).strip()
(reference service/build_text_index.py:113-128).

bs4 is not installed in this environment, so the engine ships a stdlib
``html.parser`` extractor that reproduces the same contract:

- parse leniently, decode character/entity references (convert_charrefs)
- drop all text inside <script>/<style> subtrees
- ignore comments / doctype / processing instructions (bs4>=4.9 get_text
  ignores non-text NavigableStrings for HTML documents)
- strip each text node, drop empties, join with a single space
- collapse remaining whitespace runs to one space and trim

The synthetic `pages` fixture derives its ``text`` column from this exact
function, so the per-url invariant ``engine_extract(html) == text`` is
enforced end-to-end by tests. If bs4 is importable the test-suite
additionally cross-checks byte-identity against BeautifulSoup itself.

Execution: Arrow-vectorized pandas UDF (BinaryType -> StringType) — Python
is unavoidable here (HTML parsing), but batches move via Arrow, no per-row
Python serialization.
"""

from __future__ import annotations

import re
from html import unescape
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_WS_RE = re.compile(r"\s+")

# elements whose text content the reference removes entirely
_SKIPPED = ("script", "style")

# ---------------------------------------------------------------------------
# Fast path: regex extraction with an exact-fallback contract.
#
# HTMLParser.feed is a pure-Python state machine — the dominant cost of the
# corpus build's extraction stage. ``_fast_extract`` reproduces the parser's
# output for the common well-formed subset and returns None (-> parser
# fallback) the moment it sees a construct it does not model EXACTLY:
# any unconsumed '<', a stray/unterminated script/style/comment, a malformed
# start tag, '>' inside quoted attribute values, CDATA/PI/doctype, the
# '<!-->' empty-comment pathology, or Unicode whose lowercasing changes
# length. Comment and script/style spans are found with the parser's own
# state rules (comments end at the first '-->'; CDATA content ends only at
# a well-formed ``</\s*script\s*>`` — html.parser's endtagfind — anything
# else, e.g. '</script foo>', is CDATA data and stays inside the block).
# Differentially fuzzed against the parser on 120k adversarial fragment
# soups (0 diffs) plus byte-identity over the full synthetic corpus; see
# tests/test_html_fast_path.py. Measured 1.3x on 1.5 KB synthetic pages and
# 4.3x on 60 KB pages.
# ---------------------------------------------------------------------------
_ATTRS = r"""(?:\s+[^\s<>=/"'][^\s<>=/]*(?:\s*=\s*(?:"[^"<>]*"|'[^'<>]*'|[^\s<>"'`=]+))?)*\s*/?\s*"""
_TAG_RE = re.compile(r"</?[a-zA-Z][a-zA-Z0-9:._-]*" + _ATTRS + r">")
_OPEN_RE = re.compile(r"(?is)<(?:script|style)" + _ATTRS + r">")
_CDATA_END = {
    "s": re.compile(r"(?i)</\s*script\s*>"),
    "y": re.compile(r"(?i)</\s*style\s*>"),
}
_COMMENT_CLOSE = re.compile(r"--\s*>")  # == _markupbase._commentclose
_TAGNEXT = " \t\n\r\f\v/>"


def _fast_extract(html: str) -> str | None:
    """Parser-identical extraction for well-formed HTML; None = use parser."""
    if "<!-->" in html or "<!--->" in html:
        return None
    hl = html.lower()
    n = len(html)
    if len(hl) != n:  # lowercasing changed length (e.g. 'İ') — spans unsafe
        return None
    spans: list[tuple[int, int]] = []
    i = 0
    while True:
        best, kind = -1, ""
        for lit, k in (
            ("<!--", "c"),
            ("<script", "s"),
            ("<style", "y"),
            ("</script", "e"),
            ("</style", "e"),
        ):
            p = hl.find(lit, i)
            if k in ("s", "y"):
                # must be a real start tag: name boundary after the literal
                while p != -1 and p + len(lit) < n and hl[p + len(lit)] not in _TAGNEXT:
                    p = hl.find(lit, p + 1)
            if p != -1 and (best == -1 or p < best):
                best, kind = p, k
        if best == -1:
            break
        # conservative: the construct must start in a TEXT position. If the
        # last '<' before it is never closed by a '>', html.parser would lex
        # the construct as tag soup inside that open tag (e.g. '<a<!--x-->')
        # — and span removal here could even glue a FAKE tag together from
        # the '<' before and a '>' after the span. Any doubt -> parser.
        lt = html.rfind("<", i, best)
        if lt != -1 and html.find(">", lt, best) == -1:
            return None
        if kind == "e":
            return None  # stray end tag in text position
        if kind == "c":
            # html.parser (_markupbase._commentclose) ends a comment at
            # '--\s*>' — '-- >' terminates it too, not just literal '-->'
            cm = _COMMENT_CLOSE.search(html, best + 4)
            if cm is None:
                return None  # unterminated comment
            spans.append((best, cm.end()))
            i = cm.end()
            continue
        om = _OPEN_RE.match(html, best)
        if om is None:
            return None  # start tag we can't bound exactly
        em = _CDATA_END[kind].search(html, om.end())
        if em is None:
            return None  # unterminated CDATA block
        spans.append((best, em.end()))
        i = em.end()
    if spans:
        out, prev = [], 0
        for a, b in spans:
            out.append(html[prev:a])
            prev = b
        out.append(html[prev:])
        s = " ".join(out)
    else:
        s = html
    parts = []
    for seg in _TAG_RE.split(s):
        if "<" in seg:
            return None  # a '<' no modeled construct consumed
        st = unescape(seg).strip()
        if st:
            parts.append(st)
    return _WS_RE.sub(" ", " ".join(parts)).strip()


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip_depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:  # noqa: ANN001
        if tag in _SKIPPED:
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIPPED and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth:
            return
        stripped = data.strip()
        if stripped:
            self.parts.append(stripped)


def _parser_extract(html: str) -> str:
    """The html.parser reference path (always available as the fallback)."""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return _WS_RE.sub(" ", " ".join(p.parts)).strip()


def extract_text_py(html: bytes | str | None) -> str:
    """Single-value extraction (used by the fixture generator and tests)."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    fast = _fast_extract(html)
    if fast is not None:
        return fast
    return _parser_extract(html)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    """Vectorized extraction: binary html column -> extracted text column."""
    return html.map(extract_text_py)


class _TitleExtractor(HTMLParser):
    """<title> text, falling back to the first <h1> (reference
    scrape_web.py:127-134 extract_title semantics)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._stack: list[str] = []
        self.title: str | None = None
        self.h1: str | None = None

    def handle_starttag(self, tag, attrs) -> None:  # noqa: ANN001
        if tag in ("title", "h1"):
            self._stack.append(tag)

    def handle_endtag(self, tag) -> None:  # noqa: ANN001
        if self._stack and self._stack[-1] == tag:
            self._stack.pop()

    def handle_data(self, data: str) -> None:
        if not self._stack:
            return
        top = self._stack[-1]
        if top == "title" and self.title is None:
            self.title = data.strip()
        elif top == "h1" and self.h1 is None:
            self.h1 = data.strip()


def extract_title_py(html: bytes | str | None) -> str:
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _TitleExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return p.title or p.h1 or ""


@pandas_udf(StringType())
def extract_title_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_title_py)


class _FeatureCounter(HTMLParser):
    """Structural page features (reference service/scrape_web.py:790-826 content
    heuristics): header/code-block/outbound-link counts + text length."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self.headers = 0
        self.code_blocks = 0
        self.links = 0
        self.text_len = 0

    def handle_starttag(self, tag, attrs) -> None:  # noqa: ANN001
        if tag in _SKIPPED:
            self._skip += 1
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self.headers += 1
        elif tag in ("code", "pre"):
            self.code_blocks += 1
        elif tag == "a" and any(k == "href" for k, _ in attrs):
            self.links += 1

    def handle_endtag(self, tag) -> None:  # noqa: ANN001
        if tag in _SKIPPED and self._skip > 0:
            self._skip -= 1

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self.text_len += len(data.strip())


def extract_page_features_py(html: bytes | str | None) -> tuple[int, int, int, int]:
    """(content_length, headers_count, code_blocks, outbound_links)."""
    if html is None:
        return (0, 0, 0, 0)
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _FeatureCounter()
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass
    return (p.text_len, p.headers, p.code_blocks, p.links)


PAGE_FEATURES_SCHEMA = (
    "content_length int, headers_count int, code_blocks int, outbound_links int"
)


def with_page_features(df, html_col: str = "html"):
    """df + struct column ``features`` of structural page counts — feeds
    the A6 document-weight formula straight from raw HTML (no crawler)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        IntegerType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("content_length", IntegerType()),
            StructField("headers_count", IntegerType()),
            StructField("code_blocks", IntegerType()),
            StructField("outbound_links", IntegerType()),
        ]
    )

    @pandas_udf(schema)
    def feats(html: pd.Series) -> pd.DataFrame:
        rows = [extract_page_features_py(h) for h in html]
        return pd.DataFrame(
            rows, columns=["content_length", "headers_count", "code_blocks", "outbound_links"]
        )

    return df.withColumn("features", feats(F.col(html_col)))
