"""Tokenization as native Catalyst expressions (JVM-side, codegen'd).

Reference semantics (service/build_text_index.py:106-111 index side,
service/text_search.py:110-123 query side):
    lower -> re.sub(r'[^\\w\\s]', ' ') -> split on whitespace
    index side additionally drops stopwords and tokens of length <= 1.

Python's ``\\w``/``\\s`` are unicode-aware; Java regex needs the ``(?U)``
flag for the same classes, so every pattern below carries it. Parity is
asserted in tests on unicode/punctuation edge cases (café, naïve, don't,
v1.2.3); if the JVM regex ever diverged, the fallback would be a pandas UDF
— so far parity holds (SURVEY.md §2.2 F3).

Stopword filtering is NOT done here: the pipeline filters post-explode with
a broadcast anti-join (hash lookup per row) instead of a 431-entry literal
scan per token — see operators/postings.py. ``index_tokens_col`` offers the
self-contained column variant for small/test use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from search_engine_spark.config import load_stopwords

# (?U) == UNICODE_CHARACTER_CLASS, matching Python's re semantics
PUNCT_PATTERN = r"(?U)[^\w\s]"
WS_PATTERN = r"(?U)\s+"


def tokens_col(text: Column) -> Column:
    """Raw tokens (query-side semantics): every non-empty token survives."""
    return F.filter(
        F.split(F.regexp_replace(F.lower(text), PUNCT_PATTERN, " "), WS_PATTERN),
        lambda t: t != F.lit(""),
    )


def index_tokens_col(text: Column, stopwords: frozenset[str] | None = None) -> Column:
    """Index-side tokens as a single column expression (len>1, no stopwords).

    Uses a literal array membership test — O(|stopwords|) per token, fine for
    tests and small jobs; the production postings build uses the broadcast
    anti-join instead.
    """
    stop = sorted(stopwords if stopwords is not None else load_stopwords())
    stop_arr = F.array(*[F.lit(s) for s in stop])
    return F.filter(
        tokens_col(text),
        lambda t: (F.length(t) > 1) & ~F.array_contains(stop_arr, t),
    )


def query_tokens_py(query: str) -> list[str]:
    """Driver-side query tokenization (queries are tiny; reference F4)."""
    from search_engine_spark.oracle.pyref import oracle_tokenize_query

    return oracle_tokenize_query(query)
