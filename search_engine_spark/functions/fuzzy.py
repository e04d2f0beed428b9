"""Fuzzy term similarity: RapidFuzz ``fuzz.ratio`` replica (normalized Indel).

The reference scores query-term/vocabulary-term similarity with
``fuzz.ratio`` (reference service/text_search.py:80) — the normalized
**Indel** similarity (insert/delete only), NOT Levenshtein, so Spark's
built-in ``F.levenshtein`` cannot reproduce it. We compute
``200 * LCS(a,b) / (len(a)+len(b))`` in an Arrow-vectorized pandas UDF.
Terms are short (<40 chars), so the O(n*m) two-row LCS DP per pair is cheap;
batches arrive via Arrow so there is no per-row serialization overhead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _lcs_len(a: str, b: str) -> int:
    """LCS length, two-row DP (simple, correct; pairs are short strings)."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ca = a[i - 1]
        cj = cur  # local alias
        pj = prev
        for j in range(1, lb + 1):
            if ca == b[j - 1]:
                cj[j] = pj[j - 1] + 1
            else:
                x, y = cj[j - 1], pj[j]
                cj[j] = x if x >= y else y
        prev = cur
    return prev[lb]


def indel_ratio_py(a: str, b: str) -> float:
    la, lb = len(a), len(b)
    if la + lb == 0:
        return 100.0
    return 200.0 * _lcs_len(a, b) / (la + lb)


@pandas_udf(DoubleType())
def indel_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) pairwise Indel ratio."""
    return pd.Series(
        [indel_ratio_py(x or "", y or "") for x, y in zip(a, b)], dtype="float64"
    )
