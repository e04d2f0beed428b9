"""Crawl-frontier operators — the reference crawler's data operations
re-expressed as DataFrame transforms (the HTTP fetching itself is out of
engine scope; the corpus arrives as a table, SURVEY.md §2.1 S4).

- URL normalization (C5, reference service/scrape_web.py:273-295): resolve
  relative hrefs against the page url (urljoin), strip fragments —
  vectorized pandas UDF over urllib (pure stdlib string work).
- URL validity predicate (F8, scrape_web.py:242-271): same-domain prefix,
  excluded path patterns, binary/media extension blocklist, scheme checks —
  native column predicates.
- Frontier round (E1, scrape_web.py:19,371-372): next frontier = distinct
  normalized out-links of the current frontier MINUS visited — a distinct +
  left-anti join per BFS round.
- Crawl metrics (A11, scrape_web.py:433-499): avg/total page sizes,
  avg request time — plain aggregations.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

EXCLUDED_EXTENSIONS = (
    ".pdf", ".jpg", ".jpeg", ".png", ".gif", ".svg", ".css", ".js",
    ".zip", ".tar", ".gz", ".mp4", ".mp3", ".ico", ".woff", ".woff2",
)
EXCLUDED_SCHEMES = ("mailto:", "javascript:", "tel:", "ftp:")


@pandas_udf(StringType())
def normalize_url_udf(base: pd.Series, href: pd.Series) -> pd.Series:
    """urljoin(base, href) with the fragment stripped (C5)."""
    from urllib.parse import urldefrag, urljoin

    out = []
    for b, h in zip(base, href):
        try:
            out.append(urldefrag(urljoin(b or "", h or "")).url)
        except ValueError:
            out.append("")
    return pd.Series(out)


def valid_url_col(url: Column, domain_prefix: str) -> Column:
    """F8: crawlable-url predicate as native column logic."""
    lower = F.lower(url)
    ok_scheme = ~sum(
        [lower.startswith(s).cast("int") for s in EXCLUDED_SCHEMES], F.lit(0)
    ).cast("boolean")
    ok_ext = ~sum(
        [lower.endswith(e).cast("int") for e in EXCLUDED_EXTENSIONS], F.lit(0)
    ).cast("boolean")
    return url.startswith(domain_prefix) & ok_scheme & ok_ext & (F.length(url) > 0)


def frontier_round(
    links: DataFrame,
    frontier: DataFrame,
    visited: DataFrame,
    domain_prefix: str,
) -> DataFrame:
    """One BFS round: out-links of the frontier, normalized, filtered,
    deduped, minus already-visited urls.

    links: (src_url, href); frontier/visited: (url). Scale: one broadcast
    (frontier is a round's worth of urls) + one anti-join per round; the
    visited side grows, so it stays the probe side of the anti-join.
    """
    out = (
        links.join(F.broadcast(frontier.withColumnRenamed("url", "src_url")), "src_url")
        .select(normalize_url_udf(F.col("src_url"), F.col("href")).alias("url"))
        .filter(valid_url_col(F.col("url"), domain_prefix))
        .distinct()
    )
    return out.join(visited, "url", "left_anti")


def crawl_metrics(pages: DataFrame, size_col: str = "size", time_col: str = "request_time") -> DataFrame:
    """A11: (n_pages, avg_page_size, total_bytes, avg_request_time)."""
    return pages.agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.avg(size_col).alias("avg_page_size"),
        F.sum(size_col).cast("long").alias("total_bytes"),
        F.avg(time_col).alias("avg_request_time"),
    )
