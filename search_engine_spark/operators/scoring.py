"""Weighted BM25 scoring + top-k as DataFrame joins/aggregations.

Reference semantics being reproduced (utils/bm250kapi_weighted.py:56-71,
service/text_search.py:156-219):

    score(doc) = doc_weight * sum over query tokens q (WITH multiplicity) of
        idf(q) * tf * (k1+1) / (tf + k1*(1 - b + b*doc_len/avgdl))
    top_k by score (ties broken deterministically: score desc, doc_id asc),
    then strict ``score > min_score``.

Plan shape (SURVEY.md §3.2): query terms (a tiny DF, broadcast) inner-join
``postings`` on term -> join ``doc_stats`` -> hash-aggregate per doc ->
zero-pad -> TakeOrderedAndProject. The inner join makes the computation
sparse (only docs containing >=1 query term are touched) while the reference
scores every document densely; docs it never touches all have score
doc_weight*0 = 0, so sparse == dense EXCEPT when fewer than k docs match —
then the reference's top-k contains zero-score docs (J1-note). ``_zero_pad``
restores those rows only when needed, keeping the common path sparse.

Scale notes: the probe side (postings filtered to query terms) is the only
big relation; Catalyst broadcasts the <=100-row query-term set, the
aggregation is partially applied map-side, and top-k is
TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.corpus_stats import BM25Index


def query_terms_df(spark: SparkSession, tokens: list[str]) -> DataFrame:
    """(term, qtf) — query tokens aggregated with multiplicity (a repeated
    token contributes its BM25 term twice, utils/bm250kapi_weighted.py:64)."""
    counts = Counter(tokens)
    return spark.createDataFrame(
        [(t, int(c)) for t, c in sorted(counts.items())], schema="term string, qtf int"
    )


def score_query(index: BM25Index, tokens: list[str]) -> DataFrame:
    """Sparse per-doc scores for one tokenized query: (doc_id, score).

    Docs containing no query term are absent (implicit score 0).
    """
    spark = index.postings.sparkSession
    cfg = index.cfg
    qt = query_terms_df(spark, tokens)

    # terms unknown to the vocabulary contribute idf 0 (reference
    # ``idf.get(q) or 0``) — the inner join drops them, same result.
    q_idf = F.broadcast(qt).join(F.broadcast(index.term_stats.select("term", "idf")), "term")

    contrib = (
        index.postings.join(F.broadcast(q_idf), "term")
        .join(index.doc_stats, "doc_id")
        .select(
            "doc_id",
            "doc_weight",
            (
                F.col("qtf")
                * F.col("idf")
                * (F.col("tf") * (cfg.k1 + 1))
                / (
                    F.col("tf")
                    + cfg.k1 * (1 - cfg.b + cfg.b * F.col("doc_len") / F.lit(index.avgdl))
                )
            ).alias("part"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        (F.sum("part") * F.first("doc_weight")).alias("score")
    )


def _zero_pad(index: BM25Index, scored_topk: DataFrame, k: int) -> DataFrame:
    """If fewer than k docs matched, union zero-score docs (J1-note).

    Only runs the extra scan when the cheap count says it is needed; the
    padding rows are the smallest doc_ids not already present, score 0.0 —
    matching the dense reference ranking under the deterministic tie policy.
    """
    matched = scored_topk.limit(k).collect()
    if len(matched) >= k or index.corpus_size <= len(matched):
        return scored_topk
    spark = scored_topk.sparkSession
    have = [r["doc_id"] for r in matched]
    have_df = spark.createDataFrame(
        [(d,) for d in have], schema=scored_topk.select("doc_id").schema
    )
    pad = (
        index.doc_stats.join(F.broadcast(have_df), "doc_id", "left_anti")
        .select("doc_id", F.lit(0.0).alias("score"))
        .orderBy(F.col("doc_id").asc())
        .limit(k - len(have))
    )
    return scored_topk.unionByName(pad)


def search_topk(
    index: BM25Index,
    tokens: list[str],
    top_k: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """(rank, doc_id, score): top-k docs for a tokenized (already expanded)
    query, deterministic tie policy, strict min_score filter."""
    cfg = index.cfg
    k = top_k if top_k is not None else cfg.top_k
    ms = min_score if min_score is not None else cfg.min_score
    if not tokens:
        spark = index.postings.sparkSession
        return spark.createDataFrame([], schema="rank int, doc_id string, score double")

    scored = score_query(index, tokens)
    topk = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    padded = _zero_pad(index, topk, k)
    w = (
        padded.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
        .filter(F.col("score") > F.lit(ms))
    )
    from pyspark.sql.window import Window

    return w.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        ),
    ).select("rank", "doc_id", "score")
