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


def _result_schema(index: BM25Index):
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    doc_field = index.doc_stats.schema["doc_id"]
    return StructType(
        [
            StructField("rank", IntegerType(), False),
            StructField("doc_id", doc_field.dataType, doc_field.nullable),
            StructField("score", DoubleType(), False),
        ]
    )


def batch_search_topk(
    index: BM25Index,
    queries: list[tuple[int, list[str]]],
    top_k: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """(query_id, rank, doc_id, score): top-k for MANY queries in one plan.

    The batch shape is where the engine beats a serving loop: one broadcast
    of the (query_id, term, qtf) relation against postings, one hash
    aggregation keyed (query_id, doc_id), one rank window per query — k
    results per query regardless of batch size, entirely as DataFrame ops
    (no driver-side merging, unlike the single-query latency path).

    Dense semantics (J1-note) are preserved per query: queries with fewer
    than k positive-score matches are padded with the smallest unmatched
    doc_ids at score 0 via a per-deficient-query anti-join — never a full
    queries x docs cross join.
    """
    from pyspark.sql.window import Window

    cfg = index.cfg
    k = top_k if top_k is not None else cfg.top_k
    ms = min_score if min_score is not None else cfg.min_score
    spark = index.postings.sparkSession

    qrows = []
    for qid, tokens in queries:
        for t, c in sorted(Counter(tokens).items()):
            qrows.append((qid, t, int(c)))
    if not qrows:
        empty = spark.createDataFrame([], "query_id long, rank int, doc_id string, score double")
        return empty
    qt = spark.createDataFrame(qrows, "query_id long, term string, qtf int")

    contrib = (
        index.postings.join(F.broadcast(qt), "term")
        .join(F.broadcast(index.term_stats.select("term", "idf")), "term")
        .join(index.doc_stats, "doc_id")
        .select(
            "query_id",
            "doc_id",
            "doc_weight",
            (
                F.col("qtf") * F.col("idf") * (F.col("tf") * (cfg.k1 + 1))
                / (F.col("tf") + cfg.k1 * (1 - cfg.b + cfg.b * F.col("doc_len") / F.lit(index.avgdl)))
            ).alias("part"),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        (F.sum("part") * F.first("doc_weight")).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    topk = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)

    # per-query positive counts -> deficient queries need zero-padding
    pos = (
        topk.filter(F.col("score") > 0)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("npos"))
    )
    all_q = qt.select("query_id").distinct()
    deficient = (
        all_q.join(pos, "query_id", "left")
        .select("query_id", F.coalesce("npos", F.lit(0)).alias("npos"))
        .filter(F.col("npos") < k)
    )
    pad = (
        F.broadcast(deficient)
        .crossJoin(index.doc_stats.select("doc_id"))
        .join(scored.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti")
        .withColumn(
            "rn", F.row_number().over(Window.partitionBy("query_id").orderBy(F.col("doc_id").asc()))
        )
        .filter(F.col("rn") <= k - F.col("npos"))
        .select("query_id", "doc_id", F.lit(0.0).alias("score"))
    )
    merged = topk.select("query_id", "doc_id", "score").unionByName(pad)
    final = (
        merged.withColumn("rank", F.row_number().over(w))
        .filter((F.col("rank") <= k) & (F.col("score") > F.lit(ms)))
        .select("query_id", "rank", "doc_id", "score")
    )
    return final


def search_topk(
    index: BM25Index,
    tokens: list[str],
    top_k: int | None = None,
    min_score: float | None = None,
) -> DataFrame:
    """(rank, doc_id, score): top-k docs for a tokenized (already expanded)
    query — rank-identical to the reference's DENSE ranking under the
    deterministic tie policy, with a strict min_score filter.

    Dense semantics (J1-note): the reference scores every doc; docs
    containing no query term score exactly 0, which ranks ABOVE matched docs
    with negative scores (possible when average_idf < 0 pushes the epsilon
    floor negative) and fills out top-k when fewer than k docs match. The
    sparse plan reproduces this by collecting the k best matched docs, and —
    only when fewer than k of them score > 0 — fetching the (k - positives)
    smallest unmatched doc_ids as zero-score candidates (left-anti join +
    TakeOrdered), then merging the <= 2k candidate rows driver-side. The
    common case (k positive matches) stays a single distributed job.
    """
    cfg = index.cfg
    k = top_k if top_k is not None else cfg.top_k
    ms = min_score if min_score is not None else cfg.min_score
    spark = index.postings.sparkSession
    schema = _result_schema(index)
    if not tokens:
        return spark.createDataFrame([], schema=schema)

    scored = score_query(index, tokens)
    top_rows = [
        (r["doc_id"], float(r["score"]))
        for r in scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k).collect()
    ]
    positives = sum(1 for _, s in top_rows if s > 0.0)
    if positives < k and index.corpus_size > 0:
        pad_n = k - positives
        pad_rows = (
            index.doc_stats.join(scored.select("doc_id"), "doc_id", "left_anti")
            .select("doc_id")
            .orderBy(F.col("doc_id").asc())
            .limit(pad_n)
            .collect()
        )
        top_rows += [(r["doc_id"], 0.0) for r in pad_rows]
    merged = sorted(top_rows, key=lambda x: (-x[1], x[0]))[:k]
    out = [
        (i + 1, d, s) for i, (d, s) in enumerate(merged) if s > ms
    ]
    return spark.createDataFrame(out, schema=schema)
