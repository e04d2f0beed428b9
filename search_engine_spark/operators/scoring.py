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


def _local_df(spark: SparkSession, rows: list[tuple], schema) -> DataFrame:
    """Small driver-side relation via the Arrow/pandas path: a plain-list
    ``createDataFrame`` parallelizes to defaultParallelism slices, so even a
    10-row relation schedules 32 tasks per downstream scan (~0.3s/job on
    this box); the pandas path is one Arrow batch (~10x cheaper)."""
    import pandas as pd

    if not rows:
        return spark.createDataFrame([], schema=schema)
    names = (
        [f.name for f in schema.fields]
        if hasattr(schema, "fields")
        else [c.split()[0] for c in schema.split(",")]
    )
    return spark.createDataFrame(pd.DataFrame(rows, columns=names), schema=schema)


def query_terms_df(spark: SparkSession, tokens: list[str]) -> DataFrame:
    """(term, qtf) — query tokens aggregated with multiplicity (a repeated
    token contributes its BM25 term twice, utils/bm250kapi_weighted.py:64)."""
    counts = Counter(tokens)
    return _local_df(
        spark, [(t, int(c)) for t, c in sorted(counts.items())], "term string, qtf int"
    )


def _bm25_part(cfg, avgdl: float):
    """Per-posting BM25 contribution expression (needs qtf/idf/tf/doc_len)."""
    return (
        F.col("qtf")
        * F.col("idf")
        * (F.col("tf") * (cfg.k1 + 1))
        / (F.col("tf") + cfg.k1 * (1 - cfg.b + cfg.b * F.col("doc_len") / F.lit(avgdl)))
    ).alias("part")


def score_query(index: BM25Index, tokens: list[str]) -> DataFrame:
    """Sparse per-doc scores for one tokenized query: (doc_id, score).

    Docs containing no query term are absent (implicit score 0).

    Serving plan (scoring_postings present — the build_bm25_index default):
    scoring_postings ⋈ broadcast(query terms+idf) -> hash agg -> done. ONE
    shuffle (the doc_id agg), no doc_stats join: doc_len/doc_weight ride in
    the postings rows, paid once at build. The legacy 3-relation join is
    kept for hand-assembled indexes (streaming to_bm25_index).
    """
    spark = index.postings.sparkSession
    cfg = index.cfg

    # terms unknown to the vocabulary contribute idf 0 (reference
    # ``idf.get(q) or 0``) — they are simply absent from the lookup. The
    # idf lookup is a memoized <= |q|-row collect, so the main job's only
    # broadcast is a driver-built local relation (no broadcast-build
    # sub-job per query).
    counts = Counter(tokens)
    idfs = index.idf_lookup(sorted(counts))
    q_idf = _local_df(
        spark,
        [(t, int(c), idfs[t]) for t, c in sorted(counts.items()) if t in idfs],
        "term string, qtf int, idf double",
    )

    if index.scoring_postings is not None:
        contrib = index.scoring_postings.join(F.broadcast(q_idf), "term").select(
            "doc_id", "doc_weight", _bm25_part(cfg, index.avgdl)
        )
    else:
        contrib = (
            index.postings.join(F.broadcast(q_idf), "term")
            .join(index.doc_stats, "doc_id")
            .select("doc_id", "doc_weight", _bm25_part(cfg, index.avgdl))
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

    Scale shape: every per-query top-k here is TWO-LEVEL — a partial top-k
    per (query_id, shard) where shard = hash(doc_id) % P, then a final
    top-k over the <= k*P survivors per query. No reducer ever sees more
    than ~rows/P rows for one query (a head-term query matching 10^9 docs,
    or one OOV query padding against 10^12 doc_ids, is spread over P
    reducers), at the cost of one extra narrow window over k*P rows. The
    two levels agree exactly: the global k best of a partition-wise union
    of k-best sets is the global k best.
    """
    from pyspark.sql.window import Window

    cfg = index.cfg
    k = top_k if top_k is not None else cfg.top_k
    ms = min_score if min_score is not None else cfg.min_score
    spark = index.postings.sparkSession
    shards = max(int(spark.conf.get("spark.sql.shuffle.partitions", "32")), 1)

    qrows = []
    for qid, tokens in queries:
        for t, c in sorted(Counter(tokens).items()):
            qrows.append((qid, t, int(c)))
    if not qrows:
        doc_field = index.doc_stats.schema["doc_id"]
        from pyspark.sql.types import DoubleType, IntegerType, LongType, StructField, StructType

        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", LongType(), False),
                    StructField("rank", IntegerType(), False),
                    StructField("doc_id", doc_field.dataType, doc_field.nullable),
                    StructField("score", DoubleType(), False),
                ]
            ),
        )
    qt = _local_df(spark, qrows, "query_id long, term string, qtf int")

    if index.scoring_postings is not None:
        contrib = (
            index.scoring_postings.join(F.broadcast(qt), "term")
            .join(F.broadcast(index.term_stats.select("term", "idf")), "term")
            .select("query_id", "doc_id", "doc_weight", _bm25_part(cfg, index.avgdl))
        )
    else:
        contrib = (
            index.postings.join(F.broadcast(qt), "term")
            .join(F.broadcast(index.term_stats.select("term", "idf")), "term")
            .join(index.doc_stats, "doc_id")
            .select("query_id", "doc_id", "doc_weight", _bm25_part(cfg, index.avgdl))
        )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        (F.sum("part") * F.first("doc_weight")).alias("score")
    )
    shard = F.pmod(F.hash("doc_id"), F.lit(shards))
    w_local = Window.partitionBy("query_id", "_shard").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    topk = (
        scored.withColumn("_shard", shard)
        .withColumn("rn_l", F.row_number().over(w_local))
        .filter(F.col("rn_l") <= k)  # <= k*P rows per query survive level 1
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("_shard", "rn_l")
    )

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
    w_pad_local = Window.partitionBy("query_id", "_shard").orderBy(F.col("doc_id").asc())
    w_pad = Window.partitionBy("query_id").orderBy(F.col("doc_id").asc())
    pad = (
        F.broadcast(deficient)
        .crossJoin(index.doc_stats.select("doc_id"))
        .join(scored.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti")
        .withColumn("_shard", shard)
        .withColumn("rn_l", F.row_number().over(w_pad_local))
        .filter(F.col("rn_l") <= k)  # pad need is < k, so k per shard suffices
        .withColumn("rn", F.row_number().over(w_pad))
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
    topc = scored.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
    pad_plan = (
        index.doc_stats.join(scored.select("doc_id"), "doc_id", "left_anti")
        .select("doc_id", F.lit(0.0).alias("score"))
        .orderBy(F.col("doc_id").asc())
        .limit(k)  # k smallest unmatched ids always cover any pad need < k
    )
    if index.corpus_size > 0 and index.max_idf() <= 0 and index.min_doc_weight() >= 0:
        # no document can score > 0 (all floored idfs are <= 0), so the
        # dense zero-pad ALWAYS fires — run top-k and pad candidates as ONE
        # fused job (the `scored` subtree is shared via exchange reuse)
        # instead of collect-then-pad's two sequential jobs.
        top_rows = [
            (r["doc_id"], float(r["score"]))
            for r in topc.select("doc_id", "score").unionByName(pad_plan).collect()
        ]
    else:
        top_rows = [(r["doc_id"], float(r["score"])) for r in topc.collect()]
        positives = sum(1 for _, s in top_rows if s > 0.0)
        if positives < k and index.corpus_size > 0:
            top_rows += [(r["doc_id"], 0.0) for r in pad_plan.limit(k - positives).collect()]
    merged = sorted(top_rows, key=lambda x: (-x[1], x[0]))[:k]
    out = [
        (i + 1, d, s) for i, (d, s) in enumerate(merged) if s > ms
    ]
    return _local_df(spark, out, schema)
