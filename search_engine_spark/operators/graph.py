"""Link-graph operators: undirected edge dedup (E2), PageRank, degree
top-5 (A10), and the combined document rank score (A6).

Reference quirks reproduced faithfully:
- Edge dedup is direction-insensitive — A->B and B->A collapse to the
  FIRST-encountered edge (frozenset key, reference service/scrape_web.py:407-428).
- PageRank (scrape_web.py:939-978): contribution of edge (s,t,w) is
  damping * prev[s] * w / out_degree_COUNT(s) (count, not weighted sum);
  teleport (1-d)/n for every node; L1 convergence test; dangling mass is
  simply lost (no redistribution) — a quirk, kept.
- Document rank score (build_text_index.py:143-177): 1.0 when the doc has
  no rank fields at all; content-length 0 (or absent) gives the 0.5
  "unknown" normalized length, not 0.

Scale notes: each PageRank iteration is one shuffle (join on src + groupBy
dst); ranks are cached per iteration and lineage is truncated with
localCheckpoint every few rounds so 100 iterations don't build a 100-deep
plan. Out-degrees are computed once. Skewed hub nodes are handled by AQE
skew-join splitting (enabled in the session factory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dedup_edges_undirected(edges: DataFrame, seq_col: str | None = None) -> DataFrame:
    """Collapse A->B / B->A to one edge (first occurrence wins when
    ``seq_col`` gives the encounter order; arbitrary-but-stable otherwise)."""
    key = F.array_sort(F.array(F.col("src"), F.col("dst")))
    if seq_col is None:
        return edges.withColumn("_k", key).dropDuplicates(["_k"]).drop("_k")
    w = Window.partitionBy("_k").orderBy(F.col(seq_col).asc())
    return (
        edges.withColumn("_k", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_k", "_rn")
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    max_iterations: int = 100,
    tolerance: float = 1e-6,
    checkpoint_every: int = 10,
) -> DataFrame:
    """(id, final_rank) — reference-faithful weighted PageRank.

    nodes: (id), edges: (src, dst, weight) — edges should already be
    deduped (dedup_edges_undirected) to match the reference pipeline.
    """
    spark = nodes.sparkSession
    n = nodes.count()
    if n == 0:
        return spark.createDataFrame([], "id string, final_rank double")
    node_ids = nodes.select("id").cache()
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out")).cache()
    edg = (
        edges.join(out_deg.withColumnRenamed("id", "src"), "src")
        .select("src", "dst", (F.col("weight") / F.col("out")).alias("wnorm"))
        .cache()
    )
    edg.count()
    ranks = node_ids.select("id", F.lit(1.0 / n).alias("rank")).cache()
    teleport = (1.0 - damping) / n
    # tolerance < 0 disables the convergence check entirely: fixed-iteration
    # runs (e.g. the driver query) then launch ZERO per-iteration jobs — the
    # whole chain evaluates lazily at the final action, with eager
    # localCheckpoints every checkpoint_every rounds bounding plan depth.
    check_convergence = tolerance >= 0
    for it in range(max_iterations):
        contribs = (
            edg.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("rank") * F.col("wnorm") * damping).alias("inflow"))
        )
        new_ranks = (
            node_ids.join(contribs, "id", "left")
            .select("id", (F.lit(teleport) + F.coalesce("inflow", F.lit(0.0))).alias("rank"))
        )
        if (it + 1) % checkpoint_every == 0:
            new_ranks = new_ranks.localCheckpoint(eager=not check_convergence)
        new_ranks = new_ranks.cache()
        if check_convergence:
            diff = (
                new_ranks.withColumnRenamed("rank", "nr")
                .join(ranks, "id")
                .agg(F.sum(F.abs(F.col("nr") - F.col("rank"))).alias("d"))
                .collect()[0]["d"]
            )
        ranks.unpersist()
        ranks = new_ranks
        if check_convergence and diff is not None and diff < tolerance:
            break
    out = ranks.select("id", F.col("rank").alias("final_rank"))
    node_ids.unpersist()
    out_deg.unpersist()
    edg.unpersist()
    return out


def top_linked_pages(edges: DataFrame, nodes: DataFrame, direction: str = "in", k: int = 5) -> DataFrame:
    """A10: top-k pages by in(out)-degree, with titles."""
    key = "dst" if direction == "in" else "src"
    deg = edges.groupBy(F.col(key).alias("id")).agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.orderBy(F.col("degree").desc(), F.col("id").asc())
        .limit(k)
        .join(nodes.select("id", "title"), "id", "left")
        .orderBy(F.col("degree").desc(), F.col("id").asc())
    )


def doc_rank_score_col(
    final_rank=None, initial_rank=None, weight=None,
    content_length=None, code_blocks=None, outbound_links=None,
):
    """A6 as pure column arithmetic. Pass Columns (nullable); a row with all
    three rank fields null gets the default weight 1.0."""
    fr = F.coalesce(final_rank, F.lit(0.0))
    ir = F.coalesce(initial_rank, F.lit(1.0))
    w = F.coalesce(weight, F.lit(1.0))
    cl = F.coalesce(content_length, F.lit(0)).cast("double")
    cb = F.coalesce(code_blocks, F.lit(0)).cast("double")
    ol = F.coalesce(outbound_links, F.lit(0)).cast("double")
    norm_len = F.when(cl > 0, F.least(cl / 5000.0, F.lit(1.0))).otherwise(F.lit(0.5))
    content_score = (
        norm_len * 0.4 + F.least(cb / 10.0, F.lit(1.0)) * 0.3 + F.least(ol / 20.0, F.lit(1.0)) * 0.3
    )
    combined = fr * 0.4 + ir * 0.2 + w * 0.2 + content_score * 0.2
    has_rank = final_rank.isNotNull() | initial_rank.isNotNull() | weight.isNotNull()
    return F.when(has_rank, F.greatest(combined, F.lit(0.1))).otherwise(F.lit(1.0))


def docs_with_weights(pages: DataFrame, nodes: DataFrame, ranks: DataFrame) -> DataFrame:
    """pages (url, ...) joined with graph nodes + PageRank -> doc_weight.

    Pages without a graph node get the default weight 1.0 (broadcast-able
    node table joins hash-side; at corpus scale nodes ~ pages so this is a
    shuffle equi-join on url — co-partitionable with the index build).
    """
    enriched = nodes.join(ranks, "id", "left").select(
        "url",
        F.col("final_rank"),
        F.col("initial_rank"),
        F.col("weight"),
        F.col("content_length"),
        F.col("code_blocks"),
        F.col("outbound_links"),
    )
    joined = pages.join(enriched, "url", "left")
    return joined.withColumn(
        "doc_weight",
        doc_rank_score_col(
            F.col("final_rank"), F.col("initial_rank"), F.col("weight"),
            F.col("content_length"), F.col("code_blocks"), F.col("outbound_links"),
        ),
    ).select(*pages.columns, "doc_weight")
