"""Connected components over near-duplicate pair graphs.

The dedup operators (minhash_dup_pairs, shingle_dup_pairs,
cosine_dup_pairs) emit PAIRS; a real corpus-curation pipeline needs
CLUSTERS — one canonical document per group of mutual near-dups — which
is exactly connected components over the pair graph. No counterpart in
the reference engine (its dedup is URL-keyed at crawl time,
reference service/scrape_web.py:371-372); this is the standard
web-corpus "dedup endgame" operator.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the
shuffle-based CC algorithm built for exactly this shape of cluster job:

- large-star(u): connect every neighbor LARGER than u to the minimum of
  u's closed neighborhood.
- small-star(u): connect u and all its smaller neighbors to that minimum.

Both are one groupBy + one co-partitioned join over the edge list; the
edge set converges to per-component stars rooted at the component's
minimum node in O(log n) rounds (vs O(diameter) for naive min-label
propagation — the difference between 2-3 rounds and hundreds on chain-
shaped components). Each round's shuffle key is the node id, so skew is
bounded by the largest star, and AQE's skew-join split applies to the
join. At 100 TB the per-round persist should become a checkpoint to a
staging table, same note as the dedup pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Emit (v, m) for every neighbor v > u, where m = min(N(u) ∪ {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Key each edge by its larger endpoint u; connect u and all smaller
    neighbors to m = min(N(u)) (every neighbor here is < u, so m is the
    minimum of the closed neighborhood too)."""
    keyed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mins = keyed.groupBy("u").agg(F.min("v").alias("m"))
    return (
        keyed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select("u", F.col("m").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_rounds: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``.

    component = the minimum node id of the node's connected component
    (deterministic canonical representative). Nodes not present in any
    pair are absent — join the result back to the corpus (see
    ``dup_clusters``) to give singletons their own id.

    Convergence is detected by an edge-set fingerprint
    (count + sum of xxhash64(u, v)): one tiny aggregate per round instead
    of a full exceptAll anti-join. A colliding fingerprint (probability
    ~2^-64 per round) could stop one round early; the pytest oracle
    cross-checks exact results against a union-find on random graphs.
    """
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    initial = edges

    def fingerprint(e: DataFrame):
        # decimal(38,0) sum: 64-bit hashes summed over any realistic edge
        # count cannot overflow it (ANSI mode would abort a long sum)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    fp = fingerprint(edges)
    converged = False
    for _ in range(max_rounds):
        # localCheckpoint (materialized by the fingerprint action) truncates
        # lineage every round — without it the logical plan doubles per
        # round and OPTIMIZER time, not data, dominates from round ~3
        nxt = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        nfp = fingerprint(nxt)  # materializes the checkpoint
        edges = nxt  # earlier rounds' checkpoint blocks free on GC
        if nfp == fp:
            converged = True
            break
        fp = nfp
    initial.unpersist()
    if not converged:
        # A non-star residual would silently mis-assign components; the
        # alternation converges in O(log n) rounds, so hitting the cap
        # means the caller's max_rounds is too small for this graph.
        raise RuntimeError(
            f"connected_components did not converge within max_rounds="
            f"{max_rounds}; raise max_rounds (rounds needed is O(log n) "
            f"in the largest component diameter)"
        )

    # At the fixpoint every component is a star rooted at its minimum:
    # children appear as u, roots only as v.
    comp = (
        edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .union(edges.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
    return comp


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    doc_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """(doc_id, component, cluster_size) for EVERY document.

    Documents in no near-dup pair form singleton clusters (component =
    their own id). ``component`` is the min doc_id of the cluster — the
    canonical document a keep-one-per-cluster curation step would retain.
    cluster_size counts documents, so ``cluster_size = 1`` selects the
    unique corpus and ``doc_id = component`` selects the canonical set.
    """
    comp = connected_components(pairs, src, dst)
    assigned = (
        docs.select(F.col(doc_col).alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("component", F.col("doc_id")).alias("component")
        )
    )
    sizes = assigned.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return assigned.join(sizes, "component").select(
        "doc_id", "component", "cluster_size"
    )


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    score_col: str = "quality_score",
    doc_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """(doc_id, component, cluster_size, <score_col>): the keep-best
    curation endgame — ONE row per near-dup cluster, keeping the member
    with the highest ``score_col`` (ties to the smallest doc_id), so a
    boilerplate-ridden copy never survives over its cleaner twin the way
    dup_clusters' min-id canonical can allow.

    ``docs`` must carry the score column (e.g. join quality_features
    first). The selection window partitions by component, so Spark plans
    it as WindowGroupLimit — the rank-1 filter is pushed below the sort
    and only per-cluster winners leave the exchange.
    """
    clusters = dup_clusters(docs, pairs, doc_col=doc_col, src=src, dst=dst)
    scored = clusters.join(
        docs.select(F.col(doc_col).alias("doc_id"), F.col(score_col)), "doc_id"
    )
    w = Window.partitionBy("component").orderBy(F.desc(score_col), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
