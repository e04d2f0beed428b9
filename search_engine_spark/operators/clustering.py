"""Document clustering: Word2Vec doc vectors -> silhouette-selected KMeans,
plus the cluster-analysis aggregations (A12-A14).

Reference pipeline (service/document_clustering.py):
- Word2Vec skip-gram, 100-dim, window 5, min_count 2 (:334-341); document
  vector = mean of its in-vocabulary word vectors (:343-355) —
  ``pyspark.ml.feature.Word2Vec``'s transform() IS that mean, so the doc
  vectors come out of the fitted model directly.
- k selection: silhouette score over k in [2, min(max_clusters, n)-1],
  seed 42 (:365-398); 1 cluster when n<=1 or near-zero variance (:370-377).
- KMeans with the chosen k, seed 42 (:400-407).
- cluster keyword scoring (:409-524): per-cluster term frequency contrasted
  against a sample of other clusters -> groupBy aggregations here.
- cluster size distribution (:755-762) -> groupBy(cluster).count().

Numeric parity with gensim/sklearn is not attainable (different SGD/init);
parity here is structural and the tests assert pipeline invariants
(determinism under fixed seed, sane silhouette selection, label coverage).

Scale notes: Word2Vec/KMeans are pyspark.ml distributed estimators; the
silhouette loop caches the vector DataFrame once and evaluates k candidates
over it (each a fit+transform job, embarrassingly parallel within).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from search_engine_spark.functions.tokenize import tokens_col

SEED = 42


def doc_token_arrays(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tokens) — clustering-side tokens (stopwords removed, like
    the reference's preprocess + stopword filter)."""
    stop = sorted(cfg.stopwords)
    stop_arr = F.array(*[F.lit(s) for s in stop])
    toks = F.filter(
        tokens_col(F.lower(F.col(text_col))),
        lambda t: (F.length(t) > 1) & ~F.array_contains(stop_arr, t),
    )
    return docs.select(F.col(doc_col).alias("doc_id"), toks.alias("tokens")).filter(
        F.size("tokens") > 0
    )


def doc_vectors(
    tokenized: DataFrame,
    vector_size: int = 100,
    window: int = 5,
    min_count: int = 2,
    num_partitions: int = 1,
) -> tuple[DataFrame, object]:
    """(doc_id, features) via distributed Word2Vec (transform == mean of
    word vectors, matching the reference's averaging).

    num_partitions=1 keeps training bit-deterministic under the fixed seed
    (parallel SGD merges are scheduling-order dependent); raise it for
    large corpora where reproducibility of the VECTORS (not the cluster
    semantics) can be relaxed.
    """
    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=vector_size,
        windowSize=window,
        minCount=min_count,
        seed=SEED,
        inputCol="tokens",
        outputCol="features",
        numPartitions=num_partitions,
    )
    model = w2v.fit(tokenized)
    return model.transform(tokenized).select("doc_id", "features"), model


def find_optimal_clusters(vectors: DataFrame, max_clusters: int = 10) -> int:
    """Silhouette-driven k selection (reference :365-398 semantics)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.evaluation import ClusteringEvaluator

    n = vectors.count()
    if n <= 1:
        return 1
    # variance check: documents too similar -> single cluster
    from pyspark.ml.stat import Summarizer

    var = vectors.select(Summarizer.variance(F.col("features")).alias("v")).collect()[0]["v"]
    if float(sum(var)) < 1e-10:
        return 1
    best_score, best_n = -1.0, 2
    vectors = vectors.cache()
    evaluator = ClusteringEvaluator(
        featuresCol="features", predictionCol="prediction", metricName="silhouette"
    )
    for k in range(2, min(max_clusters + 1, n)):
        km = KMeans(k=k, seed=SEED, featuresCol="features")
        preds = km.fit(vectors).transform(vectors)
        if preds.select("prediction").distinct().count() > 1:
            score = evaluator.evaluate(preds)
            if score > best_score:
                best_score, best_n = score, k
    return best_n


def cluster_documents(
    docs: DataFrame,
    n_clusters: int | None = None,
    max_clusters: int = 10,
    cfg: EngineConfig = DEFAULT_CONFIG,
    doc_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, cluster_id) — the full reference clustering pipeline."""
    from pyspark.ml.clustering import KMeans

    tokenized = doc_token_arrays(docs, cfg, doc_col, text_col).cache()
    vectors, _ = doc_vectors(tokenized)
    vectors = vectors.cache()
    k = n_clusters or find_optimal_clusters(vectors, max_clusters)
    n = vectors.count()
    k = max(1, min(k, n))
    if k == 1:
        return vectors.select("doc_id", F.lit(0).alias("cluster_id"))
    km = KMeans(k=k, seed=SEED, featuresCol="features")
    preds = km.fit(vectors).transform(vectors)
    return preds.select("doc_id", F.col("prediction").alias("cluster_id"))


def cluster_sizes(labels: DataFrame) -> DataFrame:
    """A13: (cluster_id, n_docs)."""
    return labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_docs"))


def cluster_keywords(
    labels: DataFrame,
    tokenized: DataFrame,
    top_n: int = 5,
    contrast_sample: int = 1000,
) -> DataFrame:
    """A12 (simplified to its relational core): top terms per cluster scored
    by in-cluster frequency CONTRASTED with frequency in a bounded sample of
    other clusters (reference :409-524 caps the contrast set at 1000 docs).
    (cluster_id, term, score, rank)."""
    from pyspark.sql.window import Window

    joined = labels.join(tokenized, "doc_id").select(
        "cluster_id", F.explode("tokens").alias("term")
    )
    n_docs_per_cluster = labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
    tf = joined.groupBy("cluster_id", "term").agg(F.count(F.lit(1)).alias("c"))
    # contrast: global term rate from a bounded sample
    total = labels.count()
    frac = min(1.0, contrast_sample / max(total, 1))
    sample_tf = (
        labels.sample(fraction=frac, seed=SEED)
        .join(tokenized, "doc_id")
        .select(F.explode("tokens").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("g"))
    )
    scored = (
        tf.join(n_docs_per_cluster, "cluster_id")
        .join(sample_tf, "term", "left")
        .select(
            "cluster_id",
            "term",
            (
                F.col("c") / F.col("n")
                - F.coalesce(F.col("g"), F.lit(0)) / F.lit(max(total, 1))
            ).alias("score"),
        )
    )
    w = Window.partitionBy("cluster_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .select("cluster_id", "term", "score", "rank")
    )


def file_type_histogram(docs: DataFrame, type_col: str = "source") -> DataFrame:
    """A14: (file_type, n_docs, avg_len) metadata histogram."""
    return docs.groupBy(F.col(type_col).alias("file_type")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.length("text")).alias("avg_len"),
    )
