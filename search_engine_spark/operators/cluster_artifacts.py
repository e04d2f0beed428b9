"""S10: browsable clustering artifacts sink (+ loader).

Reference (service/document_clustering.py:654-735 ``save_results`` +
:562-652 ``create_browsable_structure``) persists four artifacts:
cluster_structure.json (cluster name -> documents w/ preview + metadata,
keywords, size), document_metadata.json (file-type histogram, avg length,
empty files), clustering_summary.json (totals + per-cluster distribution +
timestamp), and a pickled model.

Spark-first shape: the per-document browsable rows are written DISTRIBUTED
as JSON partitioned by cluster_name (each cluster is a directory of JSON
lines — the browsable analog of the reference's nested dict, but it scales
past driver memory); the per-cluster and corpus-level summaries are tiny
and written driver-side. A _MANIFEST.json records row counts per artifact
so a resume/verify pass can check completeness without re-reading data.

Layout at ``<path>/``:
    cluster_structure/cluster_name=<name>/  JSON rows: doc_id, url,
        file_type, characters, estimated_read_time, preview
    clusters.json          {name: {cluster_id, size, keywords}}
    document_metadata.json {total_documents, file_types, avg_document_length,
                            empty_files}
    clustering_summary.json{total_documents, num_clusters,
                            documents_per_cluster, timestamp}
    _MANIFEST.json
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.config import DEFAULT_CONFIG, EngineConfig
from search_engine_spark.operators.clustering import descriptive_cluster_name
from search_engine_spark.operators.summarize import summarize_docs


def save_clustering_artifacts(
    path: str,
    docs: DataFrame,
    labels: DataFrame,
    keywords_df: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    doc_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    type_col: str | None = None,
    summary_sentences: int = 2,
) -> dict:
    """Persist the full browsable clustering structure; returns the manifest.

    ``keywords_df`` is (cluster_id, term, score, rank) from
    cluster_keywords_full (or the simplified cluster_keywords).
    """
    os.makedirs(path, exist_ok=True)

    # per-cluster keywords + names (tiny: K * top_n rows)
    kw_rows = keywords_df.orderBy("cluster_id", "rank").collect()
    kw_by_cluster: dict[int, list[str]] = {}
    for r in kw_rows:
        kw_by_cluster.setdefault(int(r["cluster_id"]), []).append(r["term"])
    sizes = {
        int(r["cluster_id"]): int(r["n"])
        for r in labels.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    names: dict[int, str] = {}
    for cid in sorted(sizes):
        base = descriptive_cluster_name(kw_by_cluster.get(cid, []))
        name = base if base != "Cluster" else f"Cluster_{cid}"
        # disambiguate name collisions deterministically
        if name in names.values():
            name = f"{name}_{cid}"
        names[cid] = name

    clusters_meta = {
        names[cid]: {
            "cluster_id": cid,
            "size": sizes[cid],
            "keywords": kw_by_cluster.get(cid, []),
        }
        for cid in sorted(sizes)
    }
    with open(os.path.join(path, "clusters.json"), "w", encoding="utf-8") as f:
        json.dump(clusters_meta, f, indent=2, ensure_ascii=False, sort_keys=True)

    # distributed browsable rows: summary preview + per-doc metadata
    # (reference doc_info shape, :630-644; file-size fields are N/A for a
    # table-sourced corpus and are omitted)
    spark = docs.sparkSession
    name_map = spark.createDataFrame(
        [(cid, nm) for cid, nm in names.items()], "cluster_id int, cluster_name string"
    )
    previews = summarize_docs(docs, summary_sentences, cfg, doc_col, text_col)
    url_expr = F.col(url_col) if url_col else F.lit(None).cast("string")
    type_expr = F.col(type_col) if type_col else F.lit(None).cast("string")
    browsable = (
        docs.select(
            F.col(doc_col).alias("doc_id"),
            url_expr.alias("url"),
            type_expr.alias("file_type"),
            F.length(F.col(text_col)).cast("long").alias("characters"),
            F.greatest(
                F.lit(1),
                (F.size(F.split(F.col(text_col), r"\s+")) / F.lit(200)).cast("long"),
            ).alias("estimated_read_time_min"),
        )
        .join(labels.select("doc_id", "cluster_id"), "doc_id")
        .join(F.broadcast(name_map), "cluster_id")
        .join(previews.withColumnRenamed("summary", "preview"), "doc_id")
    )
    structure_path = os.path.join(path, "cluster_structure")
    browsable.write.mode("overwrite").partitionBy("cluster_name").json(structure_path)

    # document metadata (A14 shape, reference :233-256)
    meta_row = docs.agg(
        F.count(F.lit(1)).alias("total"),
        F.avg(F.length(F.col(text_col))).alias("avg_len"),
    ).collect()[0]
    file_types = {}
    if type_col:
        file_types = {
            r["ft"]: int(r["n"])
            for r in docs.groupBy(F.col(type_col).alias("ft"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
    empty_files = [
        r["doc_id"]
        for r in docs.filter(F.length(F.col(text_col)) == 0)
        .select(F.col(doc_col).alias("doc_id"))
        .limit(10000)
        .collect()
    ]
    metadata = {
        "total_documents": int(meta_row["total"]),
        "file_types": file_types,
        "avg_document_length": float(meta_row["avg_len"] or 0.0),
        "empty_files": sorted(str(x) for x in empty_files),
    }
    with open(os.path.join(path, "document_metadata.json"), "w", encoding="utf-8") as f:
        json.dump(metadata, f, indent=2, ensure_ascii=False)

    # summary (reference :697-705)
    summary = {
        "total_documents": int(meta_row["total"]),
        "num_clusters": len(sizes),
        "documents_per_cluster": {str(cid): sizes[cid] for cid in sorted(sizes)},
        "timestamp": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    with open(os.path.join(path, "clustering_summary.json"), "w", encoding="utf-8") as f:
        json.dump(summary, f, indent=2)

    manifest = {
        "rows_written": int(sum(sizes.values())),
        "clusters": len(sizes),
        "artifacts": [
            "cluster_structure",
            "clusters.json",
            "document_metadata.json",
            "clustering_summary.json",
        ],
    }
    with open(os.path.join(path, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_clustering_artifacts(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict, dict, dict]:
    """(browsable rows DF, clusters meta, document metadata, summary)."""
    browsable = spark.read.json(os.path.join(path, "cluster_structure"))
    with open(os.path.join(path, "clusters.json"), encoding="utf-8") as f:
        clusters = json.load(f)
    with open(os.path.join(path, "document_metadata.json"), encoding="utf-8") as f:
        metadata = json.load(f)
    with open(os.path.join(path, "clustering_summary.json"), encoding="utf-8") as f:
        summary = json.load(f)
    return browsable, clusters, metadata, summary
