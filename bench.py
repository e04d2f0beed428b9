"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "docs_per_sec": ..., "query_p50_sec": ...}

Covers the engine's headline paths: BM25 index build (throughput), BM25
top-k query latency (p50 over the query mix), dedup (MinHash+LSH, simhash),
embedding similarity, text quality, event analytics.
"""

from __future__ import annotations

import json
import os
import statistics
import time

from pyspark.sql import functions as F


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    # Bound the bench JVM: on this single host spark.local.dir lives on
    # tmpfs, so heap + shuffle/persist spill share ONE 125 GiB RAM budget.
    # The round-4 bench died to the kernel OOM-killer at 48g heap + 72 GB
    # tmpfs spill; 32g heap leaves ~90 GiB of headroom for spill and the
    # OS (VERDICT r04 "What's wrong" #1c). Env override still wins.
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    from search_engine_spark.functions.tokenize import query_tokens_py
    from search_engine_spark.operators.corpus_stats import build_bm25_index
    from search_engine_spark.operators.dedup import (
        minhash_dup_pairs,
        shingle_dup_pairs,
        simhash,
        unpersist_dedup_caches,
    )
    from search_engine_spark.operators.events import hourly_event_stats, sessionize
    from search_engine_spark.operators.scoring import search_topk
    from search_engine_spark.operators.similarity import cosine_topk
    from search_engine_spark.operators.text_quality import quality_features
    from search_engine_spark.session import get_spark

    spark = get_spark(app_name="bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n_docs = docs.count()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.time()
        out = fn()
        timings[name] = round(time.time() - t0, 4)
        return out

    # 1. index build: postings + stats fully materialized
    def build():
        idx = build_bm25_index(docs, doc_col="doc_id", text_col="text").cache()
        idx.postings.count()
        idx.doc_stats.count()
        idx.term_stats.count()
        return idx

    idx = timed("index_build", build)
    docs_per_sec = round(n_docs / timings["index_build"], 2)

    # 2. BM25 query latency over a query mix (warm logical index)
    bench_queries = [
        "spark table join window",
        "key value hash merge",
        "stream batch filter sort group",
        "customer query scan the fast",
        "vector slow big small line",
    ]
    # one untimed warmup query: p50 measures steady-state serving latency,
    # not first-query JIT/codegen/broadcast warmup (which index_build's
    # timing already absorbs for the build side)
    search_topk(idx, query_tokens_py("warmup run only"), top_k=10).collect()
    lat = []
    for i, q in enumerate(bench_queries):
        t0 = time.time()
        search_topk(idx, query_tokens_py(q), top_k=10).collect()
        lat.append(time.time() - t0)
        timings[f"q{i+1}_bm25"] = round(lat[-1], 4)
    p50 = round(statistics.median(lat), 4)

    # 2b. materialized compressed index: build + query (plain and WAND)
    import hashlib
    import shutil

    from search_engine_spark.index.build import build_compressed_index
    from search_engine_spark.index.query import CompressedIndex

    cpath = f"/tmp/bench_cidx_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(cpath, ignore_errors=True)
    timed("compressed_build", lambda: build_compressed_index(docs, cpath))
    ci = CompressedIndex(spark, cpath)
    clat, wlat = [], []
    for q in bench_queries:
        toks = query_tokens_py(q)
        t0 = time.time()
        ci.search_topk(toks, top_k=10).collect()
        clat.append(time.time() - t0)
        t0 = time.time()
        ci.search_topk(toks, top_k=10, use_wand=True).collect()
        wlat.append(time.time() - t0)
    timings["cindex_query_p50"] = round(statistics.median(clat), 4)
    timings["cindex_wand_p50"] = round(statistics.median(wlat), 4)

    # 2c. batch mode: all queries in ONE plan (throughput-oriented path)
    from search_engine_spark.operators.scoring import batch_search_topk

    qs = [(i, query_tokens_py(q)) for i, q in enumerate(bench_queries)]
    t0 = time.time()
    batch_search_topk(idx, qs, top_k=10).collect()
    batch_wall = time.time() - t0
    timings["batch5_total"] = round(batch_wall, 4)
    timings["batch_amortized_per_query"] = round(batch_wall / len(qs), 4)

    # headline stays the md5 (oracle-portable) path for round-over-round
    # comparability; the xxhash64 integer-minhash scale variant is timed
    # alongside
    # every dedup pipeline registers MEMORY_AND_DISK caches (band keys,
    # term sets); with tmpfs-backed local.dir those accumulate in the SAME
    # RAM budget as the heap, so release them after each entry (VERDICT
    # r04 "What's wrong" #1b)
    timed("dedup_minhash_lsh", lambda: minhash_dup_pairs(docs, threshold=0.5).count())
    unpersist_dedup_caches()
    timed(
        "dedup_minhash_xxh64",
        lambda: minhash_dup_pairs(docs, threshold=0.5, hash_fn="xxhash64").count(),
    )
    unpersist_dedup_caches()
    timed("dedup_simhash", lambda: simhash(docs).count())
    unpersist_dedup_caches()

    # Realistic-vocabulary dedup (VERDICT r03 #3): the sf0.1 documents
    # table has a 29-term vocabulary, which makes ~3/4 of ALL pairs LSH
    # candidates — a worst-case pathology, kept above as the adversarial
    # entry, but useless for round-over-round comparison (candidate
    # verification + first-run JIT dominate and swing 3-8x). The 50k-page
    # entry runs SHINGLE (3-gram) LSH: round 4's token-SET banding on this
    # Zipf corpus made 13.7% of ALL pairs candidates (~171M pairs at 50k —
    # OOM-killed the bench JVM; VERDICT r04 #1a). Shingle space is
    # |V|^n-sparse, so the pathology disappears structurally — measured by
    # tools/lsh_candidate_rate.py before this entry was committed
    # (BENCH.md candidate-rate table).
    from search_engine_spark.sources.synth import synth_pages_df

    pages = synth_pages_df(spark, 50_000).persist()
    pages.count()  # materialize: entries time dedup, not generation
    timed(
        "dedup_pages50k_shingle",
        lambda: shingle_dup_pairs(
            pages, threshold=0.5, doc_col="url", text_col="text"
        ).count(),
    )
    unpersist_dedup_caches()
    timed(
        "dedup_pages50k_shingle_xxh64",
        lambda: shingle_dup_pairs(
            pages, threshold=0.5, doc_col="url", text_col="text", hash_fn="xxhash64"
        ).count(),
    )
    unpersist_dedup_caches()
    pages.unpersist()

    # pairs -> clusters endgame: connected components (large-star/small-star)
    # over a deterministic 200k-node dup graph with realistic web-dedup shape
    # (50k 4-cliques, every ~10th chained). The sf0.1 minhash graph itself is
    # the adversarial 29-term-vocab regime (~10M edges over 5000 docs, avg
    # degree ~3900 — no real near-dup graph looks like that; measured 303s,
    # see BENCH.md), so the bench measures the operator on the shape it is
    # for, not the corpus pathology already covered by dedup_minhash_*.
    from search_engine_spark.operators.components import dup_clusters

    def _cc_synth():
        n = 200_000
        cdocs = spark.range(n).withColumnRenamed("id", "doc_id")
        base = spark.range(n)
        clique = base.filter((F.col("id") % 4) != 0).select(
            F.col("id").alias("doc_a"),
            (F.col("id") - F.col("id") % 4).alias("doc_b"),
        )
        chain = (
            base.filter(((F.col("id") % 4) == 0) & ((F.xxhash64("id") % 10) == 0))
            .select(F.col("id").alias("doc_a"), (F.col("id") + 4).alias("doc_b"))
            .filter(F.col("doc_b") < n)
        )
        return dup_clusters(cdocs, clique.union(chain)).count()

    timed("dup_clusters_200k", _cc_synth)
    timed("embedding_topk", lambda: cosine_topk(emb, 0, 10).collect())

    # IVF ANN: one-off quantizer build (persisted, centroid-partitioned
    # lists) vs the partition-pruned probe that serves queries
    from search_engine_spark.operators.similarity import (
        build_ivf_index,
        ivf_probe_by_id,
    )

    ipath = f"/tmp/bench_ivf_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}"
    shutil.rmtree(ipath, ignore_errors=True)
    timed("ivf_build", lambda: build_ivf_index(emb, ipath, n_centroids=8, seed=42))
    timed(
        "ivf_probe",
        lambda: ivf_probe_by_id(spark, ipath, 0, k=10, n_probe=2).collect(),
    )
    from search_engine_spark.operators.similarity import (
        cosine_dup_pairs,
        cosine_pairs_lsh_multi,
    )

    # Headline ANN-pair entry is the 100-TB path (bucketed sign-LSH; slim
    # rows through the shuffle). The exact O(n^2) auditor runs SAMPLED
    # (1/4 of vectors -> 1/16 of pairs) — it exists to audit recall, not
    # to be the pipeline (VERDICT r03 "What's wrong" #1).
    timed(
        "cosine_pairs_lsh",
        lambda: cosine_pairs_lsh_multi(
            emb, n_tables=4, n_planes=6, threshold=0.35
        ).count(),
    )
    timed(
        "embedding_dup_pairs_sampled",
        lambda: cosine_dup_pairs(
            emb.filter(F.col("vec_id") % 4 == 0), threshold=0.35
        ).count(),
    )
    timed("text_quality", lambda: quality_features(docs).count())

    from search_engine_spark.operators.text_quality import repetition_features

    timed("repetition", lambda: repetition_features(docs).count())

    from search_engine_spark.operators.curation import curate_docs, hash_split
    from search_engine_spark.operators.text_quality import ngram_counts

    from search_engine_spark.operators.curation import contamination, scrub_pii

    timed("curate_docs", lambda: curate_docs(docs).count())
    timed("scrub_pii", lambda: scrub_pii(docs).count())
    timed(
        "contamination",
        lambda: contamination(
            docs, docs.filter(F.col("doc_id") % 100 == 0), n=3
        ).count(),
    )
    timed("hash_split", lambda: hash_split(docs).count())

    from search_engine_spark.operators.curation import stratified_sample

    timed(
        "stratified_sample",
        lambda: stratified_sample(
            docs, rates={"src0": 1.0, "src1": 0.5, "src2": 0.25}, default_rate=0.1
        ).count(),
    )
    timed("ngram_counts", lambda: ngram_counts(docs, 2, 50).count())
    timed("events_hourly", lambda: hourly_event_stats(events).count())
    timed("sessionize", lambda: sessionize(events).count())

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "n_docs": n_docs,
                "docs_per_sec": docs_per_sec,
                "query_p50_sec": p50,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
