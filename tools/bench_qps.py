"""Sustained query throughput (qps) via the batch top-k plan (VERDICT r03
#6): the reference serves queries from a warm in-memory process, so its
per-query latency floor is function-call time; this engine's floor is one
Spark job. The honest serving story is therefore THROUGHPUT under
batching: one DataFrame plan scoring B queries amortizes the scheduling
floor B ways.

Measures wall time and qps for batch sizes 1/5/25/100 over a fixed
query workload against (a) the sf docs corpus and (b) optionally a large
synthetic pages corpus (--pages N), printing one JSON line.

Usage: python tools/bench_qps.py [sf_dir] [--pages N] [--queries M]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH_SIZES = (1, 5, 25, 100)


def measure(index, queries: list[tuple[int, list[str]]]) -> dict:
    from search_engine_spark.operators.scoring import batch_search_topk

    # untimed warmup: codegen + broadcast of the stats tables
    batch_search_topk(index, queries[:2], top_k=10).collect()
    out = {}
    for b in BATCH_SIZES:
        batches = [queries[i : i + b] for i in range(0, len(queries), b)]
        t0 = time.time()
        n = 0
        for batch in batches:
            batch_search_topk(index, batch, top_k=10).collect()
            n += len(batch)
        wall = time.time() - t0
        out[f"batch_{b}"] = {
            "wall_sec": round(wall, 2),
            "qps": round(n / wall, 2),
            "amortized_ms_per_query": round(1000 * wall / n, 1),
        }
    return out


def main() -> None:
    from pyspark.sql import functions as F

    from search_engine_spark.functions.tokenize import query_tokens_py
    from search_engine_spark.operators.corpus_stats import build_bm25_index
    from search_engine_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
        else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_pages = 0
    n_queries = 100
    if "--pages" in sys.argv:
        n_pages = int(sys.argv[sys.argv.index("--pages") + 1])
    if "--queries" in sys.argv:
        n_queries = int(sys.argv[sys.argv.index("--queries") + 1])

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="bench_qps", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    out: dict = {"metric": "query_qps", "n_queries": n_queries}

    def workload(vocab: list[str]) -> list[tuple[int, list[str]]]:
        # deterministic mixed workload: 1-3 term queries cycling the vocab
        qs = []
        for i in range(n_queries):
            terms = [vocab[(i * 7 + j) % len(vocab)] for j in range(1 + i % 3)]
            qs.append((i, query_tokens_py(" ".join(terms))))
        return qs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = build_bm25_index(docs).cache()
    idx.postings.count()  # materialize the warm in-memory index
    vocab = [r["term"] for r in
             idx.postings.select("term").distinct().orderBy("term").collect()]
    out["sf_corpus"] = {
        "sf_dir": sf_dir,
        "n_docs": idx.corpus_size,
        **measure(idx, workload(vocab)),
    }

    if n_pages:
        from search_engine_spark.sources.synth import synth_pages_skewed_df

        pages = synth_pages_skewed_df(spark, n_pages)
        pidx = build_bm25_index(pages, doc_col="url", text_col="text").cache()
        pidx.postings.count()  # materialize the warm in-memory index
        pvocab = [r["term"] for r in
                  pidx.postings.select("term").distinct().orderBy("term")
                  .limit(2000).collect()]
        out["pages_corpus"] = {
            "n_docs": pidx.corpus_size,
            **measure(pidx, workload(pvocab)),
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
