"""Stage-level md5 vs xxhash64 MinHash benchmark (VERDICT r02 #5).

Isolates the SIGNATURE stage (seed-explode -> hash -> min-agg) from
candidate generation, on a corpus whose vocabulary is large enough that
hashing dominates: the synthetic pages corpus (2000-term Zipf vocab,
~200 distinct terms/doc -> n_docs * ~200 * num_hashes hash evaluations).
The full-pipeline sf0.1 numbers measure the pathological 29-term-vocab
regime where candidate verification dominates; this isolates what the
hash choice itself costs.

Usage: python tools/bench_minhash_stage.py [n_pages] [num_hashes] [reps]
Prints one JSON line with per-variant wall times (noop-write terminal
action: no collect, no driver transfer).
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.session import get_spark  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
NH = int(sys.argv[2]) if len(sys.argv) > 2 else 16
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from pyspark import StorageLevel

    from search_engine_spark.operators.dedup import (
        doc_terms,
        minhash_signatures_from_terms,
    )
    from search_engine_spark.sources.synth import synth_pages_df

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_minhash", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    pages = synth_pages_df(spark, N)
    terms = doc_terms(pages, doc_col="url", text_col="text").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_terms = terms.count()  # materialize: signature timing excludes tokenize

    results: dict[str, dict] = {}
    for fn in ("md5", "xxhash64"):
        # one untimed warmup per variant (codegen), then REPS timed runs
        laps = []
        for i in range(REPS + 1):
            t0 = time.time()
            minhash_signatures_from_terms(terms, NH, hash_fn=fn).write.format(
                "noop"
            ).mode("overwrite").save()
            if i > 0:
                laps.append(time.time() - t0)
        results[fn] = {
            "median_sec": round(statistics.median(laps), 3),
            "runs": [round(x, 3) for x in laps],
        }
    md5_t, xxh_t = results["md5"]["median_sec"], results["xxhash64"]["median_sec"]
    print(
        json.dumps(
            {
                "n_pages": N,
                "n_term_rows": n_terms,
                "num_hashes": NH,
                "hash_evals": n_terms * NH,
                "md5": results["md5"],
                "xxhash64": results["xxhash64"],
                "speedup_md5_over_xxh64": round(md5_t / xxh_t, 2) if xxh_t else None,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
