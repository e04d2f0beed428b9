"""Single-process reference-equivalent baseline, as a committed harness.

Formalizes the round-3 ad-hoc measurement (BENCH.md "Single-node
reference-equivalent baseline"): the reference engine's computation — its
exact tokenizer + epsilon-floored BM25 statistics (reference
utils/bm250kapi_weighted.py:35-54) built in memory and pickled (reference
service/build_text_index.py:253-320) — run as ONE Python process over the
same synthetic page corpus the Spark scaling runs use. This is the honest
single-node opponent for the docs/sec comparison: same extraction, same
tokenizer, same statistics, no Spark overheads, no compression, no
block-max metadata, no manifests, no on-disk query structure.

Deliberately GENEROUS to the baseline so the engine's margin is
conservative:
- it gets the engine's own regex fast-path extractor (extract_text_py),
  not the stdlib-parser slow path (and certainly not per-file bs4);
- the pickle goes to /dev/shm, so the virtio disk ceiling this box has
  (CLAUDE.md) never throttles it;
- corpus generation is untimed.

Usage: python tools/bench_ref_baseline.py [n_pages]   (default 150000,
the round-3 protocol size). Prints ONE JSON line with per-phase walls and
docs_per_sec.
"""

from __future__ import annotations

import json
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000


def main() -> None:
    from search_engine_spark.config import load_stopwords
    from search_engine_spark.functions.html_extract import extract_text_py
    from search_engine_spark.oracle.pyref import build_oracle_index
    from search_engine_spark.sources.synth import gen_page_record

    # untimed: materialize the html corpus (the Spark legs read the same
    # generator's output from parquet; both sides' input cost is excluded)
    htmls = []
    urls = []
    for i in range(N):
        r = gen_page_record(i, N)
        htmls.append(r["html"])
        urls.append(r["url"])

    t0 = time.time()
    texts = [extract_text_py(h) for h in htmls]
    t_extract = time.time() - t0

    stopwords = load_stopwords()
    t0 = time.time()
    docs = [(u, t) for u, t in zip(urls, texts) if t]
    index = build_oracle_index(docs, stopwords)
    t_stats = time.time() - t0

    t0 = time.time()
    out_path = os.environ.get("REF_BASELINE_PICKLE", "/dev/shm/ref_baseline_index.pkl")
    with open(out_path, "wb") as f:
        pickle.dump(index, f, protocol=pickle.HIGHEST_PROTOCOL)
    t_pickle = time.time() - t0
    pkl_mb = os.path.getsize(out_path) / 2**20
    os.unlink(out_path)

    total = t_extract + t_stats + t_pickle
    print(
        json.dumps(
            {
                "n_docs": N,
                "extract_sec": round(t_extract, 1),
                "stats_sec": round(t_stats, 1),
                "pickle_sec": round(t_pickle, 1),
                "total_sec": round(total, 1),
                "docs_per_sec": round(N / total, 1),
                "pickle_mb": round(pkl_mb, 1),
                "vocab": len(index.idf),
            }
        )
    )


if __name__ == "__main__":
    main()
