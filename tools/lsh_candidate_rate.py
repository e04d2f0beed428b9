"""LSH candidate-rate probe: measure candidates / all-pairs BEFORE any
large dedup run.

The round-4 bench OOM (VERDICT r04 "What's wrong" #1) happened because the
synth pages corpus' token-SET banding produced candidates for 13.7% of ALL
doc pairs — a rate that is constant in n, so a 50k-doc run implied ~171M
candidate pairs joined against two ~200-term arrays each. A 3-line probe at
n ∈ {1k, 4k} would have caught it before commit; this is that probe, kept
as a first-class diagnostic.

Usage:
    python tools/lsh_candidate_rate.py [n1 n2 ...]     # default: 1000 4000

Reports, for each corpus/variant at each n:
    candidates, all-pairs, rate, and the rate ratio n2/n1 (a near-constant
    rate across n means quadratic blowup at scale — do NOT run the big job
    without max_bucket_size or a structurally sparser shingle space).

Corpora probed:
    documents  — $SPARK_GRAFT_SF_DIR/documents.parquet token-set banding
                 (the adversarial 29-term-vocab regime)
    pages      — synth_pages_df token-set banding (the round-4 killer)
    pages-shingle — synth_pages_df 3-gram shingle banding (the sparse,
                 order-sensitive detector bench.py now uses at 50k)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def probe(name, terms_fn, n, spark):
    from search_engine_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_from_terms,
        unpersist_dedup_caches,
    )

    terms = terms_fn(n).repartition("doc_id").persist()
    terms.count()
    t0 = time.time()
    sig = minhash_signatures_from_terms(terms, num_hashes=8)
    cands = lsh_candidate_pairs(sig, rows_per_band=2).count()
    wall = time.time() - t0
    allp = n * (n - 1) // 2
    terms.unpersist()
    unpersist_dedup_caches()
    return {
        "corpus": name,
        "n": n,
        "candidates": cands,
        "all_pairs": allp,
        "rate": round(cands / allp, 5) if allp else 0.0,
        "sec": round(wall, 2),
    }


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [1000, 4000]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from search_engine_spark.operators.dedup import doc_terms, shingle_terms
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.synth import synth_pages_df

    spark = get_spark(app_name="lsh-candidate-rate")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    corpora = {
        "documents": lambda n: doc_terms(docs.limit(n)),
        "pages": lambda n: doc_terms(
            synth_pages_df(spark, n), doc_col="url", text_col="text"
        ),
        "pages-shingle": lambda n: shingle_terms(
            synth_pages_df(spark, n), n=3, doc_col="url", text_col="text"
        ),
    }
    rows = []
    for cname, fn in corpora.items():
        per_corpus = []
        for n in sizes:
            r = probe(cname, fn, n, spark)
            per_corpus.append(r)
            rows.append(r)
            print(json.dumps(r), flush=True)
        if len(per_corpus) >= 2 and per_corpus[0]["rate"] > 0:
            ratio = per_corpus[-1]["rate"] / per_corpus[0]["rate"]
            # a ~constant rate means candidates grow quadratically in n —
            # dangerous only when the MAGNITUDE is high enough that the
            # verify join's volume explodes at the target size. Project it.
            target_n = int(os.environ.get("LSH_RATE_TARGET_N", "50000"))
            proj = per_corpus[-1]["rate"] * target_n * (target_n - 1) // 2
            if ratio > 0.5 and proj > 10_000_000:
                verdict = (
                    f"DANGEROUS: rate ~constant in n and ~{proj / 1e6:.0f}M "
                    f"candidate pairs projected at n={target_n} — cap "
                    "buckets (max_bucket_size) or use shingles"
                )
            elif ratio > 0.5:
                verdict = (
                    f"rate ~constant in n but only ~{proj / 1e3:.0f}k pairs "
                    f"projected at n={target_n}: acceptable"
                )
            else:
                verdict = "rate decays with n: safe"
            print(
                json.dumps(
                    {
                        "corpus": cname,
                        "rate_ratio_largest_vs_smallest": round(ratio, 3),
                        "projected_pairs_at_target": int(proj),
                        "target_n": target_n,
                        "verdict": verdict,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
