"""End-to-end curation-pipeline soak (VERDICT r03 #4): curate ->
minhash+LSH pairs -> connected-component dup clusters -> keep-best
canonical set, on the skewed 2M-page web corpus at local[32].

The index build has a 2M-doc soak (BENCH.md); this gives the curation
layer the same evidence: no driver aborts, per-stage wall times, and
per-stage shuffle read/write volumes (REST API deltas) — checking the
one-slim-exchange claim of PLANS.md §5c at ~400x the driver-gate scale.

Usage: python tools/soak_curation.py [n_pages] [num_hashes] [rows_per_band] [max_bucket_size]
max_bucket_size (default 0 = uncapped) passes the LSH mega-bucket guard
through to minhash_dup_pairs — run capped vs uncapped at the same N for
the straggler A/B. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
NUM_HASHES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
ROWS_PER_BAND = int(sys.argv[3]) if len(sys.argv) > 3 else 4
MAX_BUCKET = int(sys.argv[4]) if len(sys.argv) > 4 else 0  # 0 = uncapped


def _shuffle_totals(ui: str) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all completed
    stages via the monitoring REST API."""
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=5) as r:
            app_id = json.load(r)[0]["id"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
        return (
            sum(s.get("shuffleReadBytes", 0) for s in stages),
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
        )
    except Exception:
        return (0, 0)


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from search_engine_spark.operators.components import canonical_docs, dup_clusters
    from search_engine_spark.operators.curation import curate_docs
    from search_engine_spark.operators.dedup import minhash_dup_pairs
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.synth import synth_pages_skewed_df

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="soak-curation",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus) * 2,
        extra_conf={"spark.ui.enabled": "true"},
    )
    ui = spark.sparkContext.uiWebUrl or ""
    out: dict = {
        "n_pages": N,
        "cores": int(cpus),
        "max_bucket_size": MAX_BUCKET or None,
        "stages": {},
    }

    def stage(name: str, fn):
        """fn must MATERIALIZE (run an action) and return the row count —
        wall time and shuffle deltas are measured around that action."""
        r0, w0 = _shuffle_totals(ui)
        t0 = time.time()
        rows = fn()
        wall = time.time() - t0
        r1, w1 = _shuffle_totals(ui)
        out["stages"][name] = {
            "wall_sec": round(wall, 1),
            "rows": rows,
            "shuffle_read_mb": round((r1 - r0) / 2**20, 1),
            "shuffle_write_mb": round((w1 - w0) / 2**20, 1),
        }
        # incremental evidence: an aborted soak still leaves per-stage
        # records on stderr (the round-4/5 aborts left only a stack trace)
        print(f"STAGE {name} {json.dumps(out['stages'][name])}",
              file=sys.stderr, flush=True)
        return rows

    pages = synth_pages_skewed_df(spark, N).persist(StorageLevel.MEMORY_AND_DISK)
    stage("generate", pages.count)  # excluded from total_curation_sec

    # thresholds sized for this corpus (~250-word pages); its synthetic text
    # carries no natural-language markers, so lang-gating is exercised with
    # the corpus's own deterministic majority prediction rather than
    # filtering everything out
    from search_engine_spark.operators.text_quality import lang_pred_cols

    lang_col, _ = lang_pred_cols(F.col("text"))
    majority = (
        pages.sample(fraction=min(1.0, 20_000 / N), seed=1)
        .select(lang_col.alias("pl"))
        .groupBy("pl").count().orderBy(F.desc("count")).first()["pl"]
    )
    out["curate_lang"] = majority

    # untimed warmup on a small slice: first execution of these codegen-heavy
    # plans pays 5-10x JIT (BENCH.md "VM degradation audit"); the soak
    # measures the steady state a long-running 100 TB job actually sees
    warm = pages.limit(2_000).persist()
    curate_docs(warm, lang=majority, doc_col="url").count()
    minhash_dup_pairs(
        warm, num_hashes=NUM_HASHES, rows_per_band=ROWS_PER_BAND,
        threshold=0.7, doc_col="url", hash_fn="xxhash64",
    ).count()
    warm.unpersist()

    kept = curate_docs(
        pages, lang=majority, min_quality=0.2, min_tokens=20,
        max_tokens=2_000, doc_col="url",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stage("curate", kept.count)

    # survivors with text + quality, materialized OUTSIDE the timed stages
    # (re-joining text is bookkeeping both downstream stages share)
    surv = (
        pages.join(kept.select(F.col("doc_id").alias("url"), "quality_score"), "url")
        .select("url", "text", "quality_score")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    surv.count()

    pairs = minhash_dup_pairs(
        surv, num_hashes=NUM_HASHES, rows_per_band=ROWS_PER_BAND,
        threshold=0.7, doc_col="url", hash_fn="xxhash64",
        max_bucket_size=MAX_BUCKET or None,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    stage("minhash_pairs", pairs.count)

    clusters = dup_clusters(surv, pairs, doc_col="url").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    stage("dup_clusters", clusters.count)
    out["n_clusters"] = clusters.select("component").distinct().count()

    canon = canonical_docs(surv, pairs, score_col="quality_score", doc_col="url")
    stage("canonical_docs", canon.count)

    out["total_curation_sec"] = round(
        sum(s["wall_sec"] for n, s in out["stages"].items() if n != "generate"), 1
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
