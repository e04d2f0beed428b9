"""WAND win-regime benchmark (VERDICT r02 #2).

Builds the compressed block-max index over the 150k-page synthetic corpus
(enough blocks per head term that pruning can pay: df(w0000) ~ 10^5 ->
~10^3 blocks at block_size=128) and measures full-decode vs WAND latency
over a query mix, asserting result identity per query.

Usage: python tools/bench_wand.py [n_pages] [mode] [index_dir]
mode = 'base' (iid corpus: flat block maxima, pruning structurally
impossible — measures the fallback overhead) or 'skewed' (site-structured
web-realistic corpus: block maxima vary with site topic/length/spam, the
regime block-max pruning exists for). Index is built once per
(mode, n_pages) and reused if the manifest matches.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.session import get_spark  # noqa: E402
from search_engine_spark.functions.tokenize import query_tokens_py  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
MODE = sys.argv[2] if len(sys.argv) > 2 else "base"
IDX = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/wand_idx_{MODE}_{N}"

# base corpus: head (w0000...), mid, tail terms + planted rares.
BASE_QUERIES = [
    "w0000 w0001 w0002",              # pure head: many blocks, low idf
    "w0050 w0300 w1500",              # mid/tail mix
    "xylophonium w0000",              # df=1 rare + head
    "quartzine w0004 w0010",          # df=2 rare + head
    "w1800 w1900 w1999",              # pure tail: few blocks
    "w0100 w0200 w0400 w0800 w1600",  # 5-term spread
]

# skewed corpus: topics are 32-term vocab slices (w0096.. = topic 3 etc.).
# Same-topic queries have spam-farm hubs covering every term (high theta ->
# off-topic sites' blocks prunable); cross-topic queries bound how much a
# lower theta still prunes.
SKEWED_QUERIES = [
    "w0096 w0097 w0098",              # one topic, hubs exist
    "w0000 w0001 w0002",              # topic 0 + Zipf head: biggest lists
    "w0096 w0320 w1024",              # cross-topic: no single hub
    "w0500 w0501 w0502",              # mid-vocab topic
    "w1900 w1901 w1902",              # tail-vocab topic
    "w0096 w0100 w0110 w0120 w0127",  # 5 terms, one topic
]


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="bench_wand", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    manifest = os.path.join(IDX, "corpus.json")
    need_build = True
    if os.path.exists(manifest):
        with open(manifest) as f:
            need_build = json.load(f).get("corpus_size") != N
    if need_build:
        from search_engine_spark.sources.synth import synth_pages_df, synth_pages_skewed_df
        from search_engine_spark.index.build import build_compressed_index

        t0 = time.time()
        gen = synth_pages_skewed_df if MODE == "skewed" else synth_pages_df
        pages = gen(spark, N)
        build_compressed_index(pages, IDX, doc_col="url", text_col="text")
        print(f"build: {time.time() - t0:.1f}s for {N} pages ({MODE})", file=sys.stderr)

    from search_engine_spark.index.query import CompressedIndex

    ci = CompressedIndex(spark, IDX)
    ci.search_topk(query_tokens_py("warmup only"), top_k=10).collect()
    ci.search_topk(query_tokens_py("warmup only"), top_k=10, use_wand=True).collect()

    plain, wand, per_q = [], [], {}
    for q in SKEWED_QUERIES if MODE == "skewed" else BASE_QUERIES:
        toks = query_tokens_py(q)
        t0 = time.time()
        r_plain = ci.search_topk(toks, top_k=10).collect()
        tp = time.time() - t0
        t0 = time.time()
        r_wand = ci.search_topk(toks, top_k=10, use_wand=True).collect()
        tw = time.time() - t0
        # doc identity + rank exact; scores to 1e-9 (float64 partial-sum
        # tree order differs between the full-decode and rescore aggs ->
        # last-ULP differences, seen at 2M docs)
        assert [(r["rank"], r["doc_id"], round(r["score"], 9)) for r in r_plain] == [
            (r["rank"], r["doc_id"], round(r["score"], 9)) for r in r_wand
        ], f"WAND != full decode for {q!r}"
        plain.append(tp)
        wand.append(tw)
        per_q[q] = {"plain": round(tp, 3), "wand": round(tw, 3)}
    out = {
        "n_pages": N,
        "mode": MODE,
        "plain_p50": round(statistics.median(plain), 4),
        "wand_p50": round(statistics.median(wand), 4),
        "plain_total": round(sum(plain), 4),
        "wand_total": round(sum(wand), 4),
        "queries": per_q,
        "identical_results": True,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
