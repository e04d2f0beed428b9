"""WAND win-regime benchmark (VERDICT r02 #2).

Builds the compressed block-max index over the 150k-page synthetic corpus
(enough blocks per head term that pruning can pay: df(w0000) ~ 10^5 ->
~10^3 blocks at block_size=128) and measures full-decode vs WAND latency
over a query mix, asserting result identity per query.

Usage: python tools/bench_wand.py [n_pages] [index_dir]
Index is built once and reused if the manifest matches n_pages.
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
IDX = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/wand_idx_{N}"

# head (w0000...), mid, tail terms + planted rares: the regimes WAND cares
# about. Rare+head mixes are where block pruning pays (theta driven by the
# high-idf term prunes the head term's many low-max blocks).
QUERIES = [
    "w0000 w0001 w0002",              # pure head: many blocks, low idf
    "w0050 w0300 w1500",              # mid/tail mix
    "xylophonium w0000",              # df=1 rare + head
    "quartzine w0004 w0010",          # df=2 rare + head
    "w1800 w1900 w1999",              # pure tail: few blocks
    "w0100 w0200 w0400 w0800 w1600",  # 5-term spread
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
        from search_engine_spark.sources.synth import synth_pages_df
        from search_engine_spark.index.build import build_compressed_index

        t0 = time.time()
        pages = synth_pages_df(spark, N)
        build_compressed_index(pages, IDX, doc_col="url", text_col="text")
        print(f"build: {time.time() - t0:.1f}s for {N} pages", file=sys.stderr)

    from search_engine_spark.index.query import CompressedIndex

    ci = CompressedIndex(spark, IDX)
    ci.search_topk(query_tokens_py("warmup only"), top_k=10).collect()
    ci.search_topk(query_tokens_py("warmup only"), top_k=10, use_wand=True).collect()

    plain, wand, per_q = [], [], {}
    for q in QUERIES:
        toks = query_tokens_py(q)
        t0 = time.time()
        r_plain = ci.search_topk(toks, top_k=10).collect()
        tp = time.time() - t0
        t0 = time.time()
        r_wand = ci.search_topk(toks, top_k=10, use_wand=True).collect()
        tw = time.time() - t0
        assert [tuple(r) for r in r_plain] == [tuple(r) for r in r_wand], (
            f"WAND != full decode for {q!r}"
        )
        plain.append(tp)
        wand.append(tw)
        per_q[q] = {"plain": round(tp, 3), "wand": round(tw, 3)}
    out = {
        "n_pages": N,
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
