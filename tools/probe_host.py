"""Host parallel-capability probe (no Spark, no JVM).

Separates "the engine doesn't scale" from "the host doesn't scale": runs a
fixed pure-CPU work unit (sha256 over a 1 MiB buffer, GIL released) in K
OS processes for K in --workers, and reports per-worker and aggregate
throughput plus strong-scaling efficiency vs the 1-worker run. If THIS
number is well under 1.0 at 4 workers, no Spark configuration on the same
box can hit the north rule's 0.8 — the deficit is host-level (shared /
throttled cores), not engine code. Pin against BENCH.md scaling sections.

Usage: python tools/probe_host.py [--workers 1,4,32] [--seconds 8]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import multiprocessing as mp
import os
import time


_BARRIER = None


def _init_barrier(barrier) -> None:
    global _BARRIER
    _BARRIER = barrier


def _work(args: tuple[int, float]) -> tuple[int, float, float]:
    """Hash a 1 MiB buffer repeatedly for ~seconds; return (iterations,
    start, end). All workers rendezvous at a barrier BEFORE timing begins:
    a spawn Pool staggers process start by hundreds of ms, and un-overlapped
    head/tail time understates contention at high K (ADVICE r04)."""
    seed, seconds = args
    buf = bytes([seed % 256]) * (1 << 20)
    if _BARRIER is not None:
        _BARRIER.wait()
    n = 0
    t_start = time.time()
    t_end = t_start + seconds
    while time.time() < t_end:
        hashlib.sha256(buf).digest()
        n += 1
    return n, t_start, time.time()


def run(workers: int, seconds: float) -> dict:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(workers)
    t0 = time.time()
    with ctx.Pool(workers, initializer=_init_barrier, initargs=(barrier,)) as pool:
        results = pool.map(_work, [(i, seconds) for i in range(workers)])
    wall = time.time() - t0
    total_mb = sum(n for n, _, _ in results)  # 1 MiB per iteration
    # throughput over the measured FULL span (min start -> max end): with
    # the barrier the spans coincide to ~ms, and the full span is the
    # conservative denominator (never inflates aggregate throughput)
    span = max(e for _, _, e in results) - min(s for _, s, _ in results)
    return {
        "workers": workers,
        "wall_sec": round(wall, 2),
        "measured_span_sec": round(span, 3),
        "agg_mb_per_sec": round(total_mb / span, 1),
        "per_worker_mb_per_sec": round(total_mb / span / workers, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,4,32")
    ap.add_argument("--seconds", type=float, default=8.0)
    args = ap.parse_args()
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    counts = [int(x) for x in args.workers.split(",")]
    runs = [run(k, args.seconds) for k in counts]
    base = runs[0]
    for r in runs[1:]:
        ratio = r["workers"] / base["workers"]
        r["efficiency_vs_first"] = round(
            (r["agg_mb_per_sec"] / base["agg_mb_per_sec"]) / ratio, 3
        )
    print(json.dumps({"probe": "sha256_1mib", "runs": runs}))


if __name__ == "__main__":
    main()
