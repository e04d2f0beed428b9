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


def _work(args: tuple[int, float]) -> int:
    """Hash a 1 MiB buffer repeatedly for ~seconds; return iterations."""
    seed, seconds = args
    buf = bytes([seed % 256]) * (1 << 20)
    n = 0
    t_end = time.time() + seconds
    while time.time() < t_end:
        hashlib.sha256(buf).digest()
        n += 1
    return n


def run(workers: int, seconds: float) -> dict:
    t0 = time.time()
    with mp.get_context("spawn").Pool(workers) as pool:
        iters = pool.map(_work, [(i, seconds) for i in range(workers)])
    wall = time.time() - t0
    total_mb = sum(iters)  # 1 MiB per iteration
    return {
        "workers": workers,
        "wall_sec": round(wall, 2),
        "agg_mb_per_sec": round(total_mb / seconds, 1),
        "per_worker_mb_per_sec": round(total_mb / seconds / workers, 1),
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
