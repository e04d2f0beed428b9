"""Host memory-bandwidth scaling probe (no Spark, no JVM).

Companion to probe_host.py (pure-CPU sha256): Spark's shuffle / Tungsten
sort / parquet+snappy / Arrow paths are memory-bandwidth heavy, so when
pure-CPU scales ~1.0 but the index build scales ~0.7, the next suspect is
the host's shared memory controllers. Each worker repeatedly copies a
buffer far larger than L3 (numpy memcpy ~= STREAM copy); workers
rendezvous at a barrier before timing (same protocol as probe_host).
Aggregate GB/s flat in K = a shared ceiling no engine code can beat;
per-worker GB/s dropping with K quantifies it.

On a real N-node cluster each executor brings its OWN memory controllers,
so bandwidth scales with N across machines — this probe measures the
single-box sandbox substitute's ceiling, not the engine.

Usage: python tools/probe_membw.py [--workers 1,2,4,8] [--mb 256] [--seconds 6]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time

import numpy as np

_BARRIER = None


def _init_barrier(barrier) -> None:
    global _BARRIER
    _BARRIER = barrier


def _work(args: tuple[int, float, int]) -> tuple[float, float, float]:
    seed, seconds, mb = args
    src = np.full(mb * (1 << 20) // 8, seed + 1, dtype=np.int64)
    dst = np.empty_like(src)
    dst[:] = src  # touch all pages before timing
    if _BARRIER is not None:
        _BARRIER.wait()
    n = 0
    t_start = time.time()
    t_end = t_start + seconds
    while time.time() < t_end:
        dst[:] = src
        n += 1
    # bytes moved = read src + write dst per pass
    return 2.0 * n * src.nbytes, t_start, time.time()


def run(workers: int, seconds: float, mb: int) -> dict:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(workers)
    with ctx.Pool(workers, initializer=_init_barrier, initargs=(barrier,)) as pool:
        results = pool.map(_work, [(i, seconds, mb) for i in range(workers)])
    span = max(e for _, _, e in results) - min(s for _, s, _ in results)
    total_gb = sum(b for b, _, _ in results) / 1e9
    return {
        "workers": workers,
        "measured_span_sec": round(span, 3),
        "agg_gb_per_sec": round(total_gb / span, 2),
        "per_worker_gb_per_sec": round(total_gb / span / workers, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", default="1,2,4,8")
    ap.add_argument("--mb", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=6.0)
    args = ap.parse_args()
    counts = [int(x) for x in args.workers.split(",")]
    runs = [run(k, args.seconds, args.mb) for k in counts]
    base = runs[0]
    for r in runs[1:]:
        ratio = r["workers"] / base["workers"]
        r["efficiency_vs_first"] = round(
            (r["agg_gb_per_sec"] / base["agg_gb_per_sec"]) / ratio, 3
        )
    print(json.dumps({"probe": "memcpy_stream", "buffer_mb": args.mb, "runs": runs}))


if __name__ == "__main__":
    main()
