"""One full index-build job at a given parallelism — the scaling-efficiency
measurement unit (north rule: same job, same input, N vs 4N cores).

Usage: python tools/scaling_job.py local[8] /tmp/pages.parquet /tmp/idx_8 [shuffle_parts]

Also accepts local-cluster[N,C,mem_mb] masters (separate worker/executor
JVMs on one box — the multi-executor deployment shape). In that mode the
job MUST be launched through spark-submit --py-files (see
tools/bench_scaling_cluster.py): executor Python workers import the
package from the shipped zip, not the driver's cwd.

Pipeline measured: read pages parquet -> HTML extraction (pandas UDF) ->
tokenize -> postings/stats -> compressed block-max index written to disk.
Prints one JSON line {"master", "wall_sec", "docs", "docs_per_sec"}.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F


def _total_cores(master: str) -> int:
    inner = master.split("[", 1)[1].rstrip("]")
    if master.startswith("local-cluster"):
        n_exec, cores_per, _mem_mb = inner.split(",")
        return int(n_exec) * int(cores_per)
    return int(inner)


def main() -> None:
    master, input_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    cores = _total_cores(master)
    # partitioning must scale with cores for a fair strong-scaling run:
    # shuffle width 2x cores, and AQE must not coalesce below core count
    # (default 64MB advisory size would squeeze this corpus to ~1 partition)
    shuffle = int(sys.argv[4]) if len(sys.argv) > 4 else cores * 2
    shutil.rmtree(out_path, ignore_errors=True)

    from search_engine_spark.functions.html_extract import extract_text_udf
    from search_engine_spark.index.build import build_compressed_index
    from search_engine_spark.session import get_spark

    spark = get_spark(
        app_name=f"scaling-{master}",
        master=master,
        shuffle_partitions=shuffle,
        extra_conf={
            "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64k",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
            "spark.sql.files.maxPartitionBytes": "4m",
        },
    )
    pages = spark.read.parquet(input_path)
    n_docs = pages.count()

    # pre-warm: fork+import Python UDF workers and JIT the codegen paths on
    # a tiny sample BEFORE the clock starts — cluster startup cost is not
    # part of steady-state indexing throughput (a real deployment reuses
    # warm executors; the north rule measures indexing throughput, not
    # JVM/Python cold start)
    warm = pages.limit(256).repartition(cores * 2)
    warm.select(extract_text_udf(F.col("html")).alias("t")).agg(
        F.sum(F.length("t"))
    ).collect()

    t0 = time.time()
    # extraction is the Python-heavy stage: spread it over all cores and
    # persist so downstream stats/encode jobs read text, not re-parse HTML
    extracted = (
        pages.repartition(cores * 2)
        .select("url", extract_text_udf(F.col("html")).alias("text"))
        .persist()
    )
    extracted.count()  # materialize: splits the extract phase out of build
    t_extract = round(time.time() - t0, 2)
    t1 = time.time()
    build_compressed_index(extracted, out_path, doc_col="url", text_col="text")
    t_build = round(time.time() - t1, 2)
    wall = time.time() - t0

    # per-stage walls from the build's own manifest: the scaling diagnosis
    # needs to know WHICH stage fails to scale, not just the total
    stage_walls = {}
    try:
        import os

        with open(os.path.join(out_path, "_MANIFEST.json")) as f:
            stage_walls = {
                k: v.get("wall_sec") for k, v in json.load(f)["stages"].items()
            }
    except OSError:
        pass

    print(
        json.dumps(
            {
                "master": master,
                "wall_sec": round(wall, 2),
                "docs": n_docs,
                "docs_per_sec": round(n_docs / wall, 2),
                "extract_sec": t_extract,
                "build_sec": t_build,
                "stage_walls": stage_walls,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
