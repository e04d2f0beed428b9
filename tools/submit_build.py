"""spark-submit entry point for the index build (north-rule deployment).

Cluster usage (the deployment contract; executors receive the package via
--py-files, no driver-only imports on the executor path):

    python tools/make_pyfiles_zip.py            # -> dist/search_engine_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/search_engine_spark.zip \
        tools/submit_build.py <input_parquet_or_table> <index_path> [weight_col]

Reads the pages table, extracts text when only html is present, builds the
compressed block-max index with lineage manifests (resumable: re-submitting
with the same input skips completed stages), prints the manifest summary.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    input_path, index_path = sys.argv[1], sys.argv[2]
    weight_col = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("search-engine-index-build").getOrCreate()

    from search_engine_spark.functions.html_extract import extract_text_udf
    from search_engine_spark.index.build import build_compressed_index

    pages = spark.read.parquet(input_path)
    if "text" not in pages.columns and "html" in pages.columns:
        pages = pages.withColumn("text", extract_text_udf(F.col("html")))
    key = "url" if "url" in pages.columns else "doc_id"

    manifest = build_compressed_index(
        pages, index_path, doc_col=key, text_col="text", weight_col=weight_col
    )
    print(json.dumps({"index_path": index_path, "stages": manifest["stages"]}, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
