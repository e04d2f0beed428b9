"""Table-format detection: Iceberg when a runtime catalog exists, else the
parquet + JSON-manifest layout (same logical contract).

The north rule targets Iceberg tables; this sandbox ships no Iceberg
runtime jar, so `index/build.py` writes parquet plus explicit snapshot /
per-file lineage manifests that carry the metadata an Iceberg commit would
(input snapshot id, per-file row/byte stats, stage completion). When a
cluster HAS Iceberg configured (spark.sql.catalog.* with an Iceberg
implementation), ``write_table``/``read_table`` below route through
``writeTo(...).createOrReplace()`` so the same build code lands in real
Iceberg tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff an Iceberg catalog is configured AND its classes load."""
    conf = spark.sparkContext.getConf().getAll()
    catalogs = [
        k for k, v in conf
        if k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
    ]
    if not catalogs:
        return False
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def write_table(df: DataFrame, identifier_or_path: str, fmt_hint: str | None = None) -> str:
    """Write to Iceberg when available (identifier like cat.db.tbl), else
    parquet at the path. Returns the format used."""
    spark = df.sparkSession
    if fmt_hint == "iceberg" or (fmt_hint is None and "." in identifier_or_path and iceberg_available(spark)):
        df.writeTo(identifier_or_path).using("iceberg").createOrReplace()
        return "iceberg"
    df.write.mode("overwrite").parquet(identifier_or_path)
    return "parquet"


def read_table(spark: SparkSession, identifier_or_path: str) -> DataFrame:
    if "/" not in identifier_or_path and iceberg_available(spark):
        return spark.read.table(identifier_or_path)
    return spark.read.parquet(identifier_or_path)
