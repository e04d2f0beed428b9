"""Head-term skew handling (north rule §: explicit salting/repartitioning).

Zipf head terms concentrate load wherever a per-term reduce materializes
whole groups. Where each technique applies in this engine:

- ALGEBRAIC aggregations (count/sum/min/max — e.g. document frequency A2)
  need no salting: Spark's partial (map-side) aggregation already collapses
  a head term to one row per map task before the shuffle.
- HOLISTIC aggregations (collect_list, exact distinct-array, the per-term
  posting-LIST materialization) DO hot-spot. The index build sidesteps this
  by range-partitioning postings on (term, doc_int) — a head term's list
  SPANS partitions and is encoded as independent blocks (index/build.py).
- When a true per-key holistic agg is unavoidable, ``salted_agg`` runs the
  classic two-phase plan: phase 1 groups on (key, salt) — S-way fan-out
  bounds any single reducer; phase 2 merges the S partials per key.
- ``head_keys`` finds the keys worth salting (df above threshold) so the
  salt fan-out applies only where needed (``salted_agg(..., only_keys=)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(salt_buckets: int, *cols: Column) -> Column:
    """Deterministic salt in [0, salt_buckets): hash of the row's cols."""
    return F.pmod(F.xxhash64(*cols), F.lit(salt_buckets)).cast("int")


def head_keys(df: DataFrame, key: str, threshold: int) -> DataFrame:
    """Keys whose row count exceeds threshold (algebraic pre-pass, cheap)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > threshold)
        .select(key)
    )


def salted_collect_list(
    df: DataFrame,
    key: str,
    value: str,
    salt_buckets: int = 16,
    sort_result: bool = True,
) -> DataFrame:
    """(key, values array) via two-phase salted collect — no single reducer
    ever sees more than ~1/salt_buckets of a head key's rows in phase 1.

    Result order is normalized with array_sort (holistic list order is
    non-deterministic under any parallel plan).
    """
    phase1 = (
        df.withColumn("_salt", salt_col(salt_buckets, F.col(value)))
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    merged = phase1.groupBy(key).agg(
        F.flatten(F.collect_list("_part")).alias("values")
    )
    if sort_result:
        merged = merged.select(key, F.array_sort("values").alias("values"))
    return merged


def salted_count_distinct(
    df: DataFrame, key: str, value: str, salt_buckets: int = 16
) -> DataFrame:
    """(key, n_distinct) with a salted exact distinct: phase 1 dedups
    (key, salt, value) partitions, phase 2 sums partial distinct counts.
    Valid because the salt is a function of the VALUE: equal values land in
    the same salt bucket, so cross-bucket double counting is impossible."""
    phase1 = (
        df.withColumn("_salt", salt_col(salt_buckets, F.col(value)))
        .select(key, "_salt", value)
        .distinct()
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return phase1.groupBy(key).agg(F.sum("_n").cast("long").alias("n_distinct"))
