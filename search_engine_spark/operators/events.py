"""Event-stream analytics (batch form; streaming variants in streaming/).

The reference has no stream processing (SURVEY.md §2.9); these are the
standard event-table operators a corpus-ingest pipeline needs, expressed so
the identical logic runs under Structured Streaming (windowed aggregation is
watermark-compatible; sessionization maps to applyInPandasWithState — see
streaming/ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hourly_event_stats(events: DataFrame, round_to: int = 6) -> DataFrame:
    """(ws, event_type, n_events, n_users, avg_value): tumbling 1h windows.

    Uses date_trunc (== F.window 1-hour tumbling start) so the batch oracle
    is expressible in ANSI SQL; the streaming variant uses F.window +
    watermark on the same truncation.
    """
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("ws"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.avg("value"), round_to).alias("avg_value"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """(user_id, session_id, session_start, session_end, n_events).

    Gap-based sessionization: a new session starts when the time since the
    user's previous event exceeds the gap. Classic lag + cumulative-sum
    windows — shuffles once on user_id; skew bounded by per-user activity.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    flagged = events.withColumn(
        "new_sess",
        F.when(
            gap.isNull()
            | ((F.unix_timestamp("ts") - F.unix_timestamp(gap)) > gap_minutes * 60),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    with_sess = flagged.withColumn(
        "session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return with_sess.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )
