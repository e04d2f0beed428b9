"""Structured Streaming: incremental index == batch index; watermarked
window aggregation matches the batch operator on closed windows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.corpus_stats import build_bm25_index
from search_engine_spark.operators.scoring import search_topk
from search_engine_spark.streaming.ingest import (
    IncrementalIndexer,
    streaming_hourly_event_stats,
)


def test_incremental_index_equals_batch(spark, tiny_pages, tmp_path):
    """Stream pages in two file batches -> assembled index gives the same
    search results as a batch build over all pages."""
    src = str(tmp_path / "stream_src")
    half1 = tiny_pages.filter(F.col("url") < "https://synth.example/s4")
    half2 = tiny_pages.filter(F.col("url") >= "https://synth.example/s4")
    pages_flat = tiny_pages.select("url", "text")
    half1.select("url", "text").write.mode("overwrite").parquet(src)

    store = str(tmp_path / "inc_index")
    idxer = IncrementalIndexer(spark, store)
    schema = "url string, text string"
    stream = spark.readStream.schema(schema).parquet(src)
    q = idxer.start(stream, checkpoint=str(tmp_path / "cp1"))
    q.awaitTermination(120)

    # second batch arrives
    half2.select("url", "text").write.mode("append").parquet(src)
    stream2 = spark.readStream.schema(schema).parquet(src)
    q2 = idxer.start(stream2, checkpoint=str(tmp_path / "cp1"))
    q2.awaitTermination(120)

    inc = idxer.to_bm25_index()
    batch = build_bm25_index(pages_flat, doc_col="url", text_col="text")
    assert inc.corpus_size == batch.corpus_size
    assert inc.avgdl == pytest.approx(batch.avgdl, abs=1e-9)
    for query in [["w0000", "w0001"], ["xylophonium"], ["ubiquitone"]]:
        a = [(r["doc_id"], r["score"]) for r in search_topk(inc, query).orderBy("rank").collect()]
        b = [(r["doc_id"], r["score"]) for r in search_topk(batch, query).orderBy("rank").collect()]
        assert [x for x, _ in a] == [x for x, _ in b], query
        for (_, sa), (_, sb) in zip(a, b):
            assert sa == pytest.approx(sb, abs=1e-9)


def test_legacy_flat_layout_still_readable(spark, tiny_pages, tmp_path):
    """ADVICE r02: stores written by the pre-batch-subdir (flat append)
    layout have no partition-discovered `batch` column; to_bm25_index must
    fall back to an unfiltered read instead of failing on the missing
    column."""
    import json

    from search_engine_spark.operators.corpus_stats import build_postings_local

    store = str(tmp_path / "legacy")
    os.makedirs(store)
    pages = tiny_pages.select("url", "text").limit(10)
    pages = pages.filter(F.length(F.trim("text")) > 0)
    postings = build_postings_local(pages, doc_col="url", text_col="text")
    # legacy layout: flat append, no batch=<id> subdirectories
    postings.write.mode("append").parquet(os.path.join(store, "postings"))
    dl = postings.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("doc_len"))
    dl.write.mode("append").parquet(os.path.join(store, "docs"))
    agg = dl.agg(F.count(F.lit(1)), F.sum("doc_len")).collect()[0]
    with open(os.path.join(store, "state.json"), "w") as f:
        json.dump({"batches": [0], "n_docs": int(agg[0]), "sum_doc_len": int(agg[1])}, f)

    idx = IncrementalIndexer(spark, store).to_bm25_index()
    assert idx.corpus_size == int(agg[0])
    assert idx.postings.count() == postings.count()
    assert "batch" not in idx.postings.columns


def test_batch_replay_is_idempotent(spark, tiny_pages, tmp_path):
    """Re-delivering the same batch_id must not double-count (exactly-once)."""
    store = str(tmp_path / "inc2")
    idxer = IncrementalIndexer(spark, store)
    part = tiny_pages.select("url", "text").limit(20)
    idxer.process_batch(part, batch_id=0)
    n1 = idxer._state()["n_docs"]
    idxer.process_batch(part, batch_id=0)  # replay
    assert idxer._state()["n_docs"] == n1


def test_crash_between_write_and_record_is_atomic(spark, tiny_pages, tmp_path):
    """Crash AFTER the parquet write but BEFORE state.json records the
    batch: the redelivered batch must overwrite (not append), and readers
    must never see the orphan files — postings stay exactly-once."""
    store = str(tmp_path / "inc3")
    idxer = IncrementalIndexer(spark, store)
    part = tiny_pages.select("url", "text").limit(20)

    # 1. a successfully committed batch 0
    idxer.process_batch(part, batch_id=0)
    committed = idxer.to_bm25_index()
    rows_committed = committed.postings.count()
    n_committed = committed.corpus_size

    # 2. batch 1 "crashes" after writing files, before recording: simulate
    #    by running it fully, then rolling the STATE back (files remain)
    part2 = tiny_pages.select("url", "text").limit(35)
    idxer.process_batch(part2, batch_id=1)
    st = idxer._state()
    st["batches"].remove(1)
    st["n_docs"] = n_committed
    st["sum_doc_len"] = committed.avgdl * n_committed if n_committed else 0
    st["sum_doc_len"] = int(round(st["sum_doc_len"]))
    idxer._save_state(st)

    # orphan files exist but a reader sees only committed batches
    mid = idxer.to_bm25_index()
    assert mid.corpus_size == n_committed
    assert mid.postings.count() == rows_committed

    # 3. redelivery of batch 1 overwrites the orphan and commits
    idxer.process_batch(part2, batch_id=1)
    final = idxer.to_bm25_index()
    assert final.corpus_size == n_committed + 35
    # postings are exactly the union of the two batches, no duplicates
    expected = rows_committed + idxer.spark.read.parquet(
        f"{store}/postings/batch=1"
    ).count()
    assert final.postings.count() == expected
    per_batch = (
        spark.read.parquet(f"{store}/postings")
        .groupBy("doc_id", "term", "batch")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .count()
    )
    assert per_batch == 0


def test_streaming_sessionize_smoke(spark, tmp_path):
    """applyInPandasWithState wiring: ingest one micro-batch; sessions stay
    open (no timeout has fired), so append mode emits nothing — but the
    stateful operator must run cleanly end-to-end."""
    from search_engine_spark.streaming.ingest import streaming_sessionize

    events = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 7), (2, "2024-01-01 10:05:00", 7), (3, "2024-01-01 10:01:00", 8)],
        "event_id long, ts_s string, user_id long",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id")
    src = str(tmp_path / "sess_src")
    events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("event_id long, ts timestamp, user_id long").parquet(src)
    out = streaming_sessionize(stream, gap_minutes=30)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from sess_out").collect()
    assert rows == []  # sessions still open after one batch


def test_streaming_sessionize_timeout_closes_session(spark, tmp_path):
    """The ProcessingTimeTimeout path actually fires: ingest user 7's
    events, wait past the gap, ingest an unrelated user's event — the next
    micro-batch must emit user 7's CLOSED session with the right bounds."""
    import time as _time

    from pyspark.sql import functions as F  # noqa: F811

    from search_engine_spark.streaming.ingest import streaming_sessionize

    src = str(tmp_path / "sess_to_src")
    schema = "event_id long, ts timestamp, user_id long"

    def write(rows, mode):
        spark.createDataFrame(rows, "event_id long, ts_s string, user_id long").select(
            "event_id", F.to_timestamp("ts_s").alias("ts"), "user_id"
        ).write.mode(mode).parquet(src)

    write([(1, "2024-01-01 10:00:00", 7), (2, "2024-01-01 10:00:30", 7)], "overwrite")
    stream = spark.readStream.schema(schema).parquet(src)
    out = streaming_sessionize(stream, gap_minutes=0.05)  # 3s gap
    q = (
        out.writeStream.format("memory")
        .queryName("sess_to")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_sess_to"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        rows = []
        for i in range(60):
            _time.sleep(2)
            rows = spark.sql("select * from sess_to").collect()
            if rows:
                break
            if i == 4:
                # some Spark versions only evaluate timers when a batch has
                # data — nudge with an unrelated user's event
                write([(3, "2024-01-01 11:00:00", 8)], "append")
        u7 = [r for r in rows if r["user_id"] == 7]
        assert len(u7) == 1, rows
        r = u7[0]
        assert r["n_events"] == 2
        assert r["session_start"].strftime("%H:%M:%S") == "10:00:00"
        assert r["session_end"].strftime("%H:%M:%S") == "10:00:30"
    finally:
        q.stop()


def test_streaming_window_matches_batch(spark, tmp_path):
    """availableNow file stream through the watermarked window agg ==
    batch date_trunc aggregation (closed windows, counts + avg)."""
    events = spark.createDataFrame(
        [
            (i, f"2024-01-01 {h:02d}:{m:02d}:00", i % 5, "click" if i % 2 else "view", float(i))
            for i, (h, m) in enumerate((h, m) for h in range(4) for m in (0, 20, 40))
        ],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select("event_id", F.to_timestamp("ts_s").alias("ts"), "user_id", "event_type", "value")
    src = str(tmp_path / "ev_src")
    events.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).parquet(src)
    out = streaming_hourly_event_stats(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "cp_ev"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["ws"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in spark.sql("select * from win_out").collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n_events"], r["avg_value"])
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .collect()
    }
    # append mode emits only windows closed by the watermark; every emitted
    # window must match the batch result exactly
    assert len(got) > 0
    for k, v in got.items():
        assert k in want and v[0] == want[k][0] and v[1] == pytest.approx(want[k][1]), k
