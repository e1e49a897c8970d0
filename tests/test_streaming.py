"""Streaming ingest test: parquet-backed micro-batches drive the seed
stream to completion synchronously (memory sink)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from publicationsretriever_spark.streaming.ingest import (
    per_host_rates,
    seed_stream_to_frontier,
)

SCHEMA = "id string, url string, ts timestamp"


def test_seed_stream_to_frontier(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", "https://h1.org/files/x.pdf", t0),
        ("b", "https://h1.org/files/x.pdf", t0),           # dup url
        ("c", "https://www.facebook.com/x/y", t0),          # gated out
        ("d", "https://h2.org/article/1", t0),
    ]
    src = tmp_path / "seeds"
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(src))

    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    frontier = seed_stream_to_frontier(stream, num_buckets=8)
    q = (
        frontier.writeStream.outputMode("append")
        .format("memory")
        .queryName("frontier_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM frontier_out").collect()
    urls = sorted(r["url"] for r in out)
    assert urls == ["https://h1.org/files/x.pdf", "https://h2.org/article/1"]
    assert all(r["url_hash"] is not None and r["host_bucket"] is not None for r in out)


def test_per_host_rates(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("a", f"https://h1.org/files/{i}.pdf", t0 + dt.timedelta(minutes=i))
        for i in range(4)
    ]
    src = tmp_path / "seeds2"
    spark.createDataFrame(rows, SCHEMA).write.parquet(str(src))
    stream = spark.readStream.schema(SCHEMA).parquet(str(src))
    rates = per_host_rates(seed_stream_to_frontier(stream, num_buckets=8))
    q = (
        rates.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rates_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT host, n_urls FROM rates_out").collect()
    assert sum(r["n_urls"] for r in out) == 4
    assert all(r["host"] == "h1.org" for r in out)


def test_stateful_politeness_slots_continue_across_batches(spark, tmp_path):
    """applyInPandasWithState politeness: per-host slot numbering is
    durable stream state — the second micro-batch continues exactly
    where the first stopped (the batch engine resets per round)."""
    from publicationsretriever_spark.streaming.ingest import schedule_politely

    t0 = dt.datetime(2024, 1, 1)
    src = tmp_path / "seeds3"
    src.mkdir()
    # two separate files + maxFilesPerTrigger=1 => two micro-batches
    spark.createDataFrame(
        [("a", f"https://h9.org/files/a{i}.pdf", t0) for i in range(3)], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b1"))
    spark.createDataFrame(
        [("b", f"https://h9.org/files/b{i}.pdf", t0) for i in range(2)], SCHEMA
    ).coalesce(1).write.parquet(str(src / "b2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    sched = schedule_politely(seed_stream_to_frontier(stream, num_buckets=8))
    q = (
        sched.writeStream.outputMode("append")
        .format("memory")
        .queryName("sched_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM sched_out").collect()
    assert len(out) == 5
    slots = sorted(r["planned_fetch_ms"] for r in out)
    # 5 urls of one host, slots 0..12000 in 3000ms steps with NO reset
    # at the micro-batch boundary
    assert slots == [0, 3000, 6000, 9000, 12000]


def test_payload_dedup_stream(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", "hashA", t0),
        ("u2", "hashA", t0 + dt.timedelta(minutes=5)),   # dup within wm
        ("u3", "hashB", t0 + dt.timedelta(minutes=1)),
        ("u4", "hashC", t0 + dt.timedelta(minutes=2)),
        ("u5", "hashB", t0 + dt.timedelta(minutes=59)),  # dup within wm
    ]
    src = tmp_path / "payloads"
    schema = "url string, content_hash string, fetch_ts timestamp"
    spark.createDataFrame(rows, schema).write.parquet(str(src))

    from publicationsretriever_spark.streaming.ingest import (
        payload_dedup_stream,
    )

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        payload_dedup_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM dedup_out").collect()
    # one survivor per hash; the survivor is the first-in-batch row
    assert sorted(r["content_hash"] for r in out) == [
        "hashA", "hashB", "hashC",
    ]
