"""Watermark semantics under controlled micro-batch ordering
(SURVEY.md §2 stream_late_data): a late event arriving after the watermark
passed its window is dropped by the engine, finalized windows emit exactly
once, and still-open windows emit nothing in append mode.

File order is forced via modification times (the file stream source
processes oldest-first with maxFilesPerTrigger=1). The late row arrives a
full micro-batch after its window was evicted — a late row landing in the
same batch as the eviction still merges (watermark filtering uses the
previous batch's watermark), which is why the scenario needs three batches.
"""

from __future__ import annotations

import time
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from aind_data_transformation_spark.streaming import jobs

_NS = 1_000_000_000
_BASE = 1704067200  # 2024-01-01T00:00:00Z


def _write_events(path: str, rows: list[tuple[int, int]]) -> None:
    """rows: (event_id, ts_seconds_since_2024) as ns-timestamp parquet
    matching the events.parquet physical schema."""
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([(_BASE + r[1]) * _NS for r in rows], pa.int64()),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(table, path)


def test_late_event_dropped_after_watermark(spark, tmp_path):
    src = tmp_path / "events_stream"
    src.mkdir()
    # batch 1: two rows in W0=[00:00,00:10) + a row at 03:00 that will
    # push the 1-hour watermark to 02:00 > W0.end
    _write_events(str(src / "b1.parquet"), [(0, 0), (1, 300), (2, 10800)])
    time.sleep(1.1)  # distinct mtimes => deterministic batch order
    # batch 2: advances event time; W0 is evicted + emitted this batch
    _write_events(str(src / "b2.parquet"), [(10, 11160)])
    time.sleep(1.1)
    # batch 3: a LATE row for the already-finalized W0, plus a fresh row
    _write_events(str(src / "b3.parquet"), [(3, 420), (4, 12600)])

    events = (
        spark.readStream.schema(jobs.EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    )
    agg = (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "10 minutes"))
        .count()
        .select(F.col("window.start").alias("win_start"), "count")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    dropped = sum(
        p["stateOperators"][0]["numRowsDroppedByWatermark"]
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1  # exactly the late event_id=3

    rows = spark.sql(f"SELECT * FROM {name}").collect()
    emitted = {r["win_start"].strftime("%H:%M"): r["count"] for r in rows}
    # W0 finalized exactly once with only the on-time rows
    assert emitted == {"00:00": 2}
