"""Structured Streaming tests (SURVEY §2.10): file-source stream over the
daily JSONL landing layout, dedup-within-watermark, daily tumbling
aggregation, exactly-once bronze sink via checkpointing.

All runs use trigger(availableNow=True) so they are bounded and
deterministic under test.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.streaming.ingest import (
    daily_counts,
    dedup_within_watermark,
    read_event_stream,
    write_bronze_stream,
)
from tests.conftest import fixture_events


@pytest.fixture(scope="module")
def landing_dir(tmp_path_factory) -> str:
    """Daily landing layout: one dir per ingest day, duplicates included
    (the raw pre-dedup stream — the conftest jsonl fixture's shape)."""
    root = tmp_path_factory.mktemp("stream_landing")
    events = fixture_events()
    by_day: dict[str, list[dict]] = {}
    for e in events:
        day = e["ingested_at"][:10]
        by_day.setdefault(day, []).append(e)
    for day, evs in by_day.items():
        d = root / day
        d.mkdir()
        (d / "events.jsonl").write_text("\n".join(json.dumps(e) for e in evs) + "\n")
    return str(root)


def _run_to_memory(stream_df, name: str, output_mode: str):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_dedup_within_watermark(spark, landing_dir):
    stream = read_event_stream(spark, f"{landing_dir}/*/events.jsonl")
    deduped = dedup_within_watermark(stream, watermark="7 days")
    _run_to_memory(deduped, "dedup_sink", "append")
    out = spark.sql("SELECT event_id FROM dedup_sink")
    # the exact duplicate (same event_id, later ingested_at) collapsed
    assert out.count() == out.distinct().count() == 15


def test_stream_daily_counts(spark, landing_dir):
    stream = read_event_stream(spark, f"{landing_dir}/*/events.jsonl")
    counts = daily_counts(stream, watermark="7 days")
    _run_to_memory(counts, "daily_sink", "complete")
    rows = {
        (str(r.event_date), r.event_type): r.n_events
        for r in spark.sql("SELECT * FROM daily_sink").collect()
    }
    # fixture: 2 order events on 2026-02-10 (ord-b-1, ord-a-1); the raw
    # stream still carries the duplicate, so 2026-02-11 order_updated = 2
    assert rows[("2026-02-10", "order_created")] == 2
    assert rows[("2026-02-11", "order_updated")] == 2
    assert rows[("2026-02-13", "refund_issued")] == 2


def test_stream_bronze_sink_exactly_once(spark, landing_dir, tmp_path):
    bronze = str(tmp_path / "bronze")
    ckpt = str(tmp_path / "ckpt")
    stream = dedup_within_watermark(
        read_event_stream(spark, f"{landing_dir}/*/events.jsonl")
    )
    q = write_bronze_stream(stream, bronze, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(bronze).count()
    assert first == 15
    # re-run with the SAME checkpoint: no new source files → no new rows
    q2 = write_bronze_stream(
        dedup_within_watermark(read_event_stream(spark, f"{landing_dir}/*/events.jsonl")),
        bronze,
        ckpt,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(bronze).count() == first
    # partitioned by ingest date → partition pruning on the date predicate
    one_day = spark.read.parquet(bronze).where(F.col("ingest_date") == "2026-02-10")
    assert 0 < one_day.count() < first
