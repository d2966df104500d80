"""fact_shipments silver consumer (Q8 upgrade — the reference LOADS
shipment events but never queries them, SURVEY §1.4 Q8 / reference
src/bootstrap_loader.py:79). Covers: all three vendor dialects + their
drift variants, last-writer-wins current state, the ship-latency quality
section, and a raw replay over the reference's shipped live day."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.plans.quality import shipment_latency_metrics
from commercepulse_data_pipeline_spark.plans.silver import normalize_orders, normalize_shipments

LIVE_FILE = "/root/reference/data/live_events/2026-02-19/events.jsonl"


def _env(event_id, event_type, payload, event_time="2026-02-14T12:00:00Z", vendor="vendor_b"):
    return (event_id, event_type, event_time, vendor, json.dumps(payload), "2026-02-20T00:00:00Z", "t")


COLS = ["event_id", "event_type", "event_time", "vendor", "payload", "ingested_at", "source"]


def test_normalize_shipments_dialects_and_lww(spark):
    rows = [
        # vendor_a dialect (+ drift twin update_time)
        _env("s1", "shipment_updated", {"orderRef": "O1", "tracking": "T1", "status": "CREATED", "updateTime": "2026-02-14T10:00:00Z"}, vendor="vendor_a"),
        _env("s2", "shipment_updated", {"orderRef": "O1", "tracking": "T1", "status": "IN_TRANSIT", "update_time": "2026-02-14T12:00:00Z"}, vendor="vendor_a"),
        # vendor_b dialect (+ drift shipment_status→status)
        _env("s3", "shipment_updated", {"order_id": "O2", "tracking_code": "T2", "shipment_status": "DELIVERED", "time": "2026-02-14T11:00:00Z"}),
        # vendor_c dialect: nested order id + epoch seconds
        _env("s4", "shipment_updated", {"order": {"id": "O3"}, "tracking": "T3", "state": "PICKED_UP", "ts": 1771058400}, vendor="vendor_c"),
        # historical bootstrap shape
        _env("s5", "historical_shipment", {"shipment_id": "T4", "order_id": "O4", "status": "delivered", "shipped_at": "2023-06-01T00:00:00Z"}, vendor="unknown"),
        # no tracking id at all → dropped
        _env("s6", "shipment_updated", {"order_id": "O5", "status": "CREATED"}),
        # non-shipment event → filtered by type
        _env("x1", "order_created", {"order_id": "O9", "tracking": "NOPE"}),
    ]
    out = {r.tracking_id: r for r in normalize_shipments(spark.createDataFrame(rows, COLS)).collect()}
    assert set(out) == {"T1", "T2", "T3", "T4"}
    # last-writer-wins by update time: T1's later IN_TRANSIT beats CREATED
    assert out["T1"].shipment_status == "in_transit" and out["T1"].event_id == "s2"
    assert out["T2"].shipment_status == "delivered" and out["T2"].order_id == "O2"
    assert out["T3"].order_id == "O3"
    assert str(out["T3"].shipment_time).startswith("2026-02-14")  # epoch parsed
    assert out["T4"].event_type == "historical_shipment"


def test_shipment_latency_metrics_section(spark):
    orders = spark.createDataFrame(
        [("O1", "2026-02-10T00:00:00Z"), ("O2", "2026-01-01T00:00:00Z")],
        ["order_id", "created_at"],
    ).withColumn("created_at", F.to_timestamp("created_at"))
    shipments = spark.createDataFrame(
        [
            ("T1", "O1", "in_transit", "2026-02-12T00:00:00Z"),   # 2 days
            ("T2", "O2", "delivered", "2026-02-02T00:00:00Z"),    # 32 days
            ("T9", "O-GHOST", "created", "2026-02-12T00:00:00Z"),  # no order → dropped
        ],
        ["tracking_id", "order_id", "shipment_status", "shipment_time"],
    ).withColumn("shipment_time", F.to_timestamp("shipment_time"))
    rows = {r.shipment_status: r for r in shipment_latency_metrics(orders, shipments).collect()}
    assert set(rows) == {"in_transit", "delivered"}
    assert rows["in_transit"].avg_days_to_update == 2.0
    assert rows["in_transit"].over_7d == 0
    assert rows["delivered"].over_7d == 1 and rows["delivered"].over_30d == 1


@pytest.mark.skipif(not os.path.exists(LIVE_FILE), reason="reference tree not available")
def test_shipments_replay_reference_live_day(spark):
    """The shipped live day carries 551 shipment_updated events over 485
    distinct tracking ids (dup events + multi-update chains) — the silver
    view must land exactly one current-state row per tracking id, every
    status in the generator's domain."""
    from commercepulse_data_pipeline_spark.sources.readers import read_jsonl_events, valid_events

    events = valid_events(read_jsonl_events(spark, LIVE_FILE)).dropDuplicates(["event_id"])
    ships = normalize_shipments(events)
    rows = ships.collect()
    assert len(rows) == 485
    assert all(r.tracking_id for r in rows)
    assert {r.shipment_status for r in rows} <= {"created", "picked_up", "in_transit", "delivered"}
    assert all(r.shipment_time is not None for r in rows)
    # every row's order ref resolved through one of the three dialects
    assert sum(1 for r in rows if r.order_id is None) == 0
    # joinable against the (Q2-fixed) orders silver from the same stream
    orders = normalize_orders(events)
    section = shipment_latency_metrics(orders, ships)
    assert section.agg(F.sum("n_shipments")).first()[0] > 0
