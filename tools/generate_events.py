"""Deterministic event-stream generator (reference S6 analog:
src/live_event_generator.py:165-244).

Writes daily JSONL landing files with the reference's designed-in noise:
exact duplicates (``--dup-rate``), late arrivals — event_time lagging
ingested_at by 1-7 days (``--late-rate``), and vendor schema drift
(``--drift-rate`` controls how often a vendor emits an alternate field
spelling). Payload dialects match FIXTURES.md: vendor_a
(orderRef/total/created slash-dates), vendor_b (order_id/totalAmount/
created_at ISO-Z), vendor_c (nested order.id + epoch seconds).

Pure Python on purpose — it's a fixture factory, not an engine operator
(SURVEY §2.1 S6). Deterministic per seed.

Usage:
  python tools/generate_events.py --out /tmp/landing --date 2026-02-19 \
      --events 2000 --seed 42 --dup-rate 0.05 --late-rate 0.10 --drift-rate 0.15
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import random
from datetime import datetime, timedelta, timezone

VENDORS = ("vendor_a", "vendor_b", "vendor_c")
EVENT_TYPES = ("order_created", "order_updated", "payment_succeeded", "refund_issued", "shipment_updated")


def _sid(rng: random.Random) -> str:
    return hashlib.sha1(str(rng.random()).encode()).hexdigest()[:12]


def _iso(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


def make_event(rng: random.Random, day: datetime, order_pool: list[str], drift_rate: float, late_rate: float) -> dict:
    vendor = rng.choice(VENDORS)
    etype = rng.choices(EVENT_TYPES, weights=[30, 15, 30, 5, 20])[0]
    ingested = day + timedelta(seconds=rng.randrange(86400))
    event_time = ingested
    if rng.random() < late_rate:
        event_time = ingested - timedelta(days=rng.randrange(1, 8), seconds=rng.randrange(86400))

    order_id = rng.choice(order_pool) if order_pool and rng.random() < 0.8 else f"ORD-{_sid(rng)}"
    if order_id not in order_pool:
        order_pool.append(order_id)
    amount = round(rng.uniform(10, 50000), 2)
    drift = rng.random() < drift_rate

    if etype.startswith("order"):
        if vendor == "vendor_a":
            payload = {"orderRef": order_id, "buyerEmail": f"u{rng.randrange(500)}@x.com",
                       ("total_amount" if drift else "total"): amount,
                       "status": rng.choice(["pending", "confirmed", "cancelled"]),
                       "created": event_time.strftime("%Y/%m/%d %H:%M:%S")}
        elif vendor == "vendor_b":
            payload = {"order_id": order_id, "customerId": f"C{rng.randrange(500)}",
                       ("amount" if drift else "totalAmount"): amount,
                       "state": rng.choice(["pending", "confirmed", "cancelled"]),
                       "created_at": _iso(event_time)}
        else:
            payload = {"order": {"id": order_id}, "amount": amount,
                       "state": rng.choice(["pending", "confirmed"]),
                       "ts": int(event_time.timestamp())}
    elif etype == "payment_succeeded":
        pid = f"PAY-{_sid(rng)}"
        key = rng.choice(["transaction_id", "payment_id", "paymentId"]) if drift else "transaction_id"
        payload = {key: pid, "order_id": order_id,
                   ("amount" if drift else "amountPaid"): amount,
                   "payment_status": rng.choices(["success", "successful", "completed", "failed", "FAILED"],
                                                 weights=[40, 15, 15, 20, 10])[0],
                   "channel": rng.choice(["card", "transfer", "ussd"]),
                   "paid_at": _iso(event_time)}
    elif etype == "refund_issued":
        payload = {"refund_id": f"REF-{_sid(rng)}", "order_id": order_id,
                   "payment_id": f"PAY-{_sid(rng)}",
                   ("amount" if drift else "refundAmount"): round(amount * rng.uniform(0.1, 1.0), 2),
                   "reason": rng.choice(["damaged", "late", "other"]),
                   "refunded_at": _iso(event_time)}
    else:
        payload = {"tracking_id": f"TRK-{_sid(rng)}", "order_id": order_id,
                   "status": rng.choice(["in_transit", "delivered", "returned"])}

    natural = payload.get("order_id") or payload.get("orderRef") or order_id
    event_id = hashlib.sha256(f"{etype}:{natural}:{_iso(event_time)}:{_sid(rng)}".encode()).hexdigest()
    return {"event_id": event_id, "event_type": etype, "event_time": _iso(event_time),
            "vendor": vendor, "payload": json.dumps(payload),
            "ingested_at": _iso(ingested), "source": "live_stream"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--date", required=True, help="YYYY-MM-DD landing day")
    ap.add_argument("--events", type=int, default=2000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--dup-rate", type=float, default=0.05)
    ap.add_argument("--late-rate", type=float, default=0.10)
    ap.add_argument("--drift-rate", type=float, default=0.15)
    args = ap.parse_args()

    rng = random.Random(args.seed)
    day = datetime.strptime(args.date, "%Y-%m-%d").replace(tzinfo=timezone.utc)
    order_pool: list[str] = []
    events = [make_event(rng, day, order_pool, args.drift_rate, args.late_rate)
              for _ in range(args.events)]
    # exact duplicates, re-ingested later (the reference's replay noise)
    for e in rng.sample(events, int(len(events) * args.dup_rate)):
        dup = dict(e)
        dup["ingested_at"] = _iso(
            datetime.strptime(e["ingested_at"], "%Y-%m-%dT%H:%M:%SZ") + timedelta(minutes=5)
        )
        events.append(dup)
    rng.shuffle(events)

    d = os.path.join(args.out, args.date)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "events.jsonl")
    with open(path, "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    print(f"wrote {len(events)} events ({len(events) - args.events} duplicates) to {path}")


if __name__ == "__main__":
    main()
