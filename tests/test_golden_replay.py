"""Golden replay of the reference's shipped data (VERDICT r1 item #2).

The strongest capability proof available: drive this engine end-to-end
over the reference's own data and reconcile against its shipped outputs
(`/root/reference/warehouse/facts/*.csv`,
`/root/reference/reports/quality_report_2026-02-20.txt`) in bug-compat
mode (compat.py — reference type sets, key maps, NULL-collapse dedup).

Input reconstruction: the reference's historical inputs
(`data/bootstrap/*_2023.json`) are gitignored and NOT shipped — only the
live day (`data/live_events/2026-02-19/events.jsonl`, replayed raw here)
and the golden outputs are. The historical events are reconstructed from
the golden fact rows themselves: fact tables are the deduped images of
the lost inputs under the reference's own key-coalescing (e.g. a golden
payment row maps back to `{payment_id, order_id, amount, status, method,
payment_date}`), and replaying a deduped image through the same pipeline
is a fixed point. event_id parity proves the reconstruction is faithful:
every synthesized historical event re-derives its golden event_id through
our bootstrap reader's sha256(type:natural_key) path
(reference src/bootstrap_loader.py:22-43) — verified for 400/400 orders
and 359/360 payments (the one NULL-payment_id row and the one NULL-id
refund fall back to md5-of-record hashing of the LOST original record,
so their event_ids are unknowable; they are excluded from the event_id
check but included in every value check).

Expected numbers (reference reports/quality_report_2026-02-20.txt:6-32,
warehouse/facts/*.csv, BASELINE.md): fact_orders=560, fact_payments=360,
fact_refunds=1, fact_order_daily=252, orphan_payments=251,
orphan_refunds=0, success_rate=0.7472, gross=5,145,000, net=5,120,000,
late>7d=49, late>30d=44, avg_days=-9.24, completeness 279/25/1/1,
status breakdown success=269/failed=91, vendors unknown=400/vendor_b=159/
vendor_a=1.
"""

from __future__ import annotations

import json
import math
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark import compat
from commercepulse_data_pipeline_spark.sources.readers import read_historical_json, write_bronze

REF = "/root/reference"
LIVE_FILE = f"{REF}/data/live_events/2026-02-19/events.jsonl"
GOLD = f"{REF}/warehouse/facts"

pytestmark = pytest.mark.skipif(
    not os.path.exists(LIVE_FILE), reason="reference tree not available"
)


def _gold(name: str) -> pd.DataFrame:
    return pd.read_csv(f"{GOLD}/{name}.csv", dtype=str)


def _iso(ts: str | float) -> str | None:
    """Golden CSV '2023-01-03 01:16:25+00:00' → '2023-01-03T01:16:25Z'."""
    if not isinstance(ts, str):
        return None
    return ts.replace(" ", "T").replace("+00:00", "Z")


def _synthesize_bootstrap(tmp: str) -> dict[str, str]:
    """Reconstruct the gitignored *_2023.json bootstrap files from the
    golden fact rows (see module docstring). Key names are chosen so the
    reference's own coalesce lists (src/transformer.py:29-33,52-74,
    100-111) and natural-key map (src/bootstrap_loader.py:32-37) extract
    exactly the golden values back."""
    orders = []
    g_orders = _gold("fact_orders")
    for r in g_orders[g_orders.event_type == "historical_order"].itertuples():
        rec = {"order_id": r.order_id, "totalAmount": float(r.order_amount)}
        if isinstance(r.customer_id, str):
            rec["customerId"] = r.customer_id
        if isinstance(r.order_status, str):
            rec["state"] = r.order_status
        if isinstance(r.created_at, str):
            rec["created_at"] = _iso(r.created_at)
        orders.append(rec)

    payments = []
    for r in _gold("fact_payments").itertuples():
        rec = {"amount": float(r.payment_amount)}
        if isinstance(r.payment_id, str):
            rec["payment_id"] = r.payment_id
        if isinstance(r.order_id, str):
            rec["order_id"] = r.order_id
        if isinstance(r.payment_status, str):
            rec["status"] = r.payment_status
        if isinstance(r.payment_method, str):
            rec["method"] = r.payment_method
        if isinstance(r.payment_date, str):
            rec["payment_date"] = _iso(r.payment_date)
        payments.append(rec)

    refunds = []
    for r in _gold("fact_refunds").itertuples():
        rec = {"amount": float(r.refund_amount)}
        if isinstance(r.refund_reason, str):
            rec["reason"] = r.refund_reason
        refunds.append(rec)

    paths = {}
    for name, records in (
        ("historical_order", orders),
        ("historical_payment", payments),
        ("historical_refund", refunds),
    ):
        paths[name] = f"{tmp}/{name}.json"
        with open(paths[name], "w") as f:
            json.dump(records, f)
    return paths


@pytest.fixture(scope="module")
def replayed(spark, tmp_path_factory):
    """bootstrap(synth historical) + load-live(raw shipped file) → bronze
    → bug-compat silver → (orders, payments, refunds) DataFrames."""
    tmp = str(tmp_path_factory.mktemp("golden"))
    bronze = f"{tmp}/bronze"
    paths = _synthesize_bootstrap(tmp)

    for event_type, path in paths.items():
        env = read_historical_json(spark, path, event_type).withColumn(
            compat.POS_COL, F.lit(-1).cast("long")
        )
        write_bronze(env, bronze)
    live = compat.read_events_with_pos(spark, LIVE_FILE)
    write_bronze(live, bronze)

    events = spark.read.parquet(bronze)
    orders = compat.normalize_orders_ref(events).cache()
    payments = compat.normalize_payments_ref(events).cache()
    refunds = compat.normalize_refunds_ref(events).cache()
    yield {"events": events, "orders": orders, "payments": payments, "refunds": refunds}
    for df in (orders, payments, refunds):
        df.unpersist()


def test_bootstrap_event_id_parity(replayed):
    """Synthesized historical events re-derive their golden event_ids via
    sha256(event_type:natural_key) — proves the reader's envelope synthesis
    matches reference src/bootstrap_loader.py:22-43 on real keys."""
    g_orders = _gold("fact_orders")
    g_pay = _gold("fact_payments")
    golden_ids = set(g_orders[g_orders.event_type == "historical_order"].event_id) | set(
        g_pay[g_pay.payment_id.notna()].event_id
    )
    got = {
        r.event_id
        for r in replayed["events"]
        .where(F.col("source") == "historical_bootstrap")
        .select("event_id")
        .collect()
    }
    missing = golden_ids - got
    assert not missing, f"{len(missing)} golden event_ids not re-derived: {sorted(missing)[:3]}"
    # only the two md5-fallback rows (NULL payment_id payment, NULL-id refund)
    assert len(got - golden_ids) == 2


def _order_key(row) -> tuple:
    return (
        row["order_id"] or "<NULL>",
        row["customer_id"] or "<NULL>",
        f"{float(row['order_amount']):.2f}",
        row["order_status"] or "<NULL>",
        row["created_at"] or "<NULL>",
        row["event_id"],
        row["vendor"],
        row["event_type"],
    )


def test_fact_orders_bitwise(replayed):
    """All 560 golden fact_orders rows, every column including event_id —
    the dedup tie-break (ingestion position) reproduces pandas'
    unstable-sort survivor on this data."""
    ours = [
        _order_key(r.asDict())
        for r in replayed["orders"]
        .withColumn("created_at", F.date_format("created_at", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
        .collect()
    ]
    g = _gold("fact_orders")
    golden = [
        _order_key(
            {
                "order_id": r.order_id if isinstance(r.order_id, str) else None,
                "customer_id": r.customer_id if isinstance(r.customer_id, str) else None,
                "order_amount": r.order_amount,
                "order_status": r.order_status if isinstance(r.order_status, str) else None,
                "created_at": _iso(r.created_at),
                "event_id": r.event_id,
                "vendor": r.vendor,
                "event_type": r.event_type,
            }
        )
        for r in g.itertuples()
    ]
    assert len(ours) == 560
    assert sorted(ours) == sorted(golden)


def test_fact_payments_and_refunds(replayed):
    g = _gold("fact_payments")
    ours = {
        r["payment_id"]: r
        for r in (
            row.asDict()
            for row in replayed["payments"]
            .withColumn("payment_date", F.date_format("payment_date", "yyyy-MM-dd'T'HH:mm:ss'Z'"))
            .collect()
        )
    }
    assert len(ours) == 360
    for r in g.itertuples():
        pid = r.payment_id if isinstance(r.payment_id, str) else None
        mine = ours[pid]
        assert f"{float(mine['payment_amount']):.2f}" == f"{float(r.payment_amount):.2f}"
        assert mine["payment_status"] == (r.payment_status if isinstance(r.payment_status, str) else None)
        assert mine["payment_method"] == (r.payment_method if isinstance(r.payment_method, str) else None)
        assert mine["payment_date"] == _iso(r.payment_date)
        assert mine["order_id"] == (r.order_id if isinstance(r.order_id, str) else None)
        if pid is not None:  # NULL-id row's event_id is md5-of-lost-record
            assert mine["event_id"] == r.event_id

    refunds = [r.asDict() for r in replayed["refunds"].collect()]
    gr = _gold("fact_refunds")
    assert len(refunds) == len(gr) == 1
    assert f"{float(refunds[0]['refund_amount']):.2f}" == f"{float(gr.refund_amount.iloc[0]):.2f}"
    assert refunds[0]["refund_reason"] == gr.refund_reason.iloc[0]
    assert refunds[0]["refund_id"] is None and refunds[0]["payment_id"] is None


def test_fact_order_daily_bitwise(replayed):
    """All 252 golden daily rows value-exact (gross/net/counts/rates)."""
    daily = compat.build_fact_order_daily_ref(
        replayed["orders"], replayed["payments"], replayed["refunds"]
    )
    ours = {
        (str(r["order_date"]), r["vendor"]): r
        for r in (row.asDict() for row in daily.collect())
    }
    g = pd.read_csv(f"{GOLD}/fact_order_daily.csv")
    assert len(ours) == len(g) == 252
    for r in g.itertuples():
        mine = ours[(r.order_date, r.vendor)]
        assert float(mine["gross_revenue"]) == float(r.gross_revenue)
        assert float(mine["total_refunds"]) == float(r.total_refunds)
        assert float(mine["net_revenue"]) == float(r.net_revenue)
        assert int(mine["order_count"]) == int(r.order_count)
        assert int(mine["paid_count"]) == int(r.paid_count)
        for col in ("payment_success_rate", "refund_rate"):
            gv = getattr(r, col)
            if isinstance(gv, float) and math.isnan(gv):
                assert mine[col] is None
            else:
                assert float(mine[col]) == float(gv)


def test_quality_report_golden_numbers(replayed):
    """Every number in reports/quality_report_2026-02-20.txt:6-32."""
    rep = compat.quality_report_ref(
        replayed["orders"], replayed["payments"], replayed["refunds"]
    )
    assert rep["total_orders"] == 560
    assert rep["total_payments"] == 360
    assert rep["total_refunds"] == 1
    assert rep["orders_missing_customer_id"] == 279
    assert rep["orders_missing_amount"] == 25
    assert rep["payments_missing_order_id"] == 1
    assert rep["refunds_missing_payment_id"] == 1
    assert rep["orphan_payments"] == 251
    assert rep["orphan_refunds"] == 0
    assert rep["payments_over_7_days"] == 49
    assert rep["payments_over_30_days"] == 44
    assert rep["avg_days_to_payment"] == -9.24
    assert rep["gross_revenue"] == 5_145_000.00
    assert rep["total_refunded"] == 25_000.00
    assert rep["net_revenue"] == 5_120_000.00
    assert rep["payment_success_rate"] == 0.7472
    assert rep["refund_rate"] == 0.0049
    assert rep["status_breakdown"] == {"success": 269, "failed": 91}
    assert rep["vendor_breakdown"] == {"unknown": 400, "vendor_b": 159, "vendor_a": 1}
