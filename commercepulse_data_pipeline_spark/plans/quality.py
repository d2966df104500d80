"""Data-quality report (reference src/quality_report.py:6-165) as a set of
declarative aggregates.

The reference renders a txt/csv report from six sections; here each
section is a DataFrame (driver-side rendering stays trivial), and the
whole report is a handful of single-pass aggregations:

- completeness: one ``df.agg`` row of conditional counts (A4/P4/P5)
- orphans: two left-anti join counts (J3)
- late-arrival: equi-join + interval arithmetic + threshold counts
  (J1/F6/P6)
- revenue integrity: success-only sums (Q3's SECOND gross definition) and
  successful÷total success rate (Q4's second definition)
- status / vendor breakdowns: groupBy counts with pct-of-total (A3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.functions.drift import safe_divide
from commercepulse_data_pipeline_spark.functions.temporal import days_between
from commercepulse_data_pipeline_spark.operators.joins import orphans


def completeness(orders: DataFrame) -> DataFrame:
    """Null/zero completeness checks (reference src/quality_report.py:45-48)."""
    return orders.agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.sum(F.col("customer_id").isNull().cast("long")).alias("null_customer_id"),
        F.sum((F.col("order_amount") == 0).cast("long")).alias("zero_amount_orders"),
        F.sum(F.col("created_at").isNull().cast("long")).alias("null_created_at"),
    )


def orphan_counts(orders: DataFrame, payments: DataFrame, refunds: DataFrame) -> DataFrame:
    """Referential integrity (reference src/quality_report.py:61-66):
    payments with no order, refunds with no payment."""
    orphan_payments = orphans(payments, orders, "order_id").count()
    orphan_refunds = orphans(
        refunds.where(F.col("payment_id").isNotNull()), payments, "payment_id"
    ).count()
    spark = orders.sparkSession
    return spark.createDataFrame(
        [(orphan_payments, orphan_refunds)], "orphan_payments long, orphan_refunds long"
    )


def late_arrival_metrics(orders: DataFrame, payments: DataFrame) -> DataFrame:
    """Order→payment latency (reference src/quality_report.py:72-98).
    Detected, not corrected (Q9) — negative averages are faithfully
    possible when historical payments join unrelated order timestamps."""
    joined = orders.select("order_id", "created_at").join(
        payments.select("order_id", "payment_date"), "order_id", "inner"
    )
    lag = days_between(F.col("payment_date"), F.col("created_at"))
    return joined.agg(
        F.count(F.lit(1)).alias("matched_payments"),
        F.sum((lag > 7).cast("long")).alias("late_over_7d"),
        F.sum((lag > 30).cast("long")).alias("late_over_30d"),
        F.round(F.avg(lag), 2).alias("avg_days_to_payment"),
    )


def shipment_latency_metrics(orders: DataFrame, shipments: DataFrame) -> DataFrame:
    """Order→shipment latency + current-status breakdown (Q8 upgrade —
    the reference loads shipment events and never queries them, SURVEY
    §1.4 Q8; this is the ship-latency section its quality report lacks).

    One equi-join on order_id + one groupBy on the (tiny) status domain:
    per current shipment status, count, avg days from order creation to
    the last shipment update, and >7d/>30d threshold counts (the same P6
    thresholds the payment-latency section uses)."""
    joined = orders.select("order_id", "created_at").join(
        shipments.select("order_id", "shipment_status", "shipment_time"),
        "order_id",
        "inner",
    )
    lag = days_between(F.col("shipment_time"), F.col("created_at"))
    return (
        joined.groupBy("shipment_status")
        .agg(
            F.count(F.lit(1)).alias("n_shipments"),
            F.round(F.avg(lag), 2).alias("avg_days_to_update"),
            F.sum((lag > 7).cast("long")).alias("over_7d"),
            F.sum((lag > 30).cast("long")).alias("over_30d"),
        )
        .orderBy("shipment_status")
    )


def revenue_integrity(payments: DataFrame, refunds: DataFrame) -> DataFrame:
    """Success-only revenue + rates (reference src/quality_report.py:105-118)."""
    pay = payments.agg(
        F.round(
            F.sum(F.when(F.col("payment_status") == "success", F.col("payment_amount")).otherwise(F.lit(0.0))),
            2,
        ).alias("gross_revenue_success"),
        F.sum((F.col("payment_status") == "success").cast("long")).alias("successful_payments"),
        F.count(F.lit(1)).alias("total_payments"),
    )
    ref = refunds.agg(F.round(F.coalesce(F.sum("refund_amount"), F.lit(0.0)), 2).alias("total_refunded"))
    return (
        pay.crossJoin(ref)
        .select(
            "gross_revenue_success",
            "total_refunded",
            F.round(F.col("gross_revenue_success") - F.col("total_refunded"), 2).alias("net_revenue"),
            safe_divide(F.col("successful_payments"), F.col("total_payments")).alias("payment_success_rate"),
            safe_divide(F.col("total_refunded"), F.col("gross_revenue_success")).alias("refund_rate"),
        )
    )


def breakdown(df: DataFrame, col: str) -> DataFrame:
    """Frequency + pct-of-total (reference A3,
    src/quality_report.py:131-134 status, :141-143 vendor).

    The pct denominator uses a scalar-subquery-free shape: a window over
    the (already tiny) grouped frame, not over the raw rows.
    """
    from pyspark.sql import Window

    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy()
    return counts.select(
        col,
        "n",
        F.round(F.col("n") / F.sum("n").over(total) * 100, 2).alias("pct"),
    ).orderBy(F.desc("n"), F.asc(col))


def full_report(
    orders: DataFrame,
    payments: DataFrame,
    refunds: DataFrame,
    shipments: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """All six reference sections (run_quality_report shape), plus the
    ship-latency section when a shipments silver table is supplied (Q8
    upgrade — the reference has no shipment consumer)."""
    report = {
        "completeness": completeness(orders),
        "orphans": orphan_counts(orders, payments, refunds),
        "late_arrival": late_arrival_metrics(orders, payments),
        "revenue_integrity": revenue_integrity(payments, refunds),
        "status_breakdown": breakdown(payments, "payment_status"),
        "vendor_breakdown": breakdown(orders, "vendor"),
    }
    if shipments is not None:
        report["shipment_latency"] = shipment_latency_metrics(orders, shipments)
    return report
