"""End-to-end table builds: silver normalization, gold aggregates,
dimensions, quality report (reference §3 lifecycle, medallion-style)."""

from commercepulse_data_pipeline_spark.plans.dimensions import (
    build_dim_customer,
    build_dim_date,
    build_dim_product,
)
from commercepulse_data_pipeline_spark.plans.gold import (
    build_fact_order_daily,
    revenue_by_date,
    vendor_success_pct,
)
from commercepulse_data_pipeline_spark.plans.quality import full_report
from commercepulse_data_pipeline_spark.plans.silver import (
    ORDER_TYPES,
    PAYMENT_TYPES,
    REFUND_TYPES,
    normalize_orders,
    normalize_payments,
    normalize_refunds,
)

__all__ = [
    "ORDER_TYPES",
    "PAYMENT_TYPES",
    "REFUND_TYPES",
    "build_dim_customer",
    "build_dim_date",
    "build_dim_product",
    "build_fact_order_daily",
    "full_report",
    "normalize_orders",
    "normalize_payments",
    "normalize_refunds",
    "revenue_by_date",
    "vendor_success_pct",
]
