"""Scalar column-expression library (reference §2.4 F1-F11), all
JVM-side Catalyst expressions — no Python UDFs. (The sanctioned
Arrow-batched extension templates live in ``functions.pandas_ext``,
imported explicitly so the core library stays UDF-free.)"""

from commercepulse_data_pipeline_spark.functions.expr import let
from commercepulse_data_pipeline_spark.functions.drift import (
    canonical_status,
    coalesce_keys,
    json_keys,
    numeric_or_zero,
    safe_divide,
)
from commercepulse_data_pipeline_spark.functions.hashing import (
    event_id,
    row_fingerprint,
    short_id,
    stable_bucket,
    text_fingerprint,
)
from commercepulse_data_pipeline_spark.functions.temporal import (
    calendar_columns,
    days_between,
    parse_timestamp,
)

__all__ = [
    "calendar_columns",
    "canonical_status",
    "coalesce_keys",
    "days_between",
    "event_id",
    "json_keys",
    "let",
    "numeric_or_zero",
    "parse_timestamp",
    "row_fingerprint",
    "safe_divide",
    "short_id",
    "stable_bucket",
    "text_fingerprint",
]
