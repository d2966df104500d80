"""Timestamp parsing and calendar derivations.

Reference F3 (src/transformer.py:33,82,120): ``pd.to_datetime(x, utc=True,
errors="coerce")`` accepts mixed formats and coerces failures to NaT. Spark
equivalent: a coalesce over ``try_to_timestamp`` with each observed format
(ISO-Z, ``YYYY/MM/DD HH:MM:SS``, ``YYYY-MM-DD HH:MM``, epoch seconds),
returning NULL when nothing matches. ``try_*`` keeps this correct under
ANSI mode (Spark 4 default).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Formats observed across the vendor dialects (FIXTURES §2):
# vendor_b ISO-Z, vendor_a "YYYY/MM/DD HH:MM:SS" / "YYYY-MM-DD HH:MM",
# vendor_c epoch seconds.
_FORMATS = (
    "yyyy-MM-dd'T'HH:mm:ssX",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSSX",
    "yyyy/MM/dd HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
)


def parse_timestamp(col: Column) -> Column:
    """Multi-format timestamp parse; NULL on failure (reference F3)."""
    s = col.cast("string")
    attempts = [F.try_to_timestamp(s, F.lit(fmt)) for fmt in _FORMATS]
    # Epoch seconds (vendor_c `ts`): all-digit strings of plausible width.
    epoch = F.when(
        s.rlike(r"^\d{9,11}$"), F.timestamp_seconds(s.try_cast("long"))
    )
    return F.coalesce(*attempts, epoch)


def calendar_columns(date_col: Column) -> dict[str, Column]:
    """dim_date derivations (reference F5, src/populate_dimensions.py:21-29):
    day name, ISO week, month, quarter, year, is_weekend (Sat/Sun)."""
    return {
        "day_of_week": F.date_format(date_col, "EEEE"),
        "week_number": F.weekofyear(date_col),
        "month": F.month(date_col),
        "quarter": F.quarter(date_col),
        "year": F.year(date_col),
        "is_weekend": F.dayofweek(date_col).isin(1, 7),
    }


def days_between(later: Column, earlier: Column) -> Column:
    """Fractional days between two timestamps (reference F6,
    src/quality_report.py:84-86)."""
    return (F.unix_timestamp(later) - F.unix_timestamp(earlier)) / F.lit(86400.0)
