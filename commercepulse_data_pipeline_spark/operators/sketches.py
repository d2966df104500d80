"""Mergeable sketch rollup tables (Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg`` family).

THE 100 TB distinct-counting pattern: you cannot answer "distinct users
between any two dates" from a daily ``countDistinct`` table (distincts
don't add), and re-scanning raw events per dashboard query is a full-table
pass. A sketch rollup stores one mergeable HLL sketch per (day, group) —
built in ONE pass over raw events, map-side combined like any algebraic
aggregate — and answers any date-range distinct query by unioning a few
hundred kilobyte-sized sketches, never touching raw data again. Estimates
carry the standard HLL relative error (~1.04/√2^lg_k ≈ 1.6% at the
default lg_k=12).

The reference has no sketch surface at all (single-node pandas counts
exactly); this is the extension tier's scale path, the same role
``approx_count_distinct`` plays inline — but PERSISTED and re-mergeable,
so the one expensive pass is paid once.

Everything here is JVM-side Catalyst (the sketch functions are built-in
aggregates); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_sketch_rollup(
    events: DataFrame,
    *,
    day_col: str = "day",
    group_cols: list[str] | None = None,
    key_col: str = "user_id",
    lg_k: int = 12,
) -> DataFrame:
    """One row per (day, *group_cols): a mergeable HLL sketch of
    ``key_col`` plus the exact row count. One shuffle on the rollup key;
    the sketch aggregate combines map-side like a sum."""
    groups = [day_col, *(group_cols or [])]
    return events.groupBy(*groups).agg(
        F.hll_sketch_agg(F.col(key_col).cast("string"), F.lit(lg_k)).alias("key_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def write_sketch_rollup(
    events: DataFrame,
    path: str,
    *,
    day_col: str = "day",
    group_cols: list[str] | None = None,
    key_col: str = "user_id",
    lg_k: int = 12,
    mode: str = "overwrite",
) -> None:
    """Persist the rollup as parquet (sketches are plain binary columns).
    Append mode supports incremental daily builds: duplicate (day, group)
    rows from reruns are harmless because readers union-merge sketches —
    HLL union is idempotent for the same underlying keys."""
    build_sketch_rollup(
        events, day_col=day_col, group_cols=group_cols, key_col=key_col, lg_k=lg_k
    ).write.mode(mode).parquet(path)


def distinct_over_range(
    spark: SparkSession,
    path: str,
    start_day,
    end_day,
    *,
    day_col: str = "day",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Distinct-key estimate per group over [start_day, end_day]: filters
    the rollup (partition/row-group pruning — days are the sort key) and
    union-merges the day sketches. Touches only kilobytes per group, no
    raw data."""
    rollup = spark.read.parquet(path).where(
        (F.col(day_col) >= F.lit(start_day)) & (F.col(day_col) <= F.lit(end_day))
    )
    groups = group_cols or []
    agg = rollup.groupBy(*groups).agg(
        F.hll_union_agg("key_sketch").alias("merged"),
        F.sum("n_rows").alias("n_rows"),
    )
    return agg.select(
        *groups,
        F.hll_sketch_estimate("merged").alias("distinct_estimate"),
        "n_rows",
    )
