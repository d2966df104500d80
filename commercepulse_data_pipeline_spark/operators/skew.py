"""Skew mitigation: salted aggregation and salted join.

AQE's skew-join splitting (on in `session.get_spark`) handles skewed
sort-merge joins at runtime, but two shapes still need explicit salting at
100 TB:

- **hot-key aggregation**: one key with billions of rows lands on one
  reducer. Salting splits it into N partial groups (extra map-side
  fan-out is free — partial aggregation already runs per partition),
  then a second tiny aggregation merges the N partials.
- **skewed join against a non-broadcastable side**: replicate the small
  side N ways (explode), salt the big side uniformly, join on
  (key, salt) — the hot key's rows spread over N partitions.

Both are pure DataFrame transforms — no RDDs, no custom partitioner.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, Callable[[Column], Column], Callable[[Column], Column]]],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps output column name → (input_col, partial_fn, merge_fn):
    ``{"total": ("amount", F.sum, F.sum),
       "n":     ("amount", F.count, F.sum),
       "mx":    ("amount", F.max, F.max)}``
    Phase 1 groups by (key, salt) — the hot key spreads over
    ``salt_buckets`` reducers; phase 2 merges the ≤ salt_buckets partial
    rows per key (tiny).

    Only works for algebraic aggregates (sum/count/min/max, or anything
    with a partial+merge decomposition). Non-decomposable aggregates
    (exact median, collect_list order) don't belong here.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    phase1 = salted.groupBy(*key_cols, "__salt").agg(
        *[
            partial(F.col(col)).alias(f"__p_{out}")
            for out, (col, partial, _merge) in aggs.items()
        ]
    )
    return phase1.groupBy(*key_cols).agg(
        *[
            merge(F.col(f"__p_{out}")).alias(out)
            for out, (_col, _partial, merge) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join where ``big`` is skewed on ``on`` and ``small`` is too
    large to broadcast: salt the big side uniformly, replicate the small
    side ``salt_buckets``×, join on (key, salt).

    Cost model: small side shuffles salt_buckets× its size; the hot key's
    probe rows spread over salt_buckets partitions. Pick buckets ≈ the
    skew factor, not more.
    """
    big_s = big.withColumn("__salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    return big_s.join(small_r, on=[on, "__salt"], how=how).drop("__salt")
