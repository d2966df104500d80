"""Join operators (reference §2.6 J1-J3) with scale-aware strategy hints.

The reference's joins are pandas ``isin`` membership checks — O(groups ×
rows) rescans (reference src/transformer.py:140,144). Here each is a single
declarative join; Catalyst/AQE picks broadcast-hash vs sort-merge at
runtime. Dimension sides get an explicit ``broadcast()`` hint where we know
they're small (at 100 TB the facts are huge, dims are not)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def semi_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Set-membership restriction (reference J2: ``isin`` against a group's
    order ids, src/transformer.py:140,144). left_semi never widens rows."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | list[str]) -> DataFrame:
    """Anti-membership (reference J3 orphan detection,
    src/quality_report.py:61-66)."""
    return left.join(right, on=on, how="left_anti")


def orphans(child: DataFrame, parent: DataFrame, key: str, *, broadcast_parent: bool = False) -> DataFrame:
    """Referential-integrity orphans: child rows whose key has no parent.
    ``broadcast_parent`` for small parents (a key-only projection is pushed
    first so only the join key shuffles/broadcasts)."""
    parent_keys = parent.select(key).dropDuplicates([key])
    if broadcast_parent:
        parent_keys = F.broadcast(parent_keys)
    return child.join(parent_keys, on=key, how="left_anti")


def enrich(
    fact: DataFrame, dim: DataFrame, on: str | list[str], *, how: str = "left", broadcast_dim: bool = True
) -> DataFrame:
    """Fact-to-dimension equi-join (reference J1). Dims broadcast by
    default — the 100 TB posture: never shuffle the fact for a small dim."""
    return fact.join(F.broadcast(dim) if broadcast_dim else dim, on=on, how=how)
