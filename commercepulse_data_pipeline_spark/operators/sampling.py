"""Deterministic sampling — the reproducibility primitive a training-data
pipeline needs (beyond the reference's surface; extension tier).

`df.sample()` is seeded per-partition and NOT stable under repartitioning,
speculative retries, or engine changes — a training-set sampled that way
can't be reproduced, diffed, or incrementally extended. The standard fix
(used by every large-scale corpus pipeline) is CONTENT-keyed sampling: a
row is in the sample iff ``hash(key) < rate``, which is

- deterministic across runs, engines, partitionings, and cluster sizes;
- incremental: re-running over a grown corpus keeps every previously
  sampled row (no resample churn);
- exactly replayable in the DuckDB oracle (md5 is engine-independent,
  unlike xxhash64/rand — DECISIONS.md md5/sha rule).

Scale shape: a single codegen'd projection + filter — no shuffle, no UDF,
pushes down past column pruning. The per-stratum variant is a CASE over
the stratum column (small literal rate maps) — for thousands of strata,
swap the CASE for a broadcast-joined rates dimension; the filter stays
map-side either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Buckets are the first 32 bits of md5(salt || key) — uniform on [0, 2^32).
BUCKET_SPACE = 1 << 32


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 2^32): first 8 hex chars of md5(salt || key)
    as an unsigned int. Engine-reproducible (hex-digit arithmetic replays
    identically in the DuckDB oracle)."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long")


def threshold_for(rate: float) -> int:
    """Integer bucket threshold for a sampling rate — computed ONCE in
    Python so both engines compare against the same exact literal (no
    float-rounding skew at the boundary)."""
    return int(rate * BUCKET_SPACE)


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, *, salt: str = ""
) -> DataFrame:
    """Keep a row iff md5-bucket(key) < rate·2^32. Same key → same verdict
    forever; ``salt`` derives independent samples from the same corpus."""
    return df.where(hash_bucket(F.col(key_col), salt) < F.lit(threshold_for(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    *,
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample dominant
    languages, keep the tail) — the corpus-balancing step of a training
    pipeline. ``rates`` maps stratum value → keep rate; everything else
    gets ``default_rate``."""
    thr: Column = F.lit(threshold_for(default_rate))
    for value, rate in sorted(rates.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(threshold_for(rate))).otherwise(thr)
    return df.where(hash_bucket(F.col(key_col), salt) < thr)


def assign_splits(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    *,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Deterministic train/validation/test assignment — every row gets a
    split label from the same md5-bucket arithmetic as
    ``deterministic_sample``, so the partition is:

    - disjoint and exhaustive by construction (adjacent integer bucket
      ranges over [0, 2^32) in sorted-name order, remainder to the last
      split — no row lost to float-boundary gaps);
    - stable across runs/engines/partitionings AND under corpus growth —
      a document never migrates between splits when new data arrives
      (the leakage mode that silently contaminates eval sets when
      ``randomSplit`` reshuffles);
    - replayable in the DuckDB oracle (hex-digit arithmetic, exact
      integer thresholds computed once in Python).

    ``splits`` maps name → fraction (must sum to ~1; the last sorted name
    absorbs rounding). Pure codegen projection — no shuffle, no UDF.
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    names = sorted(splits)
    # NULL keys hash as the empty string instead of propagating NULL
    # through md5 — a NULL bucket would give split=NULL and the row would
    # silently vanish from every split filter, breaking the exhaustiveness
    # contract. All NULL-keyed rows land (deterministically) in one split.
    bucket = hash_bucket(F.coalesce(F.col(key_col).cast("string"), F.lit("")), salt)
    expr: Column | None = None
    upper = 0
    for i, name in enumerate(names):
        upper = BUCKET_SPACE if i == len(names) - 1 else upper + threshold_for(splits[name])
        cond = bucket < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    return df.withColumn(split_col, expr)
