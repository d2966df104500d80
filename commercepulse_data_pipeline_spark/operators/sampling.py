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
