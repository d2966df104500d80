"""Sequence packing — batching documents into fixed-capacity context
windows, the step between a cleaned corpus and an LLM training run
(extension tier; the reference has no training-data surface).

Packing is inherently SEQUENTIAL (each bin decision depends on the
previous fill level), so the scalable shape is SHARDED next-fit:

1. shard every doc by a deterministic md5 bucket of its id — uniform,
   reproducible, independent of partitioning (operators/sampling.py
   family);
2. within each shard, walk docs in id order and next-fit them into bins:
   close the current bin when the next doc would overflow ``capacity``.

Each shard's walk is a tiny stateful loop over its own rows — exactly
what ``applyInPandas`` is for (Arrow-batched, one group per shard, no
driver involvement). At 100 TB parallelism = ``n_shards`` (thousands);
per-shard state is two integers. Packing efficiency loss vs global
next-fit is negligible when shards hold ≫ capacity/mean_tokens docs.

Determinism makes the whole thing oracle-checkable: the same shard
assignment and the same in-shard walk replay in DuckDB as a recursive CTE
(one recursion step per row per shard).

Docs longer than ``capacity`` are counted at ``capacity`` tokens (the
training pipeline truncates them) so they occupy a bin alone rather than
overflowing every bin they touch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from commercepulse_data_pipeline_spark.operators.sampling import hash_bucket

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("bin_idx", T.LongType()),
        T.StructField("bin_fill", T.LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    *,
    capacity: int,
    n_shards: int = 8,
    salt: str = "",
) -> DataFrame:
    """Assign every doc to (shard, bin_idx) by sharded next-fit packing.

    Returns one row per doc: (doc_id, shard, bin_idx, bin_fill) where
    ``bin_fill`` is the bin's running fill AFTER this doc — so
    ``max(bin_fill) group by shard, bin_idx`` is each window's token count.
    """
    import pandas as pd

    sharded = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.least(F.col(token_col).cast("long"), F.lit(capacity)).alias("__tok"),
        (hash_bucket(F.col(id_col), salt) % n_shards).cast("int").alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        bins, fills = [], []
        bin_idx, fill = 0, 0
        for tok in pdf["__tok"]:
            if fill and fill + tok > capacity:
                bin_idx += 1
                fill = 0
            fill += tok
            bins.append(bin_idx)
            fills.append(fill)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "shard": pdf["shard"].to_numpy(),
                "bin_idx": bins,
                "bin_fill": fills,
            }
        )

    return sharded.groupBy("shard").applyInPandas(pack, PACKED_SCHEMA)


def packed_windows(packed: DataFrame) -> DataFrame:
    """Roll packed rows up to one row per context window: doc count and
    token fill — the shape a training-run manifest wants."""
    return packed.groupBy("shard", "bin_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("bin_fill").alias("window_tokens"),
    )
