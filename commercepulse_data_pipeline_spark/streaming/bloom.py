"""Continuously maintained Bloom-filter membership rollup — the streaming
form of ``operators/sketches.py``'s bloom store.

Per micro-batch (``foreachBatch``): compute the batch's sparse (shard,
pos) bit rows and land them under the batch's own partition
(``ingest_batch=N``, overwrite — the idempotent-replay pattern shared by
every store in this package: a checkpoint replay of batch N overwrites
N's own output instead of duplicating it). Readers
(``membership_over_range``) DISTINCT over every row in range, and bit-OR
is associative, commutative and IDEMPOTENT — so duplicate (shard, pos)
rows across batch partitions are correct by construction, the same
argument as the HLL store (and a stronger one than the histogram store,
whose counts are not idempotent).

The store grows up to m_bits rows per (shard, batch that touched the
shard); :func:`compact_bloom_rollup` re-folds to at most m_bits rows per
shard total (run it on a cron beside the stream — readers keep working
mid-compaction because de-duplicating partials is what they do anyway).

At 100 TB: each batch's write is one map-side-combined distinct of the
batch only; probe cost stays proportional to shards x fill x partials,
which compaction keeps at ~1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.operators.sketches import build_bloom_rollup


def bloom_rollup_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    *,
    shard_col: str = "day",
    key_col: str = "user_id",
    m_bits: int = 1 << 16,
    k: int = 4,
) -> None:
    """Fold one micro-batch into the store: THIS batch's bit rows only,
    landed under the batch's own partition (replay-idempotent
    overwrite)."""
    build_bloom_rollup(
        batch_df, shard_col=shard_col, key_col=key_col, m_bits=m_bits, k=k
    ).write.mode("overwrite").parquet(f"{store_dir}/ingest_batch={batch_id}")


def stream_bloom_rollup(
    spark: SparkSession,
    events_path: str,
    store_dir: str,
    checkpoint: str,
    *,
    schema: str = "day string, user_id long",
    shard_col: str = "day",
    key_col: str = "user_id",
    m_bits: int = 1 << 16,
    k: int = 4,
    max_files_per_trigger: int = 10,
    trigger_once: bool = True,
):
    """Tail a directory of event parquet drops and maintain the membership
    filters continuously. Returns the started query."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_path)
    )

    def _batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        bloom_rollup_batch(
            batch_df, batch_id, store_dir,
            shard_col=shard_col, key_col=key_col, m_bits=m_bits, k=k,
        )

    writer = stream.writeStream.foreachBatch(_batch_fn).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_bloom_rollup(
    spark: SparkSession,
    store_dir: str,
    *,
    shard_col: str = "day",
    keep_latest: int = 2,
) -> dict:
    """Re-fold the per-batch partials to one DISTINCT (shard, pos) set in
    the consolidated ``ingest_batch=-1`` partition, via the shared
    marker-file fold protocol (crash-recoverable at every point; see
    ``sources/readers.py::compact_streaming_index``). Compaction is EXACT
    — bit-OR of bit-ORs — so probe answers are identical before, during,
    and after. ``keep_latest`` batch partitions stay untouched for
    replay safety."""
    import os

    from commercepulse_data_pipeline_spark.sources.readers import (
        _fold_commit,
        _recover_index_compact,
    )

    p = store_dir.rstrip("/")
    _recover_index_compact(p)
    prefix = "ingest_batch="
    parts: dict[int, str] = {}
    for entry in os.listdir(p):
        if entry.startswith(prefix) and os.path.isdir(os.path.join(p, entry)):
            parts[int(entry[len(prefix):])] = entry
    real = sorted(v for v in parts if v != -1)
    fold = real[: len(real) - keep_latest] if keep_latest else real
    if not fold:
        return {"folded": 0, "partitions_after": len(parts)}
    fold_vals = fold + ([-1] if -1 in parts else [])
    fold_names = [parts[v] for v in fold_vals]
    merged = (
        spark.read.parquet(p)
        .where(F.col("ingest_batch").isin(fold_vals))
        .select(shard_col, "pos")
        .distinct()
    )
    cons_name = f"{prefix}-1"
    merged.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(p + "._fold_tmp", cons_name)
    )
    _fold_commit(p, cons_name, fold_names, -1 in parts)
    return {
        "folded": len(fold),
        "partitions_after": len(parts) - len(fold_vals) + 1,
    }
