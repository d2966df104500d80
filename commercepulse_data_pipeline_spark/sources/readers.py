"""Bronze-layer ingestion (reference §2.1 S1/S2, §2.2 K1 semantics).

The reference lands raw events in MongoDB with an upsert-by-event_id
unique index (src/bootstrap_loader.py:19,92-105). Our bronze layer is
Parquet partitioned by ingest date: JSON/JSONL in → event envelope out,
``payload`` kept as a raw JSON string (drift-proof — no schema lock-in at
ingestion, SURVEY §1.3), idempotency via dropDuplicates(event_id).

Scale: file listing + schema are per-day partitions; bad records are
retained and *counted*, never silently dropped (reference S2 counts skips,
src/live_event_loader.py:32-48).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from commercepulse_data_pipeline_spark.functions.drift import coalesce_keys
from commercepulse_data_pipeline_spark.functions.hashing import event_id as _event_id

ENVELOPE_FIELDS = ("event_id", "event_type", "event_time", "vendor", "payload", "ingested_at", "source")

# Raw-string envelope schema: payload deliberately StringType (schema drift
# is a designed-in property of the stream, FIXTURES §1-2).
ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.StringType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("event_time", T.StringType()),
        T.StructField("vendor", T.StringType()),
        T.StructField("payload", T.StringType()),
        T.StructField("ingested_at", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

# Candidate key lists from the reference's envelope synthesis
# (src/bootstrap_loader.py:32-43 natural key, :46-53 event time, :56-60 vendor).
# The natural-key map is PER EVENT TYPE (reference key_map,
# src/bootstrap_loader.py:32-37): a historical_payment record containing
# both order_id and payment_id keys hashes on payment_id — a flat global
# priority list would pick order_id and produce a different event_id.
NATURAL_KEY_MAP = {
    "historical_order": ("order_id", "id"),
    "historical_payment": ("payment_id", "id", "transaction_id"),
    "historical_shipment": ("shipment_id", "id", "tracking_id"),
    "historical_refund": ("refund_id", "id"),
}
NATURAL_KEY_CANDIDATES = ("order_id", "payment_id", "refund_id", "id", "transaction_id", "tracking_id")
EVENT_TIME_CANDIDATES = ("created_at", "order_date", "payment_date", "shipped_at", "refund_date", "timestamp", "date")
VENDOR_CANDIDATES = ("vendor_id", "vendor", "seller_id", "merchant_id")


def read_jsonl_events(spark: SparkSession, path: str, source: str = "live_stream") -> DataFrame:
    """JSONL event scan with bad-record retention (reference S2).

    PERMISSIVE mode parks unparseable lines in ``_corrupt_record``;
    ``skipped`` below means rows the reference would have dropped
    (decode failure OR missing event_id, src/live_event_loader.py:38-46).
    """
    raw = (
        spark.read.schema(ENVELOPE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return (
        raw.withColumn("ingested_at", F.coalesce("ingested_at", F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'")))
        .withColumn("source", F.coalesce("source", F.lit(source)))
        .withColumn("skipped", F.col("_corrupt_record").isNotNull() | F.col("event_id").isNull())
    )


def skip_count(events: DataFrame) -> int:
    """How many raw lines would the reference's loader have skipped."""
    return events.where(F.col("skipped")).count()


def valid_events(events: DataFrame) -> DataFrame:
    return events.where(~F.col("skipped")).select(*ENVELOPE_FIELDS)


def read_historical_json(
    spark: SparkSession, path: str, event_type: str, source: str = "historical_bootstrap"
) -> DataFrame:
    """Historical JSON-array bootstrap (reference S1,
    src/bootstrap_loader.py:84-99): whole-file JSON arrays of flat records
    → synthesized envelope (natural key, event time, vendor extraction +
    deterministic SHA-256 event_id)."""
    raw = spark.read.option("multiLine", True).json(path)
    cols = set(raw.columns)
    def candidates(names):
        return [F.col(n).cast("string") for n in names if n in cols] or [F.lit(None).cast("string")]
    key_names = NATURAL_KEY_MAP.get(event_type, NATURAL_KEY_CANDIDATES)
    natural_key = coalesce_keys(candidates(key_names), skip_falsy=True)
    evt_time = coalesce_keys(candidates(EVENT_TIME_CANDIDATES), skip_falsy=True)
    vendor = F.coalesce(coalesce_keys(candidates(VENDOR_CANDIDATES), skip_falsy=True), F.lit("unknown"))
    # payload = the whole record re-serialized as canonical JSON
    payload = F.to_json(F.struct(*[F.col(c) for c in sorted(raw.columns)]))
    natural_or_hash = F.coalesce(natural_key, F.md5(payload))
    return raw.select(
        _event_id(F.lit(event_type), natural_or_hash).alias("event_id"),
        F.lit(event_type).alias("event_type"),
        evt_time.alias("event_time"),
        vendor.alias("vendor"),
        payload.alias("payload"),
        F.date_format(F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ingested_at"),
        F.lit(source).alias("source"),
    )


def write_bronze(events: DataFrame, path: str, mode: str = "append") -> None:
    """Bronze sink: parquet partitioned by ingest date (partition pruning
    replaces the reference's directory-per-date layout, §4)."""
    (
        events.withColumn("ingest_date", F.to_date(F.substring("ingested_at", 1, 10)))
        .write.mode(mode)
        .partitionBy("ingest_date")
        .parquet(path)
    )


def read_bronze(spark: SparkSession, path: str, event_types: list[str] | None = None) -> DataFrame:
    """Bronze scan with predicate pushdown (reference S3: Mongo
    ``find({event_type: {$in: ...}})`` — Catalyst pushes the isin filter
    into the parquet scan) and storage-level idempotency on read."""
    df = spark.read.parquet(path)
    if event_types:
        df = df.where(F.col("event_type").isin(event_types))
    return df.dropDuplicates(["event_id"])


def read_fx_rates(spark: SparkSession, path: str) -> DataFrame:
    """FX-rate CSV scan (reference S4 — shipped but never read by the
    reference, SURVEY Q7; our currency-normalization fix uses it)."""
    return (
        spark.read.option("header", True).csv(path)
        .select(F.to_date("date").alias("fx_date"), F.col("USDNGN").cast("double").alias("usd_ngn"))
    )


def write_bucketed(
    df,
    table_name: str,
    bucket_col: str,
    *,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (co-located join layout).

    Two fact tables bucketed by the same key into the same bucket count
    join WITHOUT a shuffle — the physical plan has no Exchange on either
    side (SortMergeJoin reads matching buckets directly). At 100 TB this
    is the difference between re-shuffling petabytes per join and reading
    co-located files; bucket the big fact tables by their join key at
    write time (orders/payments/refunds by order_id).
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table_name)


def _swap_in(path: str, tmp: str, old: str) -> None:
    """Replace ``path`` with ``tmp`` via two renames: readers never
    observe a half-written dataset, and the source stays intact if the
    rewrite died before this point. A stale old-dir from a prior crashed
    swap is cleared first (rename onto a non-empty target fails).
    Rename-swap assumes atomic directory moves — local/HDFS; on object
    stores use a table format's commit protocol instead."""
    import os as _os
    import shutil as _shutil

    if _os.path.exists(old):
        _shutil.rmtree(old)
    _os.rename(path.rstrip("/"), old)
    _os.rename(tmp, path.rstrip("/"))
    _shutil.rmtree(old)


def compact_parquet(
    spark: SparkSession,
    path: str,
    *,
    target_file_mb: int = 128,
    partition_col: str | None = None,
) -> dict:
    """Small-files compaction: rewrite a parquet dataset so each output
    file is ~``target_file_mb``. Streaming ingest (one file per
    micro-batch per task) and fine-grained partitioning both breed
    thousands of KB-sized files; at 100 TB the scan's file-open/footer
    overhead and the driver's listing/memory cost dominate long before
    the bytes do. The reference never needs this (pandas, single file) —
    any production lakehouse does.

    Mechanics: size the dataset from the file listing (cheap, no scan),
    rewrite with ``ceil(bytes / target)`` output files — via
    ``repartition(n)`` (round-robin, even sizes) or, when
    ``partition_col`` is given, ``repartition(n, col)`` +
    ``partitionBy(col)`` so each hive partition compacts to its own
    file set and partition pruning survives. The rewrite goes to a
    temp sibling directory first and swaps in with two renames —
    readers never observe a half-written dataset, and the source is
    still intact if the rewrite dies. (Rename-based swap assumes a
    filesystem with atomic directory moves — local/HDFS; on object
    stores use a table format's commit protocol instead.)

    Returns {"files_before", "files_after", "bytes"} for ops logging.
    """
    import glob as _glob
    import math
    import os as _os

    files = [
        f
        for f in _glob.glob(_os.path.join(path, "**", "*"), recursive=True)
        if _os.path.isfile(f) and not _os.path.basename(f).startswith(("_", "."))
    ]
    total = sum(_os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    writer = (
        df.repartition(n_out, partition_col).write.partitionBy(partition_col)
        if partition_col
        else df.repartition(n_out).write
    )
    writer.mode("overwrite").parquet(tmp)
    _swap_in(path, tmp, old)
    after = [
        f
        for f in _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        if _os.path.isfile(f)
    ]
    return {"files_before": len(files), "files_after": len(after), "bytes": total}


def purge_keys(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list | DataFrame,
    *,
    partition_col: str | None = None,
) -> dict:
    """Right-to-erasure propagation: remove every row whose ``key_col``
    is in ``keys`` from a parquet dataset, atomically (same rename-swap
    as :func:`compact_parquet`). Run it per table to propagate a deletion
    request through bronze/silver/gold — the reference's truncate-and-
    reload has no targeted-delete story at all.

    ``keys`` may be a Python list (small requests) or a DataFrame with a
    ``key_col`` column (bulk requests); either way the purge is one
    broadcast LEFT-ANTI join — the dataset shuffles nothing and is read
    once for the rewrite. Returns {"rows_before", "rows_removed"} (the
    counts cost one extra scan; erasure jobs audit their work).
    """
    df = spark.read.parquet(path)
    key_type = df.schema[key_col].dataType
    if isinstance(keys, DataFrame):
        keys_df = keys.select(
            F.col(key_col).cast(key_type).alias(key_col)
        ).dropDuplicates([key_col])
    else:
        # accept heterogeneous callers (CLI strings, Python ints) by
        # round-tripping through string → the dataset's key type
        keys_df = spark.createDataFrame(
            [(str(k),) for k in keys], f"{key_col} string"
        ).select(F.col(key_col).cast(key_type).alias(key_col))
    kept = df.join(F.broadcast(keys_df), on=key_col, how="left_anti")
    before = df.count()
    tmp = path.rstrip("/") + "._purge_tmp"
    old = path.rstrip("/") + "._purge_old"
    writer = kept.write.partitionBy(partition_col) if partition_col else kept.write
    writer.mode("overwrite").parquet(tmp)
    _swap_in(path, tmp, old)
    after = spark.read.parquet(path).count()
    return {"rows_before": before, "rows_removed": before - after}
