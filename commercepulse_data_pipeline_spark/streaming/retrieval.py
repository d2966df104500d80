"""Continuous inverted-index ingest — the streaming sibling of
``operators/retrieval.py::write_text_index`` (the same discipline as
``streaming/media.py::stream_image_hash_index``): tail a directory of
document parquet drops and maintain a BM25-servable postings store.

Store layout (what ``bm25_topk_indexed`` reads when no batch-mode
``meta/`` sidecar exists):

  {store}/postings/ingest_batch=N/term_bucket=B/   posting rows
  {store}/stats/ingest_batch=N/                    one (n, s, n_buckets,
                                                   id_col) row per batch

Replay idempotency: every write is a per-batch-partition OVERWRITE — a
replayed micro-batch (crash between commit and checkpoint advance)
reproduces its own partitions bit-identically and the query-time stats
roll-up never double-counts. There is NO mutable meta to corrupt; layout
params ride in every stats row and the reader refuses a store whose
batches disagree (the stream-side analogue of write_text_index's
append-param pin).

At scale: per-batch cost is one map pass over the batch (array-side
distinct-term counts) + a partitioned write — O(batch), never an index
rewrite; the serving probe stays partition-pruned regardless of how many
ingest_batch partitions accumulate (term_bucket prunes at its level).
Compact with the same maintenance tooling as any hive-partitioned table
when small-batch file counts grow.

Append semantics: batches are treated as DISJOINT corpus slices — a doc
re-ingested in a later batch contributes postings (and stats) again,
exactly as a corpus containing both copies would. Dedup belongs upstream
(the curation funnel / ``dedup_within_watermark``), not in the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.functions.localdf import one_slice_df

from ..operators.retrieval import _corpus_stats, _postings_from_staged, _staged_rle


def text_index_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> None:
    """Fold one micro-batch of documents into the postings store.
    Zero-token docs hold no postings but count in the batch's stats row
    (the write_text_index contract, single-sourced in ``_corpus_stats``).

    Write order is stats FIRST, postings second — deliberately: a serve
    racing a half-committed batch (or reading after a crash between the
    two writes) then sees stats that count docs whose postings are not
    yet visible, which only UNDER-ranks (the docs are absent, idf/avgdl
    slightly conservative) and converges on replay. The opposite order
    would score visible postings against stats that undercount the
    corpus — systematically inflated scores, which is the worse silent
    failure. On the very first batch the window instead surfaces as a
    missing-postings read error: honest, and gone once the batch
    commits."""
    spark = batch_df.sparkSession
    staged = _staged_rle(batch_df, text_col).localCheckpoint(eager=True)
    stats_row = _corpus_stats(staged)
    one_slice_df(
        spark,
        [(int(stats_row["n"]), int(stats_row["s"]), n_buckets, id_col)],
        "n long, s long, n_buckets int, id_col string",
    ).write.mode("overwrite").parquet(
        f"{store_dir}/stats/ingest_batch={batch_id}"
    )
    _postings_from_staged(staged, id_col, n_buckets).write.mode(
        "overwrite"
    ).partitionBy("term_bucket").parquet(
        f"{store_dir}/postings/ingest_batch={batch_id}"
    )


def stream_text_index(
    spark: SparkSession,
    docs_path: str,
    store_dir: str,
    checkpoint: str,
    *,
    schema: str = "doc_id bigint, text string",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 64,
    max_files_per_trigger: int = 10,
    trigger_once: bool = True,
):
    """Tail ``docs_path`` for document parquet drops and maintain the
    BM25 postings store. Returns the started query; serve with
    ``operators.retrieval.bm25_topk_indexed(spark, store_dir, terms)``
    at any point — results reflect every committed batch."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_path)
    )

    def _batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        text_index_batch(
            batch_df,
            batch_id,
            store_dir,
            text_col=text_col,
            id_col=id_col,
            n_buckets=n_buckets,
        )

    writer = stream.writeStream.foreachBatch(_batch_fn).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
