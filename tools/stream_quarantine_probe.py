"""Streaming quarantine twin latency probe (VERDICT r12 item 6).

The batch clean-corpus --quarantine chain is probed in SCALE.md (r12:
0.98x overhead after the clusters/with_tokens hoists); the STREAMING twin
(streaming/corpus.py::clean_corpus_batch quarantine=True) has correctness
tests but no measured scale row. This probe drives the batch function the
way foreachBatch does — three consecutive micro-batches against the same
accumulating store, so batch 2 and 3 pay the real cross-batch index probe
— at 1x (2k docs/batch) and 10x (20k docs/batch), quarantine off and on,
and reports per-batch wall clock.

What it answers: (a) does the quarantine flag's extra lineage (reject
complements + the dropped/derep localCheckpoints) change micro-batch
latency materially at 10x batch size, and (b) how does micro-batch
latency itself scale with batch size as the index accumulates (the r12
note rejecting the exact-dedup checkpoint predicted ~5% — verify at 10x).

Corpus construction mirrors tools/cli_chain_probe.py: offset doc_ids and
copy-prefixed vocabulary per replica (pair output scales with data, no
quadratic-by-construction), PLUS per-batch token prefixes so consecutive
batches are near-dup-free against each other except for a planted 5%
cross-batch duplicate slice — the realistic stream shape (most arrivals
new, some re-crawls).

Usage: python tools/stream_quarantine_probe.py [workdir]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.01"


def build_batch(spark, n_copies: int, batch_no: int):
    """One micro-batch: n_copies x 500 base docs, vocabulary prefixed by
    (copy, batch) so batches don't near-dup each other — except a planted
    5% slice that reuses batch 0's tokens verbatim (cross-batch dups)."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(n_copies):
        p = src.withColumn(
            "doc_id", F.col("doc_id") + F.lit((batch_no * 100 + i) * 10_000_000)
        )
        # 5% of rows keep batch-0 vocabulary => cross-batch near-dups the
        # index probe must catch; the rest are batch-unique
        tag = F.when(F.col("doc_id") % 20 == 3, F.lit(f"c{i}_b0_")).otherwise(
            F.lit(f"c{i}_b{batch_no}_")
        )
        p = p.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda x: F.concat(tag, x),
                ),
                " ",
            ),
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("doc_id", "text").localCheckpoint(eager=True)


def run_stream(spark, store: str, n_copies: int, quarantine: bool) -> list[float]:
    from commercepulse_data_pipeline_spark.streaming.corpus import (
        clean_corpus_batch,
    )

    shutil.rmtree(store, ignore_errors=True)
    times = []
    for b in range(3):
        batch = build_batch(spark, n_copies, b)
        t0 = time.monotonic()
        clean_corpus_batch(batch, b, store, quarantine=quarantine)
        times.append(round(time.monotonic() - t0, 2))
    return times


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stream_q_probe"
    os.makedirs(workdir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out = {"batches": 3, "base_docs_per_copy": 500}
    for label, copies in (("1x_2k", 4), ("10x_20k", 40)):
        for q in (False, True):
            key = f"{label}_{'q' if q else 'base'}"
            out[key] = run_stream(
                spark, os.path.join(workdir, key), copies, quarantine=q
            )
    # quarantined rows at 10x for the record (store from the last run)
    qdir = os.path.join(workdir, "10x_20k_q", "quarantine")
    out["q_rows_10x"] = spark.read.parquet(qdir).count()
    out["kept_rows_10x"] = spark.read.parquet(
        os.path.join(workdir, "10x_20k_q", "corpus")
    ).count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
