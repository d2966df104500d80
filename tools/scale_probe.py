"""Scale probe: replicate the sf0.1 tables N× on disk (multi-file parquet,
like production layout) and compare headline query times against sf0.1.

Near-linear growth (ratio ≈ N on a fixed-core box) is the evidence that
plans are shuffle/partition-clean: a superlinear blowup would expose a
hidden cross product, a driver-side collect, or a skew hotspot.

Usage: python tools/scale_probe.py [N] [outdir] [query ...]
(query subset optional — default is the full PROBE_QUERIES list; the 100×
decade probe runs just the heavy tier to keep wall-clock sane)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = [
    "pricing_summary",
    "daily_revenue",
    "order_daily_rollup",
    "dedup_last_writer",
    "docs_quality",
    "minhash_pairs",
    "ngram_jaccard",
    "simhash_pairs",
    "fact_shipments_rollup",
    "embedding_selfknn",
    # round-4 extension tier
    "docs_dup_clusters",
    "docs_dedup_keep_best",
    "docs_stratified_sample",
    "docs_packed_windows",
    "docs_contamination",
    "docs_pii_scrub",
    # round-5 additions
    "corpus_top_ngrams",
    "docs_chunked",
    "docs_keywords",
    "minhash_incremental",
    "docs_repetition",
    "docs_split_manifest",
    "corpus_summary",
    # round-6 additions
    "fx_normalized_revenue",
    "last_touch_asof",
    "scd2_asof",
    "order_value_percentiles_approx",
    "semantic_dedup",
    "split_leakage",
    "docs_unigram_ce",
    "merge_upsert_state",
    "salted_revenue",
    "corpus_mixture_plan",
    "incident_impact",
    "docs_curation_funnel",
    "incident_concurrency",
    "docs_per_lang_sample",
    "user_conversion",
    "corpus_snapshot_diff",
    "source_overlap",
    "docs_encoded",
    "retention_cohorts",
    "daily_revenue_7dma",
    "lang_confusion",
    # round-7 additions
    "approx_stats_check",
    "order_value_percentiles_check",
    "purge_audit",
    "sketch_range_users",
    "token_heavy_hitters",
    "bpe_pair_counts",
    "docs_weighted_sample",
    "docs_length_deciles",
    # round-8 additions
    "order_value_hist_quantiles",
    "kmv_set_overlap",
    "containment_pairs",
    "docs_epoch_shuffle",
    "skew_report",
    "corpus_collocations",
    "embedding_gram",
    "revenue_anomalies",
    # round-9 additions
    "docs_passage_dedup",
    "docs_decontaminated",
    "ann_pq_topk",
    "docs_mixture_applied",
    "cross_source_fuzzy_join",
    "orders_above_customer_avg",
    # round-10 additions
    "ann_ivfpq_topk",
    "docs_boilerplate_strip",
    "docs_dsir_sample",
    "embedding_hard_negatives",
    "ann_pq_knn_join",
    "docs_bigram_ce",
    "docs_temperature_mixture",
    "docs_hashed_vectors",
    "docs_tfidf_vectors",
    # round-11 additions
    "docs_cluster_safe_split",
    "embedding_label_outliers",
    "docs_derepeated",
    "corpus_novelty",
    "simhash_incremental",
    # round-12 additions
    "docs_quarantine",
    "dup_cluster_size_hist",
    "dup_pairs_confirmed",
    "docs_ce_bands",
    "docs_ce_bands_global",
    # bitext_margin_pairs is deliberately NOT probed: its cost model is
    # |src|x|tgt| (both sides grow under replication -> quadratic BY
    # CONTRACT, which is why margin_knn_join is max_queries-guarded and
    # documented as a per-language-pair-shard operator; see SCALE.md r12)
]

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def replicate(spark, src: str, dst: str, n: int) -> None:
    """N× data volume; keys offset per copy so join/group cardinality
    scales with the data (pure duplication would understate group growth)."""
    from pyspark.sql import functions as F

    os.makedirs(dst, exist_ok=True)
    offsets = {
        "orders": ("o_orderkey", 10_000_000), "lineitem": ("l_orderkey", 10_000_000),
        "documents": ("doc_id", 10_000_000), "embeddings": ("vec_id", 10_000_000),
        "events": ("event_id", 10_000_000),
    }
    for t in TABLES:
        src_df = spark.read.parquet(f"{src}/{t}.parquet")
        if t in offsets:
            key, step = offsets[t]
            parts = []
            for i in range(n):
                p = src_df.withColumn(key, F.col(key) + F.lit(i * step))
                if t == "events" and i > 0:
                    # Shift each copy's clock past the base span (30 days):
                    # overlapping replicas would make every time-window
                    # query's TRUE output grow quadratically by construction
                    # (N× windows × N× co-window events), measuring output
                    # inflation, not plan scaling — the same reasoning as
                    # the documents vocabulary prefixing below. N× data now
                    # means N× history, the realistic growth axis.
                    if dict(src_df.dtypes).get("ts") == "bigint":  # nanos-as-long era
                        p = p.withColumn("ts", F.col("ts") + F.lit(i * 35 * 86400 * 10**9))
                    else:
                        p = p.withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 35} DAYS"))
                if t == "embeddings" and i > 0:
                    # Rotate each copy's vector by i positions: identical
                    # replicas would land in the SAME sign-LSH buckets, so
                    # posting lists would grow n× and pair candidates n²×
                    # by construction (duplicate inflation, not plan
                    # scaling). Rotation keeps norms but changes direction.
                    dim = len(src_df.select("embedding").head()[0])
                    sh = i % dim
                    if sh:
                        p = p.withColumn(
                            "embedding",
                            F.concat(
                                F.slice(F.col("embedding"), sh + 1, dim - sh),
                                F.slice(F.col("embedding"), 1, sh),
                            ),
                        )
                if t == "documents":
                    # Prefix every token with the copy id → each copy has a
                    # DISJOINT shingle vocabulary. Plain replication makes
                    # every copy an exact near-dup of its siblings, so pair
                    # outputs grow quadratically BY CONSTRUCTION and the
                    # probe would measure output inflation, not plan scaling.
                    p = p.withColumn(
                        "text",
                        F.array_join(
                            F.transform(
                                F.split(F.col("text"), r"\s+"),
                                lambda x: F.concat(F.lit(f"c{i}_"), x),
                            ),
                            " ",
                        ),
                    )
                parts.append(p)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        else:
            out = src_df  # dims stay fixed (star-schema realism)
        out.write.mode("overwrite").parquet(f"{dst}/{t}.parquet")


def run(spark, sf_dir: str, names=None) -> dict[str, float]:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in names or PROBE_QUERIES:
        best = float("inf")
        for _ in range(2):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_probe_sf1"
    names = sys.argv[3:] or PROBE_QUERIES
    # Base reads the SAME many-file layout bench.py uses: comparing a
    # single-row-group base (1 scan split/table) against many-file
    # replicas would skew ratios in both directions.
    from bench import materialize_split_copies

    src = materialize_split_copies("/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        # one scan task per part file (same rationale as bench.py)
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "4m")
        # historical testdata encoding (TIMESTAMP(NANOS) events): harmless
        # when absent, required for replicas written from that encoding
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # embeddings is replicated last — its presence means a complete replica
    if not os.path.exists(f"{outdir}/embeddings.parquet"):
        replicate(spark, src, outdir, n)

    # untimed JIT warm-up sweep (same rationale as bench.py: the JVM's
    # first ~25s run 5-10x slow, which would inflate base times and
    # understate the ratios)
    import __spark_entry__ as entrymod

    for name in names:
        entrymod.queries()[name](spark, src).write.format("noop").mode("overwrite").save()

    base = run(spark, src, names)
    big = run(spark, outdir, names)
    report = {
        "replication": n,
        "base_sf": 0.1,
        "queries": {
            q: {"base_s": base[q], "scaled_s": big[q],
                "ratio": round(big[q] / base[q], 2) if base[q] > 0 else None}
            for q in names
        },
    }
    print(json.dumps(report, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
