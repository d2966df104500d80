"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized through the noop sink (full execution, no
driver-side collect) — the number measures the distributed plan, not
result serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "daily_revenue",
    "order_daily_rollup",
    "revenue_rollup",
    "order_value_percentiles",
    "ship_latency",
    "dedup_last_writer",
    "sessionize",
    "event_daily_stats",
    "docs_quality",
    "docs_exact_dedup",
    "token_budget",
    "minhash_pairs",
    "ngram_jaccard",
    "simhash_pairs",
    "ann_cosine_topk",
    "embedding_knn",
    "sql_regional_revenue",
    "session_windows",
    "docs_shared_passages",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("commercepulse-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Untimed warm-up: trigger JVM JIT / codegen compilation and parquet
    # footer reads once, so the first measured query reflects the plan,
    # not cold-start. Standard benchmark methodology (warm runs).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy("l_returnflag").count().write.format(
        "noop"
    ).mode("overwrite").save()

    # Each query runs twice; we report the min (steady-state). The first
    # run pays one-time whole-stage-codegen compilation (~2-4s for the
    # widest expression trees), a fixed cost that amortizes to zero at
    # production scale and would otherwise dominate sub-second queries.
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = qs[name]
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.monotonic() - t0)
        dt = round(min(runs), 3)
        timings[name] = dt
        total += dt

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
