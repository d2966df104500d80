"""Skew probe: Zipf-skewed key layout → plain vs salted vs AQE plans.

The 10× replication probe (tools/scale_probe.py) grows volume UNIFORMLY;
this probe grows a single key's share instead — the failure mode that
actually breaks 100 TB jobs. Layout (deterministic, hash-assigned so the
hot key interleaves across files like production data):

    ~40% of rows → key 0 (the hot vendor)
    ~20% of rows → keys 1..10
    ~40% of rows → uniform over keys 11..100010

Measured shapes (each min-of-2 after an untimed warm-up):

- join_plain:      big ⋈ dim, AQE off, broadcast off — the hot key's rows
                   land in ONE sort-merge task (the cliff).
- join_salted:     operators.skew.salted_join, same confs — hot key spread
                   over salt_buckets tasks; dim replicated buckets×.
- join_aqe_skew:   AQE + skewJoin on (production default) — runtime split
                   of the oversized partition, no code change.
- agg_plain:       groupBy(key).sum/count/max — EXPECTED to stay flat
                   under skew: hash aggregation runs partially map-side,
                   so the reducer sees one partial row per (key, map
                   task), not the raw hot-key rows. Recorded to document
                   when NOT to salt.
- agg_salted:      operators.skew.salted_agg on the same aggregates —
                   expected ≈ agg_plain + one extra tiny shuffle; the
                   operator is for NON-combinable shapes, and the probe
                   keeps everyone honest about that.
- lww_window:      last_writer_wins (rank-1 window) on the skewed key.
                   Spark 4 inserts WindowGroupLimit BEFORE the shuffle —
                   each map task pre-keeps only its own rank-1 candidates
                   per key, so the hot key ships #map_tasks rows, not 40%
                   of the table. This is why the D1 operator is skew-safe.
- lww_window_nolimit: same query with the WindowGroupLimit optimizer rule
                   disabled — the pre-Spark-3.5 behavior, i.e. the cliff
                   the optimization removes.
- rollup_aqe:      pre-aggregate-then-join rollup shape (plans/gold.py
                   pattern) on the skewed key under production confs
                   (AQE + skew join on) — end-to-end sanity that the gold
                   rollup plan shape survives a hot vendor.

Usage: python tools/skew_probe.py [rows] [outdir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEFAULT = 16_000_000
TAIL_KEYS = 100_000


def build(spark, n: int, outdir: str) -> None:
    from pyspark.sql import functions as F

    marker = f"{outdir}/_DONE"
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read().strip() == str(n):
                return
        # stale layout from a different row count: rebuild, else the
        # report's "rows" field would misstate what was measured
        import shutil

        shutil.rmtree(outdir, ignore_errors=True)
    ids = spark.range(n, numPartitions=64).withColumnRenamed("id", "row_id")
    h = F.pmod(F.hash("row_id"), F.lit(100))
    key = (
        F.when(h < 40, F.lit(0))
        .when(h < 60, 1 + F.pmod(F.col("row_id"), F.lit(10)))
        .otherwise(11 + F.pmod(F.col("row_id"), F.lit(TAIL_KEYS)))
    )
    big = ids.select(
        "row_id",
        key.cast("long").alias("vendor_id"),
        ((F.col("row_id") * 1007) % 100000).cast("double").alias("amount"),
        F.col("row_id").alias("ts"),
        F.concat(F.lit("payload-"), (F.col("row_id") % 99991).cast("string")).alias("payload"),
    )
    big.write.mode("overwrite").parquet(f"{outdir}/big.parquet")
    dim = spark.range(TAIL_KEYS + 11).select(
        F.col("id").alias("vendor_id"),
        F.concat(F.lit("vendor-"), F.col("id").cast("string")).alias("vendor_name"),
        (F.col("id") % 7).cast("int").alias("region_id"),
    )
    dim.write.mode("overwrite").parquet(f"{outdir}/dim.parquet")
    with open(f"{outdir}/_DONE", "w") as fh:
        fh.write(f"{n}\n")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_DEFAULT
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew_probe"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from commercepulse_data_pipeline_spark.operators.dedup import last_writer_wins
    from commercepulse_data_pipeline_spark.operators.skew import salted_agg, salted_join

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, n, outdir)
    big = spark.read.parquet(f"{outdir}/big.parquet")
    dim = spark.read.parquet(f"{outdir}/dim.parquet")

    def set_confs(
        aqe: bool, skew: bool, broadcast: bool, wgl: bool, small_skew_thresholds: bool = False
    ) -> None:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew).lower())
        # Scale the skew-detection thresholds to probe size FOR THE SKEW-
        # JOIN MEASUREMENT ONLY: the default trigger is median×5 AND
        # >256 MB — a 100 TB hot partition clears that by orders of
        # magnitude, but the probe's ~200 MB hot partition sits just under
        # it (measured: the split silently never fired and join_aqe_skew
        # == join_plain). 16 MB keeps the same median×5 shape at probe
        # scale; everything else runs production defaults (a global 16 MB
        # advisory size measurably perturbs unrelated shapes).
        thr = "16m" if small_skew_thresholds else "256m"
        adv = "16m" if small_skew_thresholds else "64m"
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", thr)
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", adv)
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", "10485760" if broadcast else "-1"
        )
        # WindowGroupLimit insertion threshold: rank <= k pre-filter runs
        # map-side before the window shuffle when the rank filter is below
        # this; -1 disables the rule (the pre-3.5 cliff, for contrast)
        spark.conf.set(
            "spark.sql.optimizer.windowGroupLimitThreshold", "1000" if wgl else "-1"
        )

    def timed(name: str, fn, runs: int = 2) -> float:
        best = float("inf")
        for _ in range(runs):
            t0 = time.monotonic()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.monotonic() - t0)
        return round(best, 3)

    join_plain = lambda: big.join(dim, "vendor_id").select(  # noqa: E731
        "vendor_name", "amount"
    )
    join_salt = lambda: salted_join(  # noqa: E731
        big, dim, "vendor_id", salt_buckets=32, salt_cols=["row_id"]
    ).select("vendor_name", "amount")
    aggs = {
        "total": ("amount", F.sum, F.sum),
        "n": ("amount", F.count, F.sum),
        "mx": ("amount", F.max, F.max),
    }
    agg_plain = lambda: big.groupBy("vendor_id").agg(  # noqa: E731
        F.sum("amount").alias("total"), F.count("amount").alias("n"),
        F.max("amount").alias("mx"),
    )
    agg_salt = lambda: salted_agg(  # noqa: E731
        big, ["vendor_id"], aggs, salt_buckets=32, salt_cols=["row_id"]
    )
    lww = lambda: last_writer_wins(  # noqa: E731
        big, ["vendor_id"], "ts", tiebreak_cols=["row_id"]
    )

    def rollup():
        per_key = big.groupBy("vendor_id").agg(
            F.sum("amount").alias("rev"), F.count(F.lit(1)).alias("n")
        )
        return per_key.join(dim, "vendor_id").groupBy("region_id").agg(
            F.sum("rev").alias("rev"), F.sum("n").alias("n")
        )

    # warm-up (JIT) on the production-conf path
    set_confs(aqe=True, skew=True, broadcast=False, wgl=True)
    join_plain().write.format("noop").mode("overwrite").save()
    agg_plain().write.format("noop").mode("overwrite").save()
    lww().write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}
    set_confs(aqe=False, skew=False, broadcast=False, wgl=True)
    results["join_plain_noaqe"] = timed("join_plain", join_plain)
    results["join_salted_noaqe"] = timed("join_salted", join_salt)
    set_confs(aqe=True, skew=True, broadcast=False, wgl=True, small_skew_thresholds=True)
    results["join_aqe_skew"] = timed("join_aqe", join_plain)
    set_confs(aqe=True, skew=True, broadcast=False, wgl=True)
    results["agg_plain"] = timed("agg_plain", agg_plain)
    results["agg_salted"] = timed("agg_salted", agg_salt)
    results["lww_window"] = timed("lww", lww)
    set_confs(aqe=True, skew=True, broadcast=False, wgl=False)
    results["lww_window_nolimit"] = timed("lww_nolimit", lww)
    set_confs(aqe=True, skew=True, broadcast=False, wgl=True)
    results["rollup_aqe"] = timed("rollup", rollup)

    # correctness cross-checks (cheap): salted results == plain results
    checks = {
        "join_rows_equal": join_plain().count() == join_salt().count(),
        "agg_rows_equal": agg_plain().count() == agg_salt().count(),
        "agg_hot_total_equal": (
            agg_plain().where(F.col("vendor_id") == 0).select("total", "n").collect()
            == agg_salt().where(F.col("vendor_id") == 0).select("total", "n").collect()
        ),
    }
    hot_share = big.where(F.col("vendor_id") == 0).count() / big.count()
    print(json.dumps({
        "rows": n,
        "hot_key_share": round(hot_share, 4),
        "timings_s": results,
        "checks": checks,
    }, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
