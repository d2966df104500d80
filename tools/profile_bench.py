"""Profile individual headline queries under the exact bench.py session
conf (32-part-file split copies + one-task-per-file packing), printing
per-query wall time over N runs plus optional formatted plans.

Usage: python tools/profile_bench.py q1 q2 ... [--explain] [--runs N]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import materialize_split_copies  # noqa: E402


def main() -> None:
    explain = "--explain" in sys.argv
    runs = 2
    args = sys.argv[1:]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]  # don't let the N leak into the name list
    names = [a for a in args if not a.startswith("--")]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    bench_dir = materialize_split_copies(sf_dir)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("profile")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.files.openCostInBytes", "4m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    # warm-up
    spark.read.parquet(f"{bench_dir}/lineitem.parquet").groupBy("l_returnflag").count().write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        fn = qs[name]
        if explain:
            fn(spark, bench_dir).explain("formatted")
        ts = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn(spark, bench_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.monotonic() - t0, 3))
        print(f"{name}: min={min(ts)} runs={ts}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
