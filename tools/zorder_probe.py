"""Z-order layout probe at scale: rewrite a multi-GB replica table with
``zorder_layout`` and measure (a) rewrite wall-time and (b) the pruning
ratio a selective range predicate achieves on EACH clustered dimension,
from parquet footer min/max stats — the same stats Spark's scan uses —
plus the timed filtered-count before/after.

Usage:
  python tools/zorder_probe.py [replica_dir] [table] [colA] [colB]

Defaults probe the 100x scale replica's lineitem on
(l_orderkey, l_partkey). The source table is COPIED to a work dir first
(zorder_layout rewrites in place); results print as one JSON line and
are recorded in SCALE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parquet_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f) and not os.path.basename(f).startswith(("_", "."))
    ]


def pruning_ratio(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(files whose [min,max] intersects [lo,hi], total files) — footer
    stats only, the information Spark's scan pruning runs on."""
    import pyarrow.parquet as pq

    files = parquet_files(path)
    hit = 0
    for f in files:
        md = pq.read_metadata(f)
        idx = md.schema.to_arrow_schema().names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        if min(mins) <= hi and max(maxs) >= lo:
            hit += 1
    return hit, len(files)


def timed_count(spark, path: str, col: str, lo, hi) -> tuple[float, int]:
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    n = spark.read.parquet(path).where(F.col(col).between(lo, hi)).count()
    return round(time.monotonic() - t0, 3), n


def main() -> None:
    replica = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe_100x_r8"
    table = sys.argv[2] if len(sys.argv) > 2 else "lineitem"
    cols = sys.argv[3:5] or ["l_orderkey", "l_partkey"]
    src = os.path.join(replica, f"{table}.parquet")
    work = os.path.join("/tmp/zorder_probe", f"{table}.parquet")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from commercepulse_data_pipeline_spark.sources.readers import zorder_layout

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(os.path.dirname(work), ignore_errors=True)
    os.makedirs(os.path.dirname(work), exist_ok=True)
    if os.path.isdir(src):
        shutil.copytree(src, work)
    else:
        os.makedirs(work, exist_ok=True)
        shutil.copy(src, os.path.join(work, "part-00000.parquet"))

    # A ~1%-of-domain window per clustered column (quantile-derived so
    # skew can't make one probe trivially empty).
    windows = {}
    df = spark.read.parquet(work)
    for c in cols:
        lo, hi = df.approxQuantile(c, [0.40, 0.41], 0.001)
        windows[c] = (lo, hi)

    before = {}
    for c, (lo, hi) in windows.items():
        t, n = timed_count(spark, work, c, lo, hi)
        hit, tot = pruning_ratio(work, c, lo, hi)
        before[c] = {"files_hit": hit, "files_total": tot, "count_s": t, "rows": n}

    t0 = time.monotonic()
    stats = zorder_layout(spark, work, cols, target_file_mb=32)
    rewrite_s = round(time.monotonic() - t0, 3)

    after = {}
    for c, (lo, hi) in windows.items():
        t, n = timed_count(spark, work, c, lo, hi)
        hit, tot = pruning_ratio(work, c, lo, hi)
        after[c] = {"files_hit": hit, "files_total": tot, "count_s": t, "rows": n}
        assert n == before[c]["rows"], (c, n, before[c]["rows"])

    total_bytes = sum(os.path.getsize(f) for f in parquet_files(work))
    print(
        json.dumps(
            {
                "table": table,
                "zorder_cols": cols,
                "bytes": total_bytes,
                "rewrite_s": rewrite_s,
                "files_after": stats["files_after"],
                "before": before,
                "after": after,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
