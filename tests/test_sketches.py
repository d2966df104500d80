"""Mergeable HLL sketch rollup tables (operators/sketches.py): one pass
builds per-(day, group) sketches; any date-range distinct query is a
union-merge of persisted kilobyte sketches — never a raw re-scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.operators import sketches as sk

# HLL at lg_k=12: rsd ≈ 1.04/√4096 ≈ 1.6%; 5σ envelope + small floor
def _tol(exact: int) -> float:
    return max(5 * 1.04 / 4096 ** 0.5 * exact, 2.0)


def _events(spark, n_days=10, users_per_day=300):
    # user u is active on day d iff u % (d+1) == 0 → overlapping cohorts,
    # deterministic exact distincts to verify against
    rows = [
        (f"2026-03-{d+1:02d}", "view", u)
        for d in range(n_days)
        for u in range(users_per_day * 4)
        if u % (d + 1) == 0
    ]
    return spark.createDataFrame(rows, "day string, event_type string, user_id long")


def test_sketch_rollup_range_estimate_within_envelope(spark, tmp_path):
    e = _events(spark)
    path = str(tmp_path / "rollup")
    sk.write_sketch_rollup(e, path, group_cols=["event_type"])

    # one sketch row per (day, group); sketches are small binaries
    rollup = spark.read.parquet(path)
    assert rollup.count() == 10
    assert dict(rollup.dtypes)["key_sketch"] == "binary"

    got = sk.distinct_over_range(
        spark, path, "2026-03-03", "2026-03-07", group_cols=["event_type"]
    ).first()
    ref = e.where((F.col("day") >= "2026-03-03") & (F.col("day") <= "2026-03-07"))
    exact = ref.select("user_id").distinct().count()
    assert got.n_rows == ref.count()  # row counts are exact, not sketched
    assert abs(got.distinct_estimate - exact) <= _tol(exact), (
        got.distinct_estimate, exact,
    )


def test_sketch_rollup_incremental_append(spark, tmp_path):
    """The incremental build path: append each day's sketches separately;
    range queries over the combined store merge across appends."""
    e = _events(spark, n_days=6)
    path = str(tmp_path / "rollup")
    for d in range(6):
        day = f"2026-03-{d+1:02d}"
        sk.write_sketch_rollup(
            e.where(F.col("day") == day), path,
            group_cols=["event_type"], mode="append",
        )
    got = sk.distinct_over_range(
        spark, path, "2026-03-01", "2026-03-06", group_cols=["event_type"]
    ).first()
    exact = e.select("user_id").distinct().count()
    assert abs(got.distinct_estimate - exact) <= _tol(exact)
    # grouping is optional: a global (no-group) rollup also merges
    path2 = str(tmp_path / "rollup_global")
    sk.write_sketch_rollup(e, path2)
    got2 = sk.distinct_over_range(spark, path2, "2026-03-02", "2026-03-04").first()
    ref2 = e.where((F.col("day") >= "2026-03-02") & (F.col("day") <= "2026-03-04"))
    exact2 = ref2.select("user_id").distinct().count()
    assert abs(got2.distinct_estimate - exact2) <= _tol(exact2)


def test_sketch_range_query_prunes_to_rollup_scan(spark, tmp_path):
    """The range query's plan reads the ROLLUP with the day filter pushed
    to the scan — the raw events table appears nowhere."""
    e = _events(spark, n_days=8)
    path = str(tmp_path / "rollup")
    sk.write_sketch_rollup(e, path, group_cols=["event_type"])
    q = sk.distinct_over_range(
        spark, path, "2026-03-02", "2026-03-05", group_cols=["event_type"]
    )
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "day" in plan
    assert plan.count("FileScan") == 1  # rollup only; no raw-event scan


def test_stream_sketch_rollup_and_compaction(spark, tmp_path):
    """Streaming form: each micro-batch appends its own partial sketches
    (no cross-batch state — HLL union associativity makes duplicate
    (day, group) partials correct by construction); compaction re-merges
    to one row per (day, group) and range queries agree before, during,
    and after."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from commercepulse_data_pipeline_spark.streaming.sketches import (
        compact_sketch_rollup,
        sketch_rollup_batch,
        stream_sketch_rollup,
    )

    drops = tmp_path / "drops"
    drops.mkdir()
    # batch 1: days 01-02; batch 2: days 02-03 (day 02 spans batches →
    # partial-merge is actually exercised)
    def write_drop(name, rows):
        pq.write_table(
            pa.table({
                "day": [r[0] for r in rows],
                "event_type": [r[1] for r in rows],
                "user_id": pa.array([r[2] for r in rows], type=pa.int64()),
            }),
            str(drops / name),
        )

    b1 = [("2026-03-01", "view", u) for u in range(200)] + [
        ("2026-03-02", "view", u) for u in range(100, 300)
    ]
    b2 = [("2026-03-02", "view", u) for u in range(250, 400)] + [
        ("2026-03-03", "view", u) for u in range(350, 500)
    ]
    write_drop("b1.parquet", b1)
    write_drop("b2.parquet", b2)
    now = time.time()
    os.utime(str(drops / "b1.parquet"), (now - 60, now - 60))
    os.utime(str(drops / "b2.parquet"), (now, now))

    store = str(tmp_path / "rollup")
    q = stream_sketch_rollup(
        spark, str(drops), store, str(tmp_path / "ckpt"),
        group_cols=["event_type"], max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    parts = {e.name for e in os.scandir(store) if e.is_dir()}
    assert parts == {"ingest_batch=0", "ingest_batch=1"}

    all_rows = b1 + b2
    def exact_between(lo, hi):
        return len({u for d, _t, u in all_rows if lo <= d <= hi})

    got = sk.distinct_over_range(
        spark, store, "2026-03-01", "2026-03-03", group_cols=["event_type"]
    ).first()
    exact = exact_between("2026-03-01", "2026-03-03")
    assert got.n_rows == len(all_rows)
    assert abs(got.distinct_estimate - exact) <= _tol(exact)

    # compact: one row per (day, group); day 02's two partials merged
    stats = compact_sketch_rollup(
        spark, store, group_cols=["event_type"], keep_latest=0
    )
    assert stats["folded"] == 2 and stats["partitions_after"] == 1
    cons = spark.read.parquet(store)
    assert cons.count() == 3  # days 01, 02, 03 — one row each
    got2 = sk.distinct_over_range(
        spark, store, "2026-03-02", "2026-03-03", group_cols=["event_type"]
    ).first()
    exact2 = exact_between("2026-03-02", "2026-03-03")
    assert abs(got2.distinct_estimate - exact2) <= _tol(exact2)

    # the compacted store keeps accepting batch appends
    b3 = [("2026-03-04", "view", u) for u in range(450, 600)]
    sketch_rollup_batch(
        spark.createDataFrame(b3, "day string, event_type string, user_id long"),
        2, store, group_cols=["event_type"],
    )
    all_rows += b3
    got3 = sk.distinct_over_range(
        spark, store, "2026-03-01", "2026-03-04", group_cols=["event_type"]
    ).first()
    exact3 = exact_between("2026-03-01", "2026-03-04")
    assert abs(got3.distinct_estimate - exact3) <= _tol(exact3)
