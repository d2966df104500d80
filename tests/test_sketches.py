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
