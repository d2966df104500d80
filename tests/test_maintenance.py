"""Tests: parquet small-files compaction (storage maintenance op)."""

from __future__ import annotations

from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.sources.readers import compact_parquet


def _parquet_files(path):
    import glob
    import os

    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]


def test_compact_parquet_collapses_small_files(spark, tmp_path):
    path = str(tmp_path / "many")
    df = spark.range(10_000).withColumn("v", F.col("id") * 2)
    df.repartition(40).write.parquet(path)
    assert len(_parquet_files(path)) == 40

    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_before"] >= 40
    assert stats["files_after"] == 1  # 10k rows ≪ 128 MB → one file

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # no leftover temp/old directories
    import os

    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")


def test_compact_parquet_recovers_from_stale_old_dir(spark, tmp_path):
    import os

    path = str(tmp_path / "stale")
    spark.range(500).repartition(4).write.parquet(path)
    os.makedirs(path + "._compact_old/leftover")  # a prior run died mid-swap
    stats = compact_parquet(spark, path, target_file_mb=128)
    assert stats["files_after"] == 1
    assert spark.read.parquet(path).count() == 500
    assert not os.path.exists(path + "._compact_old")


def test_cli_compact_subcommand(spark, tmp_path, capsys):
    from commercepulse_data_pipeline_spark.cli import main

    path = str(tmp_path / "cli_many")
    spark.range(1_000).repartition(8).write.parquet(path)
    assert main(["compact", path]) == 0
    assert "8 files → 1" in capsys.readouterr().out
    assert spark.read.parquet(path).count() == 1_000


def test_compact_parquet_preserves_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(2_000).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("p")
    )
    df.repartition(12).write.partitionBy("p").parquet(path)
    n_before = len(_parquet_files(path))
    assert n_before >= 12

    compact_parquet(spark, path, target_file_mb=128, partition_col="p")
    back = spark.read.parquet(path)
    assert back.count() == 2_000
    # hive layout survives → partition pruning still works
    plan = (
        back.where(F.col("p") == "1")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert back.where(F.col("p") == "1").count() == df.where(F.col("p") == "1").count()
    assert "PartitionFilters: [" in plan and len(_parquet_files(path)) < n_before


def test_compact_parquet_salts_big_hive_partition(spark, tmp_path):
    """ADVICE r6: a multi-GB hive partition must NOT collapse to one file
    written by one straggler task — the salt width per partition is derived
    from that partition's input bytes, so a hot partition gets multiple
    write tasks/files while pruning survives."""
    import os

    path = str(tmp_path / "skewed")
    # hot partition: ~3 MB of incompressible-ish sha2 text; cold: tiny
    payload = F.concat(
        *[
            F.sha2(F.concat(F.col("id").cast("string"), F.lit(str(i))), 512)
            for i in range(4)
        ]
    )
    hot = spark.range(12_000).select(
        F.col("id"), F.lit("hot").alias("p"), payload.alias("t")
    )
    cold = spark.range(50).select(
        F.col("id"), F.lit("cold").alias("p"), payload.alias("t")
    )
    hot.unionAll(cold).repartition(8).write.partitionBy("p").parquet(path)
    hot_bytes = sum(
        os.path.getsize(f) for f in _parquet_files(os.path.join(path, "p=hot"))
    )
    assert hot_bytes > 2 * 1024 * 1024  # precondition: hot really is multi-MB

    compact_parquet(spark, path, target_file_mb=1, partition_col="p")
    hot_files = _parquet_files(os.path.join(path, "p=hot"))
    cold_files = _parquet_files(os.path.join(path, "p=cold"))
    assert len(hot_files) >= 2, "hot partition compacted to a single giant file"
    assert len(cold_files) == 1, "cold partition should stay one small file"
    back = spark.read.parquet(path)
    assert back.count() == 12_050
    plan = back.where(F.col("p") == "cold")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_recover_swap_adopts_stranded_dataset(spark, tmp_path):
    """ADVICE r6: a crash between _swap_in's two renames strands the only
    copy at <path>._purge_old; the next rewrite op adopts it back instead
    of failing at spark.read."""
    import os

    from commercepulse_data_pipeline_spark.sources.readers import purge_keys

    path = str(tmp_path / "stranded")
    spark.range(30).selectExpr("id AS user_id").write.parquet(path)
    os.rename(path, path + "._purge_old")  # crash window: path gone
    stats = purge_keys(spark, path, "user_id", [1])
    assert stats == {"rows_before": 30, "rows_removed": 1}
    assert spark.read.parquet(path).count() == 29


def test_purge_keys_rejects_uncastable_keys(spark, tmp_path):
    """ADVICE r6: a deletion key that casts to NULL would silently match
    nothing (rows_removed=0 for a compliance request) — must raise, and
    must leave the dataset untouched."""
    import pytest as _pytest

    from commercepulse_data_pipeline_spark.sources.readers import purge_keys

    path = str(tmp_path / "typed")
    spark.range(20).selectExpr("id AS user_id").write.parquet(path)
    with _pytest.raises(ValueError, match="abc"):
        purge_keys(spark, path, "user_id", ["5", "abc"])
    assert spark.read.parquet(path).count() == 20  # nothing was purged

    bad_df = spark.createDataFrame([("7",), ("not-a-key",)], ["user_id"])
    with _pytest.raises(ValueError, match="not-a-key"):
        purge_keys(spark, path, "user_id", bad_df)
    assert spark.read.parquet(path).count() == 20


def test_purge_keys_removes_only_targets(spark, tmp_path):
    from commercepulse_data_pipeline_spark.sources.readers import purge_keys

    path = str(tmp_path / "erase")
    spark.range(100).selectExpr("id AS user_id", "id * 2 AS v").write.parquet(path)
    stats = purge_keys(spark, path, "user_id", [3, 7, 7, 999])
    assert stats == {"rows_before": 100, "rows_removed": 2}
    back = spark.read.parquet(path)
    assert back.count() == 98
    assert back.where("user_id IN (3, 7)").count() == 0
    assert back.where("user_id = 4").count() == 1
    import os

    assert not os.path.exists(path + "._purge_tmp")
    assert not os.path.exists(path + "._purge_old")


def test_purge_keys_dataframe_request_and_partitions(spark, tmp_path):
    from pyspark.sql import functions as F2
    from commercepulse_data_pipeline_spark.sources.readers import purge_keys

    path = str(tmp_path / "erase_part")
    spark.range(60).select(
        F2.col("id").alias("user_id"), (F2.col("id") % 3).cast("string").alias("p")
    ).write.partitionBy("p").parquet(path)
    req = spark.range(10).select(F2.col("id").alias("user_id"))
    stats = purge_keys(spark, path, "user_id", req, partition_col="p")
    assert stats["rows_removed"] == 10
    back = spark.read.parquet(path)
    assert back.count() == 50 and back.where("user_id < 10").count() == 0
    # hive layout survives
    plan = back.where(F2.col("p") == "1")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_cli_purge_subcommand(spark, tmp_path, capsys):
    from commercepulse_data_pipeline_spark.cli import main

    path = str(tmp_path / "cli_erase")
    spark.range(20).selectExpr("id AS user_id").write.parquet(path)
    assert main(["purge", path, "user_id", "5", "11"]) == 0
    assert "removed 2 of 20" in capsys.readouterr().out
    assert spark.read.parquet(path).where("user_id IN (5, 11)").count() == 0
