"""Tests: parquet small-files compaction (storage maintenance op)."""

from __future__ import annotations

import pytest
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


# ---------------------------------------------------------------------------
# Streaming index retention/compaction (VERDICT r6 item 6): the append-mode
# MinHash/LSH index dirs grow one partition per micro-batch; folding them
# must keep the store queryable and dedup-correct MID-STREAM.
# ---------------------------------------------------------------------------

_BASE = "the quick brown fox jumps over the lazy dog again and again today"


def _corpus_store(spark, tmp_path, n_batches=4):
    from commercepulse_data_pipeline_spark.streaming.corpus import clean_corpus_batch

    store = str(tmp_path / "store")
    batches = [[(1, _BASE), (2, "unique first-batch content here")]] + [
        [(10 * b, f"totally unrelated content number {b} with words")]
        for b in range(1, n_batches)
    ]
    for bid, rows in enumerate(batches):
        clean_corpus_batch(
            spark.createDataFrame(rows, "doc_id long, text string"),
            bid, store, max_bucket=100000,
        )
    return store


@pytest.mark.slow
def test_compact_streaming_index_corpus_stays_live(spark, tmp_path):
    import os

    from commercepulse_data_pipeline_spark.operators import dedup as dd
    from commercepulse_data_pipeline_spark.sources.readers import (
        compact_streaming_index,
    )
    from commercepulse_data_pipeline_spark.streaming.corpus import clean_corpus_batch

    store = _corpus_store(spark, tmp_path)
    bands_root = f"{store}/index/bands"
    rows_before = spark.read.parquet(bands_root).count()
    stats = compact_streaming_index(spark, bands_root, keep_latest=1)
    assert stats["folded"] == 3
    parts = {e.name for e in os.scandir(bands_root) if e.is_dir()}
    assert parts == {"ingest_batch=-1", "ingest_batch=3"}
    assert spark.read.parquet(bands_root).count() == rows_before  # nothing lost

    # the store is still a live index: a probe near-dup of a FOLDED
    # batch-0 doc is found by the incremental pair query ...
    probe = spark.createDataFrame(
        [(100, _BASE + " tonight")], "doc_id long, text string"
    )
    pairs = {(r.id_a, r.id_b) for r in
             dd.minhash_pairs_incremental(probe, spark, f"{store}/index").collect()}
    assert (1, 100) in pairs
    # ... and the STREAM keeps deduping against folded history: the next
    # micro-batch's near-dup of doc 1 is dropped
    clean_corpus_batch(
        spark.createDataFrame([(50, _BASE + " tonight")], "doc_id long, text string"),
        4, store, max_bucket=100000,
    )
    kept = {r.doc_id for r in
            spark.read.parquet(f"{store}/corpus").select("doc_id").collect()}
    assert 50 not in kept and 1 in kept

    # idempotent: a second compaction folds the new tail, still lossless
    compact_streaming_index(spark, bands_root, keep_latest=1)
    assert spark.read.parquet(bands_root).count() > 0
    pairs2 = {(r.id_a, r.id_b) for r in
              dd.minhash_pairs_incremental(probe, spark, f"{store}/index").collect()}
    assert (1, 100) in pairs2


def test_compact_streaming_index_embeddings_sub_partitions(spark, tmp_path):
    import os

    from commercepulse_data_pipeline_spark.operators import similarity as sim
    from commercepulse_data_pipeline_spark.sources.readers import (
        compact_streaming_index,
    )
    from commercepulse_data_pipeline_spark.streaming.embeddings import (
        dedup_embeddings_batch,
    )

    A = [1.0, 0.2, -0.5, 3.0]
    B = [-2.0, 1.0, 0.7, 0.1]
    C = [0.3, -4.0, 1.5, 0.9]
    store = str(tmp_path / "estore")
    for bid, rows in enumerate([[(1, A)], [(2, B)], [(3, C)]]):
        dedup_embeddings_batch(
            spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
            bid, store, tau=0.99, n_planes=4,
        )
    lists_root = f"{store}/index/lists"
    rows_before = spark.read.parquet(lists_root).count()
    stats = compact_streaming_index(
        spark, lists_root, keep_latest=1, sub_partition_col="lsh_bucket"
    )
    assert stats["folded"] == 2
    assert spark.read.parquet(lists_root).count() == rows_before
    # inner lsh_bucket layout survived the fold
    cons = os.path.join(lists_root, "ingest_batch=-1")
    assert any(e.name.startswith("lsh_bucket=") for e in os.scandir(cons))

    # the consolidated store still serves probes for FOLDED vectors ...
    got = sim.lsh_topk_indexed(spark, f"{store}/index", A, k=1, probes=1).collect()
    assert got and got[0].vec_id == 1
    # ... and the stream still dedups against them
    dedup_embeddings_batch(
        spark.createDataFrame(
            [(10, [v * 1.001 for v in A])], "vec_id long, embedding array<float>"
        ),
        3, store, tau=0.99, n_planes=4,
    )
    kept = {r.vec_id for r in
            spark.read.parquet(f"{store}/vectors").select("vec_id").collect()}
    assert 10 not in kept and kept == {1, 2, 3}


@pytest.mark.slow
def test_compact_streaming_index_crash_rolls_forward(spark, tmp_path, monkeypatch):
    """Kill the fold at its commit point (marker written, consolidated
    partition not yet renamed in): the next call must roll FORWARD —
    place the consolidated dir, drop the folded ones, lose nothing."""
    import os

    from commercepulse_data_pipeline_spark.operators import dedup as dd
    from commercepulse_data_pipeline_spark.sources.readers import (
        compact_streaming_index,
    )

    store = _corpus_store(spark, tmp_path)
    bands_root = f"{store}/index/bands"
    rows_before = spark.read.parquet(bands_root).count()

    real_rename = os.rename
    cons_dst = os.path.join(bands_root, "ingest_batch=-1")

    def crashing(src, dst):
        if str(dst) == cons_dst:
            raise RuntimeError("injected crash at commit point")
        return real_rename(src, dst)

    monkeypatch.setattr(os, "rename", crashing)
    with pytest.raises(RuntimeError, match="commit point"):
        compact_streaming_index(spark, bands_root, keep_latest=1)
    monkeypatch.undo()
    # torn: marker + tmp exist, consolidated partition absent
    assert os.path.exists(bands_root + "._fold_old/_FOLDED.json")
    assert not os.path.exists(cons_dst)

    stats = compact_streaming_index(spark, bands_root, keep_latest=1)
    assert os.path.exists(cons_dst)
    assert not os.path.exists(bands_root + "._fold_old")
    assert not os.path.exists(bands_root + "._fold_tmp")
    assert spark.read.parquet(bands_root).count() == rows_before
    probe = spark.createDataFrame(
        [(100, _BASE + " tonight")], "doc_id long, text string"
    )
    pairs = {(r.id_a, r.id_b) for r in
             dd.minhash_pairs_incremental(probe, spark, f"{store}/index").collect()}
    assert (1, 100) in pairs


@pytest.mark.slow
def test_cli_compact_index_subcommand(spark, tmp_path, capsys):
    from commercepulse_data_pipeline_spark.cli import main

    store = _corpus_store(spark, tmp_path)
    assert main(["compact-index", f"{store}/index/bands", "--keep-latest", "1"]) == 0
    assert "folded 3 batch" in capsys.readouterr().out
    assert spark.read.parquet(f"{store}/index/bands").count() > 0


def test_optimize_layout_gives_disjoint_file_ranges(spark, tmp_path):
    """Data-skipping layout (r7): after optimize_layout on a key, each
    output file's parquet min/max statistics cover a disjoint key range —
    a selective predicate then prunes to the files whose range intersects
    (on the original random layout every file spans the whole domain)."""
    import pyarrow.parquet as pq

    from commercepulse_data_pipeline_spark.sources.readers import optimize_layout

    path = str(tmp_path / "layout")
    # write deliberately shuffled: random-ish interleaving across 8 files
    df = spark.range(30_000).select(
        F.pmod(F.col("id") * 48271, F.lit(20011)).alias("k"),
        F.col("id").alias("v"),
        F.sha2(F.col("id").cast("string"), 512).alias("payload"),  # bulk
    )
    df.repartition(8).write.parquet(path)

    def file_ranges():
        out = []
        for f in _parquet_files(path):
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = md.row_group(rg).column(0)  # k
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    before = file_ranges()
    domain = max(m for _, m in before) - min(m for m, _ in before)
    # precondition: the random layout's files each span ~the whole domain
    assert all(hi - lo > domain * 0.8 for lo, hi in before)

    stats = optimize_layout(spark, path, ["k"], target_file_mb=1)
    assert stats["files_after"] >= 2
    after = file_ranges()
    assert len(after) == stats["files_after"]
    # ranges are (near-)disjoint: each file ends before the next begins
    # (boundary values may be shared by duplicates of the range split key)
    for (lo1, hi1), (lo2, _hi2) in zip(after, after[1:]):
        assert hi1 <= lo2, (after,)
    back = spark.read.parquet(path)
    assert back.count() == 30_000
    plan = back.where(F.col("k") == 7)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), EqualTo(k,7)]" in plan


def test_zorder_layout_prunes_on_both_dimensions(spark, tmp_path):
    """Z-order layout (r7): after clustering on TWO independent keys, a
    selective range predicate on EITHER key intersects only a strict
    subset of files' min/max stats — where the linear sort serves only
    its leading key (the trailing key's per-file ranges still span the
    whole domain, so nothing prunes)."""
    import pyarrow.parquet as pq

    from commercepulse_data_pipeline_spark.sources.readers import (
        optimize_layout,
        zorder_layout,
    )

    def build(path):
        # x, y decorrelated via multiplicative hashing; shuffled layout
        df = spark.range(90_000).select(
            F.pmod(F.col("id") * 48271, F.lit(9973)).alias("x"),
            F.pmod(F.col("id") * 16807, F.lit(9973)).alias("y"),
            F.sha2(F.col("id").cast("string"), 512).alias("payload"),
        )
        df.repartition(8).write.mode("overwrite").parquet(path)

    def matching_files(path, col_idx, lo, hi):
        files = _parquet_files(path)
        hit = 0
        for f in files:
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col_idx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            if min(mins) <= hi and max(maxs) >= lo:
                hit += 1
        return hit, len(files)

    zpath = str(tmp_path / "zorder")
    build(zpath)
    stats = zorder_layout(spark, zpath, ["x", "y"], target_file_mb=1)
    assert stats["files_after"] >= 8
    # a 10%-of-domain window on each dimension prunes most files
    for col_idx in (0, 1):
        hit, n = matching_files(zpath, col_idx, 1000, 1997)
        assert hit < n * 0.6, (col_idx, hit, n)
    back = spark.read.parquet(zpath)
    assert back.count() == 90_000
    assert back.columns == ["x", "y", "payload"]  # helper column dropped

    # contrast: linear sort on (x, y) leaves y unprunable
    lpath = str(tmp_path / "linear")
    build(lpath)
    optimize_layout(spark, lpath, ["x", "y"], target_file_mb=1)
    hit_y, n_l = matching_files(lpath, 1, 1000, 1997)
    assert hit_y == n_l  # every file's y-range spans the domain


@pytest.mark.slow
def test_compact_streaming_index_refold_crash_keeps_new_consolidated(
    spark, tmp_path, monkeypatch
):
    """The r7 self-review bug: a SECOND compaction re-folds the existing
    ingest_batch=-1 partition, so the marker's folded list contains the
    consolidated NAME — a crash right after the commit rename must not
    let recovery delete the dir at that name (it is the NEW data; the
    old copy sits set-aside). Kill immediately after the commit rename,
    recover, verify zero loss."""
    import os
    import shutil

    from commercepulse_data_pipeline_spark.sources.readers import (
        compact_streaming_index,
    )
    from commercepulse_data_pipeline_spark.streaming.corpus import clean_corpus_batch

    store = _corpus_store(spark, tmp_path)
    bands_root = f"{store}/index/bands"
    compact_streaming_index(spark, bands_root, keep_latest=1)  # creates -1
    # two more batches so the second fold has something + the old -1
    for bid, doc in ((4, (40, "more unrelated content four")),
                     (5, (50, "more unrelated content five"))):
        clean_corpus_batch(
            spark.createDataFrame([doc], "doc_id long, text string"),
            bid, store, max_bucket=100000,
        )
    rows_before = spark.read.parquet(bands_root).count()

    cons_dst = os.path.join(bands_root, "ingest_batch=-1")
    real_rmtree = shutil.rmtree

    def crashing(path, *a, **kw):
        # first deletion AFTER the commit rename → crash before cleanup
        if str(path).startswith(bands_root) and "ingest_batch=" in str(path):
            raise RuntimeError("injected crash after commit rename")
        return real_rmtree(path, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", crashing)
    with pytest.raises(RuntimeError, match="after commit rename"):
        compact_streaming_index(spark, bands_root, keep_latest=1)
    monkeypatch.undo()
    # torn: new -1 in place, old -1 set aside, folded batch dirs remain
    assert os.path.exists(cons_dst)
    assert os.path.exists(bands_root + "._fold_old/ingest_batch=-1")

    stats = compact_streaming_index(spark, bands_root, keep_latest=1)
    assert not os.path.exists(bands_root + "._fold_old")
    assert spark.read.parquet(bands_root).count() == rows_before, \
        "recovery deleted the new consolidated partition"


def test_missing_store_error_classification(spark, tmp_path):
    """is_missing_store_error: PATH_NOT_FOUND and empty-dir schema
    inference count as 'store not written yet'; other analysis errors
    (e.g. a real parquet read failing on a non-parquet file) do not.
    fold_consistent_read refuses non-file schemes outright (ADVICE r9:
    silent consistency downgrade is worse than an error)."""
    import os

    import pytest as _pytest

    from commercepulse_data_pipeline_spark.sources.readers import (
        fold_consistent_read,
        is_missing_store_error,
    )

    # missing path -> True
    try:
        spark.read.parquet(str(tmp_path / "nope")).collect()
        raise AssertionError("expected PATH_NOT_FOUND")
    except Exception as exc:  # noqa: BLE001
        assert is_missing_store_error(exc)
    # created-but-never-written dir -> True (UNABLE_TO_INFER_SCHEMA)
    os.makedirs(tmp_path / "empty")
    try:
        spark.read.json(str(tmp_path / "empty")).collect()
        raise AssertionError("expected UNABLE_TO_INFER_SCHEMA")
    except Exception as exc:  # noqa: BLE001
        assert is_missing_store_error(exc)
    # a plain FileNotFoundError counts too (driver-local listing)
    assert is_missing_store_error(FileNotFoundError("x"))
    # a non-missing error must NOT be swallowed
    assert not is_missing_store_error(ValueError("boom"))
    # with root= (ADVICE r10): a missing-classified error against a store
    # that EXISTS WITH DATA is a compaction race, not "first batch" —
    # the caller must retry, never skip cross-batch dedup
    populated = tmp_path / "populated"
    os.makedirs(populated)
    (populated / "part-0.parquet").write_bytes(b"x")
    assert not is_missing_store_error(FileNotFoundError("x"), str(populated))
    # root genuinely absent -> still True
    assert is_missing_store_error(FileNotFoundError("x"), str(tmp_path / "gone"))
    # root exists but holds only marker files -> created-never-written,
    # still "missing" (the UNABLE_TO_INFER_SCHEMA shape)
    markers = tmp_path / "markers"
    os.makedirs(markers)
    (markers / "_SUCCESS").write_text("")
    assert is_missing_store_error(FileNotFoundError("x"), str(markers))
    # file:-prefixed roots are normalized before the FS probe
    assert not is_missing_store_error(
        FileNotFoundError("x"), f"file:{populated}"
    )
    # non-file scheme raises loudly instead of degrading to a plain read
    with _pytest.raises(ValueError, match="local-filesystem-only"):
        fold_consistent_read(spark, "s3a://bucket/store")
    with _pytest.raises(ValueError, match="local-filesystem-only"):
        fold_consistent_read(spark, "hdfs://nn/store")
