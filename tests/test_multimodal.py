"""Multimodal plumbing tests: binary media columns + mapInPandas feature
extraction (decoder stubbed deterministically — no codec libs in this
container; the Spark-side schema/batching/partitioning is the real thing).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.multimodal import (
    FEATURE_SCHEMA,
    DeterministicFakeDecoder,
    extract_features,
    media_stats,
    real_decode,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        ("img-1", "image", "image/png", b"\x89PNG fake bytes 1", 17, {"camera": "x"}),
        ("img-2", "image", "image/png", b"\x89PNG fake bytes 2", 17, {}),
        ("aud-1", "audio", "audio/wav", b"RIFF fake wave", 14, {}),
        ("vid-1", "video", "video/mp4", b"\x00\x00ftypmp42", 10, {}),
        ("img-3", "image", "image/jpeg", None, 0, {}),  # NULL content
    ]
    return spark.createDataFrame(
        rows, "media_id string, modality string, mime_type string, content binary, n_bytes long, meta map<string,string>"
    )


def test_extract_features_schema_and_modality(media_df):
    out = extract_features(media_df)
    assert out.schema == FEATURE_SCHEMA
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 5
    # images get dimensions, no duration
    assert rows["img-1"].width is not None and rows["img-1"].height is not None
    assert rows["img-1"].duration_sec is None
    # audio/video get duration, no dimensions
    assert rows["aud-1"].duration_sec is not None and rows["aud-1"].width is None
    assert rows["vid-1"].duration_sec is not None
    # every row gets a fixed-length feature vector
    assert all(len(r.feature) == 8 for r in rows.values())
    # NULL content decodes deterministically (empty-bytes path), no crash
    assert rows["img-3"].feature is not None


def test_extract_features_partition_independent(media_df):
    """Same results regardless of partitioning/batch size — the Arrow
    batching must not change values (pure per-row function)."""
    a = {r.media_id: tuple(r.feature) for r in extract_features(media_df).collect()}
    b = {
        r.media_id: tuple(r.feature)
        for r in extract_features(media_df.repartition(4), batch_rows=2).collect()
    }
    assert a == b


def test_media_stats_metadata_only(media_df, tmp_path):
    stats = {(r.modality, r.mime_type): r for r in media_stats(media_df).collect()}
    assert stats[("image", "image/png")].n_items == 2
    assert stats[("image", "image/png")].total_bytes == 34
    # the rollup never references `content` — column pruning must drop the
    # binary column from the parquet scan (ReadSchema excludes it)
    path = str(tmp_path / "media")
    media_df.write.parquet(path)
    spark = media_df.sparkSession
    plan = (
        media_stats(spark.read.parquet(path))
        ._jdf.queryExecution().executedPlan().toString()
    )
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and all("content" not in ln for ln in read_schema)


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"bytes", "image")


def test_fake_decoder_deterministic():
    d1 = DeterministicFakeDecoder.decode(b"same bytes", "image")
    d2 = DeterministicFakeDecoder.decode(b"same bytes", "image")
    assert d1 == d2


def test_resize_images_contract(media_df):
    from commercepulse_data_pipeline_spark.multimodal import resize_images

    out = resize_images(media_df, target=(224, 224)).collect()
    # one row per IMAGE row only (3 images in the fixture)
    assert len(out) == 3
    assert all(r.width == 224 and r.height == 224 for r in out)
    # deterministic across partitionings
    again = resize_images(media_df.repartition(4), target=(224, 224)).collect()
    assert {r.media_id: bytes(r.content) for r in out} == \
           {r.media_id: bytes(r.content) for r in again}


def test_sample_frames_fanout(media_df):
    from commercepulse_data_pipeline_spark.multimodal import sample_frames

    out = sample_frames(media_df, fps=1.0, max_frames=5).collect()
    # only the video row fans out; ≥1 and ≤ max_frames frames
    ids = {r.media_id for r in out}
    assert ids == {"vid-1"}
    assert 1 <= len(out) <= 5
    assert [r.frame_index for r in sorted(out, key=lambda r: r.frame_index)] == list(range(len(out)))
    assert all(r.frame_ts_sec == r.frame_index / 1.0 for r in out)
