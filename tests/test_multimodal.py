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


def _bmp_bytes(width: int, height: int, pixel: bytes = b"\x10\x80\xf0") -> bytes:
    """Minimal real 24-bit BMP: file header + BITMAPINFOHEADER + padded rows."""
    import struct

    row = (pixel * width)[: 3 * width]
    row += b"\x00" * ((4 - len(row) % 4) % 4)  # 4-byte row padding
    pixels = row * height
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40)
    return header + dib + pixels


def _wav_bytes(seconds: float, rate: int = 8000) -> bytes:
    """Minimal real RIFF/PCM WAV: mono 16-bit, a deterministic ramp."""
    import struct

    n = int(seconds * rate)
    data = b"".join(struct.pack("<h", (i * 37) % 32768 - 16384) for i in range(n))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_decode_bmp_wav_ppm():
    """real_decode parses REAL bytes of the uncompressed formats."""
    d = real_decode(_bmp_bytes(13, 7), "image")
    assert (d["width"], d["height"], d["duration_sec"]) == (13, 7, None)
    assert len(d["feature"]) == 8 and all(0.0 <= v <= 1.0 for v in d["feature"])

    d = real_decode(_wav_bytes(2.5), "audio")
    assert d["duration_sec"] == pytest.approx(2.5, abs=1e-3)
    assert d["width"] is None and len(d["feature"]) == 8

    ppm = b"P6\n# comment\n5 4\n255\n" + b"\x01\x02\x03" * 20
    d = real_decode(ppm, "image")
    assert (d["width"], d["height"]) == (5, 4)

    # legal P6 header-terminator variants must not shift the raster
    # offset: CRLF (text-mode writers), trailing comment after maxval,
    # single space, and rasters whose FIRST byte is whitespace- or
    # '#'-valued — the raster is EOF-anchored by its exact size, so
    # every variant yields identical features
    for first in (b"\x0a", b"\x0d", b"\x23", b"\x20", b"\x01"):
        raster = first + b"\x02\x03" + b"\x01\x02\x03" * 19
        ref = real_decode(b"P6 5 4 255\n" + raster, "image")["feature"]
        for variant in (
            b"P6 5 4 255\r\n" + raster,
            b"P6 5 4 255 # trailing comment\n" + raster,
            b"P6 5 4 255 " + raster,
            b"P6\n5 4\n# c\n255\n" + raster,
        ):
            d = real_decode(variant, "image")
            assert (d["width"], d["height"]) == (5, 4)
            assert d["feature"] == ref, (first, variant[:16])


def test_real_decode_compressed_is_explicit_stub():
    """Formats needing codec libs still raise — clearly marked boundary."""
    with pytest.raises(NotImplementedError):
        real_decode(b"\x89PNG\r\n\x1a\n...", "image")


def test_real_decode_distributed(spark):
    """Real bytes flow through the distributed mapInPandas path end to
    end: extract_features with decoder=real_decode over a mixed BMP/WAV
    frame returns true dimensions/durations."""
    rows = [
        ("bmp-1", "image", "image/bmp", _bmp_bytes(32, 16), 0, {}),
        ("bmp-2", "image", "image/bmp", _bmp_bytes(64, 8), 0, {}),
        ("wav-1", "audio", "audio/wav", _wav_bytes(1.25), 0, {}),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id string, modality string, mime_type string, content binary, n_bytes long, meta map<string,string>",
    )
    out = {
        r.media_id: r
        for r in extract_features(df.repartition(3), decoder=real_decode, batch_rows=1).collect()
    }
    assert (out["bmp-1"].width, out["bmp-1"].height) == (32, 16)
    assert (out["bmp-2"].width, out["bmp-2"].height) == (64, 8)
    assert out["wav-1"].duration_sec == pytest.approx(1.25, abs=1e-3)
    assert all(len(r.feature) == 8 for r in out.values())


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
