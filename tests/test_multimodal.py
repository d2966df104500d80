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


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png_filter_line(ftype: int, line: bytes, prev: bytes, bpp: int) -> bytes:
    """FORWARD PNG filtering per spec §9 — the independent transform the
    decoder's inverse is checked against (round-trip oracle)."""
    out = bytearray([ftype])
    for i, x in enumerate(line):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            v = x
        elif ftype == 1:
            v = (x - a) & 0xFF
        elif ftype == 2:
            v = (x - b) & 0xFF
        elif ftype == 3:
            v = (x - ((a + b) >> 1)) & 0xFF
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            v = (x - pred) & 0xFF
        out.append(v)
    return bytes(out)


def _png_bytes(
    width: int,
    height: int,
    raster: bytes,
    *,
    color_type: int = 2,
    bit_depth: int = 8,
    filters: list[int] | None = None,
    interlace: int = 0,
    idat_split: int = 1,
) -> bytes:
    """Minimal valid PNG encoder (stdlib only) with per-row filter choice
    and optional multi-IDAT splitting."""
    import struct
    import zlib

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    bpp = max(1, (channels * bit_depth) // 8)
    stride = (width * channels * bit_depth + 7) // 8
    assert len(raster) == stride * height
    filters = filters or [0] * height
    prev = bytes(stride)
    filtered = bytearray()
    for r in range(height):
        line = raster[r * stride : (r + 1) * stride]
        filtered += _png_filter_line(filters[r], line, prev, bpp)
        prev = line
    compressed = zlib.compress(bytes(filtered))
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    step = max(1, len(compressed) // idat_split)
    for i in range(0, len(compressed), step):
        out += _png_chunk(b"IDAT", compressed[i : i + step])
    return out + _png_chunk(b"IEND", b"")


def test_real_decode_png_all_filters_roundtrip():
    """PNG decode recovers the exact pre-filter raster for every filter
    type (forward filtering in the test is the independent oracle), across
    color types and multi-IDAT files."""
    from commercepulse_data_pipeline_spark.multimodal import _feature_from_bytes

    w, h = 8, 5
    raster = bytes((r * 31 + i * 7) % 256 for r in range(h) for i in range(w * 3))
    ref = _feature_from_bytes(raster)
    # one row per filter type; also split IDAT to prove chunk concat works
    png = _png_bytes(w, h, raster, filters=[0, 1, 2, 3, 4], idat_split=3)
    d = real_decode(png, "image")
    assert (d["width"], d["height"], d["duration_sec"]) == (w, h, None)
    assert d["feature"] == ref
    # all-Paeth encoding of the same raster featurizes identically —
    # the feature is from the RECONSTRUCTED raster, not the IDAT bytes
    d2 = real_decode(_png_bytes(w, h, raster, filters=[4] * h), "image")
    assert d2["feature"] == ref

    # grayscale (1ch), gray+alpha (2ch), RGBA (4ch), 16-bit RGB
    for ct, nch, depth in ((0, 1, 8), (4, 2, 8), (6, 4, 8), (2, 3, 16)):
        stride = w * nch * (depth // 8)
        ras = bytes((r * 13 + i * 5) % 256 for r in range(h) for i in range(stride))
        d = real_decode(
            _png_bytes(w, h, ras, color_type=ct, bit_depth=depth,
                       filters=[4, 3, 2, 1, 0]),
            "image",
        )
        assert (d["width"], d["height"]) == (w, h), (ct, depth)
        assert d["feature"] == _feature_from_bytes(ras), (ct, depth)

    # sub-byte depth: 1-bit grayscale, packed rows (bpp floors to 1)
    stride1 = (w * 1 + 7) // 8
    ras1 = bytes((r * 91 + i) % 256 for r in range(h) for i in range(stride1))
    d = real_decode(
        _png_bytes(w, h, ras1, color_type=0, bit_depth=1, filters=[1, 2, 4, 3, 0]),
        "image",
    )
    assert (d["width"], d["height"]) == (w, h)
    assert d["feature"] == _feature_from_bytes(ras1)


def test_real_decode_png_interlaced_rejected():
    raster = bytes(range(24)) * 5
    png = _png_bytes(8, 5, raster[: 8 * 3 * 5], interlace=1)
    with pytest.raises(ValueError, match="interlaced"):
        real_decode(png, "image")


def test_real_decode_compressed_is_explicit_stub():
    """Formats needing codec libs still raise — clearly marked boundary."""
    with pytest.raises(NotImplementedError):
        real_decode(b"\xff\xd8\xff\xe0jpeg-ish", "image")


def test_real_decode_distributed(spark):
    """Real bytes flow through the distributed mapInPandas path end to
    end: extract_features with decoder=real_decode over a mixed BMP/WAV
    frame returns true dimensions/durations."""
    rows = [
        ("bmp-1", "image", "image/bmp", _bmp_bytes(32, 16), 0, {}),
        ("bmp-2", "image", "image/bmp", _bmp_bytes(64, 8), 0, {}),
        ("wav-1", "audio", "audio/wav", _wav_bytes(1.25), 0, {}),
        ("png-1", "image", "image/png",
         _png_bytes(6, 4, bytes((i * 11) % 256 for i in range(6 * 3 * 4)),
                    filters=[0, 1, 2, 4]), 0, {}),
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
    assert (out["png-1"].width, out["png-1"].height) == (6, 4)
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
