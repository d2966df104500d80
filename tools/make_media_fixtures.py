"""Generate the checked-in media fixture files for the
``media_features_check`` driver query, plus the expected decode rows its
DuckDB literal-table oracle pins.

The fixture bytes are produced by the INDEPENDENT test-side encoders in
``tests/test_multimodal.py`` (the same encoders the decode round-trip
tests verify against), entirely deterministic — re-running this script
must reproduce byte-identical files.

Expected width/height/duration are derived from the ENCODER PARAMETERS
on the very line that builds each fixture — never from decoding the
bytes — so the oracle pin shares no implementation with the decoders it
checks (VERDICT r9 item 6). ``real_decode`` is still run as a LOUD
CROSS-CHECK (any disagreement aborts the script instead of silently
pinning a decoder bug) and to compute the feature pin, which is
decoder-defined by construction (it hashes the extracted feature vector
— the distributed-path-equality part of the check, not a truth claim).

Usage: python tools/make_media_fixtures.py   (writes fixtures/media/ and
prints the oracle VALUES rows to paste into __spark_entry__.py)
"""

from __future__ import annotations

import hashlib
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import numpy as np  # noqa: E402

import test_multimodal as tm  # noqa: E402  (the independent encoders)

from commercepulse_data_pipeline_spark.multimodal import real_decode  # noqa: E402

# modality per fixture (mirrors _FIXTURE_MODALITY in __spark_entry__.py)
MODALITY = {
    "jpeg": "image", "png": "image", "gif": "video", "bmp": "image",
    "tiff": "image", "ppm": "image", "wav": "audio", "flac": "audio",
    "mp3": "audio", "mp4": "video", "ogg_vorbis": "audio",
    "ogg_opus": "audio", "webp": "image", "webp_anim": "video",
    "heic": "image", "avif": "image",
}


def _tiff_bytes(bo: bytes, width: int, height: int) -> bytes:
    import struct

    e = "<" if bo == b"II" else ">"
    entries = []
    for tag, v in ((256, width), (257, height)):
        entries.append(
            struct.pack(e + "HHI", tag, 3, 1) + struct.pack(e + "H2x", v)
        )
    ifd = struct.pack(e + "H", len(entries)) + b"".join(entries)
    ifd += struct.pack(e + "I", 0)
    return bo + struct.pack(e + "H", 42) + struct.pack(e + "I", 8) + ifd


def _meta(width=None, height=None, dur_ms=None) -> dict:
    return {"width": width, "height": height, "duration_ms": dur_ms}


def build() -> dict[str, tuple[bytes, dict]]:
    """Each entry: (fixture bytes, parameter-derived expected metadata).
    Every width/height/duration below restates an argument passed to the
    encoder right next to it — the derivation rules are spec facts
    (samples/rate, sum of frame delays, MPEG-1 L3's 1152 samples/frame,
    Opus' fixed 48 kHz granule clock, HEIF's largest-ispe primary), not
    decoder behavior."""
    fx: dict[str, tuple[bytes, dict]] = {}

    # JPEG: 16x8 RGB deterministic gradient, 4:2:0 subsampling
    px = np.zeros((8, 16, 3), dtype=np.float64)
    for r in range(8):
        for c in range(16):
            px[r, c] = ((r * 16 + c) % 256, (c * 13) % 256, (r * 29) % 256)
    fx["jpeg"] = (tm._jpeg_bytes(px, subsample=(2, 2)),
                  _meta(width=px.shape[1], height=px.shape[0]))

    # PNG: 12x6 RGB, one of each filter type across rows
    raster = bytes((r * 37 + c * 11) % 256 for r in range(6) for c in range(36))
    fx["png"] = (tm._png_bytes(12, 6, raster, filters=[0, 1, 2, 3, 4, 1]),
                 _meta(width=12, height=6))

    # GIF: 10x5, two frames with 20cs + 30cs delays -> (20+30)*10 ms
    f1 = bytes((i * 3) % 4 for i in range(50))
    f2 = bytes((i * 7 + 1) % 4 for i in range(50))
    gif_delays_cs = [20, 30]
    fx["gif"] = (
        tm._gif_bytes(10, 5, [f1, f2], bytes(range(12)), min_code_size=2,
                      delays=gif_delays_cs),
        _meta(width=10, height=5, dur_ms=sum(gif_delays_cs) * 10),
    )

    fx["bmp"] = (tm._bmp_bytes(9, 7), _meta(width=9, height=7))
    fx["tiff"] = (_tiff_bytes(b"MM", 640, 480), _meta(width=640, height=480))
    fx["ppm"] = (b"P6\n4 3\n255\n" + bytes((i * 19) % 256 for i in range(36)),
                 _meta(width=4, height=3))

    # WAV: seconds is the encoder argument; ms = seconds * 1000
    fx["wav"] = (tm._wav_bytes(1.5, rate=8000), _meta(dur_ms=1500))

    # FLAC: 64 stereo samples at 8 kHz -> 64/8000 s = 8 ms
    left = [((i * 37) % 4001) - 2000 for i in range(64)]
    right = [777] * 32 + [-12345] * 32
    fr1 = tm._flac_frame_enc([left[:32], right[:32]], 16, 0,
                             ["verbatim", "constant"])
    fr2 = tm._flac_frame_enc([left[32:], right[32:]], 16, 1,
                             ["verbatim", "constant"])
    fx["flac"] = (tm._flac_full([left, right], 16, 8000, [fr1, fr2]),
                  _meta(dur_ms=round(len(left) / 8000 * 1000)))

    # MP3: version=1 is MPEG-1 Layer III @44100 Hz, 1152 samples/frame
    n_mp3_frames = 100
    fx["mp3"] = (tm._mp3_frames(n_mp3_frames, version=1, id3=tm._id3v2(64)),
                 _meta(dur_ms=round(n_mp3_frames * 1152 / 44100 * 1000)))

    fx["webp"] = (tm._webp_bytes("vp8l", 1023, 517),
                  _meta(width=1023, height=517))
    # animated WebP: duration = sum of ANMF frame durations (ms)
    anim_ms = [40, 60, 100]
    fx["webp_anim"] = (tm._webp_bytes("vp8x", 320, 180, frame_ms=anim_ms),
                       _meta(width=320, height=180, dur_ms=sum(anim_ms)))

    fx["mp4"] = (tm._mp4_bytes(12.5, 640, 360),
                 _meta(width=640, height=360, dur_ms=round(12.5 * 1000)))

    # HEIF: reported dims = the LARGEST ispe entry (the primary image;
    # smaller entries are thumbnails in real files)
    fx["heic"] = (tm._heif_bytes(b"heic", [(4032, 3024)]),
                  _meta(width=4032, height=3024))
    avif_dims = [(320, 240), (1280, 720)]
    aw, ah = max(avif_dims, key=lambda wh: wh[0] * wh[1])
    fx["avif"] = (tm._heif_bytes(b"avif", avif_dims),
                  _meta(width=aw, height=ah))

    # Ogg Vorbis: last-page granule = total samples at the header rate
    fx["ogg_vorbis"] = (tm._ogg_vorbis_bytes(44100, rate=44100),
                        _meta(dur_ms=round(44100 / 44100 * 1000)))
    # Ogg Opus: granule clock is ALWAYS 48 kHz; playable = granule-preskip
    fx["ogg_opus"] = (tm._ogg_opus_bytes(96312, pre_skip=312),
                      _meta(dur_ms=round((96312 - 312) / 48000 * 1000)))
    return fx


def expected_row(name: str, content: bytes, meta: dict) -> tuple:
    """Oracle row from the PARAMETER-derived meta; real_decode is run
    only to (a) cross-check the derivation loudly and (b) compute the
    decoder-defined feature pin."""
    d = real_decode(content, MODALITY[name])
    dur = d.get("duration_sec")
    if dur is None:
        dec_ms = None
    else:
        # Spark-side: cast(round(duration_sec * 1000, 0) as long) — round
        # HALF_UP on the shortest-repr decimal, like BigDecimal.valueOf
        from decimal import ROUND_HALF_UP, Decimal

        dec_ms = int(Decimal(repr(dur * 1000.0)).quantize(
            Decimal(1), rounding=ROUND_HALF_UP))
    decoded = {"width": d.get("width"), "height": d.get("height"),
               "duration_ms": dec_ms}
    if decoded != meta:
        raise SystemExit(
            f"{name}: decoder disagrees with encoder parameters — "
            f"decoded {decoded} vs derived {meta}; fix the decoder (or "
            f"the derivation comment) before regenerating the pin"
        )
    # Spark-side: md5(array_join(transform(feature,
    #   x -> cast(cast(x as double) * 16777216 as long) cast to string), ','))
    # feature is float32 in FEATURE_SCHEMA; float32 -> double is exact and
    # *2^24 only shifts the exponent, so both engines see identical longs
    pins = ",".join(
        str(int(float(np.float32(v)) * 16777216.0)) for v in d["feature"]
    )
    feat_pin = hashlib.md5(pins.encode()).hexdigest()
    return (name, MODALITY[name], meta["width"], meta["height"],
            meta["duration_ms"], feat_pin)


def main() -> None:
    outdir = os.path.join(REPO, "fixtures", "media")
    os.makedirs(outdir, exist_ok=True)
    fixtures = build()
    rows = []
    for name in sorted(fixtures):
        content, meta = fixtures[name]
        path = os.path.join(outdir, f"{name}.bin")
        with open(path, "wb") as f:
            f.write(content)
        rows.append(expected_row(name, content, meta))
    print("-- paste into the media_features_check oracle:")
    for r in rows:
        w = "NULL" if r[2] is None else r[2]
        h = "NULL" if r[3] is None else r[3]
        dm = "NULL" if r[4] is None else r[4]
        print(f"    ('{r[0]}', '{r[1]}', {w}, {h}, {dm}, '{r[5]}'),")


def _indep_luma_raster(idx: bytes, palette: bytes, w: int, h: int):
    """Expected gray raster from CONSTRUCTION PARAMETERS only — palette
    lookup + integer BT.601 luma, no decoder involved."""
    out = []
    for y in range(h):
        row = []
        for x in range(w):
            i = idx[y * w + x]
            r, g, b = palette[3 * i : 3 * i + 3]
            row.append((r * 299 + g * 587 + b * 114) // 1000)
        out.append(row)
    return out


def _indep_ahash(gray) -> int:
    """Independent aHash walk (pure python, no multimodal import) —
    the documented convention: 8x8 box cells, bit set iff
    cell_sum * total_n >= total_sum * cell_n, signed-64 storage."""
    h, w = len(gray), len(gray[0])
    cells = []
    for i in range(8):
        r0, r1 = (i * h) // 8, ((i + 1) * h) // 8
        r1 = max(r1, r0 + 1) if r0 < h else h
        r0 = min(r0, h - 1)
        for j in range(8):
            c0, c1 = (j * w) // 8, ((j + 1) * w) // 8
            c1 = max(c1, c0 + 1) if c0 < w else w
            c0 = min(c0, w - 1)
            s = n = 0
            for rr in range(r0, r1):
                for cc in range(c0, c1):
                    s += gray[rr][cc]
                    n += 1
            cells.append((s, n))
    ts = sum(s for s, _ in cells)
    tn = sum(n for _, n in cells)
    sig = 0
    for b, (s, n) in enumerate(cells):
        if s * tn >= ts * n:
            sig |= 1 << b
    return sig - (1 << 64) if sig >= 1 << 63 else sig


def build_clips() -> dict[str, tuple[bytes, list]]:
    """Video near-dup fixture clips (r14): deterministic animated GIFs
    for the ``video_neardup_check`` driver query. Each entry: (bytes,
    per-frame construction params (idx, palette)) — the expected pair
    table derives from the PARAMS via the independent luma/hash walks,
    never from decoding the bytes."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    w, h, n = 32, 24, 6
    pal_a = bytes(v for i in range(16) for v in (i * 16 + 4,) * 3)
    pal_re = bytes(min(255, v + 6) for v in pal_a)
    f_scroll = [
        bytes(((x + 3 * t) * 16 // w) % 16 for y in range(h) for x in range(w))
        for t in range(n)
    ]
    f_bands = [
        bytes((y * 16 // h + 5 * t) % 16 for y in range(h) for x in range(w))
        for t in range(n)
    ]

    def gif(frames, pal):
        return tm._gif_bytes(w, h, frames, pal, min_code_size=4,
                             delays=[10] * len(frames))

    return {
        "clip_a": (gif(f_scroll, pal_a), [(f, pal_a) for f in f_scroll]),
        "clip_a_re": (gif(f_scroll, pal_re), [(f, pal_re) for f in f_scroll]),
        "clip_a_sub": (gif(f_scroll[:3], pal_a), [(f, pal_a) for f in f_scroll[:3]]),
        "clip_b": (gif(f_bands, pal_a), [(f, pal_a) for f in f_bands]),
    }


def expected_clip_pairs(clips: dict, hamming_threshold: int = 4,
                        min_match_frac: float = 0.5) -> list[tuple]:
    """Pure-python replay of the video_neardup_pairs CONTRACT over the
    construction-parameter hashes: frame pairs within the Hamming
    radius across different clips, per-clip distinct matched frames,
    containment filter. This is the oracle pin — shared code with the
    engine: none."""
    w, h = 32, 24
    sigs = {}  # clip -> [hash per frame]
    for name, (_content, params) in clips.items():
        sigs[name] = [
            _indep_ahash(_indep_luma_raster(idx, pal, w, h))
            for idx, pal in params
        ]
    names = sorted(sigs)
    rows = []
    for ia, a in enumerate(names):
        for b in names[ia + 1 :]:
            matched_a, matched_b, hams = set(), set(), []
            for i, sa in enumerate(sigs[a]):
                for j, sb in enumerate(sigs[b]):
                    d = bin((sa ^ sb) & ((1 << 64) - 1)).count("1")
                    if d <= hamming_threshold:
                        matched_a.add(i)
                        matched_b.add(j)
                        hams.append(d)
            if not hams:
                continue
            fa = len(matched_a) / len(sigs[a])
            fb = len(matched_b) / len(sigs[b])
            if max(fa, fb) >= min_match_frac:
                rows.append((a, b, len(sigs[a]), len(sigs[b]),
                             len(matched_a), len(matched_b),
                             round(fa, 6), round(fb, 6), min(hams)))
    return rows


def main_clips() -> None:
    outdir = os.path.join(REPO, "fixtures", "media", "clips")
    os.makedirs(outdir, exist_ok=True)
    clips = build_clips()
    for name, (content, _params) in clips.items():
        with open(os.path.join(outdir, f"{name}.bin"), "wb") as f:
            f.write(content)
    rows = expected_clip_pairs(clips)
    # LOUD separation cross-check: the unrelated clip must not pair
    if any("clip_b" in (r[0], r[1]) for r in rows):
        raise SystemExit("clip_b pairs with the scroll family — redesign content")
    if not any(set(r[:2]) == {"clip_a", "clip_a_re"} for r in rows):
        raise SystemExit("re-encode pair missing — redesign content")
    print("-- paste into the video_neardup_check oracle:")
    for r in rows:
        print(
            f"    ('{r[0]}', '{r[1]}', CAST({r[2]} AS BIGINT), "
            f"CAST({r[3]} AS BIGINT), CAST({r[4]} AS BIGINT), "
            f"CAST({r[5]} AS BIGINT), CAST({r[6]} AS DOUBLE), "
            f"CAST({r[7]} AS DOUBLE), CAST({r[8]} AS BIGINT)),"
        )


def _indep_ehash(samples) -> int:
    """Independent audio energy-envelope hash walk (pure python, no
    multimodal import) — the documented convention: 65 windows with the
    grid boundary guards, energy = sum |x|, bit k iff mean energy rises
    from window k to k+1 (exact integer cross-multiply), signed-64."""
    n = len(samples)
    wins = []
    for k in range(65):
        a, b = (k * n) // 65, ((k + 1) * n) // 65
        b = max(b, a + 1) if a < n else n
        a = min(a, n - 1)
        wins.append((sum(abs(v) for v in samples[a:b]), b - a))
    sig = 0
    for k in range(64):
        (ea, na), (eb, nb) = wins[k], wins[k + 1]
        if ea * nb < eb * na:
            sig |= 1 << k
    return sig - (1 << 64) if sig >= 1 << 63 else sig


def _audio_samples(kind: str, n: int = 4000) -> list[int]:
    """Deterministic integer waveforms shared with the audio fixtures —
    triangle + square + pseudo-noise, all integer arithmetic."""
    out = []
    for i in range(n):
        if kind == "tone":
            tri = abs((i % 200) - 100) - 50
            sq = 20 if (i // 75) % 2 else -20
            out.append(tri * 40 + sq + ((i * 7919) % 31 - 15))
        else:  # 'other'
            tri = abs((i % 37) - 18) - 9
            sq = 30 if (i // 260) % 2 else -30
            out.append(tri * 25 + sq * 40 + ((i * 104729) % 61 - 30))
    return out


def _wav_pcm16(samples: list[int], rate: int = 8000) -> bytes:
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_audio() -> dict[str, tuple[bytes, list[int] | None]]:
    """Audio near-dup fixtures (r14): (bytes, construction samples) —
    expected hashes derive from the SAMPLES via the independent walk,
    never from decoding the bytes. The FLAC entry re-encodes the SAME
    samples (losslessly), the gain entry scales them exactly 2x, the mp3
    entry is the documented lossy boundary (metadata-only -> err row)."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    tone = _audio_samples("tone")
    other = _audio_samples("other")
    gain2 = [s * 2 for s in tone]
    fr1 = tm._flac_frame_enc([tone[:2000]], 16, 0, ["verbatim"])
    fr2 = tm._flac_frame_enc([tone[2000:]], 16, 1, ["verbatim"])
    return {
        "tone_wav": (_wav_pcm16(tone), tone),
        "tone_flac": (tm._flac_full([tone], 16, 8000, [fr1, fr2]), tone),
        "tone_gain2": (_wav_pcm16(gain2), gain2),
        "other_wav": (_wav_pcm16(other), other),
        "mp3": (tm._mp3_frames(20, version=1), None),
    }


def main_audio() -> None:
    outdir = os.path.join(REPO, "fixtures", "media", "audio")
    os.makedirs(outdir, exist_ok=True)
    audio = build_audio()
    rows = []
    for name in sorted(audio):
        content, samples = audio[name]
        with open(os.path.join(outdir, f"{name}.bin"), "wb") as f:
            f.write(content)
        if samples is None:
            rows.append((name, None, None, None, 0))
        else:
            rows.append((name, _indep_ehash(samples), len(samples), 8000, 1))
    # LOUD cross-checks: lossless re-encode + exact gain invariance must
    # pin IDENTICAL hashes; the unrelated waveform must stay far
    pin = {r[0]: r[1] for r in rows}
    if not (pin["tone_wav"] == pin["tone_flac"] == pin["tone_gain2"]):
        raise SystemExit("lossless/gain invariance broke — redesign")
    d = bin((pin["tone_wav"] ^ pin["other_wav"]) & ((1 << 64) - 1)).count("1")
    if d <= 12:
        raise SystemExit(f"other too close (hamming {d}) — redesign content")
    print("-- paste into the audio_hash_check oracle:")
    for r in rows:
        eh = "CAST(NULL AS BIGINT)" if r[1] is None else f"CAST({r[1]} AS BIGINT)"
        ns = "CAST(NULL AS BIGINT)" if r[2] is None else f"CAST({r[2]} AS BIGINT)"
        sr = "CAST(NULL AS BIGINT)" if r[3] is None else f"CAST({r[3]} AS BIGINT)"
        print(f"    ('{r[0]}', {eh}, {ns}, {sr}, CAST({r[4]} AS BIGINT)),")


if __name__ == "__main__":
    if "--clips" in sys.argv:
        main_clips()
    elif "--audio" in sys.argv:
        main_audio()
    else:
        main()
