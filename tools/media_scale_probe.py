"""Scale probe for the media near-dup tiers (r14): generate synthetic
clip/audio corpora at 1x and FACTORx, run the full decode->hash->pair
pipelines, and print per-stage wall times. The fixture-backed driver
queries (video_neardup_check / audio_hash_check) are fixture-sized by
construction; THIS is where the operators' scale behavior is measured —
the scaling paths are the Arrow decode pass (linear by construction) and
sig_hamming_pairs (banded posting lists, probed at corpus scale here).

Corpus shape: 10% of items are planted near-dup re-encodes (gain or
palette shifts) so the pair stages do real work; families are disjoint
across the base/scaled corpora dimensions (ids namespaced), so pair
output grows linearly with the planted families, not quadratically.

Usage: python tools/media_scale_probe.py [factor=10] [base_n=300]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def _clip_bytes(seed: int, reencode: bool) -> bytes:
    import test_multimodal as tm

    w, h, n = 32, 24, 6
    shift = 6 if reencode else 0
    pal = bytes(
        min(255, v + shift) for i in range(16) for v in ((i * 16 + 4),) * 3
    )
    # per-seed UNIQUE content: a Weyl-hash noise field keyed on (seed,
    # x, y) + a motion term — distinct seeds hash ~uniformly far apart,
    # so the only near-dup families are the PLANTED re-encodes. (Two
    # earlier designs collided: a shared gradient rotated per seed
    # collapsed into one bucket family — 30k unintended pairs at n=330,
    # then a zero-pair bucket-cap collapse at 10x; a low-entropy
    # frequency/orientation family still paired quadratically.)
    def mix(x: int, y: int, t: int) -> int:
        # murmur-style finalizer over xor'd coordinates — NONLINEAR in
        # the seed (a linear Weyl offset made every clip a translate of
        # one global pattern, which is exactly what aHash matches)
        v = (x * 73856093) ^ (y * 19349663) ^ (seed * 83492791) ^ (
            t * 2971215073
        )
        v &= 0xFFFFFFFF
        v = ((v ^ (v >> 13)) * 0x5BD1E995) & 0xFFFFFFFF
        return (v ^ (v >> 15)) % 16

    frames = [
        bytes(mix(x, y, t) for y in range(h) for x in range(w))
        for t in range(n)
    ]
    return tm._gif_bytes(w, h, frames, pal, min_code_size=4,
                         delays=[10] * n)


def _wav_bytes_for(seed: int, gain2: bool) -> bytes:
    import struct

    n = 2000
    # per-seed unique ENVELOPE: the ehash bits are the 65-window energy
    # gradient, so each of the 64 windows gets a seed-keyed pseudo-random
    # amplitude level (Weyl hash over (seed, window)) — distinct seeds
    # hash ~uniformly far apart and only the planted gain copies pair
    g = 2 if gain2 else 1
    p1 = 40 + (seed * 7) % 163
    data = bytearray()
    win = max(1, n // 64)

    def level(k: int) -> int:
        v = (k * 19349663) ^ (seed * 83492791)
        v &= 0xFFFFFFFF
        v = ((v ^ (v >> 13)) * 0x5BD1E995) & 0xFFFFFFFF
        return 1 + (v ^ (v >> 15)) % 40

    for i in range(n):
        tri = abs((i % p1) - p1 // 2) - p1 // 4
        v = (tri * level(i // win) + ((i * 7919) % 31 - 15)) * g
        data += struct.pack("<h", max(-32768, min(32767, v)))
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + bytes(data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_corpus(spark, kind: str, n: int, path: str) -> None:
    if os.path.exists(f"{path}/_SUCCESS"):
        return
    rows = []
    for i in range(n):
        if kind == "video":
            rows.append((f"v{i}", _clip_bytes(i, False)))
            if i % 10 == 0:  # planted re-encode family
                rows.append((f"v{i}_re", _clip_bytes(i, True)))
        else:
            rows.append((f"a{i}", _wav_bytes_for(i, False)))
            if i % 10 == 0:
                rows.append((f"a{i}_g2", _wav_bytes_for(i, True)))
    spark.createDataFrame(rows, "media_id string, content binary").repartition(
        32
    ).write.mode("overwrite").parquet(path)


def time_video(spark, path: str) -> dict:
    from commercepulse_data_pipeline_spark import multimodal as mm

    media = spark.read.parquet(path)
    t0 = time.monotonic()
    frames = mm.video_frame_hashes(media, max_frames=16).localCheckpoint(
        eager=True
    )
    t_hash = time.monotonic() - t0
    t0 = time.monotonic()
    n_pairs = mm.video_neardup_pairs(
        frames, hamming_threshold=4, min_match_frac=0.5
    ).count()
    t_pairs = time.monotonic() - t0
    return {"hash_sec": round(t_hash, 3), "pairs_sec": round(t_pairs, 3),
            "n_pairs": n_pairs}


def time_video_between(spark, path: str, batch_n: int = 40) -> dict:
    """Incremental probe: a FIXED-SIZE batch of fresh clips (+ planted
    re-encodes of indexed ones) probes the corpus's frame index via
    video_neardup_pairs_between — per-ingest cost must stay ~flat as the
    INDEX grows 10x (the O(batch) claim)."""
    from commercepulse_data_pipeline_spark import multimodal as mm

    idx_frames = mm.video_frame_hashes(
        spark.read.parquet(path), max_frames=16
    ).localCheckpoint(eager=True)
    rows = []
    for i in range(batch_n):
        rows.append((f"new{i}", _clip_bytes(10_000_000 + i, False)))
        if i % 4 == 0:  # planted re-encode of an indexed clip
            rows.append((f"v{i}_newre", _clip_bytes(i, True)))
    batch = spark.createDataFrame(rows, "media_id string, content binary")
    new_frames = mm.video_frame_hashes(batch, max_frames=16).localCheckpoint(
        eager=True
    )
    t0 = time.monotonic()
    n_pairs = mm.video_neardup_pairs_between(
        new_frames, idx_frames, hamming_threshold=4, min_match_frac=0.5
    ).count()
    return {"between_sec": round(time.monotonic() - t0, 3), "n_pairs": n_pairs}


def time_audio(spark, path: str) -> dict:
    from commercepulse_data_pipeline_spark import multimodal as mm
    from commercepulse_data_pipeline_spark.operators.dedup import (
        sig_hamming_pairs,
    )

    media = spark.read.parquet(path)
    t0 = time.monotonic()
    hashes = mm.audio_hash(media).where("ehash is not null").localCheckpoint(
        eager=True
    )
    t_hash = time.monotonic() - t0
    t0 = time.monotonic()
    n_pairs = sig_hamming_pairs(
        hashes.select("media_id", "ehash"), id_col="media_id",
        sig_col="ehash", hamming_threshold=4,
    ).count()
    t_pairs = time.monotonic() - t0
    return {"hash_sec": round(t_hash, 3), "pairs_sec": round(t_pairs, 3),
            "n_pairs": n_pairs}


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base_n = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    root = "/tmp/media_scale_probe"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for kind, timer in (("video", time_video), ("audio", time_audio)):
        for label, n in (("base", base_n), (f"{factor}x", base_n * factor)):
            path = f"{root}/{kind}_{n}"
            build_corpus(spark, kind, n, path)
            timer(spark, path)  # warm run (JIT)
            r = timer(spark, path)
            print(f"{kind} {label} (n={n}): {r}", flush=True)
    # incremental: fixed batch vs 1x and 10x frame indexes
    for label, n in (("base", base_n), (f"{factor}x", base_n * factor)):
        path = f"{root}/video_{n}"
        time_video_between(spark, path)  # warm
        r = time_video_between(spark, path)
        print(f"video between {label} (index n={n}): {r}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
