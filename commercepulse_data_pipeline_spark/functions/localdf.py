"""Driver-local DataFrames in ONE partition (r16).

``spark.createDataFrame(rows, schema)`` parallelizes the local rows into
``defaultParallelism`` pickled slices, and evaluating each slice pays a
Python-runner round trip (guide §4 — the JVM↔Python boundary). That cost
is invisible until something evaluates the slices SEQUENTIALLY: every
sidecar/metadata writer in this library funnels its tiny local frame
through ``coalesce(1)`` (single-file layout for driver-side sidecar
reads), and a ``coalesce(1)`` task computes all parent slices one after
another in one thread.

Measured at the bench conf (local[32], Spark 4.1): ~155 ms per slice →
**~5 s to write an 8-row centroid table** (32 slices × one boundary round
trip each, serialized), linear in the slice count, and ~0.1 s for the
identical write from a JVM-source frame — the cost is purely the
per-slice Python boundary, not the parquet writer. The two tiny metadata
writes inside ``write_ivfpq_index`` alone were ~9 s of the 16 s
``ann_ivfpq_train`` bench row.

The fix: build the frame over ONE slice up front. Same rows, same
schema handling (explicit schema string or StructType — never
inference), same single output file with rows in the same order; the
only difference is that the boundary is crossed once.

Also used for the 1-row broadcast parameter frames
(``_with_centroid_assign`` / ``_with_pq_codes``): a broadcast build over
a 32-slice 1-row frame runs 32 tasks (parallel, so ~1 round-trip wall
time — much milder than the coalesce case) where 1 task suffices.
"""

from __future__ import annotations


def one_slice_df(spark, rows, schema):
    """``spark.createDataFrame(rows, schema)`` with the local rows packed
    into a SINGLE partition. ``schema`` must be explicit (DDL string or
    StructType) — one slice of data must never drive schema inference.
    Empty ``rows`` is fine (explicit schema, no sampling)."""
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
