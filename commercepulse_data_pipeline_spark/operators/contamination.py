"""Benchmark decontamination — flag training docs that leak evaluation
data (extension tier; a first-class step of any LLM training-data
pipeline, next to dedup and quality filtering).

The standard check is n-gram overlap: a corpus document is contaminated to
the degree its word shingles also appear in the evaluation/benchmark set.
Distributed shape:

- the PROBE side (benchmarks) is small by construction → its distinct
  shingle vocabulary broadcasts; the corpus side never shuffles for the
  membership test (broadcast left-semi join, plan-asserted in tests);
- per-doc shingle sets come from one explode; the per-doc set SIZE is a
  pure projection of the same (distinct) shingle array — no second
  explode (same lesson as ngram_jaccard_pairs);
- output is one row per corpus doc with hit count and overlap ratio —
  filter at whatever threshold the pipeline's policy sets.

At 100 TB the corpus side is a single explode + one aggregation on the
doc id (uniform); if the probe vocabulary ever outgrows broadcast range,
the same plan degrades gracefully to a shuffled semi-join on the shingle
(uniform md5-ish text keys, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.operators.dedup import word_shingles


def ngram_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str | None = None,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-corpus-doc overlap against the probe set's shingle vocabulary.

    Returns (id_col, set_size, hits, contamination) where ``contamination``
    = hits / set_size over the doc's DISTINCT shingles. Docs too short to
    have any ``shingle_n``-gram are omitted (no denominator).
    """
    probe_text_col = probe_text_col or text_col
    # explode_outer + null-filter on both sides: a plain explode's
    # inferred non-empty filter re-runs the shingle construction once more
    # per row (see functions/expr.py); shingle elements are never NULL
    probe_vocab = F.broadcast(
        probes.select(
            F.explode_outer(word_shingles(F.col(probe_text_col), shingle_n)).alias("shingle")
        )
        .where(F.col("shingle").isNotNull())
        .distinct()
    )
    doc_sh = corpus.select(
        F.col(id_col),
        F.explode_outer(word_shingles(F.col(text_col), shingle_n)).alias("shingle"),
    ).where(F.col("shingle").isNotNull())
    hits = (
        doc_sh.join(probe_vocab, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    sizes = corpus.select(
        F.col(id_col),
        F.size(word_shingles(F.col(text_col), shingle_n)).alias("set_size"),
    ).where(F.col("set_size") > 0)
    return (
        sizes.join(hits, id_col, "left")
        .select(
            id_col,
            "set_size",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)) / F.col("set_size"), 6
            ).alias("contamination"),
        )
    )
