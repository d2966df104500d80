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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.functions.expr import let
from commercepulse_data_pipeline_spark.operators.dedup import word_shingles
from commercepulse_data_pipeline_spark.operators.text import token_ngrams, tokens


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


def scrub_contamination(
    corpus: DataFrame,
    probes: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    probe_text_col: str | None = None,
    window_tokens: int = 8,
) -> DataFrame:
    """Decontamination CORRECTION (the acting sibling of
    :func:`ngram_contamination`, same detect→correct symmetry as
    ``text.dedup_passages`` → ``docs_shared_passages``): REWRITE corpus
    documents by splicing out every token covered by a
    ``window_tokens``-token window whose fingerprint appears anywhere in
    the probe (benchmark/eval) set. Unlike passage dedup there is NO
    canonical survivor — evaluation text must not appear in training
    data at all, so every hit is removed.

    Returns the corpus columns plus ``text_scrubbed``, ``n_tokens``,
    ``n_tokens_removed`` and ``n_probe_windows`` (contaminated windows in
    the doc). Filter/drop on the counts per pipeline policy.

    Scale shape: the probe side is small by construction → its distinct
    window-fingerprint vocabulary broadcasts, and the corpus-side
    membership test is a broadcast semi-join on the exploded (doc, pos,
    fp) rows — corpus text never moves for detection. The only
    corpus-sized shuffle is the final doc-keyed join of the (typically
    tiny) contaminated-position lists back onto the text; pre-bucket the
    corpus by ``id_col`` to co-locate it. The splice is the same codegen
    projection as ``dedup_passages``."""
    probe_text_col = probe_text_col or text_col
    w = window_tokens
    probe_vocab = F.broadcast(
        probes.select(
            F.explode_outer(
                F.transform(
                    token_ngrams(tokens(F.col(probe_text_col)), w),
                    lambda g: F.md5(g),
                )
            ).alias("__fp")
        )
        .where(F.col("__fp").isNotNull())
        .distinct()
    )
    staged = corpus.withColumn("__toks", tokens(F.col(text_col)))
    fps = F.transform(token_ngrams(F.col("__toks"), w), lambda g: F.md5(g))
    occ = staged.select(
        F.col(id_col).alias("__doc"), F.posexplode(fps)
    ).select(
        "__doc",
        F.col("pos").cast("int").alias("__pos"),
        F.col("col").alias("__fp"),
    )
    dup_lists = (
        occ.join(probe_vocab, "__fp", "left_semi")
        .groupBy("__doc")
        .agg(F.array_sort(F.collect_set("__pos")).alias("__dup_pos"))
    )
    joined = staged.join(
        dup_lists, staged[id_col] == dup_lists["__doc"], "left"
    ).drop("__doc")
    dup_pos = F.coalesce(F.col("__dup_pos"), F.array().cast("array<int>"))

    from commercepulse_data_pipeline_spark.operators.text import (
        splice_covered_tokens,
    )

    out = joined.withColumn(
        "__spliced",
        let(dup_pos, lambda dp: splice_covered_tokens(F.col("__toks"), dp, w)),
    )
    return out.select(
        *corpus.columns,
        F.col("__spliced.kept_text").alias("text_scrubbed"),
        F.size("__toks").alias("n_tokens"),
        (F.size("__toks") - F.col("__spliced.n_kept")).alias(
            "n_tokens_removed"
        ),
        F.size(dup_pos).alias("n_probe_windows"),
    )
