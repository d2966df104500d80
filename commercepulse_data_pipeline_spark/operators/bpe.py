"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding (Sennrich et al. 2016, public algorithm) over a Spark
corpus — the tokenizer-training step of an LLM data pipeline, next to the
vocab/encode tier in ``operators/text.py``.

Convention (shared by trainer, encoder, oracle SQL and the pure-Python
test reference, so all four agree symbol-for-symbol):

- words  = whitespace tokens of ``lower(text)`` (``text.tokens``);
- symbols(word) = characters of the word followed by an ``</w>``
  end-of-word marker;
- a merge ``(a, b)`` joins every non-overlapping adjacent occurrence
  left-to-right in one pass (so ``aaa`` under ``(a, a)`` → ``[aa, a]``);
- the best pair each round is max total count, ties broken by the
  lexicographically smallest ``(a, b)`` — deterministic across engines.

Scale shape — the part that matters at 100 TB:

- the corpus is scanned ONCE (``word_freqs``): BPE statistics depend only
  on the distinct-word frequency table, which is orders of magnitude
  smaller than the corpus (Heaps' law) and is what every iteration runs
  on;
- each training round is: adjacent-pair explode → map-side-combined
  count → ``takeOrdered(1)`` (ONE driver row, never a full collect) →
  a JVM-side ``F.aggregate`` fold that rewrites the symbol arrays (no
  Python in the loop). Lineage is cut with ``localCheckpoint`` every few
  rounds so ``n_merges`` stays bounded in plan size;
- encoding dedups to DISTINCT words first, runs the (inherently
  sequential per-word) merge loop once per distinct word in an
  Arrow-batched pandas UDF against a broadcast rank table, then
  broadcast-joins the word→pieces map back to the corpus — UDF work is
  O(distinct words), not O(corpus).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

END = "</w>"


def _symbols(word: Column) -> Column:
    """Character symbols plus the end-of-word marker."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — the ONE corpus-sized pass; every
    BPE iteration afterwards runs on this much smaller table."""
    return (
        df.select(F.explode_outer(tokens(F.col(text_col))).alias("word"))
        .where(F.col("word").isNotNull() & (F.col("word") != ""))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (one per position, so
    repeats inside a word count once per occurrence, as BPE requires).
    Guarded for single-symbol arrays (a fully-merged word): F.sequence
    would otherwise run DESCENDING to a 0 index, which ANSI element_at
    rejects."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("a"), F.element_at(syms, i + 1).alias("b")
        ),
    )
    return F.when(F.size(syms) >= 2, pairs).otherwise(
        F.array().cast("array<struct<a:string,b:string>>")
    )


def pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency —
    BPE round-0 statistics as (a, b, n_pairs). One corpus scan, one
    word-key shuffle, one pair-key shuffle, both map-side combined."""
    wf = word_freqs(df, text_col)
    return (
        wf.select(F.explode(_adjacent_pairs(_symbols(F.col("word")))).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("n_pairs"))
    )


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """One merge round as a JVM-side left-to-right fold: append each
    symbol unless it completes the (a, b) pair at the tail, in which case
    the tail is replaced by the joined symbol. Non-overlapping by
    construction (the joined tail no longer equals ``a`` unless a==a+b)."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe(
    df: DataFrame,
    n_merges: int,
    text_col: str = "text",
    *,
    checkpoint_every: int = 8,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges over the corpus; returns the ordered
    merge list [(a, b, count), …]. Driver traffic is exactly one row per
    round (the argmax pair); the symbol table stays distributed and its
    lineage is cut every ``checkpoint_every`` rounds."""
    state = (
        word_freqs(df, text_col)
        .select(_symbols(F.col("word")).alias("syms"), "freq")
        .localCheckpoint()
    )
    merges: list[tuple[str, str, int]] = []
    for step in range(n_merges):
        best = (
            state.select(F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("a").asc(), F.col("b").asc())
            .take(1)
        )
        if not best or best[0]["n"] < 1:
            break
        a, b, n = best[0]["a"], best[0]["b"], int(best[0]["n"])
        merges.append((a, b, n))
        state = state.select(_apply_merge(F.col("syms"), a, b).alias("syms"), "freq")
        if (step + 1) % checkpoint_every == 0:
            state = state.localCheckpoint()
    state.unpersist()
    return merges


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode documents with a learned merge list → (id_col, pieces:
    array<string>, n_pieces). The merge loop is inherently sequential per
    word, so it runs in an Arrow-batched pandas UDF — but only over
    DISTINCT words (broadcast-joined back), so UDF work is O(vocab)."""
    from pyspark.sql import types as T

    ranks = {(m[0], m[1]): i for i, m in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bpe_word(words: pd.Series) -> pd.Series:
        def enc(word: str) -> list[str]:
            syms = list(word) + [END]
            while len(syms) > 1:
                ranked = [
                    (ranks[(syms[i], syms[i + 1])], i)
                    for i in range(len(syms) - 1)
                    if (syms[i], syms[i + 1]) in ranks
                ]
                if not ranked:
                    break
                r = min(ranked)[0]
                a, b = merges[r][0], merges[r][1]
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return words.map(enc)

    words = df.select(
        F.col(id_col), F.posexplode(tokens(F.col(text_col))).alias("pos", "word")
    )
    vocab = words.select("word").distinct().withColumn("pieces", bpe_word(F.col("word")))
    return (
        words.join(F.broadcast(vocab), "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("pieces")))
                    ),
                    lambda s: s["pieces"],
                )
            ).alias("pieces")
        )
        .withColumn("n_pieces", F.size("pieces"))
    )
