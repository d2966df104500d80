"""Document-LENGTH scaling probe for the shingle/fingerprint operators.

The 10× replication probe (tools/scale_probe.py) grows the CORPUS; this
one grows the DOCUMENTS — the dimension where per-element lambda
re-evaluation used to make array builders quadratic (functions/expr.py).
Fixed doc count, token length swept L → k·L with a disjoint vocabulary
per doc (so pair outputs stay empty and we time the builders, not the
joins). A healthy operator grows ≈ linearly in L (shingle count is
L - n + 1); the pre-let-binding forms grew ≈ L² (measured ~19× at
L=1000 for word_shingles).

Usage:
  python tools/longdoc_probe.py [n_docs] [base_len] [factor]
Defaults: 500 docs, 250 tokens, 4×.

Prints one line per (operator, length) with seconds, then the time
ratio vs the length factor.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corpus(spark, n_docs: int, n_tokens: int):
    # disjoint per-doc vocabulary: doc i's tokens are "d<i>w<j>" — no
    # cross-doc shingle collisions, so posting lists stay singleton and
    # pair generation is a no-op; the timed work is the per-doc builders.
    # j runs the FULL position range (no modulo): a cycling vocabulary
    # would cap the distinct-shingle count at the cycle length, and the
    # distinct-consuming operators (array_distinct before minhash/
    # jaccard/simhash) would stop growing with doc length — the probe
    # would then under-state the expected linear ratio.
    from pyspark.sql import functions as F

    df = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_tokens - 1)),
                lambda j: F.concat(
                    F.lit("d"), F.col("id").cast("string"), F.lit("w"),
                    j.cast("string"),
                ),
            ),
            " ",
        ).alias("text"),
    )
    return df.repartition(32).cache()


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    base_len = int(sys.argv[2]) if len(sys.argv) > 2 else 250
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from commercepulse_data_pipeline_spark.operators import dedup as dd
    from commercepulse_data_pipeline_spark.operators import text as tx

    ops = {
        "minhash_signature_table": lambda d: dd.minhash_signature_table(
            d, "text", "doc_id", num_hashes=8, shingle_n=3
        ),
        "simhash_table": lambda d: dd.simhash_table(d, "text", "doc_id", shingle_n=2),
        "ngram_jaccard_pairs": lambda d: dd.ngram_jaccard_pairs(
            d, "text", "doc_id", shingle_n=3, threshold=0.5
        ),
        "rolling_fingerprints": lambda d: d.select(
            F.explode_outer(tx.rolling_fingerprints(F.col("text"), 8)).alias("fp")
        ).where(F.col("fp").isNotNull()),
        "top_ngrams": lambda d: tx.top_ngrams(d, "text", "doc_id", ngram_n=2, k=100),
        "repetition_scores": lambda d: tx.repetition_scores(d, "text").select(
            "doc_id", "dup_line_frac", "top_ngram_frac"
        ),
        # r9: the splice operators — per-doc work is fingerprint build +
        # coverage filter; disjoint vocab means no dup windows, so this
        # times the builders and the (empty-list) splice projection
        "dedup_passages": lambda d: tx.dedup_passages(d).select(
            "doc_id", "n_tokens_removed"
        ),
        # r10: the scoped splice sibling — same builder work, (source,
        # fp)-keyed decision
        "strip_boilerplate": lambda d: tx.strip_boilerplate(
            d.withColumn(
                "source",
                F.concat(F.lit("s"), (F.col("doc_id") % 3).cast("string")),
            )
        ).select("doc_id", "n_tokens_removed"),
    }

    # Full untimed warm-up sweep FIRST (same lesson as bench.py: the
    # JVM's first ~25s run 5-10× slow while tiered JIT compiles the
    # scan/agg loops — a per-operator warm-up right before timing is not
    # enough, the first length's whole sweep would still be inflated).
    warm = corpus(spark, min(n_docs, 500), base_len)
    warm.count()
    for fn in ops.values():
        fn(warm).count()
        fn(warm).count()
    warm.unpersist()

    results: dict[str, list[float]] = {}
    for length in (base_len, base_len * factor):
        d = corpus(spark, n_docs, length)
        d.count()
        for name, fn in ops.items():
            fn(d).count()  # cache/size warm-up at this length
            best = min(
                (lambda t0: (fn(d).count(), time.time() - t0)[1])(time.time())
                for _ in range(2)
            )
            results.setdefault(name, []).append(best)
            print(f"{name} len={length}: {best:.2f}s", flush=True)
        d.unpersist()

    print(f"\nlength factor: {factor}x  (linear => ratio ~{factor}, quadratic => ~{factor**2})")
    for name, (a, b) in results.items():
        print(f"{name}: ratio {b / a:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
