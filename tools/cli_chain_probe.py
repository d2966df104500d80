"""End-to-end clean-corpus CLI chain probe (VERDICT r10 item 5).

Every stage of ``clean-corpus`` is individually scale-probed in SCALE.md,
but COMPOSITION can hide stage-boundary materializations the per-operator
probes can't see (a stage consumed twice, an eager checkpoint sized to the
corpus, a broadcast that only fits at the small size). This probe runs the
full CLI — ``--strip-boilerplate --pair-source semantic --dsir-target`` —
at 2k and 20k docs (min-of-2 wall clock each) and, at the large size,
a cumulative-flag breakdown (base → +strip → +semantic-pairs → +dsir) so
the dominant stage is measured, not guessed.

Corpus construction mirrors tools/scale_probe.py's documents rule: each
replica gets offset doc_ids and a copy-prefixed token vocabulary, so pair
outputs scale with the data instead of exploding quadratically by
construction. Sources cycle so --strip-boilerplate sees real per-source
groups; the DSIR target is a fixed 200-doc English sample (target size is
a model constant, not a corpus axis).

Usage: python tools/cli_chain_probe.py [outdir]
Prints one JSON line; paste the numbers into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.01"


def build_docs(spark, dst: str, n_copies: int) -> None:
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(n_copies):
        p = src.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        # disjoint vocabulary per copy (scale_probe documents rule)
        p = p.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda x: F.concat(F.lit(f"c{i}_"), x),
                ),
                " ",
            ),
        )
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(dst)


def run_cli(docs: str, out: str, flags: list[str]) -> float:
    from commercepulse_data_pipeline_spark import cli

    shutil.rmtree(out, ignore_errors=True)
    t0 = time.monotonic()
    rc = cli.main(["clean-corpus", "--docs", docs, "--out", out, *flags])
    dt = time.monotonic() - t0
    assert rc == 0, rc
    return round(dt, 2)


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cli_chain_probe"
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    target = os.path.join(outdir, "dsir_target")
    (
        spark.read.parquet(f"{BASE}/documents.parquet")
        .where(F.col("lang") == "en")
        .limit(200)
        .select("doc_id", "text")
        .write.mode("overwrite")
        .parquet(target)
    )

    full_flags = [
        "--strip-boilerplate",
        "--pair-source", "semantic",
        "--dsir-target", target,
        "--dsir-top-k", "1000000",  # rank-only: keep the funnel intact
        "--splits", "train=0.9,val=0.05,test=0.05",
    ]

    sizes = {"2k": 4, "20k": 40}
    results: dict[str, object] = {}
    docs_paths = {}
    for name, n in sizes.items():
        docs = os.path.join(outdir, f"docs_{name}")
        build_docs(spark, docs, n)
        docs_paths[name] = docs
        runs = [
            run_cli(docs, os.path.join(outdir, f"out_{name}_{i}"), full_flags)
            for i in range(2)
        ]
        results[f"e2e_{name}"] = {"runs": runs, "min": min(runs)}

    # cumulative-flag breakdown at the large size: each increment's delta
    # attributes wall clock to the stage it enables (one run each — the
    # deltas are for ranking stages, the e2e ratio above is the headline)
    docs20 = docs_paths["20k"]
    breakdown = {}
    cum: list[str] = []
    breakdown["base"] = run_cli(docs20, os.path.join(outdir, "bd_base"), cum)
    cum = ["--strip-boilerplate"]
    breakdown["+strip_boilerplate"] = run_cli(docs20, os.path.join(outdir, "bd_strip"), cum)
    cum += ["--pair-source", "semantic"]
    breakdown["+semantic_pairs"] = run_cli(docs20, os.path.join(outdir, "bd_sem"), cum)
    cum += ["--dsir-target", target, "--dsir-top-k", "1000000"]
    breakdown["+dsir"] = run_cli(docs20, os.path.join(outdir, "bd_dsir"), cum)
    results["breakdown_20k_cumulative"] = breakdown

    e2 = results["e2e_2k"]["min"]
    e20 = results["e2e_20k"]["min"]
    results["ratio_10x"] = round(e20 / e2, 2)

    # r12: --quarantine overhead at the large size — the per-stage reject
    # complements + flag-gated localCheckpoints should cost a small
    # constant factor over the full chain, not re-run it (the checkpoints
    # exist precisely so the reject sides never re-execute splice/pair
    # lineage)
    q_runs = [
        run_cli(
            docs20,
            os.path.join(outdir, f"out_20k_q_{i}"),
            full_flags + ["--quarantine"],
        )
        for i in range(2)
    ]
    results["e2e_20k_quarantine"] = {"runs": q_runs, "min": min(q_runs)}
    results["quarantine_overhead_x"] = round(min(q_runs) / e20, 2)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
