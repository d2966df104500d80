"""Strict variant of tools/parity.py: full-precision float repr instead of
6-sig-fig normalization — approximates the driver's value-hash check, which
hashes exact values. A query that is OK here should be hash-green in
CORRECTNESS_r{N}.json.

Usage: python tools/parity_strict.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _normalize(df_pandas):
    """Sort columns by name, full-precision stringify, sort rows."""
    import numpy as np
    import pandas as pd

    df = df_pandas.reindex(sorted(df_pandas.columns), axis=1)

    def norm_cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, (np.floating,)):
            v = float(v)
        if isinstance(v, (np.integer,)):
            v = int(v)
        if isinstance(v, float):
            return repr(v)  # shortest round-trip repr — exact per-bit
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        if hasattr(v, "isoformat"):
            return v.isoformat()
        return str(v)

    rows = ["\x1f".join(norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows), list(df.columns), [str(t) for t in df.dtypes]


def compare(spark, sf_dir: str, names: list[str] | None = None, verbose: bool = True):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            results[name] = f"SPARK ERROR: {e}"
            if verbose:
                print(f"  {name}: SPARK ERROR {str(e)[:2000]}")
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(sdf)} rows)"
            if verbose:
                print(f"  {name}: rows-only, {len(sdf)} rows")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE ERROR: {e}"
            if verbose:
                print(f"  {name}: ORACLE ERROR {str(e)[:2000]}")
            continue
        s_rows, s_cols, s_types = _normalize(sdf)
        o_rows, o_cols, o_types = _normalize(odf)
        if s_cols != o_cols:
            results[name] = f"SCHEMA MISMATCH spark={s_cols} oracle={o_cols}"
        elif len(s_rows) != len(o_rows):
            results[name] = f"ROWCOUNT MISMATCH spark={len(s_rows)} oracle={len(o_rows)}"
        elif s_rows != o_rows:
            diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:3]
            results[name] = (
                f"VALUE MISMATCH ({sum(1 for a, b in zip(s_rows, o_rows) if a != b)} rows)"
                f" dtypes spark={s_types} oracle={o_types} e.g. {diffs[:2]}"
            )
        else:
            results[name] = f"OK ({len(s_rows)} rows)"
        if verbose:
            print(f"  {name}: {results[name][:3000]}")
    con.close()
    return results


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or None
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        # UTC like session.py: epoch-based queries (ship_latency,
        # fact_shipments_rollup, late_payments) cast DATE→TIMESTAMP in the
        # session zone and would mismatch the oracle on non-UTC hosts.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    res = compare(spark, sf_dir, names)
    bad = {k: v for k, v in res.items() if not v.startswith(("OK", "rows-only"))}
    print(f"\n{len(res) - len(bad)}/{len(res)} OK")
    sys.exit(1 if bad else 0)
