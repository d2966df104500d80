"""Tolerance parity for sketch aggregates (VERDICT r2 #8): the driver
records `approx_stats` rows-only (sketch outputs are estimator-specific by
design), so this test pins its VALUES against DuckDB's exact twins —
HyperLogLog++ distinct counts within the configured rsd envelope, t-digest
quantiles within a small relative band of the true percentile.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def exact():
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    df = con.sql(
        """
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               quantile_disc(value, 0.5) AS p50,
               quantile_disc(value, 0.95) AS p95,
               count(*) AS n_events
        FROM events GROUP BY 1
        """
    ).df()
    con.close()
    return {r.event_type: r for r in df.itertuples(index=False)}


def test_approx_stats_within_tolerance(spark, exact):
    import __spark_entry__ as E

    got = {r.event_type: r for r in E.q_approx_stats(spark, SF_DIR).collect()}
    assert set(got) == set(exact)
    for et, e in exact.items():
        g = got[et]
        # exact count must match exactly — it's a plain count
        assert g.n_events == e.n_events, et
        # HLL++ at rsd=0.02: allow 5 standard errors (plus a 2-count floor
        # for the tiny-sf groups where the estimator is exact anyway)
        tol = max(5 * 0.02 * e.exact_users, 2)
        assert abs(g.approx_users - e.exact_users) <= tol, (et, g.approx_users, e.exact_users)
        # quantiles at accuracy=10000: both sides return discrete order
        # statistics (quantile_disc ~ percentile_approx's definition), so
        # a 2% relative band only has to absorb sketch error, not
        # interpolation-definition gaps (quantile_cont interpolates and
        # diverges by a whole order-stat gap on small groups)
        for name, approx_v, exact_v in (("p50", g.p50, e.p50), ("p95", g.p95, e.p95)):
            denom = max(abs(exact_v), 1.0)
            assert abs(approx_v - exact_v) / denom <= 0.02, (et, name, approx_v, exact_v)


def test_order_value_percentiles_approx_within_tolerance(spark):
    """The approx twin of order_value_percentiles (VERDICT r5 item 3):
    driver records it rows-only, so pin its values against the exact
    percentile query here. Both sides group on o_orderpriority; at
    accuracy=10000 with ~3k rows per group the sketch is near-exact, so a
    2% relative band is generous."""
    import __spark_entry__ as E

    exact = {r.o_orderpriority: r
             for r in E.q_order_value_percentiles(spark, SF_DIR).collect()}
    approx = {r.o_orderpriority: r
              for r in E.q_order_value_percentiles_approx(spark, SF_DIR).collect()}
    assert set(approx) == set(exact)
    for pri, e in exact.items():
        a = approx[pri]
        assert a.n_orders == e.n_orders, pri
        for name in ("p50", "p90", "p99"):
            av, ev = getattr(a, name), getattr(e, name)
            denom = max(abs(ev), 1.0)
            assert abs(av - ev) / denom <= 0.02, (pri, name, av, ev)


def test_sketch_check_queries_all_pass(spark):
    """The r7 hash-checkable twins (VERDICT r6 item 2): every per-group
    envelope verdict must be 1 — the oracle asserts all-ones, so a sketch
    drifting out of envelope turns the driver row red. Pinned here at the
    small sf too (where the rank-based bound must absorb the
    discrete-vs-interpolated definition gap that a value band does not)."""
    import __spark_entry__ as E

    for r in E.q_approx_stats_check(spark, SF_DIR).collect():
        assert (r.users_ok, r.p50_ok, r.p95_ok) == (1, 1, 1), r
    for r in E.q_order_value_percentiles_check(spark, SF_DIR).collect():
        assert (r.p50_ok, r.p90_ok, r.p99_ok) == (1, 1, 1), r
