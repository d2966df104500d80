"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` maps one entry per implemented operator family from
SURVEY.md §2 (reference file:line cited in each docstring); ``oracle_sql()``
holds the DuckDB-equivalent ANSI SQL. Column names and rounding are aligned
on both sides so the driver's order-insensitive value-hash matches.

Queries marked "rows-only" (no oracle entry) are the genuinely
non-SQL-expressible ones: the multimodal decode path (deterministic fake
codec, engine-specific by design) and sketch aggregates (estimator-specific
outputs; their exact twins ARE oracle-checked, and a tolerance parity test
covers the sketches in pytest). Everything else — including both approximate
ANN paths (sign-LSH and IVF) — is hash-checked by replaying the
deterministic hash/PRNG families (md5-derived longs, LCG hyperplanes,
decimal Lloyd means) as SQL literals or in-SQL derivations.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from commercepulse_data_pipeline_spark.functions.drift import canonical_status, safe_divide
from commercepulse_data_pipeline_spark.functions.localdf import one_slice_df as _one_slice_df
from commercepulse_data_pipeline_spark.functions.pins import pin as _pin
from commercepulse_data_pipeline_spark.functions.temporal import calendar_columns, days_between
from commercepulse_data_pipeline_spark.operators import dedup as dd
from commercepulse_data_pipeline_spark.operators import similarity as sim
from commercepulse_data_pipeline_spark.operators import text as tx
from commercepulse_data_pipeline_spark.operators import windows as win
from commercepulse_data_pipeline_spark.operators.joins import anti_join, semi_join


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents table. Scan parallelism comes from the storage layout +
    session conf (many part files + one-task-per-file packing), never from
    an injected repartition — bench.py rewrites each single-row-group
    testdata file as a 32-part-file directory so the benched plans read
    wide the same way production data (many files) does."""
    return _t(spark, sf_dir, "documents")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` normalized to TIMESTAMP (ltz).

    The driver-generated events.parquet has shipped with two physical ts
    encodings across rounds — TIMESTAMP(NANOS) (rejected by Spark's
    reader; read via the nanosAsLong legacy conf and truncated to micros)
    and micros with isAdjustedToUTC=false (read as TIMESTAMP_NTZ, which
    ``unix_micros``/windowing reject). Both normalize to the same
    wall-clock TIMESTAMP under the UTC session timezone — exactly DuckDB's
    naive view of the same file, so oracles agree either way."""
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # noqa: BLE001 — conf may not exist on other versions
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _iso_date(col) -> F.Column:
    """Render a date as 'yyyy-MM-dd' string: temporal columns cross the
    Spark↔DuckDB comparison as strings so arrow/pandas type mapping can
    never skew the driver's value hash."""
    return F.date_format(col, "yyyy-MM-dd")


def _dsum(col, scale: int = 2) -> F.Column:
    """Order-independent rounded float sum: accumulate in DECIMAL (exact,
    commutative) and round in decimal space, so the result never depends
    on partition/merge order — double sums can land on either side of a
    rounding boundary depending on add order, which is nondeterministic on
    a cluster AND differs between engines."""
    return F.round(F.sum(col.cast("decimal(30,8)")), scale).cast("double")


def _davg(col, scale: int = 4) -> F.Column:
    """Order-independent rounded mean: exact decimal sum → one double
    division → round."""
    return F.round(F.sum(col.cast("decimal(30,8)")).cast("double") / F.count(col), scale)


# ---------------------------------------------------------------------------
# Relational core (reference §2.3-§2.8 on the TPC-H-ish tables)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped multi-agg groupBy (reference A1/A4/A5/F8 analog:
    src/transformer.py:130-165 rollup semantics). Map-side partial agg →
    2-key shuffle; whole-stage codegen end-to-end."""
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            _dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))).alias("sum_charge"),
            _davg(F.col("l_quantity")).alias("avg_qty"),
            _davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship A1 (src/transformer.py:130-165): daily revenue rollup as
    join + groupBy — the reference's O(groups×payments) isin loop becomes
    one shuffle each side + one agg shuffle.

    Lineitems pre-aggregate per order BEFORE the join: the join carries
    one row per order instead of one per lineitem, and the final rollup
    counts plain rows instead of a countDistinct (which would force an
    expand/two-phase distinct aggregation). Decimal partial sums re-sum
    exactly (associative), so rounding matches the single-pass oracle."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", _iso_date("o_orderdate").alias("order_date"))
    l_per_order = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,8)")
            ).alias("order_rev")
        )
    )
    return (
        o.join(l_per_order, o.o_orderkey == l_per_order.l_orderkey)
        .groupBy("order_date")
        .agg(
            F.round(F.sum("order_rev"), 2).cast("double").alias("gross_revenue"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


def q_order_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_order_daily shape on the driver tables (reference A1 + Q3/Q4
    semantics, src/transformer.py:130-165): pre-aggregate lineitems per
    order BEFORE joining so order_count never double-counts (SURVEY §7.3)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    per_order = l.groupBy("l_orderkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(30,8)")).alias("order_rev"),
        F.sum(
            F.when(F.col("l_returnflag") == "R", F.col("l_extendedprice")).otherwise(F.lit(0.0)).cast("decimal(30,8)")
        ).alias("returned_amt"),
    )
    joined = o.select(
        "o_orderkey", _iso_date("o_orderdate").alias("order_date"), "o_orderpriority"
    ).join(per_order, o.o_orderkey == per_order.l_orderkey, "left")
    return joined.groupBy("order_date", "o_orderpriority").agg(
        F.coalesce(F.round(F.sum("order_rev"), 2).cast("double"), F.lit(0.0)).alias("gross_revenue"),
        F.coalesce(F.round(F.sum("returned_amt"), 2).cast("double"), F.lit(0.0)).alias("returned_amount"),
        F.count(F.lit(1)).alias("order_count"),
        F.sum(F.when(F.col("returned_amt") > 0, 1).otherwise(0)).alias("returned_order_count"),
        safe_divide(
            F.sum(F.when(F.col("returned_amt") > 0, 1).otherwise(0)), F.count(F.lit(1))
        ).alias("return_rate"),
    )


def q_dedup_last_writer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 last-writer-wins (src/transformer.py:40): latest event per user,
    rank-1 window, deterministic tiebreak."""
    e = _events(spark, sf_dir)
    return dd.last_writer_wins(e, ["user_id"], "ts", tiebreak_cols=["event_id"]).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("ts_us"), "value"
    )


def q_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 keep-first (src/transformer.py:88,126), deterministic variant:
    earliest event per (user_id, event_type)."""
    e = _events(spark, sf_dir)
    return dd.keep_first(e, ["user_id", "event_type"], "ts", tiebreak_cols=["event_id"]).select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("ts_us")
    )


def q_drift_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1 multi-key falsy-aware coalesce (src/transformer.py:52-74):
    resolve a payload key from JSON with pandas `or`-chain semantics
    (0 counts as missing — SURVEY Q10)."""
    e = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k")
    missing_key = F.get_json_object(F.col("props"), "$.does_not_exist")
    resolved = F.coalesce(F.nullif(F.coalesce(missing_key, k), F.lit("0")), F.lit("-1"))
    return e.select("event_id", resolved.alias("k_resolved"))


def q_status_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 status canonicalization (src/transformer.py:66-72) + A3
    frequency breakdown (src/quality_report.py:131-134)."""
    e = _events(spark, sf_dir)
    return (
        e.select(canonical_status(F.col("event_type")).alias("canonical_status"))
        .groupBy("canonical_status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_timestamp_multiformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 multi-format timestamp parse with NULL-coerce
    (src/transformer.py:33,82,120): round-trip events.ts through two vendor
    string formats, re-parse via the try_to_timestamp coalesce chain."""
    from commercepulse_data_pipeline_spark.functions.temporal import parse_timestamp

    e = _events(spark, sf_dir)
    as_string = F.when(
        F.col("event_id") % 2 == 0, F.date_format("ts", "yyyy/MM/dd HH:mm:ss")
    ).otherwise(F.date_format("ts", "yyyy-MM-dd HH:mm"))
    return e.select("event_id", F.unix_micros(parse_timestamp(as_string)).alias("parsed_us"))


def q_calendar_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 date-range generator + F5 calendar derivations
    (src/populate_dimensions.py:19-29) — dim_date, 1,461 rows."""
    days = spark.sql(
        "SELECT explode(sequence(to_date('2023-01-01'), to_date('2026-12-31'), interval 1 day)) AS date_key"
    )
    cal = calendar_columns(F.col("date_key"))
    return days.select(
        _iso_date("date_key").alias("date_key"),
        cal["day_of_week"].alias("day_of_week"),
        cal["week_number"].cast("long").alias("week_number"),
        cal["month"].cast("long").alias("month"),
        cal["quarter"].cast("long").alias("quarter"),
        cal["year"].cast("long").alias("year"),
        cal["is_weekend"].alias("is_weekend"),
    )


def q_customer_first_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 groupBy-min first-seen (src/populate_dimensions.py:51) + J1
    fact-dim equi-join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(_iso_date("o_orderdate")).alias("first_order_date"),
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("total_spent"),
    )
    return c.join(F.broadcast(firsts), c.c_custkey == firsts.o_custkey).select(
        "c_custkey", "c_name", "first_order_date", "n_orders", "total_spent"
    )


def q_orphan_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left-anti orphan detection (src/quality_report.py:61-66)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return anti_join(c, o, "c_custkey").select("c_custkey", "c_name")


def q_big_spender_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left-semi membership (src/transformer.py:140,144): customers
    having at least one high-value order, counted per market segment."""
    c = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 150000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        semi_join(c, big, "c_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


def q_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 + F6 interval arithmetic + P6 threshold counts (late-arrival
    analysis, src/quality_report.py:72-98)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = o.join(l, o.o_orderkey == l.l_orderkey)
    lag_us = F.unix_micros(F.col("l_shipdate").cast("timestamp")) - F.unix_micros(
        F.col("o_orderdate").cast("timestamp")
    )
    day_us = 86400.0 * 1_000_000
    # sum lag_us in DECIMAL: per-group int64 sums of microsecond lags
    # overflow silently at large SF while the DuckDB oracle sums in
    # 128-bit (ADVICE r2) — decimal(38,0) matches that headroom exactly.
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        F.round(F.sum(lag_us.cast("decimal(30,0)")).cast("double") / F.lit(day_us) / F.count(F.lit(1)), 4).alias("avg_days_to_ship"),
        F.sum((lag_us > 7 * day_us).cast("long")).alias("over_7d"),
        F.sum((lag_us > 30 * day_us).cast("long")).alias("over_30d"),
    )


def q_fact_shipments_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_shipments semantics on the driver tables (Q8 upgrade,
    plans/silver.py::normalize_shipments + plans/quality.py::
    shipment_latency_metrics): lineitem rows act as shipment updates per
    order; last-writer-wins picks the CURRENT state (ship date desc,
    line number as tie-break); rollup per (priority, current status)
    with order→last-update latency and P6 threshold counts."""
    from commercepulse_data_pipeline_spark.operators.dedup import last_writer_wins

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    upd = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("order_id"),
        F.col("l_returnflag").alias("current_status"),
        F.col("l_shipdate").cast("timestamp").alias("ship_ts"),
        F.col("l_linenumber").alias("line_no"),
    )
    # current_status closes the tiebreak chain: this round's testdata has
    # (orderkey, shipdate, linenumber) full-tie rows with DIFFERENT
    # returnflags, which engines would otherwise break arbitrarily.
    cur = last_writer_wins(upd, ["order_id"], "ship_ts", tiebreak_cols=["line_no", "current_status"])
    j = cur.join(o, cur.order_id == o.o_orderkey)
    lag_us = F.unix_micros(F.col("ship_ts")) - F.unix_micros(F.col("o_orderdate").cast("timestamp"))
    day_us = 86400.0 * 1_000_000
    return j.groupBy("o_orderpriority", "current_status").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # decimal sum for the same int64-overflow reason as q_ship_latency
        F.round(F.sum(lag_us.cast("decimal(30,0)")).cast("double") / F.lit(day_us) / F.count(F.lit(1)), 4).alias("avg_days_to_last_update"),
        F.sum((lag_us > 7 * day_us).cast("long")).alias("over_7d"),
        F.sum((lag_us > 30 * day_us).cast("long")).alias("over_30d"),
    )


def q_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 global scalar aggregates + P4/P5 null/zero predicates
    (src/quality_report.py:45-48)."""
    e = _events(spark, sf_dir)
    return e.agg(
        F.count(F.lit(1)).alias("total_events"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_user_id"),
        F.sum(F.col("value").isNull().cast("long")).alias("null_value"),
        F.sum((F.col("value") == 0).cast("long")).alias("zero_value"),
        F.countDistinct("user_id").alias("distinct_users"),
        _dsum(F.col("value")).alias("total_value"),
    )


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (distributed replacement of the driver-side .head(n),
    SURVEY §2.8): top 10 customers by revenue, deterministic tiebreak."""
    o = _t(spark, sf_dir, "orders")
    by_cust = o.groupBy("o_custkey").agg(_dsum(F.col("o_totalprice")).alias("revenue"))
    return by_cust.orderBy(F.desc("revenue"), F.asc("o_custkey")).limit(10)


def q_union_actors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set op — unionByName + distinct (the reference's only set-ops are
    membership checks; the envelope union S1+S2 is unionByName, SURVEY §2.8)."""
    e = _events(spark, sf_dir)
    buyers = e.where(F.col("event_type") == "purchase").select("user_id", F.lit("purchase").alias("src"))
    errored = e.where(F.col("event_type") == "error").select("user_id", F.lit("error").alias("src"))
    return buyers.unionByName(errored).distinct()


def q_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window — per-user cumulative value over time (our engine's
    window family; the reference had none, SURVEY §2.8)."""
    e = _events(spark, sf_dir)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"),
        F.round(F.sum("value").over(w), 2).alias("running_value")
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min) + per-session stats — the
    stateful-stream pattern in batch form (§2.10 mapping)."""
    e = _events(spark, sf_dir)
    sessions = win.sessionize(e, "user_id", "ts", gap_minutes=30)
    return win.session_stats(sessions, "user_id", "ts").select(
        "user_id", "session_id", "n_events", "duration_sec"
    )


def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window, 30-min gap): the built-in
    form of the sessionize operator — one aggregation, windows merge as
    events arrive; identical in batch and Structured Streaming (where it
    pairs with a watermark). Output: per-user sessions with bounds."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("start_us"),
            F.unix_micros(F.col("w.end")).alias("end_us"),
            "n_events",
        )
    )


def q_event_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling window aggregate — the batch equivalent of the
    streaming daily rollup (§2.10: F.window('1 day') ≡ to_date groupBy)."""
    e = _events(spark, sf_dir)
    return (
        e.groupBy(_iso_date("ts").alias("event_date"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("total_value"),
            F.countDistinct("user_id").alias("active_users"),
        )
    )


# ---------------------------------------------------------------------------
# Training-data extension operators (documents / embeddings)
# ---------------------------------------------------------------------------

def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: clusters + canonical id."""
    d = _docs(spark, sf_dir)
    return dd.duplicate_clusters(d, "text", "doc_id")


def q_docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + lexical stats, pure codegen (no UDF)."""
    d = _docs(spark, sf_dir)
    return tx.with_text_stats(d, "text").select(
        "doc_id",
        "n_tokens",
        "n_distinct_tokens",
        F.round("mean_token_len", 4).alias("mean_token_len"),
    )


def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring (length/diversity/alpha bands)."""
    d = _docs(spark, sf_dir)
    return tx.quality_score(d, "text").select("doc_id", "quality_score")


def q_docs_lang_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3-style frequency breakdown over (lang, source) with char stats."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars").cast("double") / F.count("n_chars"), 2).alias("avg_chars"),
    )


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: whole-content md5 + first rolling 8-token
    window hash (containment-detection primitive)."""
    d = _docs(spark, sf_dir)
    toks = tx.tokens(F.col("text"))
    first_window = F.md5(F.array_join(F.slice(toks, 1, 8), " "))
    return d.select(
        "doc_id",
        F.md5("text").alias("content_md5"),
        F.when(F.size(toks) >= 8, first_window).alias("head_fingerprint"),
    )


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=4, 3-word shingles), lexicographic-min md5
    family — engine-reproducible by construction."""
    d = _docs(spark, sf_dir)
    sig = dd.minhash_signature_table(d, "text", "doc_id", num_hashes=4, shingle_n=3)
    return sig.select(
        "doc_id", F.concat_ws("|", "h0", "h1", "h2", "h3").alias("signature")
    )


def q_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (k=8, 4 bands × 2 rows): the scalable
    near-dup path — posting-list bucket grouping, never O(n²).

    ``max_bucket`` is effectively disabled here so the DuckDB oracle
    (which has no cap) matches exactly at test SF; production sets the
    operator's scale-safe default (~1000) — see _pairs_in_group's memory
    note."""
    d = _docs(spark, sf_dir)
    return dd.minhash_candidate_pairs(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )


def q_docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from the MinHash band graph (operators/graph.py):
    hash-to-min connected components turn banding output into
    (doc, canonical min-id representative, cluster size) — the "keep one
    per cluster" dedup decision table a training pipeline acts on. CC
    consumes STAR edges (member→bucket-min, dd.minhash_star_edges — r16:
    linear in bucket occupancy) rather than the |bucket|²/2 pair
    explosion; a star has the same components as the clique, so the
    output is row-identical. The oracle replays the same md5 MinHash
    banding and closes the transitive hull with a recursive CTE over the
    PAIR graph — hash equality IS the star≡clique equivalence check."""
    from commercepulse_data_pipeline_spark.operators import graph

    d = _docs(spark, sf_dir)
    edges = dd.minhash_star_edges(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )
    return graph.dedup_clusters(edges)


def q_docs_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup retention pipeline composed end to end: MinHash
    pair graph → connected-component clusters → KEEP THE BEST-QUALITY
    member per cluster (operators/graph.py::keep_best_per_cluster, scored
    by operators/text.py::quality_score, ties → lowest id). This is the
    decision table a training pipeline acts on. The oracle composes the
    same three fragments in SQL (recursive CTE + quality twin +
    rank-1 window). CC input is the star-edge form (see
    q_docs_dup_clusters — components identical, linear in bucket
    occupancy)."""
    from commercepulse_data_pipeline_spark.operators import graph

    d = _docs(spark, sf_dir)
    edges = dd.minhash_star_edges(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )
    clusters = graph.dedup_clusters(edges)
    quality = tx.quality_score(d, "text").select("doc_id", "quality_score")
    return graph.keep_best_per_cluster(clusters, quality)


def q_docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language corpus balancing
    (operators/sampling.py::stratified_sample): downsample dominant 'en'
    hard, keep mid languages at half, tail languages nearly whole — keyed
    on md5(doc_id) so the sample is reproducible across runs, engines,
    partitionings, and corpus growth. Fully oracle-checked (same hex-digit
    bucket arithmetic in DuckDB)."""
    from commercepulse_data_pipeline_spark.operators.sampling import stratified_sample

    d = _docs(spark, sf_dir).select("doc_id", "lang", "source", "n_chars")
    rates = {"en": 0.25, "zh": 0.5, "es": 0.5}
    return stratified_sample(
        d, "lang", rates, "doc_id", default_rate=0.9, salt="corpus-v1:"
    )


def q_docs_per_lang_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE per-group deterministic sample: exactly k docs per
    language (rate-based sampling can't promise a floor for tail
    languages — eval sets and human-review batches need exact counts).
    Rank by md5 hash bucket (then doc_id for full determinism) inside
    each language, keep rank <= k.

    Scale shape: one shuffle on lang; Spark's WindowGroupLimit pushes the
    rank<=k filter MAP-SIDE before the shuffle (measured 6.6× in the
    Zipf probe, SCALE.md), so a dominant language ships ~k rows per map
    task, never its full corpus share."""
    from commercepulse_data_pipeline_spark.operators.sampling import hash_bucket

    k = 20
    d = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        hash_bucket(F.col("doc_id"), "langsample-v1:").asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "lang", "source")
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )


def q_user_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence conversion funnel: per signup cohort week, how many
    users purchased within 7 days of their FIRST signup, and how fast.
    The reference's nearest surface is the per-day event rollup
    (src/transformer.py:88) — no sequence semantics.

    Scale shape: signups pre-aggregate to one row per user BEFORE the
    purchase join (the gold-rollup pre-agg rule), both sides shuffle once
    on user_id, then one small groupBy on cohort week. No window over the
    raw stream, no fan-out."""
    ev = _events(spark, sf_dir)
    signups = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    j = signups.join(purchases, "user_id", "left").withColumn(
        "conv_ts",
        F.when(
            (F.col("p_ts") >= F.col("signup_ts"))
            & (F.col("p_ts") < F.col("signup_ts") + F.expr("INTERVAL 7 DAYS")),
            F.col("p_ts"),
        ),
    )
    per_user = j.groupBy("user_id", "signup_ts").agg(
        F.min("conv_ts").alias("first_conv_ts")
    )
    hours = (
        F.unix_micros("first_conv_ts") - F.unix_micros("signup_ts")
    ) / F.lit(3600000000.0)
    return per_user.groupBy(
        F.date_format(F.date_trunc("week", "signup_ts"), "yyyy-MM-dd").alias(
            "cohort_week"
        )
    ).agg(
        F.count(F.lit(1)).alias("n_signups"),
        F.count("first_conv_ts").alias("n_converted"),
        F.round(
            F.count("first_conv_ts") / F.count(F.lit(1)).cast("double"), 6
        ).alias("conversion_rate"),
        _davg(hours).alias("avg_hours_to_convert"),
    )


def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered multi-step funnel (``operators/windows.py::ordered_funnel``
    — r8): view → click → purchase with greedy-from-first matching (each
    step matches the user's earliest event of its type strictly after the
    previous step's match), plus a completed-within-7-days tier against
    the step-1 timestamp. The reference's nearest surface is the per-day
    event rollup; ``user_conversion`` covers the 2-step join form — this
    is the k-step ordered-sequence generalization.

    Scale shape: per-step type filters BEFORE user-keyed joins, one
    timestamp of state per user per step (no per-user event-list
    collect), conditional-min aggregates map-side combined. Percentages
    ship as integer basis points (n·10000 div n1) — exact cross-engine.
    Bounded collect: the single funnel-totals row."""
    from commercepulse_data_pipeline_spark.operators.windows import ordered_funnel

    ev = _events(spark, sf_dir).select("user_id", "ts", "event_type")
    f = ordered_funnel(ev, ["view", "click", "purchase"])
    week_us = 7 * 86400 * 10**6
    r = f.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
        F.count(
            F.when(
                F.unix_micros("t3") - F.unix_micros("t1") <= F.lit(week_us), 1
            )
        ).alias("n4"),
    ).first()
    n1, n2, n3, n4 = (int(r["n1"]), int(r["n2"]), int(r["n3"]), int(r["n4"]))
    bps = lambda n: (n * 10000) // n1 if n1 else 0  # noqa: E731
    rows = [
        ("step1_view", n1, bps(n1)),
        ("step2_click", n2, bps(n2)),
        ("step3_purchase", n3, bps(n3)),
        ("completed_7d", n4, bps(n4)),
    ]
    return _one_slice_df(spark, rows, "step string, n_users long, pct_bps long")


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-overlap matrix: for each pair of corpus sources, how many
    distinct 8-token passage fingerprints they share — the cross-source
    contamination/syndication map that tells a curation pipeline which
    feeds are redistributing each other's content.

    Scale shape: (source, fingerprint) distinct pairs reduce map-side;
    one shuffle on fingerprint; source pairs expand INSIDE the aggregate
    from each fingerprint's sorted source set (sources are few — the
    array is tiny even when the corpus is 100 TB); final count groups on
    the pair key. No self-join of the exploded fingerprint table."""
    d = _docs(spark, sf_dir)
    fps = d.select(
        "source",
        F.explode_outer(tx.rolling_fingerprints(F.col("text"), 8)).alias("fp"),
    ).where(F.col("fp").isNotNull())
    # no dropDuplicates pre-pass: collect_set dedups sources per fp inside
    # the ONE fp-keyed aggregate — a (source, fp) distinct would add a
    # second full shuffle for nothing
    srcs = F.sort_array(F.collect_set("source"))
    pair_structs = F.flatten(
        F.transform(
            F.col("srcs"),
            lambda a, i: F.transform(
                F.slice(F.col("srcs"), i + 2, F.size(F.col("srcs"))),
                lambda b: F.struct(a.alias("source_a"), b.alias("source_b")),
            ),
        )
    )
    return (
        fps.groupBy("fp")
        .agg(srcs.alias("srcs"))
        .where(F.size("srcs") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.source_a", "p.source_b")
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
    )


def q_corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary build (``operators.text.build_vocab``): top-500
    tokens dense-ranked (count desc, token asc), ids 1..N, 0 reserved for
    OOV. One count shuffle + TakeOrdered — never a global sort of the
    full token space."""
    d = _docs(spark, sf_dir)
    return tx.build_vocab(d, "text", size=500).select("vocab_id", "token", "n")


def q_docs_encoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize→ids training prep (``operators.text.encode_documents``):
    each doc encoded against the corpus top-500 vocab — token count, OOV
    count, first-8-ids prefix. One broadcast join + one per-doc aggregate
    with a collect buffer bounded at 8 structs per doc by construction."""
    d = _docs(spark, sf_dir)
    vocab = tx.build_vocab(d, "text", size=500)
    return tx.encode_documents(d, vocab, "text", "doc_id", prefix=8)


def q_corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus version audit (``operators.dedup.corpus_diff``): diff two
    snapshots of the documents table and count added / removed / changed /
    unchanged. The two snapshots are synthesized DETERMINISTICALLY from
    the shipped corpus so every status is non-empty at any SF: v1 drops
    doc_id%10==0 (later additions) and carries an older text for
    doc_id%7==0; v2 drops doc_id%10==3 (later removals).

    Scale shape: each snapshot reduces to (id, md5) map-side — the text
    never shuffles — then one full-outer join on id and a 4-group count."""
    from commercepulse_data_pipeline_spark.operators.dedup import corpus_diff

    d = _docs(spark, sf_dir)
    v1 = d.where(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v1"))
        ).otherwise(F.col("text")).alias("text"),
    )
    v2 = d.where(F.col("doc_id") % 10 != 3).select("doc_id", "text")
    return (
        corpus_diff(v1, v2)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix: detected language vs the table's
    metadata language, with counts — the audit that tells a curation
    pipeline where the heuristic classifier disagrees with upstream
    labels (and which side to trust per cell).

    Scale shape: detection is a pure per-row projection; the matrix
    groupBy has ≤ |langs|² groups — map-side combine collapses
    everything before one tiny shuffle."""
    d = _docs(spark, sf_dir)
    det = tx.detect_language(d, "text")
    return det.groupBy(
        F.col("lang").alias("label_lang"), "detected_lang"
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def q_daily_revenue_7dma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day moving revenue via a RANGE window frame (interval-bounded,
    gap-correct: a missing calendar day still bounds the frame by VALUE,
    where a rows-frame would silently widen to 7 arbitrary rows). The one
    frame kind the surface didn't yet exercise.

    Scale shape: the fact table pre-aggregates to one row per DAY before
    the window, so the unpartitioned ordered frame runs over #days rows
    (thousands for a decade) — bounded by calendar time, not data volume.
    Decimal accumulation keeps the windowed sum order-independent."""
    o = _t(spark, sf_dir, "orders").select(
        F.to_date(F.col("o_orderdate").cast("timestamp")).alias("day"),
        F.col("o_totalprice"),
    )
    daily = o.groupBy("day").agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,8)")).alias("rev_dec")
    )
    w = Window.orderBy(F.unix_date(F.col("day"))).rangeBetween(-6, 0)
    return daily.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round("rev_dec", 2).cast("double").alias("revenue"),
        F.round(F.sum("rev_dec").over(w), 2).cast("double").alias("revenue_7d"),
    )


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort matrix: users grouped by first-signup week, then
    for each week offset since signup, how many were active (any event).
    The classic product-analytics triangle; the reference's nearest
    surface is the flat per-day rollup (src/transformer.py:88).

    Scale shape: first-signup pre-aggregates per user; activity reduces
    to distinct (user, week) BEFORE the join (so a user's 10⁶ events
    collapse map-side); both shuffle once on user_id; the final matrix
    groupBy is tiny. No windows, no fan-out."""
    ev = _events(spark, sf_dir)
    su = ev.where(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_wk")
    )
    act = ev.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    j = su.join(act, "user_id").withColumn(
        "week_offset", (F.datediff("wk", "cohort_wk") / 7).cast("int")
    ).where(F.col("week_offset") >= 0)
    return j.groupBy(
        F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
    ).agg(F.countDistinct("user_id").alias("n_active"))


def q_docs_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation funnel: the stage-by-stage survivor scoreboard
    a training pipeline publishes with every corpus drop — raw → exact
    dedup (canonical per content hash) → quality gate → language gate →
    deterministic sample. One row per stage with surviving docs + tokens.

    Scale shape: ONE corpus pass. Every stage is a boolean flag computed
    in the same projection (canonical needs the only shuffle — a window
    over md5(text), the exact-dedup partitioning); the five cumulative
    stage counts come out of a single global aggregate via conditional
    sums, then unpivot to rows with stack(). No per-stage rescans, no
    per-stage jobs — at 100 TB this costs the same as one groupBy."""
    from commercepulse_data_pipeline_spark.operators.sampling import (
        hash_bucket,
        threshold_for,
    )

    d = _docs(spark, sf_dir)
    scored = tx.quality_score(d, "text")
    w = Window.partitionBy(F.md5("text"))
    flagged = scored.select(
        F.size(tx.tokens(F.col("text"))).alias("n_tokens"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("f2"),
        (F.col("quality_score") >= 0.8).alias("q_ok"),
        (F.col("lang") == "en").alias("l_ok"),
        (hash_bucket(F.col("doc_id"), "funnel-v1:") < F.lit(threshold_for(0.5))).alias(
            "s_ok"
        ),
    ).select(
        "n_tokens",
        "f2",
        (F.col("f2") & F.col("q_ok")).alias("f3"),
        (F.col("f2") & F.col("q_ok") & F.col("l_ok")).alias("f4"),
        (F.col("f2") & F.col("q_ok") & F.col("l_ok") & F.col("s_ok")).alias("f5"),
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("c1"),
        F.sum("n_tokens").alias("t1"),
        *[F.sum(F.col(f"f{i}").cast("long")).alias(f"c{i}") for i in (2, 3, 4, 5)],
        *[
            F.sum(F.when(F.col(f"f{i}"), F.col("n_tokens")).otherwise(0)).alias(f"t{i}")
            for i in (2, 3, 4, 5)
        ],
    )
    return agg.selectExpr(
        "stack(5,"
        " 1, 'raw', c1, t1,"
        " 2, 'exact_dedup', c2, t2,"
        " 3, 'quality_gate', c3, t3,"
        " 4, 'lang_en', c4, t4,"
        " 5, 'sampled', c5, t5"
        ") as (stage_idx, stage, n_docs, surviving_tokens)"
    )


def q_docs_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rejected side of the curation funnel with the FIRST failing
    gate per doc (operators/text.py::quarantine_report): exact_dup →
    low_quality → wrong_lang, the funnel's own stage order — the
    exclusion table that makes corpus drops auditable and reversible.
    Same single-pass scale shape as docs_curation_funnel (one md5 window
    shuffle, reason is a pure CASE projection); the oracle replays the
    identical quality twin, canonical window, and CASE order."""
    d = _docs(spark, sf_dir)
    return tx.quarantine_report(d, "text")


def q_dup_cluster_size_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings report (operators/graph.py::cluster_size_histogram):
    MinHash pair graph → connected-component clusters → one row per
    cluster SIZE with n_clusters / n_docs, singletons included so n_docs
    sums to the corpus — the table that quantifies what "keep one per
    cluster" buys before anyone runs it. Kilobytes out at any corpus
    size (clusters reduce per-cluster first, then a size-keyed agg; the
    singleton row is one left-anti count). CC input is the star-edge
    form (see q_docs_dup_clusters — components identical, linear in
    bucket occupancy). The oracle replays the recursive-CTE hull and the
    same histogram + anti-join."""
    from commercepulse_data_pipeline_spark.operators import graph

    d = _docs(spark, sf_dir)
    edges = dd.minhash_star_edges(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )
    clusters = graph.dedup_clusters(edges)
    return graph.cluster_size_histogram(clusters, corpus=d).select(
        "cluster_size",
        F.col("n_clusters").cast("long").alias("n_clusters"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


def q_dup_pairs_confirmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-signal near-dup confirmation (operators/similarity.py::
    score_pairs): the MinHash blocker proposes lexical candidate pairs,
    the embedding table scores each with exact pairwise cosine, and the
    output carries the confirm verdict at τ=0.9 — the precision pass a
    curation pipeline runs before acting on lexical candidates. Cost is
    O(|pairs|) joins (the blocker already collapsed the pair space);
    cosine is the shared codegen fold, so the oracle replays it
    bit-for-bit from the same pair CTE."""
    d = _docs(spark, sf_dir)
    pairs = dd.minhash_candidate_pairs(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )
    emb = _t(spark, sf_dir, "embeddings")
    return sim.score_pairs(pairs, emb).select(
        "id_a",
        "id_b",
        "cosine_sim",
        F.when(F.col("cosine_sim") >= 0.9, F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("semantically_confirmed"),
    )


def q_docs_packed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-window manifest via sharded next-fit sequence packing
    (operators/packing.py): docs shard by md5 bucket, pack in id order
    into 512-token windows inside each shard (applyInPandas — the
    sanctioned stateful-loop path), then roll up to one row per window.
    The oracle replays the identical shard assignment and walk as a
    DuckDB recursive CTE."""
    from commercepulse_data_pipeline_spark.operators import packing

    d = _docs(spark, sf_dir).select(
        "doc_id", F.size(tx.tokens(F.col("text"))).alias("n_tokens")
    )
    packed = packing.pack_sequences(
        d, "doc_id", "n_tokens", capacity=512, n_shards=8, salt="pack-v1:"
    )
    return packing.packed_windows(packed)


def q_docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus cleaning pass (operators/text.py::scrub): within-doc line
    dedup + URL/email/phone redaction with per-class counts — pure
    codegen'd projections, no shuffle. Output carries md5(scrubbed) so the
    oracle hash-checks the full transformation even where it is the
    identity on this corpus."""
    d = _docs(spark, sf_dir)
    return tx.scrub(d, "text").select(
        "doc_id",
        F.col("n_urls").cast("long").alias("n_urls"),
        F.col("n_emails").cast("long").alias("n_emails"),
        F.col("n_phones").cast("long").alias("n_phones"),
        F.md5("scrubbed").alias("scrubbed_md5"),
    )


def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates (operators/text.py::repetition_scores,
    Rae et al. 2021 §A1.1 family): per-doc duplicate-line fraction and
    top-bigram fraction — the boilerplate filters a web-scale corpus
    applies before training. Pure codegen projections (sorted-run fold for
    the mode count), no UDF, no shuffle. The oracle recomputes the mode
    with a group-by count."""
    d = _docs(spark, sf_dir)
    return tx.repetition_scores(d, "text").select(
        "doc_id", "dup_line_frac", "top_ngram_frac"
    )


def q_corpus_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global corpus vocabulary statistic (operators/text.py::top_ngrams):
    top-100 token bigrams by occurrence count with document frequency —
    the stat that feeds the stop-shingle caps (max_shingle_freq /
    max_bucket) and Gopher-style corpus audits. Per-doc counts are
    computed ARRAY-SIDE (sorted-run RLE, pure codegen), so one gram-keyed
    aggregation with map-side combine is the only shuffle and the top-k is
    a TakeOrdered. Deterministic k-boundary: (count desc, doc-freq desc,
    gram asc)."""
    d = _docs(spark, sf_dir)
    return tx.top_ngrams(d, "text", "doc_id", ngram_n=2, k=100)


def q_docs_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split manifest
    (operators/sampling.py::assign_splits): disjoint, exhaustive,
    content-keyed — a document never migrates between splits under corpus
    growth, reruns, or repartitioning (the eval-leakage mode randomSplit
    invites). Pure codegen projection, no shuffle; the oracle replays the
    identical hex-digit bucket arithmetic and integer thresholds."""
    from commercepulse_data_pipeline_spark.operators.sampling import assign_splits

    d = _docs(spark, sf_dir).select("doc_id")
    return assign_splits(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split-v1:"
    )


def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup detection (operators/dedup.py::
    minhash_pairs_between): every 10th doc plays the NEW ingest batch, the
    rest the already-indexed corpus. The batch's bands broadcast; the
    index side is semi-restricted to probed keys before any shuffle —
    per-ingest cost is O(batch) + one index scan, not a corpus re-band.
    The oracle replays the same md5 banding on both sides and joins
    them."""
    d = _docs(spark, sf_dir)
    new = d.where(F.col("doc_id") % 10 == 0)
    old = d.where(F.col("doc_id") % 10 != 0)
    idx_bands = dd.minhash_bands(old, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3)
    return dd.minhash_pairs_between(
        new, idx_bands, "text", "doc_id",
        num_hashes=8, bands=4, shingle_n=3, max_bucket=100000,
    )


def q_corpus_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset-card summary of the corpus: doc/token volume, mean
    document length, language share, mean heuristic quality — the
    headline numbers a training-data release publishes. ONE scan, ZERO
    joins: quality_score appends its column as a projection, so
    everything feeds one map-side-combined global aggregate (a join-back
    formulation would scan + shuffle the whole corpus for a 1-row
    result). Float means cross the engine boundary through exact DECIMAL
    accumulation (_dsum/_davg discipline). __tok is NULL-guarded: under
    the default non-ANSI session size(NULL) = -1, which would corrupt
    the totals AND diverge from the oracle (NULL excluded from
    sum/count)."""
    d = _docs(spark, sf_dir)
    staged = tx.quality_score(d, "text").select(
        "doc_id", "lang", "n_chars", "quality_score",
        F.when(
            F.col("text").isNotNull(), F.size(tx.tokens(F.col("text")))
        ).alias("__tok"),
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("__tok").cast("long")).alias("total_tokens"),
        _davg(F.col("__tok")).alias("avg_doc_tokens"),
        F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
        F.round(
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("pct_en"),
        F.countDistinct("lang").alias("n_langs"),
        _davg(F.col("quality_score"), 6).alias("avg_quality"),
    )


def q_docs_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-5 tf·idf keywords (operators/text.py::
    doc_keywords): rational idf (N+1)/(df+1) — no transcendentals, so
    ranks can't flip on libm last-ulp differences — array-side term
    counts, one df agg, per-doc window top-k. The oracle recomputes term
    counts with a group-by."""
    d = _docs(spark, sf_dir)
    out = tx.doc_keywords(d, "text", "doc_id", k=5)
    return out.select(
        "doc_id", F.col("rank").cast("long").alias("rank"),
        "token", "tf", "df_count", "score",
    )


def q_docs_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (operators/text.py::
    chunk_documents): long docs cut into overlapping 64-token chunks at
    stride 32 — the long-document companion to sequence packing. Pure
    let-bound projection + explode_outer (no shuffle, linear per doc);
    chunk text crosses the comparison as md5. The oracle replays the same
    non-negative integer chunk arithmetic and token slicing."""
    d = _docs(spark, sf_dir)
    ch = tx.chunk_documents(d, "text", "doc_id", max_tokens=64, stride=32)
    return ch.select(
        "doc_id", "chunk_idx", "chunk_tokens", F.md5("chunk_text").alias("chunk_md5")
    )


def q_docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators/contamination.py): every 10th
    doc plays the evaluation set; the rest of the corpus is scored by the
    fraction of its distinct 3-gram shingles that appear in the eval
    vocabulary. Probe vocab broadcasts; corpus side is one explode + one
    id-keyed aggregation."""
    from commercepulse_data_pipeline_spark.operators.contamination import (
        ngram_contamination,
    )

    d = _docs(spark, sf_dir)
    probes = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    return ngram_contamination(corpus, probes, text_col="text", id_col="doc_id")


def q_docs_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination CORRECTION
    (operators/contamination.py::scrub_contamination): every 10th doc
    plays the evaluation set (same split as ``docs_contamination``, the
    detection twin); the remaining corpus docs are REWRITTEN with every
    8-token window found in the eval vocabulary spliced out — no
    canonical survivor. The md5 of each scrubbed text hash-checks the
    whole rewrite; oracle is a full DuckDB replay."""
    from commercepulse_data_pipeline_spark.operators.contamination import (
        scrub_contamination,
    )

    d = _docs(spark, sf_dir).select("doc_id", "text")
    probes = d.where(F.col("doc_id") % 10 == 0)
    corpus = d.where(F.col("doc_id") % 10 != 0)
    out = scrub_contamination(corpus, probes, window_tokens=8)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_tokens_removed",
        "n_probe_windows",
        F.md5("text_scrubbed").alias("scrubbed_md5"),
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ 0.5 via shingle inverted index.

    ``max_shingle_freq`` effectively disabled for oracle parity at test
    SF; production caps stop-shingles (~1000) — see _pairs_in_group."""
    d = _docs(spark, sf_dir)
    return dd.ngram_jaccard_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.5, max_shingle_freq=1000000
    )


def q_cross_source_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy join (operators/dedup.py::fuzzy_text_join
    — r9): even-id docs play one table, odd-id docs the other; pairs
    with exact 3-gram Jaccard >= 0.5 across the two tables. EXACT
    posting-list machinery (not LSH-approximate), so the brute-force
    DuckDB twin is complete and the jaccard values hash-check."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return dd.fuzzy_text_join(
        d.where(F.col("doc_id") % 2 == 0),
        d.where(F.col("doc_id") % 2 == 1),
        threshold=0.5,
        shingle_n=3,
        max_shingle_freq=1000000,
    )


def q_revenue_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD anomaly flags over daily order revenue
    (``operators/windows.py::robust_anomalies`` — r8): revenue
    aggregates to exact integer CENTS per day (decimal sum → long), the
    median and MAD are exact inverted-CDF ranks, and a day is anomalous
    when |x - median| > 3·MAD — all integer arithmetic, hash-replayable.
    The rank windows run over the calendar-bounded day series (the
    data-sized work happened in the per-day aggregate). Returns flagged
    days only, with the stats alongside."""
    o = _t(spark, sf_dir, "orders").select(
        _iso_date("o_orderdate").alias("day"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("__p"),
    )
    daily = o.groupBy("day").agg(
        (F.sum("__p") * 100).cast("long").alias("revenue_cents")
    )
    flagged = win.robust_anomalies(daily, "revenue_cents", "day", k_mad=3)
    return flagged.where(F.col("is_anomaly") == 1).select(
        "day",
        "revenue_cents",
        F.col("median_value").alias("median_cents"),
        F.col("abs_dev").alias("abs_dev_cents"),
        F.col("mad_value").alias("mad_cents"),
    )


def q_embedding_gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding Gram matrix upper triangle
    (``operators/similarity.py::embedding_gram`` — r8): the one-pass
    n·d² statistic feeding PCA/whitening (``pca_components`` eigh-solves
    the collected d×d triangle driver-side — bounded — and
    ``project_embeddings`` is a codegen fold, pytest-tier). Products are
    single IEEE multiplies, sums DECIMAL-accumulated → the whole matrix
    hash-replays in DuckDB."""
    e = _t(spark, sf_dir, "embeddings")
    return sim.embedding_gram(e, "embedding")


def q_corpus_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 bigram collocations by lift
    (``operators/text.py::collocations`` — r8): PMI without the log
    (rank-equivalent, and bit-replayable cross-engine because every
    operand is an exact integer count and the three IEEE divisions are
    order-pinned). min_count=5 prunes before the vocabulary joins;
    deterministic (lift, n_ab, gram) order makes the k-boundary
    hash-stable."""
    d = _docs(spark, sf_dir)
    return tx.collocations(d, "text", "doc_id", min_count=5, k=30)


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution diagnostics (``operators/skew.py::skew_report``
    — r8): exact group-size quantiles at integer inverted-CDF ranks,
    max/p50 skew ratio, the recommended salt width, and the top-3
    heaviest keys, for lineitem's order and part keys — the MEASURE step
    that justifies (or spares) salted_agg/salted_join at 100 TB. All
    integer/4-dp-double arithmetic over distinct keys → replays exactly
    in the DuckDB oracle."""
    from commercepulse_data_pipeline_spark.operators import skew as sk_ops

    li = _t(spark, sf_dir, "lineitem")
    return sk_ops.skew_report(li, ["l_orderkey", "l_partkey"], top_n=3)


def q_docs_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-2 training order
    (``operators/sampling.py::epoch_shuffle`` — r8): a reproducible
    global permutation of the corpus as (shard, pos) with NO global sort
    (positions are windowed per shard; writing is repartition(shard) +
    sortWithinPartitions). md5-derived order/shard keys (DECISIONS.md
    rule) make the entire permutation — every position — hash-replayable
    in the DuckDB oracle; (epoch, shard, pos) is the durable cursor a
    resumable training job needs, which orderBy(rand(seed)) cannot give
    (per-partition seeding reorders under retry/repartition)."""
    from commercepulse_data_pipeline_spark.operators.sampling import epoch_shuffle

    d = _docs(spark, sf_dir).select("doc_id")
    return epoch_shuffle(d, "doc_id", epoch=2, n_shards=8)


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle-containment pairs ≥ 0.6
    (``operators/dedup.py::containment_pairs`` — r8): the asymmetric
    near-dup measure |src∩dst|/|src| that catches a short doc quoted
    inside a long one, which Jaccard's union denominator hides. Same
    inverted-index shape as ngram_jaccard (cap disabled at test SF for
    oracle parity; production caps stop-shingles)."""
    d = _docs(spark, sf_dir)
    return dd.containment_pairs(
        d, "text", "doc_id", shingle_n=3, threshold=0.6, max_shingle_freq=1000000
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact ANN baseline: top-10 by cosine to the vec_id=0
    embedding. Double-precision sequential fold → engine-reproducible."""
    e = _t(spark, sf_dir, "embeddings")
    qvec = e.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return sim.cosine_topk(e, list(qvec), k=10, id_col="vec_id", vec_col="embedding")


def q_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch k-NN join (embedding-cosine near-dup primitive): 3 nearest
    non-self neighbors for each of the first 5 vectors. Queries broadcast,
    corpus scanned once; shuffle carries only (query_id, neighbor_id,
    score) — never corpus × corpus."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 5)
    out = sim.knn_join(e, q, k=3, id_col="vec_id", vec_col="embedding")
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


# knn_join_self parameters shared by the Spark query and its generated
# DuckDB oracle (deterministic LCG hyperplanes ⇒ both engines derive the
# identical LSH tables).
_SELFKNN = dict(k=3, n_planes=6, n_tables=4, seed=42, max_bucket=200, dim=64)

# SemDeDup cosine threshold — calibrated to the synthetic embedding
# corpus (max pairwise cosine ≈ 0.51; real web-scale SemDeDup runs ~0.95+
# on model embeddings). Applied to knn_join_self's ROUNDED cosine_sim.
_SEMDEDUP_TAU = 0.4


def q_embedding_selfknn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe self-kNN (embedding-cosine near-dup, VERDICT r1 #4):
    sign-LSH posting-list blocking — the corpus is never broadcast and no
    O(n²) pair space exists (operators/similarity.py knn_join_self). The
    oracle replays the same deterministic hyperplanes in SQL."""
    e = _t(spark, sf_dir, "embeddings")
    out = sim.knn_join_self(e, **{**_SELFKNN, "id_col": "vec_id", "vec_col": "embedding"})
    return out.select(
        "query_id", "neighbor_id", "cosine_sim", F.col("rank").cast("long").alias("rank")
    )


def _duck_plane_dot(vec_expr: str, plane: list[float]) -> str:
    """DuckDB expression for dot(vec, literal plane) with the SAME
    sequential left-fold over doubles as Spark's F.aggregate/zip_with
    (operators/similarity.py::_dot) — bit-identical across engines."""
    arr = "[" + ", ".join(repr(v) for v in plane) + "]"
    return (
        f"list_sum(list_transform(range(1, len({vec_expr}) + 1), "
        f"i -> CAST({vec_expr}[i] AS DOUBLE) * ({arr}::DOUBLE[])[i]))"
    )


def _selfknn_cte_body() -> str:
    """Shared CTE chain replaying knn_join_self in DuckDB (planes inlined
    as literals): keyed -> sized -> pairs -> scored -> directed -> topk.
    Used by both the selfknn oracle and the semantic-dedup oracle, so the
    two stay banding-identical by construction."""
    p = _SELFKNN

    def bucket_expr(table: int) -> str:
        planes = sim.random_hyperplanes(p["dim"], p["n_planes"], p["seed"] + table)
        bits = [
            f"(CASE WHEN {_duck_plane_dot('e.embedding', plane)} >= 0 THEN '1' ELSE '0' END)"
            for plane in planes
        ]
        return " || ".join(bits)

    keyed = "\nUNION ALL\n".join(
        f"SELECT e.vec_id, {t} AS table_id, {bucket_expr(t)} AS bucket FROM embeddings e"
        for t in range(p["n_tables"])
    )
    return f"""keyed AS ({keyed}),
        sized AS (
            SELECT table_id, bucket FROM keyed
            GROUP BY 1, 2 HAVING count(*) BETWEEN 2 AND {p["max_bucket"]}
        ),
        pairs AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM keyed a
            JOIN keyed b ON a.table_id = b.table_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
            JOIN sized s ON s.table_id = a.table_id AND s.bucket = a.bucket
        ),
        scored AS (
            SELECT id_a, id_b, dot / (na * nb) AS cos FROM (
                SELECT p.id_a, p.id_b,
                       list_sum(list_transform(range(1, len(ea.embedding) + 1),
                           i -> CAST(ea.embedding[i] AS DOUBLE) * CAST(eb.embedding[i] AS DOUBLE))) AS dot,
                       sqrt(list_sum(list_transform(ea.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS na,
                       sqrt(list_sum(list_transform(eb.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nb
                FROM pairs p
                JOIN embeddings ea ON ea.vec_id = p.id_a
                JOIN embeddings eb ON eb.vec_id = p.id_b
            ) WHERE na * nb > 0
        ),
        directed AS (
            SELECT id_a AS query_id, id_b AS neighbor_id, cos FROM scored
            UNION ALL
            SELECT id_b AS query_id, id_a AS neighbor_id, cos FROM scored
        ),
        topk AS (
            SELECT query_id, neighbor_id, cos,
                   row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
            FROM directed
        )"""


def _selfknn_oracle_sql() -> str:
    """DuckDB twin of q_embedding_selfknn."""
    return f"""
        WITH {_selfknn_cte_body()}
        SELECT query_id, neighbor_id, round(cos, 6) AS cosine_sim, rank
        FROM topk WHERE rank <= {_SELFKNN["k"]}
    """


def _semantic_dedup_oracle_sql() -> str:
    """DuckDB twin of q_semantic_dedup: the selfknn CTE chain (identical
    banding) -> threshold on the ROUNDED cosine (the Spark side filters
    knn_join_self's rounded output) -> undirected pairs -> recursive-CTE
    connected components -> keep the max-norm member per cluster."""
    return f"""
        WITH RECURSIVE {_selfknn_cte_body()},
        tpairs AS (
            SELECT DISTINCT least(query_id, neighbor_id) AS id_a,
                            greatest(query_id, neighbor_id) AS id_b
            FROM topk
            WHERE rank <= {_SELFKNN["k"]} AND round(cos, 6) >= {_SEMDEDUP_TAU}
        ),
        edges AS (
            SELECT id_a AS u, id_b AS v FROM tpairs
            UNION ALL SELECT id_b, id_a FROM tpairs
        ),
        reach(node, m) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, r.m FROM edges e JOIN reach r ON r.node = e.v
        ),
        cc AS (SELECT node, min(m) AS component FROM reach GROUP BY node),
        csizes AS (SELECT component, count(*) AS cluster_size FROM cc GROUP BY component),
        norms AS (
            SELECT vec_id,
                   sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
            FROM embeddings
        ),
        ranked AS (
            SELECT cc.node, cc.component, s.cluster_size, n.norm,
                   row_number() OVER (
                       PARTITION BY cc.component ORDER BY n.norm DESC, cc.node ASC
                   ) AS rn
            FROM cc
            JOIN csizes s USING (component)
            JOIN norms n ON n.vec_id = cc.node
        )
        SELECT component AS cluster_id, node AS kept_vec_id,
               round(norm, 6) AS kept_norm, cluster_size,
               cluster_size - 1 AS n_dropped
        FROM ranked WHERE rn = 1
    """


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023 shape):
    embedding-cosine near-dup pairs from the LSH-blocked self-kNN
    (``operators/similarity.py::knn_join_self`` — no corpus broadcast, no
    O(n²)), thresholded at ``_SEMDEDUP_TAU``, closed into clusters by
    O(log n)-round connected components (``operators/graph.py``), keeping
    the MAX-NORM member per cluster (norm as the stand-in for the
    "closest to centroid" retention rule; ties → lowest id).

    Scale shape: pairs are posting-list generated with width caps; CC is
    the checkpointed large-star/hash-to-min family; the norms join is
    id-keyed (bucket the embedding table by id at 100 TB and it
    co-locates). The oracle replays the identical hyperplane banding via
    the shared selfknn CTE, then closes the hull with a recursive CTE."""
    from commercepulse_data_pipeline_spark.operators import graph
    from commercepulse_data_pipeline_spark.operators.similarity import _norm

    e = _t(spark, sf_dir, "embeddings")
    knn = sim.knn_join_self(e, **{**_SELFKNN, "id_col": "vec_id", "vec_col": "embedding"})
    pairs = (
        knn.where(F.col("cosine_sim") >= _SEMDEDUP_TAU)
        .select(
            F.least("query_id", "neighbor_id").alias("id_a"),
            F.greatest("query_id", "neighbor_id").alias("id_b"),
        )
        .distinct()
    )
    clusters = graph.dedup_clusters(pairs)  # (doc_id, cluster_id, cluster_size)
    norms = e.select(F.col("vec_id").alias("doc_id"), _norm(F.col("embedding")).alias("norm"))
    kept = graph.keep_best_per_cluster(clusters, norms, score_col="norm")
    return kept.select(
        "cluster_id",
        F.col("kept_doc_id").alias("kept_vec_id"),
        F.round("kept_score", 6).alias("kept_norm"),
        "cluster_size",
        "n_dropped",
    )


def q_embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats (norm avg) — array math as higher-order
    functions, aggregated per class."""
    e = _t(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )
    return (
        e.select("label", norm.alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.sum(F.col("norm").cast("decimal(30,15)")).cast("double") / F.count("norm"), 6).alias("avg_norm"),
        )
    )


# lsh_topk parameters shared by the Spark query and its generated DuckDB
# oracle (same deterministic LCG hyperplane family as _SELFKNN).
_LSH_TOPK = dict(k=10, n_planes=4, probes=2, seed=42, dim=64)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH-bucketed approximate ANN (VERDICT r2 #1 — now
    oracle-checked): bucket restrict → exact re-rank. The hyperplanes are
    a deterministic LCG (operators/similarity.py:72), so the oracle
    replays them as SQL literals, re-derives the query's bucket + its
    lowest-margin multi-probe flip in SQL, and hash-matches."""
    e = _t(spark, sf_dir, "embeddings")
    p = _LSH_TOPK
    qvec = e.where(F.col("vec_id") == 0).select("embedding").head()[0]
    return sim.lsh_topk(
        e, list(qvec), k=p["k"], n_planes=p["n_planes"], probes=p["probes"], seed=p["seed"]
    )


def _lsh_topk_oracle_sql() -> str:
    """DuckDB twin of q_ann_lsh_topk. Planes are inlined literals; the
    query's bucket bits and multi-probe flip plane (smallest |dot| margin,
    ties → lowest index, exactly Python's stable sort in lsh_topk) are
    computed in SQL; a row survives iff its bits match the query's on
    every plane except possibly the flip plane — i.e. membership in
    {exact bucket, 1-flip bucket}, the probes=2 probe set."""
    p = _LSH_TOPK
    assert p["probes"] == 2, "oracle is generated for the registered probes=2 config"
    n = p["n_planes"]
    planes = sim.random_hyperplanes(p["dim"], n, p["seed"])
    qb = ",\n                   ".join(
        f"(CASE WHEN {_duck_plane_dot('q.qv', planes[i])} >= 0 THEN 1 ELSE 0 END) AS qb{i},"
        f" abs({_duck_plane_dot('q.qv', planes[i])}) AS m{i}"
        for i in range(n)
    )
    # argmin over margins, ties -> lowest plane index (CASE order).
    flip_branches = " ".join(
        "WHEN " + " AND ".join(f"m{i} <= m{j}" for j in range(n) if j != i) + f" THEN {i}"
        for i in range(n - 1)
    )
    flip = f"CASE {flip_branches} ELSE {n - 1} END"
    cb = ",\n                   ".join(
        f"(CASE WHEN {_duck_plane_dot('e.embedding', planes[i])} >= 0 THEN 1 ELSE 0 END) AS b{i}"
        for i in range(n)
    )
    mismatches_outside_flip = " + ".join(
        f"(CASE WHEN f.fi <> {i} AND c.b{i} <> f.qb{i} THEN 1 ELSE 0 END)" for i in range(n)
    )
    return f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qb AS (
            SELECT {qb}
            FROM q
        ),
        fl AS (SELECT *, {flip} AS fi FROM qb),
        cand AS (
            SELECT e.vec_id, e.embedding,
                   {cb}
            FROM embeddings e
        ),
        kept AS (
            SELECT c.vec_id, c.embedding FROM cand c, fl f
            WHERE {mismatches_outside_flip} = 0
        ),
        scored AS (
            SELECT k.vec_id,
                   list_sum(list_transform(range(1, len(k.embedding) + 1),
                       i -> CAST(k.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) AS dot,
                   sqrt(list_sum(list_transform(k.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne,
                   sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq
            FROM kept k, q
        )
        SELECT vec_id, round(dot / (ne * nq), 6) AS cosine_sim
        FROM scored WHERE ne * nq > 0
        ORDER BY dot / (ne * nq) DESC, vec_id ASC LIMIT {p["k"]}
    """


# ivf parameters shared by the Spark query and its generated DuckDB oracle.
_IVF_TOPK = dict(k=10, n_centroids=8, iters=1, nprobe=2, dim=64)


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-partitioned approximate ANN (VERDICT r2 #2 — now
    oracle-checked): deterministic k-means-lite coarse quantizer, probe
    the 2 nearest inverted lists, exact cosine re-rank. Centroid init is
    the md5-derived 64-bit hash order (engine-reproducible per the
    DECISIONS.md md5/sha rule; was xxhash64), and Lloyd means accumulate
    in decimal, so the oracle replays init + iteration + probe in SQL.
    Bucketing the corpus by centroid_id turns the probe into partition
    pruning."""
    e = _t(spark, sf_dir, "embeddings")
    p = _IVF_TOPK
    qvec = list(e.where(F.col("vec_id") == 0).select("embedding").head()[0])
    assigned, cents = sim.ivf_assign(e, n_centroids=p["n_centroids"], iters=p["iters"])
    return sim.ivf_topk(assigned, cents, qvec, k=p["k"], nprobe=p["nprobe"])


_PQ_TOPK = dict(k=10, m=4, n_codes=8, iters=1, dim=64)


def q_ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/similarity.py::pq_train/
    pq_encode/pq_topk — Jégou et al. 2011): per-subspace codebooks
    trained with the same md5-init + decimal-Lloyd discipline as IVF,
    vectors stored as m=4 small codes, and the query answered in the
    COMPRESSED domain by ADC — m LUT lookups summed in subspace order (a
    pure codegen projection, no join, vectors never decompressed; top-k
    is TakeOrderedAndProject). Served from the PERSISTED index (VERDICT
    r10 item 3 — train once via the content-keyed cache, then repeat
    calls, notably the bench's timed sweeps, measure the probe path the
    index exists for; the codes table round-trips ids + m ints and the
    codebooks round-trip as exact doubles, so results are bit-identical
    to the train-inline form). The oracle replays codebook training,
    encoding, the LUT and the ordered ADC fold in SQL, so the approximate
    DISTANCES hash-check, not just ids."""
    e = _t(spark, sf_dir, "embeddings")
    p = _PQ_TOPK
    qvec = list(e.where(F.col("vec_id") == 0).select("embedding").head()[0])
    path = _pq_index_path(e, sf_dir)
    return sim.pq_topk_indexed(spark, path, qvec, k=p["k"])


def _pq_index_path(e: DataFrame, sf_dir: str) -> str:
    """Cached plain-PQ index over the embeddings table at the registered
    ``_PQ_TOPK`` params (see ``_ann_index_cache`` for the contract);
    shared by ann_pq_topk and ann_pq_knn_join."""
    p = _PQ_TOPK

    def build(dest: str) -> None:
        books = sim.pq_train(e, m=p["m"], n_codes=p["n_codes"], iters=p["iters"])
        sim.write_pq_index(sim.pq_encode(e, books), dest, books=books)

    return _ann_index_cache(
        sf_dir, "pq", f"m{p['m']}_k{p['n_codes']}_i{p['iters']}", build
    )


def _pq_train_codes_ctes(m: int, nc: int, dim: int) -> tuple[str, str]:
    """Shared DuckDB CTE block replaying pq_train + pq_encode over the
    embeddings table (md5-ordered codebook init per subspace, one
    decimal-Lloyd iteration over (j, code) groups, final encoding).
    Returns (cte_body, sqd_template); the block defines CTEs ``books1``
    (trained codebooks) and ``codes`` (per-vector subspace codes) for
    the caller's scoring CTEs to build on. Extracted so the single-query
    ADC oracle (ann_pq_topk) and the batch ADC-join oracle
    (ann_pq_knn_join) replay the identical training text."""
    ds = dim // m
    h64 = _duck_md5_long("md5(CAST(vec_id AS VARCHAR))")
    sqd = (
        "list_sum(list_transform(range(1, len({v}) + 1), "
        "i -> (CAST({v}[i] AS DOUBLE) - {c}[i]) * (CAST({v}[i] AS DOUBLE) - {c}[i])))"
    )
    ctes = f"""hashed AS (
            SELECT vec_id, embedding, {h64} AS hv FROM embeddings
        ),
        init AS (
            SELECT row_number() OVER (ORDER BY hv ASC, vec_id ASC) - 1 AS cid,
                   embedding
            FROM hashed
            QUALIFY row_number() OVER (ORDER BY hv ASC, vec_id ASC) <= {nc}
        ),
        js AS (SELECT unnest(range(0, {m})) AS j),
        books0 AS (
            SELECT js.j, i.cid,
                   list_transform(i.embedding[js.j * {ds} + 1 : js.j * {ds} + {ds}],
                                  x -> CAST(x AS DOUBLE)) AS cvec
            FROM init i CROSS JOIN js
        ),
        subs AS (
            SELECT e.vec_id, js.j,
                   e.embedding[js.j * {ds} + 1 : js.j * {ds} + {ds}] AS sub
            FROM embeddings e CROSS JOIN js
        ),
        a0 AS (
            SELECT vec_id, j, cid FROM (
                SELECT s.vec_id, s.j, b.cid,
                       row_number() OVER (
                           PARTITION BY s.vec_id, s.j
                           ORDER BY {sqd.format(v="s.sub", c="b.cvec")} ASC, b.cid ASC
                       ) AS rn
                FROM subs s JOIN books0 b ON s.j = b.j
            ) WHERE rn = 1
        ),
        dims AS (
            SELECT a.j, a.cid, d.d,
                   CAST(CAST(s.sub[d.d] AS DOUBLE) AS DECIMAL(30,15)) AS v
            FROM a0 a
            JOIN subs s ON a.vec_id = s.vec_id AND a.j = s.j
            CROSS JOIN (SELECT unnest(range(1, {ds + 1})) AS d) d
        ),
        cm AS (
            SELECT j, cid, d, CAST(sum(v) AS DOUBLE) / count(*) AS mval
            FROM dims GROUP BY j, cid, d
        ),
        upd AS (
            SELECT j, cid, list(mval ORDER BY d ASC) AS cvec
            FROM cm GROUP BY j, cid
        ),
        books1 AS (
            SELECT b.j, b.cid, coalesce(u.cvec, b.cvec) AS cvec
            FROM books0 b LEFT JOIN upd u ON b.j = u.j AND b.cid = u.cid
        ),
        codes AS (
            SELECT vec_id, j, cid FROM (
                SELECT s.vec_id, s.j, b.cid,
                       row_number() OVER (
                           PARTITION BY s.vec_id, s.j
                           ORDER BY {sqd.format(v="s.sub", c="b.cvec")} ASC, b.cid ASC
                       ) AS rn
                FROM subs s JOIN books1 b ON s.j = b.j
            ) WHERE rn = 1
        )"""
    return ctes, sqd


def _pq_topk_oracle_sql() -> str:
    """DuckDB twin of q_ann_pq_topk: md5-ordered codebook init per
    subspace, one decimal-Lloyd iteration over (j, code) groups, final
    encoding, the query's ADC lookup table, and the SUBSPACE-ORDERED
    distance fold ((p0+p1)+p2)+p3 — the same IEEE addition order as the
    Spark-side aggregate starting from 0.0."""
    p = _PQ_TOPK
    assert p["iters"] == 1, "oracle is generated for the registered iters=1 config"
    m, nc, dim, k = p["m"], p["n_codes"], p["dim"], p["k"]
    ds = dim // m
    train_ctes, sqd = _pq_train_codes_ctes(m, nc, dim)
    wide_cols = ",\n                   ".join(
        f"max(CASE WHEN c.j = {j} THEN l.pd END) AS p{j}" for j in range(m)
    )
    fold = "p0"
    for j in range(1, m):
        fold = f"({fold} + p{j})"
    return f"""
        WITH {train_ctes},
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        lut AS (
            SELECT b.j, b.cid,
                   {sqd.format(v="(q.qv[b.j * " + str(ds) + " + 1 : b.j * " + str(ds) + " + " + str(ds) + "])", c="b.cvec")} AS pd
            FROM books1 b CROSS JOIN q
        ),
        wide AS (
            SELECT c.vec_id,
                   {wide_cols}
            FROM codes c JOIN lut l ON c.j = l.j AND c.cid = l.cid
            GROUP BY c.vec_id
        )
        SELECT vec_id, round({fold}, 6) AS approx_d2
        FROM wide
        ORDER BY round({fold}, 6) ASC, vec_id ASC
        LIMIT {k}
    """


# batch ADC-join parameters (training params shared with _PQ_TOPK so the
# oracle replays the identical codebooks).
_PQ_KNN = dict(k=3, qmod=97)


def q_ann_pq_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch compressed-domain kNN join (operators/similarity.py::
    pq_knn_join): k approximate nearest corpus vectors for EACH query
    row, entirely by ADC over the codes table — each broadcast query row
    carries its own precomputed LUT, per-pair cost is m array lookups.
    The oracle replays codebook training, encoding, every query's LUT
    and the subspace-ordered fold, then ranks per query on the UNROUNDED
    distance with id tiebreak (the operator's contract) — so the batch
    serving shape gets the same hard distance-level signal as
    ann_pq_topk. Serves from the same persisted PQ index as ann_pq_topk
    (VERDICT r10 item 3): codes scanned from disk, codebooks reloaded —
    bit-identical to encoding inline (ids + m ints and exact-double
    centroids round-trip through parquet), and repeat calls time the ADC
    join itself rather than codebook training."""
    e = _t(spark, sf_dir, "embeddings")
    p = _PQ_KNN
    path = _pq_index_path(e, sf_dir)
    books = sim.read_pq_books(spark, path)
    codes = spark.read.parquet(f"{path}/codes")
    qs = e.where(F.col("vec_id") % p["qmod"] == 0)
    out = sim.pq_knn_join(codes, qs, books, k=p["k"])
    return out.select(
        "query_id",
        "neighbor_id",
        "approx_d2",
        F.col("rank").cast("long").alias("rank"),
    )


def _pq_knn_join_oracle_sql() -> str:
    """DuckDB twin of q_ann_pq_knn_join: the shared pq_train/pq_encode
    replay, per-query LUTs, the subspace-ordered ADC fold, and a
    per-query rank on the UNROUNDED fold (ties → lowest neighbor_id)
    with the 6-dp round applied only at output — exactly pq_knn_join's
    column contract."""
    p, pt = _PQ_KNN, _PQ_TOPK
    assert pt["iters"] == 1, "oracle is generated for the registered iters=1 config"
    m, nc, dim = pt["m"], pt["n_codes"], pt["dim"]
    ds = dim // m
    train_ctes, sqd = _pq_train_codes_ctes(m, nc, dim)
    wide_cols = ",\n                   ".join(
        f"max(CASE WHEN c.j = {j} THEN l.pd END) AS p{j}" for j in range(m)
    )
    fold = "p0"
    for j in range(1, m):
        fold = f"({fold} + p{j})"
    return f"""
        WITH {train_ctes},
        q AS (
            SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id % {p["qmod"]} = 0
        ),
        lut AS (
            SELECT q.query_id, b.j, b.cid,
                   {sqd.format(v="(q.qv[b.j * " + str(ds) + " + 1 : b.j * " + str(ds) + " + " + str(ds) + "])", c="b.cvec")} AS pd
            FROM books1 b CROSS JOIN q
        ),
        wide AS (
            SELECT l.query_id, c.vec_id AS neighbor_id,
                   {wide_cols}
            FROM codes c JOIN lut l ON c.j = l.j AND c.cid = l.cid
            GROUP BY l.query_id, c.vec_id
        ),
        ranked AS (
            SELECT query_id, neighbor_id, {fold} AS d2,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY {fold} ASC, neighbor_id ASC
                   ) AS rank
            FROM wide
        )
        SELECT query_id, neighbor_id, round(d2, 6) AS approx_d2, rank
        FROM ranked WHERE rank <= {p["k"]}
    """


# IVF+PQ parameters shared by the Spark query and its generated oracle.
_IVFPQ_TOPK = dict(k=10, n_centroids=8, m=4, n_codes=8, iters=1, nprobe=2, dim=64)

# Bump when write_pq_index / write_ivfpq_index or their on-disk layout
# change: the cache key otherwise carries no code version, so a stale
# index built by the previous revision would be silently served to the
# correctness run until /tmp is cleared, masking regressions (ADVICE r10).
_ANN_CACHE_VERSION = "v1"


def _ann_index_cache(
    sf_dir: str, kind: str, params: str, build_fn, *, src_table: str = "embeddings"
) -> str:
    """Build-once/query-many index cache, like a real serving deployment:
    the builds are fully deterministic for a given corpus + params, so
    the index lands under a /tmp path keyed by params, a code-version
    token (``_ANN_CACHE_VERSION``) and a CONTENT SIGNATURE of the source
    files (path, size, mtime of every part) — regenerated or overwritten
    testdata gets a fresh key instead of silently serving an index built
    from data that no longer exists (r10 self-review). The build lands in
    a pid-suffixed dir atomically renamed into place, so concurrent
    builders (bench + driver) cannot interleave writes; the loser's
    finished build just replaces an identical one. A failed build removes
    its partial dir (try/finally), and stale ``*.build.*`` leftovers from
    crashed processes are swept on entry by liveness of the pid baked
    into the dir name (ADVICE r10) — NOT by mtime: a directory's mtime
    only moves when direct children are created, so a long build writing
    deep inside ``codes/`` looks idle and an mtime cutoff would delete a
    LIVE build out from under its owner (r11 review finding). The cache
    is /tmp-local, so the pid namespace is the right scope; pid reuse is
    guarded by a 24h age backstop. Repeat calls — the bench's timed
    sweeps, notably —
    measure SERVING latency, which is what an index exists to amortize
    toward; the first call (and the driver's single correctness run)
    still pays the build. Returns the index path."""
    import hashlib as _hashlib
    import os as _os
    import shutil as _shutil
    import time as _time

    src = f"{sf_dir.rstrip('/')}/{src_table}.parquet"
    sig = _hashlib.md5()
    for root, _dirs, files in sorted(_os.walk(src)) or [(src, [], [])]:
        for fn in sorted(files):
            st = _os.stat(_os.path.join(root, fn))
            sig.update(f"{root}/{fn}:{st.st_size}:{st.st_mtime_ns};".encode())
    if _os.path.isfile(src):
        st = _os.stat(src)
        sig.update(f"{src}:{st.st_size}:{st.st_mtime_ns};".encode())
    root_dir = "/tmp/cp_ann_cache"
    path = (
        f"{root_dir}/{kind}_{params}_{_ANN_CACHE_VERSION}"
        f"_{sig.hexdigest()[:16]}"
    )
    if _os.path.exists(f"{path}/_BUILT"):
        return path
    _os.makedirs(root_dir, exist_ok=True)
    for entry in _os.listdir(root_dir):
        if ".build." not in entry:
            continue
        d = _os.path.join(root_dir, entry)
        try:
            owner = int(entry.rsplit(".build.", 1)[1])
            _os.kill(owner, 0)  # raises if the builder is gone
            # owner alive: only reap if implausibly old (pid-reuse guard)
            stale = _time.time() - _os.path.getmtime(d) > 86400
        except (ValueError, ProcessLookupError):
            stale = True  # unparsable tag or dead builder: crashed leftover
        except PermissionError:
            stale = False  # pid exists under another uid — leave it
        except OSError:
            continue  # a concurrent sweep already removed it
        if stale:
            _shutil.rmtree(d, ignore_errors=True)
    build = f"{path}.build.{_os.getpid()}"
    try:
        build_fn(build)
        with open(f"{build}/_BUILT", "w") as fh:
            fh.write("ok\n")
        try:
            _os.rename(build, path)
        except OSError:  # a concurrent builder won the rename
            pass
    finally:
        # no-op after a successful rename; removes the partial dir when
        # the build raised or the rename lost
        _shutil.rmtree(build, ignore_errors=True)
    return path


def q_ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ residual-coded ANN over the PERSISTED serving path
    (operators/similarity.py::write_ivfpq_index / ivfpq_topk — Jégou et
    al. 2011 §IV, VERDICT r9 item 2): the index is written to scratch
    (codes partitioned by centroid_id + centroid table + residual
    codebooks), then queried exactly as production would — centroids
    ranked driver-side, only the nprobe nearest lists' partitions
    scanned (pruning, plan-asserted in tests), ADC against a PER-LIST
    LUT built from the query's residual to that list's centroid. Raw
    vectors are never read at query time. The oracle replays the entire
    deterministic pipeline in SQL — IVF init+Lloyd+assign, residuals,
    residual-codebook init+Lloyd, encoding, probe selection, per-list
    residual LUTs and the subspace-ordered ADC fold — so the approximate
    DISTANCES hash-check, not just ids."""
    e = _t(spark, sf_dir, "embeddings")
    p = _IVFPQ_TOPK
    qvec = list(e.where(F.col("vec_id") == 0).select("embedding").head()[0])
    path = _ivfpq_index_path(e, sf_dir)
    return sim.ivfpq_topk(spark, path, qvec, k=p["k"], nprobe=p["nprobe"])


def _ivfpq_index_path(e: DataFrame, sf_dir: str) -> str:
    """Cached IVF+PQ index over the embeddings table at the registered
    ``_IVFPQ_TOPK`` params (see ``_ann_index_cache`` for the contract)."""
    p = _IVFPQ_TOPK
    return _ann_index_cache(
        sf_dir,
        "ivfpq",
        f"c{p['n_centroids']}_m{p['m']}_k{p['n_codes']}_i{p['iters']}",
        lambda dest: sim.write_ivfpq_index(
            e, dest, n_centroids=p["n_centroids"], m=p["m"],
            n_codes=p["n_codes"], iters=p["iters"],
        ),
    )


def _ivfpq_topk_oracle_sql() -> str:
    """DuckDB twin of q_ann_ivfpq_topk: the IVF stage is the
    _ivf_topk_oracle_sql replay (md5-ordered init, one decimal-Lloyd
    iteration, final assignment), then residuals vs the final centroids,
    the PQ stage is the _pq_topk_oracle_sql replay run ON THE RESIDUALS
    (md5-ordered codebook init per subspace, one decimal-Lloyd iteration
    over (j, code) groups, final encoding), probe selection ranks the
    final centroids by squared distance to the query, and each probed
    list scores by a LUT built from the query's RESIDUAL to that list's
    centroid with the same subspace-ordered ((p0+p1)+p2)+p3 IEEE fold as
    the Spark-side aggregate starting from 0.0."""
    p = _IVFPQ_TOPK
    assert p["iters"] == 1, "oracle is generated for the registered iters=1 config"
    m, nc, dim, k = p["m"], p["n_codes"], p["dim"], p["k"]
    kc, nprobe = p["n_centroids"], p["nprobe"]
    ds = dim // m
    h64 = _duck_md5_long("md5(CAST(vec_id AS VARCHAR))")
    sqd = (
        "list_sum(list_transform(range(1, len({v}) + 1), "
        "i -> (CAST({v}[i] AS DOUBLE) - {c}[i]) * (CAST({v}[i] AS DOUBLE) - {c}[i])))"
    )
    wide_cols = ",\n                   ".join(
        f"max(CASE WHEN pc.j = {j} THEN l.pd END) AS p{j}" for j in range(m)
    )
    fold = "p0"
    for j in range(1, m):
        fold = f"({fold} + p{j})"
    return f"""
        WITH hashed AS (
            SELECT vec_id, embedding, {h64} AS hv FROM embeddings
        ),
        init AS (
            SELECT row_number() OVER (ORDER BY hv ASC, vec_id ASC) - 1 AS cid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
            FROM hashed
            QUALIFY row_number() OVER (ORDER BY hv ASC, vec_id ASC) <= {kc}
        ),
        a0 AS (
            SELECT vec_id, embedding, cid FROM (
                SELECT e.vec_id, e.embedding, i.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {sqd.format(v="e.embedding", c="i.cvec")} ASC, i.cid ASC
                       ) AS rn
                FROM embeddings e CROSS JOIN init i
            ) WHERE rn = 1
        ),
        cdims AS (
            SELECT a.cid, d.d,
                   CAST(CAST(a.embedding[d.d] AS DOUBLE) AS DECIMAL(30,15)) AS v
            FROM a0 a CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS d) d
        ),
        ccm AS (
            SELECT cid, d, CAST(sum(v) AS DOUBLE) / count(*) AS m
            FROM cdims GROUP BY cid, d
        ),
        cupd AS (SELECT cid, list(m ORDER BY d ASC) AS cvec FROM ccm GROUP BY cid),
        cents AS (
            SELECT i.cid, coalesce(u.cvec, i.cvec) AS cvec
            FROM init i LEFT JOIN cupd u ON i.cid = u.cid
        ),
        a1 AS (
            SELECT vec_id, embedding, cid FROM (
                SELECT e.vec_id, e.embedding, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {sqd.format(v="e.embedding", c="c.cvec")} ASC, c.cid ASC
                       ) AS rn
                FROM embeddings e CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        resid AS (
            SELECT a.vec_id, a.cid AS centroid_id,
                   list_transform(range(1, {dim + 1}),
                                  i -> CAST(a.embedding[i] AS DOUBLE) - c.cvec[i]) AS rv
            FROM a1 a JOIN cents c ON a.cid = c.cid
        ),
        js AS (SELECT unnest(range(0, {m})) AS j),
        pinit AS (
            SELECT row_number() OVER (ORDER BY hv ASC, vec_id ASC) - 1 AS pcid,
                   vec_id
            FROM hashed
            QUALIFY row_number() OVER (ORDER BY hv ASC, vec_id ASC) <= {nc}
        ),
        pbooks0 AS (
            SELECT js.j, p.pcid,
                   r.rv[js.j * {ds} + 1 : js.j * {ds} + {ds}] AS cvec
            FROM pinit p JOIN resid r ON p.vec_id = r.vec_id CROSS JOIN js
        ),
        psubs AS (
            SELECT r.vec_id, r.centroid_id, js.j,
                   r.rv[js.j * {ds} + 1 : js.j * {ds} + {ds}] AS sub
            FROM resid r CROSS JOIN js
        ),
        pa0 AS (
            SELECT vec_id, j, pcid FROM (
                SELECT s.vec_id, s.j, b.pcid,
                       row_number() OVER (
                           PARTITION BY s.vec_id, s.j
                           ORDER BY {sqd.format(v="s.sub", c="b.cvec")} ASC, b.pcid ASC
                       ) AS rn
                FROM psubs s JOIN pbooks0 b ON s.j = b.j
            ) WHERE rn = 1
        ),
        pdims AS (
            SELECT a.j, a.pcid, d.d,
                   CAST(s.sub[d.d] AS DECIMAL(30,15)) AS v
            FROM pa0 a
            JOIN psubs s ON a.vec_id = s.vec_id AND a.j = s.j
            CROSS JOIN (SELECT unnest(range(1, {ds + 1})) AS d) d
        ),
        pcm AS (
            SELECT j, pcid, d, CAST(sum(v) AS DOUBLE) / count(*) AS mval
            FROM pdims GROUP BY j, pcid, d
        ),
        pupd AS (
            SELECT j, pcid, list(mval ORDER BY d ASC) AS cvec
            FROM pcm GROUP BY j, pcid
        ),
        pbooks1 AS (
            SELECT b.j, b.pcid, coalesce(u.cvec, b.cvec) AS cvec
            FROM pbooks0 b LEFT JOIN pupd u ON b.j = u.j AND b.pcid = u.pcid
        ),
        pcodes AS (
            SELECT vec_id, centroid_id, j, pcid FROM (
                SELECT s.vec_id, s.centroid_id, s.j, b.pcid,
                       row_number() OVER (
                           PARTITION BY s.vec_id, s.j
                           ORDER BY {sqd.format(v="s.sub", c="b.cvec")} ASC, b.pcid ASC
                       ) AS rn
                FROM psubs s JOIN pbooks1 b ON s.j = b.j
            ) WHERE rn = 1
        ),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qd AS (
            SELECT c.cid, {sqd.format(v="q.qv", c="c.cvec")} AS d2
            FROM cents c, q
        ),
        probe AS (
            SELECT cid FROM (
                SELECT cid, row_number() OVER (ORDER BY d2 ASC, cid ASC) AS rn FROM qd
            ) WHERE rn <= {nprobe}
        ),
        qres AS (
            SELECT c.cid,
                   list_transform(range(1, {dim + 1}),
                                  i -> CAST(q.qv[i] AS DOUBLE) - c.cvec[i]) AS rq
            FROM cents c JOIN probe USING (cid) CROSS JOIN q
        ),
        lut AS (
            SELECT qr.cid, b.j, b.pcid,
                   {sqd.format(v="(qr.rq[b.j * " + str(ds) + " + 1 : b.j * " + str(ds) + " + " + str(ds) + "])", c="b.cvec")} AS pd
            FROM pbooks1 b CROSS JOIN qres qr
        ),
        wide AS (
            SELECT pc.vec_id,
                   {wide_cols}
            FROM pcodes pc
            JOIN lut l ON l.cid = pc.centroid_id AND l.j = pc.j AND l.pcid = pc.pcid
            GROUP BY pc.vec_id
        )
        SELECT vec_id, round({fold}, 6) AS approx_d2
        FROM wide
        ORDER BY round({fold}, 6) ASC, vec_id ASC
        LIMIT {k}
    """


def _duck_md5_long(hex_expr: str) -> str:
    """DuckDB expression for operators/dedup.py::_md5_long applied to an
    md5-hex expression: first 16 hex chars as a signed big-endian 64-bit
    value (same construction as the simhash oracle's v64)."""
    nib = f"(strpos('0123456789abcdef', substr({hex_expr}, {{pos}}, 1)) - 1)"
    terms = [
        f"(CASE WHEN {nib.format(pos=1)} >= 8 THEN {nib.format(pos=1)} - 16"
        f" ELSE {nib.format(pos=1)} END) * {16**15}"
    ]
    terms += [f"{nib.format(pos=j + 1)} * {16 ** (15 - j)}" for j in range(1, 16)]
    return "(" + " + ".join(terms) + ")"


def _ivf_topk_oracle_sql() -> str:
    """DuckDB twin of q_ann_ivf_topk: replays the ENTIRE deterministic
    pipeline in SQL — md5-ordered centroid init, one Lloyd iteration with
    exact decimal per-dimension means (operators/similarity.py::ivf_assign),
    final assignment, nprobe=2 centroid ranking, exact cosine re-rank."""
    p = _IVF_TOPK
    assert p["iters"] == 1, "oracle is generated for the registered iters=1 config"
    dim, k_cent = p["dim"], p["n_centroids"]
    h64 = _duck_md5_long("md5(CAST(vec_id AS VARCHAR))")
    # squared distance with Spark's exact fold shape: (x-y)*(x-y) summed
    # left-to-right (operators/similarity.py::_sq_dist).
    sqd = (
        "list_sum(list_transform(range(1, len({v}) + 1), "
        "i -> (CAST({v}[i] AS DOUBLE) - {c}[i]) * (CAST({v}[i] AS DOUBLE) - {c}[i])))"
    )
    return f"""
        WITH hashed AS (
            SELECT vec_id, embedding, {h64} AS hv FROM embeddings
        ),
        init AS (
            SELECT row_number() OVER (ORDER BY hv ASC, vec_id ASC) - 1 AS cid,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cvec
            FROM hashed
            QUALIFY row_number() OVER (ORDER BY hv ASC, vec_id ASC) <= {k_cent}
        ),
        a0 AS (
            SELECT vec_id, embedding, cid FROM (
                SELECT e.vec_id, e.embedding, i.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {sqd.format(v="e.embedding", c="i.cvec")} ASC, i.cid ASC
                       ) AS rn
                FROM embeddings e CROSS JOIN init i
            ) WHERE rn = 1
        ),
        dims AS (
            SELECT a.cid, d.d,
                   CAST(CAST(a.embedding[d.d] AS DOUBLE) AS DECIMAL(30,15)) AS v
            FROM a0 a CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS d) d
        ),
        cm AS (
            SELECT cid, d, CAST(sum(v) AS DOUBLE) / count(*) AS m
            FROM dims GROUP BY cid, d
        ),
        upd AS (SELECT cid, list(m ORDER BY d ASC) AS cvec FROM cm GROUP BY cid),
        cents AS (
            SELECT i.cid, coalesce(u.cvec, i.cvec) AS cvec
            FROM init i LEFT JOIN upd u ON i.cid = u.cid
        ),
        a1 AS (
            SELECT vec_id, embedding, cid FROM (
                SELECT e.vec_id, e.embedding, c.cid,
                       row_number() OVER (
                           PARTITION BY e.vec_id
                           ORDER BY {sqd.format(v="e.embedding", c="c.cvec")} ASC, c.cid ASC
                       ) AS rn
                FROM embeddings e CROSS JOIN cents c
            ) WHERE rn = 1
        ),
        q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qd AS (
            SELECT c.cid, {sqd.format(v="q.qv", c="c.cvec")} AS d2
            FROM cents c, q
        ),
        probe AS (
            SELECT cid FROM (
                SELECT cid, row_number() OVER (ORDER BY d2 ASC, cid ASC) AS rn FROM qd
            ) WHERE rn <= {p["nprobe"]}
        ),
        kept AS (
            SELECT a.vec_id, a.embedding FROM a1 a JOIN probe p ON a.cid = p.cid
        ),
        scored AS (
            SELECT k.vec_id,
                   list_sum(list_transform(range(1, len(k.embedding) + 1),
                       i -> CAST(k.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) AS dot,
                   sqrt(list_sum(list_transform(k.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne,
                   sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq
            FROM kept k, q
        )
        SELECT vec_id, round(dot / (ne * nq), 6) AS cosine_sim
        FROM scored WHERE ne * nq > 0
        ORDER BY dot / (ne * nq) DESC, vec_id ASC LIMIT {p["k"]}
    """


# --- rows-only queries (non-SQL-expressible; driver records weaker check) --


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via block LSH. Oracle-checked: the hash
    family is md5-derived (_md5_long) so DuckDB reproduces the exact
    signatures, and the pigeonhole guarantee makes the block-LSH output
    identical to the oracle's all-pairs hamming filter."""
    d = _docs(spark, sf_dir)
    # max_bucket effectively disabled (like minhash_pairs/ngram_jaccard):
    # the all-pairs oracle has no cap, and dropping a block bucket weakens
    # the pigeonhole guarantee. Production uses the operator default.
    out = dd.simhash_candidate_pairs(
        d, "text", "doc_id", hamming_threshold=6, max_bucket=100000
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def q_dup_bucket_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-bucket occupancy under the simhash pairing keys (r15 —
    operators/dedup.py::sig_block_occupancy): the observability
    complement to the ``max_bucket`` cap's silent wholesale drop. The
    max_bucket here (5) is deliberately small so the 'dropped' band is
    NON-EMPTY on the test corpus — the oracle replays the identical
    pigeonhole block arithmetic (unsigned shift via HUGEINT division)
    and band CASE, so the hash check pins exactly what the cap would
    throw away."""
    d = _docs(spark, sf_dir)
    sh = dd.simhash_table(d, "text", "doc_id").where(F.col("sig").isNotNull())
    return dd.sig_block_occupancy(
        sh, id_col="doc_id", sig_col="sig", hamming_threshold=6, max_bucket=5
    )


# Synthetic crawl-page template for docs_html_extracted (r15): the query
# wraps every document's text in a REALISTIC page (nav/footer link bars,
# script/style subtrees, entities, a short link list) and both engines
# build the page from these SAME fragments, so the extraction — not the
# synthesis — is what the hash check pins. No apostrophes (the fragments
# embed in a single-quoted SQL literal verbatim).
_HTML_TPL = (
    "<html><head><title>Synthetic Crawl Page</title>"
    "<style>p { color: red; }</style>"
    "<script>if (1 < 2) { var nav = \"&amp;\"; }</script></head><body>"
    "<!-- chrome --><div class=\"nav\"><a href=\"/\">home</a> "
    "<a href=\"/about\">about</a> <a href=\"/faq\">faq</a></div><h1>Document ",
    " under lang ",
    "</h1><p>",
    "</p><ul><li><a href=\"/t1\">tag one</a></li>"
    "<li><a href=\"/t2\">tag two</a></li></ul>"
    "<div class=\"footer\"><a href=\"/contact\">contact us now</a></div>"
    "</body></html>",
)


def q_docs_html_extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML-to-text extraction (r15 — operators/text.py::html_extract,
    the stage in FRONT of the curation funnel): every document's text is
    wrapped in the shared synthetic page template (_HTML_TPL — nav and
    footer link bars, script/style subtrees, entities, a link list),
    then extracted back out. Pure RE2-compatible regex on both sides,
    so the oracle replays segmentation, link-density block filtering
    and entity decoding verbatim: kept text, n_blocks and n_kept_blocks
    must all hash-match."""
    d = _docs(spark, sf_dir)
    html = F.concat(
        F.lit(_HTML_TPL[0]), F.col("doc_id").cast("string"),
        F.lit(_HTML_TPL[1]), F.coalesce(F.col("lang"), F.lit("und")),
        F.lit(_HTML_TPL[2]), F.coalesce(F.col("text"), F.lit("")),
        F.lit(_HTML_TPL[3]),
    )
    return tx.html_extract(d.select("doc_id", html.alias("html")))


def q_docs_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supervised hashed-feature NB classifier (r15 —
    operators/classifier.py, the fastText-shape model-based quality
    filter): train distributed on a deterministic md5 half-split of the
    corpus labeled en-vs-rest, then score EVERY doc. The oracle replays
    train AND score — same md5 feature buckets, same add-1 smoothed
    log2 ratios quantized DECIMAL(30,4) before exact decimal sums, same
    exact-total sign for the prediction — so the hash check pins the
    whole train+score pipeline bit-for-bit."""
    from commercepulse_data_pipeline_spark.operators import classifier as clf
    from commercepulse_data_pipeline_spark.operators.sampling import (
        hash_bucket,
        threshold_for,
    )

    d = _docs(spark, sf_dir)
    is_train = hash_bucket(F.col("doc_id"), salt="nbtrain-v1:") < threshold_for(0.5)
    # ONE feature explode shared by train and score (r16, VERDICT r15
    # item 7 — nb_train_on_features): hashed features build once over
    # the FULL corpus (lazily pinned; the trainer's count aggregate
    # materializes it), the train half filters down by the same
    # deterministic md5 predicate, and scoring reuses the pinned frame —
    # tokenize+md5 runs 1.0× instead of 1.5× (train half + full score).
    # The pin is feature-occurrence-sized (two ints per token/bigram) —
    # the storage-for-CPU trade nb_train_on_features documents.
    feats = _pin(
        clf.hashed_features(
            d.select("doc_id", "lang", "text"),
            text_col="text", id_cols=["doc_id", "lang"], n_buckets=256,
        ),
        eager=False,
    )
    train_feats = feats.where(is_train).select(
        (F.col("lang") == "en").cast("int").alias("label"), "__b"
    )
    labeled = d.where(is_train).select(
        (F.col("lang") == "en").cast("int").alias("label")
    )
    model = clf.nb_train_on_features(train_feats, labeled, n_buckets=256)
    scored = clf.nb_score(
        d.select("doc_id"), model, n_buckets=256,
        feats=feats.select("doc_id", "__b"),
    )
    return scored


def q_docs_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass NB classifier (r15 —
    operators/classifier.py::nb_train_multiclass/nb_score_multiclass,
    the domain/language-routing shape): train one model per language on
    the md5 half-split, score EVERY doc, argmax with the deterministic
    (exact score, then lexicographically greatest label) tie-break. The
    oracle replays the K x n_buckets dense weight table, the add-1
    priors over K classes, exact decimal per-(doc,class) sums and the
    identical argmax — predicted labels, scores and feature counts all
    hash-match."""
    from commercepulse_data_pipeline_spark.operators import classifier as clf
    from commercepulse_data_pipeline_spark.operators.sampling import (
        hash_bucket,
        threshold_for,
    )

    d = _docs(spark, sf_dir)
    labeled = d.where(
        hash_bucket(F.col("doc_id"), salt="nbtrain-v1:") < threshold_for(0.5)
    ).select("doc_id", "text", F.col("lang").alias("label"))
    model = clf.nb_train_multiclass(labeled, n_buckets=256)
    return clf.nb_score_multiclass(d.select("doc_id", "text"), model, n_buckets=256)


_QUALITY_SWEEP_TAUS = [-5.0, -2.0, 0.0, 2.0, 5.0]


def q_docs_classifier_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--quality-threshold calibration (r15, the dup_threshold_sweep
    discipline): ONE aggregation pass over the NB scores computes every
    candidate threshold as a conditional sum, then a constant-size
    unpivot — the score table is never exploded |taus|×. Output: one
    row per tau with the surviving-doc count and keep rate."""
    from commercepulse_data_pipeline_spark.operators import classifier as clf
    from commercepulse_data_pipeline_spark.operators.sampling import (
        hash_bucket,
        threshold_for,
    )

    d = _docs(spark, sf_dir)
    is_train = hash_bucket(F.col("doc_id"), salt="nbtrain-v1:") < threshold_for(0.5)
    # ONE feature explode shared by train and score (r16, VERDICT r15
    # item 7 — nb_train_on_features): hashed features build once over
    # the FULL corpus (lazily pinned; the trainer's count aggregate
    # materializes it), the train half filters down by the same
    # deterministic md5 predicate, and scoring reuses the pinned frame —
    # tokenize+md5 runs 1.0× instead of 1.5× (train half + full score).
    # The pin is feature-occurrence-sized (two ints per token/bigram) —
    # the storage-for-CPU trade nb_train_on_features documents.
    feats = _pin(
        clf.hashed_features(
            d.select("doc_id", "lang", "text"),
            text_col="text", id_cols=["doc_id", "lang"], n_buckets=256,
        ),
        eager=False,
    )
    train_feats = feats.where(is_train).select(
        (F.col("lang") == "en").cast("int").alias("label"), "__b"
    )
    labeled = d.where(is_train).select(
        (F.col("lang") == "en").cast("int").alias("label")
    )
    model = clf.nb_train_on_features(train_feats, labeled, n_buckets=256)
    scored = clf.nb_score(
        d.select("doc_id"), model, n_buckets=256,
        feats=feats.select("doc_id", "__b"),
    )
    agg = scored.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.sum(F.when(F.col("nb_logodds") >= t, 1).otherwise(0))
            .cast("long")
            .alias(f"__k{i}")
            for i, t in enumerate(_QUALITY_SWEEP_TAUS)
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(t).alias("tau"),
                F.col(f"__k{i}").alias("n_kept"),
                F.round(F.col(f"__k{i}") / F.col("__n"), 4).alias("keep_rate"),
            )
            for i, t in enumerate(_QUALITY_SWEEP_TAUS)
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select(
        F.col("r.tau"), F.col("r.n_kept"), F.col("r.keep_rate")
    )


def q_docs_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation of the supervised classifier (r15): the
    confusion matrix of NB predictions vs true en-vs-rest labels on the
    md5 half the trainer NEVER saw — the eval harness a model-based
    quality gate ships with. Exact integer counts; the oracle replays
    train, score, the holdout split and the grouping."""
    from commercepulse_data_pipeline_spark.operators import classifier as clf
    from commercepulse_data_pipeline_spark.operators.sampling import (
        hash_bucket,
        threshold_for,
    )

    d = _docs(spark, sf_dir)
    thr = threshold_for(0.5)
    bucket = hash_bucket(F.col("doc_id"), salt="nbtrain-v1:")
    labeled = d.where(bucket < thr).select(
        "doc_id", "text", (F.col("lang") == "en").cast("int").alias("label")
    )
    model = clf.nb_train(labeled, n_buckets=256)
    holdout = d.where(bucket >= thr)
    scored = clf.nb_score(holdout.select("doc_id", "text"), model, n_buckets=256)
    return (
        scored.join(holdout.select("doc_id", "lang"), "doc_id")
        .select(
            F.when(F.col("lang") == "en", F.lit(1)).otherwise(F.lit(0))
            .cast("int").alias("actual"),
            F.col("predicted"),
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


_BM25_TERMS = ["dup", "spark", "merge", "window"]


def q_docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k retrieval over the corpus (r15 —
    operators/retrieval.py::bm25_topk, the targeted subset-mining
    primitive: pull the most query-relevant slice of a web-scale corpus
    for domain probes / seed expansion). Query mixes the corpus's one
    rare token ('dup', high idf) with common ones, so ranking exercises
    both idf extremes. Shuffle shape: map-only tf/dl pass, a 1-row
    broadcast stats aggregate, map-only scoring, TakeOrdered top-k — no
    wide exchange anywhere. The oracle replays the identical arithmetic
    (log2 idf quantized DECIMAL(30,6), fixed left-to-right term sum)."""
    from commercepulse_data_pipeline_spark.operators import retrieval as ret

    return ret.bm25_topk(_docs(spark, sf_dir), _BM25_TERMS, k=20)


def q_docs_passage_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level BM25 retrieval (r15): the RAG-store composition —
    chunk_documents (max_tokens=32, stride=16 sliding windows) in front
    of bm25_topk, so the hit is the best-matching PASSAGE, not the
    whole document. chunk_key = doc_id·1000 + chunk_idx gives the
    deterministic single-column tiebreak both engines order by (chunk
    counts are « 1000 at any doc length the tokenizer emits here). The
    oracle replays chunking (the docs_chunked integer arithmetic) and
    the BM25 chain end-to-end."""
    from commercepulse_data_pipeline_spark.operators import retrieval as ret

    chunks = tx.chunk_documents(
        _docs(spark, sf_dir), max_tokens=32, stride=16
    ).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_key"),
        "doc_id",
        "chunk_idx",
        "chunk_text",
    )
    return ret.bm25_topk(
        chunks,
        _BM25_TERMS,
        text_col="chunk_text",
        id_col="chunk_key",
        k=20,
        extra_cols=("doc_id", "chunk_idx"),
    )


def q_bm25_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 served from the PERSISTED inverted index (r15 —
    operators/retrieval.py::write_text_index/bm25_topk_indexed, the
    probe path a corpus-scale retrieval deployment amortizes toward):
    postings hive-partitioned by term_bucket, the query's buckets prune
    directories, term-isin pushes into row groups, df reduces from the
    probed postings only, and the per-doc sum is one candidate-sized
    shuffle with an ORDER-INDEPENDENT exact DECIMAL(30,10) accumulation
    (a grouped sum has no fixed order — the scan scorer's left-to-right
    double sum would not replay). Index build goes through the
    content-keyed cache (repeat calls, notably the bench's timed
    sweeps, measure serving). The oracle replays postings, probe-side
    dfs, and the exact decimal accumulation from the raw documents."""
    from commercepulse_data_pipeline_spark.operators import retrieval as ret

    def _build(build_dir: str) -> None:
        ret.write_text_index(_docs(spark, sf_dir), build_dir, n_buckets=64)

    path = _ann_index_cache(
        sf_dir, "textix", "b64", _build, src_table="documents"
    )
    return ret.bm25_topk_indexed(spark, path, _BM25_TERMS, k=20)


_PHRASE_TERMS = ["spark", "query"]


def q_docs_phrase_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase search from the POSITIONAL inverted index (r15 —
    operators/retrieval.py::phrase_topk over write_text_index(...,
    positions=True)): top docs by verbatim occurrences of the phrase —
    the precision companion to bag-of-words BM25 (quoted-query
    retrieval; contamination spot checks by exact string). Probe =
    bucket-pruned read of the phrase's terms; phrase count = a pure
    integer array fold over each doc's term->positions map, so the
    oracle replays counts exactly (DuckDB's 1-based (x, i) lambda index
    vs Spark's 0-based posexplode cancels out of ADJACENCY — only
    c+offset relations cross, never absolute positions)."""
    from commercepulse_data_pipeline_spark.operators import retrieval as ret

    def _build(build_dir: str) -> None:
        ret.write_text_index(
            _docs(spark, sf_dir), build_dir, n_buckets=64, positions=True
        )

    path = _ann_index_cache(
        sf_dir, "textix", "b64pos", _build, src_table="documents"
    )
    return ret.phrase_topk(spark, path, _PHRASE_TERMS, k=20)


def q_simhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SimHash near-dup detection (r11 — operators/dedup.py::
    simhash_pairs_between, the simhash sibling of minhash_incremental):
    every 10th doc plays the NEW ingest batch; the rest is the indexed
    corpus, whose entire index state is just (id, sig) — 8 bytes/doc.
    The batch's pigeonhole block keys broadcast as a semi-join filter, so
    per-ingest cost is O(batch) + a pruned index scan, never a corpus
    re-sign. Pigeonhole (threshold < blocks) makes the output exactly
    the cross-split hamming<=threshold pairs, so the oracle replays
    signatures on both splits and joins them."""
    d = _docs(spark, sf_dir)
    new = d.where(F.col("doc_id") % 10 == 0)
    old = d.where(F.col("doc_id") % 10 != 0)
    index_sigs = dd.simhash_table(old, "text", "doc_id")
    out = dd.simhash_pairs_between(
        new, index_sigs, "text", "doc_id",
        hamming_threshold=6, max_bucket=100000,
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


def _simhash_incremental_oracle_sql(hamming_threshold: int = 6) -> str:
    """DuckDB twin of q_simhash_incremental: the shared signature replay,
    then the old-split × new-split hamming join (pigeonhole makes the
    block-LSH output equal to the all-cross-pairs filter)."""
    return f"""
        WITH {_simhash_sigs_cte()}
        SELECT least(o.doc_id, n.doc_id) AS id_a,
               greatest(o.doc_id, n.doc_id) AS id_b,
               CAST(bit_count(xor(o.sig, n.sig)) AS BIGINT) AS hamming
        FROM sigs o JOIN sigs n
          ON o.doc_id % 10 <> 0 AND n.doc_id % 10 = 0
        WHERE bit_count(xor(o.sig, n.sig)) <= {hamming_threshold}
    """


def q_docs_lang_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language-ID heuristic. Oracle-checked: argmax via
    array_max(struct(score, lang)) ties deterministically on the
    lexicographically greatest language code — replicated in SQL."""
    d = _docs(spark, sf_dir)
    return tx.detect_language(d, "text").select("doc_id", "detected_lang", F.col("lang_score"))


def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based aggregates (rows-only: sketch outputs are
    estimator-specific by design): HyperLogLog++ distinct counts and
    t-digest quantiles. These are THE 100 TB shapes — mergeable partial
    sketches, map-side combine, no exact-distinct expand and no full sort;
    exact twins (`countDistinct`, `percentile`) are oracle-checked in
    `event_daily_stats` / `order_value_percentiles`."""
    e = _events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", [0.5, 0.95], 10000).alias("value_p50_p95"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "event_type", "approx_users",
        F.round(F.element_at("value_p50_p95", 1), 2).alias("p50"),
        F.round(F.element_at("value_p50_p95", 2), 2).alias("p95"),
        "n_events",
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end on real testdata: documents become
    opaque binary media rows (utf-8 bytes), decoded/featurized through the
    Arrow-batched mapInPandas path. This registered query uses the
    deterministic fake codec (rows-only: engine-specific by design, since
    the doc bytes aren't valid media containers); ``multimodal.real_decode``
    additionally decodes REAL bytes pure-Python — baseline JPEG (huffman +
    dequant + IDCT, added r7), PNG (zlib inflate + all-filter un-filter),
    BMP, PPM/P6, RIFF/PCM WAV — exercised distributed in
    tests/test_multimodal.py::test_real_decode_distributed. Codec-library
    formats (MP3/MP4) stay behind NotImplementedError."""
    from commercepulse_data_pipeline_spark import multimodal as mm

    d = _docs(spark, sf_dir)
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = d.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("media_id"),
        modality.alias("modality"),
        F.lit("application/octet-stream").alias("mime_type"),
        F.encode("text", "utf-8").alias("content"),
        F.length("text").cast("long").alias("n_bytes"),
    )
    feats = mm.extract_features(media)
    return feats.select(
        "media_id", "modality", "width", "height",
        F.round("duration_sec", 2).alias("duration_sec"),
    )


_FIXTURE_MODALITY = {
    "jpeg": "image", "png": "image", "gif": "video", "bmp": "image",
    "tiff": "image", "ppm": "image", "wav": "audio", "flac": "audio",
    "mp3": "audio", "mp4": "video", "ogg_vorbis": "audio",
    "ogg_opus": "audio", "webp": "image", "webp_anim": "video",
    "heic": "image", "avif": "image",
}


def q_media_features_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-decoder regression pin, oracle-backed: the checked-in fixture
    bytes (`fixtures/media/*.bin`, generated deterministically by
    `tools/make_media_fixtures.py` from the INDEPENDENT test-side
    encoders) flow through the distributed Arrow decode path
    (`multimodal.extract_features(decoder=real_decode)` — baseline JPEG,
    PNG, GIF LZW, BMP, TIFF, PPM, WAV, FLAC sample decode, MP3/MP4/Ogg
    metadata walks), and the STABLE extracted fields — dimensions,
    duration_ms, and a feature-vector pin (md5 over exact float32→int
    mantissa images, engine-independent arithmetic) — hash-check against
    a DuckDB literal table of the independently computed expected values.
    Converts the decode tier's former rows-only status into hard hash
    signal; `media_features` (deterministic fake codec over testdata
    bytes) remains the rows-only volume check."""
    import os

    from commercepulse_data_pipeline_spark import multimodal as mm

    fdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "media"
    )
    rows = []
    for fn in sorted(os.listdir(fdir)):
        if not fn.endswith(".bin"):
            continue
        name = fn[:-4]
        with open(os.path.join(fdir, fn), "rb") as f:
            rows.append((name, _FIXTURE_MODALITY[name], f.read()))
    media = spark.createDataFrame(
        rows, "media_id string, modality string, content binary"
    )
    feats = mm.extract_features(media, decoder=mm.real_decode)
    # float32 -> double widening is exact and *2^24 shifts the exponent
    # only, so the truncating long cast is bit-identical cross-engine
    pin = F.md5(
        F.array_join(
            F.transform(
                "feature",
                lambda x: (x.cast("double") * F.lit(16777216.0))
                .cast("long")
                .cast("string"),
            ),
            ",",
        )
    )
    return feats.select(
        "media_id",
        "modality",
        "width",
        "height",
        F.round(F.col("duration_sec") * 1000, 0).cast("long").alias(
            "duration_ms"
        ),
        pin.alias("feat_pin"),
    )


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set semantics (§2.8 — the reference only has
    isin membership): users who both purchased AND errored, minus users
    who signed up (present in all three → excluded once). Distinct set ops = aggregate-style shuffles, no joins
    written by hand."""
    e = _events(spark, sf_dir)
    big = F.col("value") > 200
    purchasers = e.where((F.col("event_type") == "purchase") & big).select("user_id")
    errorers = e.where((F.col("event_type") == "error") & big).select("user_id")
    signups = e.where((F.col("event_type") == "signup") & big).select("user_id")
    return purchasers.intersect(errorers).exceptAll(signups.distinct()).select("user_id")


def q_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide rollup): per-user event counts, one column per event
    type. Spark's pivot is a single groupBy with per-bucket conditional
    aggregates — same shuffle as the long form. Explicit value list so
    the plan needs no discovery pass (at 100 TB never let pivot infer
    values with an extra job)."""
    e = _events(spark, sf_dir)
    types = ["purchase", "view", "click", "error", "signup"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
    )


def q_unpivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long, `stack`): per-date metric rows from the
    daily stats — the inverse of pivot, a pure projection + generator
    (no shuffle beyond the source aggregation)."""
    daily = (
        _events(spark, sf_dir)
        .groupBy(_iso_date("ts").alias("event_date"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_events"),
            F.countDistinct("user_id").cast("double").alias("active_users"),
            _dsum(F.col("value")).alias("total_value"),
        )
    )
    return daily.selectExpr(
        "event_date",
        "stack(3, 'n_events', n_events, 'active_users', active_users, "
        "'total_value', total_value) AS (metric, metric_value)",
    )


def q_sql_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface (§2.9) flagship: TPC-H-Q5-shaped 6-table star join via
    ``spark.sql`` over registered temp views. Catalyst reorders the joins
    and broadcasts the small dims; the region filter prunes before the
    fact join (verify with .explain: dims under BroadcastExchange)."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
               count(DISTINCT o_orderkey) AS n_orders
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
        GROUP BY n_name
        """
    )


def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface (§2.9): CORRELATED scalar subqueries — orders priced
    above their own customer's average — decorrelated by Catalyst into
    one aggregate + equi-join (no per-row re-execution; check .explain:
    one Aggregate on o_custkey joined back). The comparison is written as
    price·count > decimal-sum, so every operand is exact decimal/integer
    arithmetic (a float avg would be partition-order-dependent at the
    boundary); the counted output has no float surface at all."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_above_avg,
               count(DISTINCT o_custkey) AS n_customers
        FROM orders o
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (
                  SELECT count(*) FROM orders o2
                  WHERE o2.o_custkey = o.o_custkey
              ) > (
                  SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                  FROM orders o2 WHERE o2.o_custkey = o.o_custkey
              )
        GROUP BY o_orderpriority
        """
    )


def q_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles of order value per priority class. Exact
    ``percentile`` here for oracle parity; at 100 TB the drop-in scale
    path is ``approx_percentile`` (t-digest sketch, mergeable map-side —
    no full sort of the group)."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_order_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB scale path of ``order_value_percentiles``: t-digest-style
    ``approx_percentile`` — a mergeable sketch built map-side, so no group
    ever needs its values co-located and fully sorted (the exact twin's
    per-group sort is the one declared scale-weak plan, VERDICT r5 item 2).

    Rows-only by design: the sketch's picks are engine-specific, so there
    is no bit-exact DuckDB twin; ``tests/test_approx_parity.py`` pins the
    approx values against the exact percentiles with a rank-error-derived
    tolerance instead. Cross-link: exact twin ``q_order_value_percentiles``.
    """
    o = _t(spark, sf_dir, "orders")
    pc = F.expr(
        "approx_percentile(o_totalprice, array(0.5D, 0.9D, 0.99D), 10000)"
    )
    return o.groupBy("o_orderpriority").agg(
        F.round(pc[0], 4).alias("p50"),
        F.round(pc[1], 4).alias("p90"),
        F.round(pc[2], 4).alias("p99"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def _sketch_percentile_checks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    names: list[str],
    extra_aggs: list = (),
    *,
    accuracy: int = 10000,
):
    """Shared envelope check for quantile sketches: per group, the
    ``approx_percentile`` value must lie between the exact order
    statistics at rank ``ceil(q·n) ± (ceil(n/accuracy) + 1)`` — the
    sketch's published rank-error guarantee (±n/accuracy) plus one rank of
    definition slack (ceil-vs-floor). Rank-based, so the verdict is
    distribution-proof AND quantile-definition-proof (a relative value
    band falsely fails on small groups where interpolated and discrete
    percentiles sit an order-stat gap apart — observed at sf0.001).

    The exact side is a per-group window sort — same cost as an exact
    percentile; this is a parity *check* query, not a production shape
    (the production shape is the sketch itself, `q_approx_stats`).

    Returns (aggregated_df, [ok_int_column ...] aliased per ``names``).
    """
    arr = "array(" + ", ".join(f"{q}D" for q in qs) + ")"
    w = Window.partitionBy(group_col).orderBy(value_col)
    wn = Window.partitionBy(group_col)
    d = (
        df.withColumn("__r", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wn))
    )
    n = F.col("__n").cast("long")
    delta = (F.ceil(n / F.lit(accuracy)) + F.lit(1)).cast("long")
    aggs = [
        F.expr(f"approx_percentile({value_col}, {arr}, {accuracy})").alias("__ap"),
    ]
    for i, q in enumerate(qs):
        k = F.ceil(F.lit(q) * n).cast("long")
        lo_k = F.greatest(k - delta, F.lit(1).cast("long"))
        hi_k = F.least(k + delta, n)
        aggs.append(
            F.min(F.when(F.col("__r") == lo_k, F.col(value_col))).alias(f"__lo{i}")
        )
        aggs.append(
            F.min(F.when(F.col("__r") == hi_k, F.col(value_col))).alias(f"__hi{i}")
        )
    agg = d.groupBy(group_col).agg(*aggs, *extra_aggs)
    oks = [
        (
            (F.element_at("__ap", i + 1) >= F.col(f"__lo{i}"))
            & (F.element_at("__ap", i + 1) <= F.col(f"__hi{i}"))
        )
        .cast("int")
        .alias(names[i])
        for i in range(len(qs))
    ]
    return agg, oks


def q_approx_stats_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable twin of ``q_approx_stats`` (VERDICT r6 item 2): the
    sketch outputs themselves are estimator-specific, but the *claim* that
    they sit within their error envelopes is a deterministic 0/1 —
    computed Spark-side against exact aggregates in the SAME aggregation,
    so the oracle (which asserts the envelope holds, plus the exact
    counts) hash-checks it. Envelopes: HLL++ at rsd=0.02 within 5
    standard errors (2-count floor, per ``tests/test_approx_parity.py``);
    quantile sketches via the rank-error bound in
    ``_sketch_percentile_checks``. Booleans are cast to int on both
    driver sides so the value-hash never depends on an engine's bool
    repr."""
    e = _events(spark, sf_dir)
    agg, oks = _sketch_percentile_checks(
        e,
        "event_type",
        "value",
        [0.5, 0.95],
        ["p50_ok", "p95_ok"],
        [
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        ],
    )
    users_tol = F.greatest(F.lit(5 * 0.02) * F.col("exact_users"), F.lit(2.0))
    return agg.select(
        "event_type",
        "n_events",
        "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= users_tol)
        .cast("int")
        .alias("users_ok"),
        *oks,
    )


def q_order_value_percentiles_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable twin of ``q_order_value_percentiles_approx`` (VERDICT
    r6 item 2): per-priority 0/1 verdicts that each sketch percentile sits
    within its rank-error envelope of the exact order statistics (see
    ``_sketch_percentile_checks``)."""
    o = _t(spark, sf_dir, "orders")
    agg, oks = _sketch_percentile_checks(
        o.select("o_orderpriority", "o_totalprice"),
        "o_orderpriority",
        "o_totalprice",
        [0.5, 0.9, 0.99],
        ["p50_ok", "p90_ok", "p99_ok"],
        [F.count(F.lit(1)).alias("n_orders")],
    )
    return agg.select("o_orderpriority", "n_orders", *oks)


def q_purge_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure end-to-end through the REAL purge path (VERDICT r6
    item 8): copy orders to a scratch dataset, run
    ``sources.readers.purge_keys`` (broadcast left-anti + rename-swap
    rewrite) on a deterministic key set (o_orderkey divisible by 97), then
    roll up what physically survived on disk. Oracle replays the anti-join
    as plain SQL. The 5-row result is collected so the scratch dir can be
    deleted before returning (bounded-small by construction)."""
    import os
    import shutil
    import tempfile

    from commercepulse_data_pipeline_spark.sources.readers import purge_keys

    scratch = tempfile.mkdtemp(prefix="cp_purge_audit_")
    path = os.path.join(scratch, "orders")
    try:
        o = _t(spark, sf_dir, "orders")
        o.write.mode("overwrite").parquet(path)
        keys = o.where(F.col("o_orderkey") % 97 == 0).select("o_orderkey")
        audit = purge_keys(spark, path, "o_orderkey", keys)
        out = (
            spark.read.parquet(path)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n_orders"),
                _dsum(F.col("o_totalprice")).alias("total_price"),
            )
            .withColumn("rows_removed", F.lit(audit["rows_removed"]).cast("long"))
        )
        rows = out.collect()
        # one_slice_df (r16): a defaultParallelism-sliced local frame costs
        # one Python-runner round trip per slice to evaluate; one slice
        # suffices for a bounded collected result
        return _one_slice_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def q_sketch_range_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup end-to-end (``operators/sketches.py`` —
    r7): build the per-(day, event_type) HLL sketch table in ONE pass
    over events, persist it to scratch, then answer a 15-day range
    distinct-users query per event type by union-merging the persisted
    day sketches — raw events are never re-scanned for the range query.
    The estimate is verified in the same result against the exact
    distinct over the range (HLL at lg_k=12 ⇒ rsd ≈ 1.04/√4096; 5σ
    envelope with a 2-count floor, emitted as 0/1 int), and ``n_rows``
    (the summed per-day counts) is hash-checked exactly. Bounded
    collects only: the min-day scalar and the ≤|event_types| result."""
    import datetime
    import os
    import shutil
    import tempfile

    from commercepulse_data_pipeline_spark.operators import sketches as sk

    e = _events(spark, sf_dir).select(
        _iso_date("ts").alias("day"), "event_type", "user_id"
    )
    scratch = tempfile.mkdtemp(prefix="cp_sketch_")
    path = os.path.join(scratch, "rollup")
    try:
        sk.write_sketch_rollup(
            e, path, day_col="day", group_cols=["event_type"], key_col="user_id"
        )
        d0 = datetime.date.fromisoformat(e.agg(F.min("day")).first()[0])
        start = (d0 + datetime.timedelta(days=7)).isoformat()
        end = (d0 + datetime.timedelta(days=21)).isoformat()
        est = sk.distinct_over_range(
            spark, path, start, end, group_cols=["event_type"]
        )
        exact = (
            e.where((F.col("day") >= start) & (F.col("day") <= end))
            .groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("exact_users"))
        )
        tol = F.greatest(F.lit(5 * 1.04 / 4096 ** 0.5) * F.col("exact_users"), F.lit(2.0))
        out = exact.join(est, "event_type").select(
            "event_type",
            "exact_users",
            "n_rows",
            (F.abs(F.col("distinct_estimate") - F.col("exact_users")) <= tol)
            .cast("int")
            .alias("est_ok"),
        )
        rows = out.collect()
        # one_slice_df (r16): a defaultParallelism-sliced local frame costs
        # one Python-runner round trip per slice to evaluate; one slice
        # suffices for a bounded collected result
        return _one_slice_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def q_bloom_range_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Bloom-filter membership rollup end-to-end
    (``operators/sketches.py::build_bloom_rollup`` — r8, the membership
    member of the mergeable-sketch family): build one sparse m=4096-bit,
    k=4 filter per day over active user_ids in ONE pass over events,
    persist it, then answer "how many days in this 10-day window was
    each candidate user (maybe) active" by probing ONLY the kilobyte
    filter table — raw events are never re-scanned for the probe. Bit
    positions are md5-derived (DECISIONS.md hash rule), so the filter,
    the probe, and the no-false-negative verdict all replay
    bit-identically in the DuckDB oracle; ``n_days_true`` (exact) is
    carried alongside so the Bloom guarantee ``maybe >= true`` is
    hash-checked per user, false positives and all. Bounded collects:
    the min-day scalar only."""
    import datetime
    import os
    import shutil
    import tempfile

    from commercepulse_data_pipeline_spark.operators import sketches as sk

    e = _events(spark, sf_dir).select(
        _iso_date("ts").alias("day"), "user_id"
    )
    scratch = tempfile.mkdtemp(prefix="cp_bloom_")
    path = os.path.join(scratch, "rollup")
    try:
        sk.write_bloom_rollup(
            e, path, shard_col="day", key_col="user_id", m_bits=4096, k=4
        )
        d0 = datetime.date.fromisoformat(e.agg(F.min("day")).first()[0])
        start = (d0 + datetime.timedelta(days=10)).isoformat()
        end = (d0 + datetime.timedelta(days=19)).isoformat()
        cands = e.select("user_id").where(F.col("user_id") % 5 == 0).distinct()
        maybe = sk.membership_over_range(
            spark, path, cands, start, end,
            shard_col="day", key_col="user_id", m_bits=4096, k=4,
        )
        truth = (
            e.where((F.col("day") >= start) & (F.col("day") <= end))
            .where(F.col("user_id") % 5 == 0)
            .groupBy("user_id")
            .agg(F.countDistinct("day").alias("n_days_true"))
        )
        out = maybe.join(truth, "user_id", "left").select(
            "user_id",
            F.col("n_shards_maybe").alias("n_days_maybe"),
            F.coalesce(F.col("n_days_true"), F.lit(0)).cast("long").alias(
                "n_days_true"
            ),
            (
                F.col("n_shards_maybe")
                >= F.coalesce(F.col("n_days_true"), F.lit(0))
            )
            .cast("int")
            .alias("no_false_neg"),
        )
        rows = out.collect()
        # one_slice_df (r16): a defaultParallelism-sliced local frame costs
        # one Python-runner round trip per slice to evaluate; one slice
        # suffices for a bounded collected result
        return _one_slice_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def q_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KMV/Theta sketch set operations end-to-end
    (``operators/sketches.py::build_kmv_rollup`` — r8, the set-operation
    member of the mergeable-sketch family): build one k=128 sketch per
    event_type over active user-DAY keys (``user_id || ':' || day`` — the
    audience-overlap grain) in ONE pass over events, persist it, then
    answer union/intersection/Jaccard for EVERY event-type pair from the
    kilobyte sketch table alone — raw events are never re-scanned for the
    set ops, which is the question HLL structurally cannot answer. Hashes
    are md5-derived (DECISIONS.md rule) and the estimator is two IEEE
    double divisions over exact integers, so n_kept/theta/n_matches AND
    the estimates replay bit-identically in the DuckDB oracle; exact
    union/intersection ride along with 5σ envelope verdicts
    (rsd ≈ 1/√(k-2)) as 0/1 ints. Bounded collects: the ≤ C(|types|,2)
    result only."""
    import os
    import shutil
    import tempfile

    from commercepulse_data_pipeline_spark.operators import sketches as sk

    k = 128
    e = _events(spark, sf_dir).select(
        "event_type",
        F.concat(
            F.col("user_id").cast("string"), F.lit(":"), _iso_date("ts")
        ).alias("ukey"),
    ).where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    scratch = tempfile.mkdtemp(prefix="cp_kmv_")
    path = os.path.join(scratch, "rollup")
    try:
        sk.write_kmv_rollup(e, path, set_col="event_type", key_col="ukey", k=k)
        est = sk.kmv_set_overlap(spark, path, set_col="event_type", k=k)
        ud = e.distinct()
        a = ud.select(F.col("event_type").alias("set_a"), "ukey")
        b = ud.select(F.col("event_type").alias("set_b"), "ukey")
        inter = (
            a.join(b, "ukey")
            .where(F.col("set_a") < F.col("set_b"))
            .groupBy("set_a", "set_b")
            .agg(F.count(F.lit(1)).alias("exact_inter"))
        )
        sizes = ud.groupBy("event_type").agg(F.count(F.lit(1)).alias("sz"))
        exact = (
            inter.join(
                sizes.select(F.col("event_type").alias("set_a"), F.col("sz").alias("sz_a")),
                "set_a",
            )
            .join(
                sizes.select(F.col("event_type").alias("set_b"), F.col("sz").alias("sz_b")),
                "set_b",
            )
            .select(
                "set_a",
                "set_b",
                (F.col("sz_a") + F.col("sz_b") - F.col("exact_inter")).alias(
                    "exact_union"
                ),
                "exact_inter",
            )
        )
        # 5σ envelopes: union rsd = 1/sqrt(k-2); the intersection adds the
        # binomial matches/k term (<= 0.5/sqrt(k)) scaled by the union
        u_tol = 5.0 / (k - 2) ** 0.5
        i_tol = u_tol + 2.5 / k ** 0.5
        out = est.join(exact, ["set_a", "set_b"]).select(
            "set_a",
            "set_b",
            "n_kept",
            "theta",
            "n_matches",
            "union_est",
            "inter_est",
            "exact_union",
            "exact_inter",
            (
                F.abs(F.col("union_est") - F.col("exact_union"))
                <= F.lit(u_tol) * F.col("exact_union") + F.lit(2.0)
            )
            .cast("int")
            .alias("union_ok"),
            (
                F.abs(F.col("inter_est") - F.col("exact_inter"))
                <= F.lit(i_tol) * F.col("exact_union") + F.lit(2.0)
            )
            .cast("int")
            .alias("inter_ok"),
        )
        rows = out.collect()
        # one_slice_df (r16): a defaultParallelism-sliced local frame costs
        # one Python-runner round trip per slice to evaluate; one slice
        # suffices for a bounded collected result
        return _one_slice_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable Misra–Gries frequent-items rollup end-to-end
    (``operators/sketches.py`` — r7): build one bounded per-source token
    summary (capacity 16) in a single pass, persist it, then answer the
    corpus-wide heavy-hitter question by ADDING the per-source summaries
    — raw text is never re-scanned for the merge. Returns every token
    whose exact corpus count exceeds the merged error bound
    ``total_offset`` (the MG guarantee says each must be present in the
    merged summary) with its exact count, merged estimate, bound, and
    envelope verdict ``est <= exact <= est + total_offset`` as 0/1.
    Because the leaf summaries are deterministic functions of exact
    per-shard counts (boundary ties drop by VALUE), every column — the
    estimates included — replays bit-identically in the DuckDB oracle.
    Bounded collect: heavy hitters only (<= vocabulary size)."""
    import os
    import shutil
    import tempfile

    from commercepulse_data_pipeline_spark.operators import sketches as sk

    toks = _docs(spark, sf_dir).select(
        "source", F.explode(tx.tokens(F.col("text"))).alias("token")
    )
    scratch = tempfile.mkdtemp(prefix="cp_mg_")
    path = os.path.join(scratch, "mg")
    try:
        sk.write_mg_rollup(
            toks, path, shard_col="source", item_col="token", capacity=16
        )
        hh = sk.heavy_hitters_over_shards(
            spark, path, shard_col="source", item_col="token"
        )
        exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
        out = (
            exact.join(hh, "token")
            .where(F.col("exact_n") > F.col("total_offset"))
            .select(
                "token",
                "exact_n",
                "est",
                "total_offset",
                (
                    (F.col("est") <= F.col("exact_n"))
                    & (F.col("exact_n") <= F.col("est") + F.col("total_offset"))
                )
                .cast("int")
                .alias("envelope_ok"),
            )
            .orderBy(F.desc("exact_n"), "token")
        )
        rows = out.collect()
        # one_slice_df (r16): a defaultParallelism-sliced local frame costs
        # one Python-runner round trip per slice to evaluate; one slice
        # suffices for a bounded collected result
        return _one_slice_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def q_order_value_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log₂-histogram quantile rollup end-to-end
    (``operators/sketches.py`` — r8, the quantile member of the
    mergeable-sketch triad next to the HLL and Misra–Gries rollups):
    build one bounded HDR-style histogram per (day, priority) over order
    value in DECIMAL-exact cents, persist, then answer p50/p90/p99 per
    priority over a 15-day o_orderdate range by SUMMING the persisted
    per-day bucket counts — raw orders are never re-scanned for the
    range query. Binning is pure integer arithmetic (msb via base-2
    digit count, shifts, exact rational ranks), so the ESTIMATES
    themselves — not just an envelope — replay bit-identically in the
    DuckDB oracle; the exact inverted-CDF quantile and the guaranteed
    relative-error verdict (|est − exact| ≤ 2^(shift−1), i.e. rel err ≤
    2⁻⁷ at sub_bits=6) ride along as hash-checked columns. Bounded
    collects: the min-day scalar and the 15-row result."""
    import datetime
    import os
    import shutil
    import tempfile

    from commercepulse_data_pipeline_spark.operators import sketches as sk

    probs = [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority"),
        _iso_date(F.col("o_orderdate").cast("timestamp")).alias("day"),
        (F.col("o_totalprice").cast("decimal(30,8)") * 100)
        .cast("long")
        .alias("cents"),
    )
    scratch = tempfile.mkdtemp(prefix="cp_hist_")
    path = os.path.join(scratch, "rollup")
    try:
        sk.write_hist_rollup(
            o, path, "cents", shard_col="day", group_cols=["o_orderpriority"]
        )
        d0 = datetime.date.fromisoformat(o.agg(F.min("day")).first()[0])
        start = (d0 + datetime.timedelta(days=7)).isoformat()
        end = (d0 + datetime.timedelta(days=21)).isoformat()
        est = sk.hist_quantiles_over_range(
            spark, path, start, end, probs,
            shard_col="day", group_cols=["o_orderpriority"],
        )
        in_range = o.where((F.col("day") >= start) & (F.col("day") <= end))
        w = Window.partitionBy("o_orderpriority").orderBy(F.col("cents").asc())
        wt = Window.partitionBy("o_orderpriority")
        probs_arr = F.array(
            *[
                F.struct(
                    F.lit(lbl).alias("q_label"),
                    F.lit(n).alias("num"),
                    F.lit(d).alias("den"),
                )
                for lbl, n, d in probs
            ]
        )
        exact = (
            in_range.withColumn("rn", F.row_number().over(w))
            .withColumn("total", F.count(F.lit(1)).over(wt))
            .select("o_orderpriority", "cents", "rn", "total",
                    F.explode(probs_arr).alias("q"))
            .where(F.expr("rn = (q.num * total + q.den - 1) div q.den"))
            .select(
                "o_orderpriority",
                F.col("q.q_label").alias("q_label"),
                F.col("cents").alias("exact_cents"),
            )
        )
        out = (
            est.join(exact, ["o_orderpriority", "q_label"])
            .withColumn(
                "__shift",
                F.greatest(
                    F.length(F.conv(F.col("est"), 10, 2)) - F.lit(7), F.lit(0)
                ),
            )
            .select(
                "o_orderpriority",
                "q_label",
                F.col("est").alias("est_cents"),
                "exact_cents",
                F.col("n_total").alias("n_orders"),
                (
                    F.abs(F.col("est") - F.col("exact_cents"))
                    <= F.when(
                        F.col("__shift") > 0,
                        F.expr("shiftleft(1L, __shift - 1)"),
                    ).otherwise(F.lit(0).cast("long"))
                )
                .cast("int")
                .alias("within_bound"),
            )
        )
        rows = out.collect()
        # one_slice_df (r16): a defaultParallelism-sliced local frame costs
        # one Python-runner round trip per slice to evaluate; one slice
        # suffices for a bounded collected result
        return _one_slice_df(spark, rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer-training round-0 statistics (``operators/bpe.py``):
    adjacent character-pair counts (with the ``</w>`` end-of-word marker)
    weighted by word frequency, top-30 by (count desc, a, b) — the argmax
    of this table is the first learned merge. The iterative trainer and
    the Arrow-batched encoder built on the same convention are
    pytest-verified against an independent pure-Python reference
    (tests/test_bpe.py); this query hash-pins the distributed statistics
    layer both of them stand on.

    Scale shape: ONE corpus scan → word-freq table (Heaps-law small) →
    pair explode → map-side-combined count → takeOrdered top-30."""
    from commercepulse_data_pipeline_spark.operators.bpe import pair_counts

    d = _docs(spark, sf_dir)
    return (
        pair_counts(d)
        .orderBy(F.col("n_pairs").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(30)
    )


def q_docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted per-source sampling (``operators/sampling.py::
    weighted_sample_per_group``): exactly 15 docs per source, sampled
    with odds ~proportional to token count — the "prefer substantive
    docs, reproducibly" curation step (uniform twin:
    ``docs_per_lang_sample``). Priority is the integer-exact u/w variant
    of the Efraimidis–Spirakis key, so the DuckDB oracle replays the
    ranking bit-for-bit (no ln/pow ulp skew).

    Scale shape: one shuffle on source; WindowGroupLimit pushes rank<=k
    map-side, so a dominant source ships ~k rows per map task."""
    from commercepulse_data_pipeline_spark.operators.sampling import (
        weighted_sample_per_group,
    )

    d = _docs(spark, sf_dir)
    weighted = d.select(
        "doc_id",
        "source",
        F.coalesce(F.size(tx.tokens(F.col("text"))), F.lit(0)).alias("n_tokens"),
    )
    return weighted_sample_per_group(
        weighted, "source", "doc_id", "n_tokens", k=15, salt="wsample-v1:"
    )


def q_docs_length_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source length-decile profile via the ranking-window surface not
    exercised elsewhere (ntile / percent_rank / cume_dist): rank docs
    inside each source by (n_chars, doc_id) — a total order, so every
    window verdict is deterministic — then summarize each decile. The
    distribution-profiling step a curation pipeline runs before choosing
    length-filter thresholds.

    percent_rank/cume_dist are exact-integer ratios ((rank-1)/(n-1),
    rows_le/n), so the doubles are correctly-rounded identical across
    engines — safe to hash after round().

    Scale shape: the window is PARTITIONED by source (no global sort).
    For a corpus dominated by one giant source, swap the per-row window
    for the histogram two-pass — now shipped as
    operators/sampling.py::score_bands_histogram (r12) — at driver scale
    the partitioned window is the simpler correct plan."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    ranked = d.select(
        "source",
        "n_chars",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    return ranked.groupBy("source", "decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.max("pr"), 6).alias("max_pct_rank"),
        F.round(F.max("cd"), 6).alias("max_cume_dist"),
    )


def q_fx_normalized_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Currency normalization through the backward as-of rate lookup
    (``plans.gold.normalize_currency`` — the Q7 fix; reference ships
    data/fx_rates_2023.csv but never reads it, SURVEY §1.4). The sparse
    FX table is DERIVED deterministically from the orders table itself
    (rates published only on days where day-of-month % 7 == 1, value a
    pure function of the date), so both engines construct the identical
    input; gap days forward-fill from the latest earlier rate.

    Scale shape (see normalize_currency docstring): the tiny rate table
    densifies onto a calendar driver-side-bounded by two scalar aggs,
    then BROADCASTS — the 100 TB fact side never shuffles."""
    from commercepulse_data_pipeline_spark.plans.gold import normalize_currency

    o = _t(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    rates = (
        o.select(od.alias("fx_date"))
        .where(F.dayofmonth("fx_date") % 7 == 1)
        .distinct()
        .withColumn(
            "usd_ngn", F.lit(1500.0) + (F.dayofyear("fx_date") % 50).cast("double")
        )
    )
    facts = o.withColumn(
        "currency", F.when(F.col("o_orderkey") % 3 == 0, "USD").otherwise("NGN")
    )
    norm = normalize_currency(
        facts, rates, amount_col="o_totalprice", date_col="o_orderdate"
    )
    return norm.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice_ngn")).alias("revenue_ngn"),
        F.count("fx_rate_applied").alias("usd_with_rate"),
        _davg(F.col("fx_rate_applied")).alias("avg_usd_rate"),
    )


def q_last_touch_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed backward as-of join (``operators.joins.asof_join``): last-touch
    attribution — each purchase event takes the most recent click/view by
    the same user at-or-before it (the reference has no as-of operator;
    its late-arrival check is a plain equi-join, SURVEY §2.6).

    Scale shape: union + forward-fill window — both sides shuffle ONCE on
    user_id, one ordered sweep per partition, no (purchase × candidate)
    intermediate. Right side pre-deduped to one row per (user_id, ts)
    (max event_id) so the as-of pick is deterministic in both engines."""
    from commercepulse_data_pipeline_spark.operators.joins import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    touches = (
        ev.where(F.col("event_type").isin("click", "view"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("ts").alias("touch_ts"),
            F.col("event_type").alias("touch_type"),
        )
    )
    attributed = asof_join(
        purchases, touches, ["user_id"], "ts", "ts",
        value_cols=["touch_ts", "touch_type"],
    )
    mins = (F.unix_micros("ts") - F.unix_micros("touch_ts")) / F.lit(60000000.0)
    return attributed.groupBy(
        F.coalesce("touch_type", F.lit("none")).alias("attributed_touch")
    ).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        _dsum(F.col("value")).alias("total_value"),
        _davg(mins).alias("avg_mins_to_purchase"),
    )


def q_incident_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned range join (``operators.joins.range_join``): global
    point-in-interval attribution with NO equi key — each error event opens
    a 10-minute incident window and collects the purchases landing inside
    it. The reference has no range operator (nearest: same-day equi-join,
    src/transformer.py:140).

    Scale shape: a keyless ``BETWEEN`` join is a nested-loop O(points ×
    intervals) plan in Spark; ``range_join`` bins both sides at the window
    width (600 s → each interval explodes to ≤2 bins) so the pairing is a
    plain sort-merge equi-join on bin + residual filter. Incidents with
    zero purchases survive via the final broadcast-left-join (incident
    list is small relative to the event stream)."""
    from commercepulse_data_pipeline_spark.operators.joins import range_join

    ev = _events(spark, sf_dir)
    inc = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("inc_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("inc_end"),
    )
    pur = ev.where(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"), F.col("value")
    )
    pairs = range_join(pur, inc, "p_ts", "inc_start", "inc_end", bin_seconds=600)
    per_inc = pairs.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        _dsum(F.col("value")).alias("purchase_value"),
    )
    return inc.select("incident_id").join(per_inc, "incident_id", "left").select(
        "incident_id",
        F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        F.coalesce("purchase_value", F.lit(0.0)).alias("purchase_value"),
    )


def q_incident_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned interval-overlap self-join (``operators.joins.overlap_join``):
    for each 10-minute incident window, how many OTHER incidents were open
    at any point during it — the alert-storm / blast-radius metric. Keyless
    interval×interval overlap, the shape Spark would otherwise plan as a
    nested-loop self-join.

    Scale shape: both interval sets bin at the window width; a pair is
    emitted only in the bin containing its overlap's start, so the
    self-join is one sort-merge equi-join on bin with no dedup pass.
    Incidents with zero concurrency survive via the final left join."""
    from commercepulse_data_pipeline_spark.operators.joins import overlap_join

    ev = _events(spark, sf_dir)
    inc = ev.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("e"),
    )
    other = inc.select(
        F.col("incident_id").alias("other_id"),
        F.col("s").alias("os"),
        F.col("e").alias("oe"),
    )
    pairs = overlap_join(inc, other, "s", "e", "os", "oe", bin_seconds=600).where(
        F.col("incident_id") != F.col("other_id")
    )
    per_inc = pairs.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_concurrent")
    )
    return inc.select("incident_id").join(per_inc, "incident_id", "left").select(
        "incident_id", F.coalesce("n_concurrent", F.lit(0)).alias("n_concurrent")
    )


def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history + point-in-time view (``plans.scd.scd2_history`` /
    ``as_of``): the event log becomes type-2 version rows (valid_from /
    valid_to / is_current, one window pass, one shuffle on the key), then
    the ``as_of`` slice counts versions in effect at a fixed instant.
    Emulates the reference's Mongo row-level upsert history on plain
    parquet (K1, SURVEY §2.2)."""
    from commercepulse_data_pipeline_spark.plans.scd import as_of, scd2_history

    ev = _events(spark, sf_dir)
    # ties on (user_id, ts) would make lead() nondeterministic — keep the
    # max event_id per instant (same guard in the oracle)
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    ded = ev.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")
    # hist feeds two branches (full-history agg + the as_of slice) —
    # pin it so the scan + dedup + lead window run once, not per branch
    hist = scd2_history(ded, ["user_id"], "ts").localCheckpoint(eager=False)
    t0 = "2024-01-15 00:00:00"
    hours = (F.unix_micros("valid_to") - F.unix_micros("valid_from")) / F.lit(
        3600000000.0
    )
    full = hist.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_versions"),
        F.sum(F.when(F.col("is_current"), 1).otherwise(0)).cast("long").alias("n_current"),
        _davg(hours).alias("avg_version_hours"),
    )
    at_t = as_of(hist, t0).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_valid_at_t")
    )
    return (
        full.join(at_t, "event_type", "left")
        .withColumn("n_valid_at_t", F.coalesce("n_valid_at_t", F.lit(0)))
        .select("event_type", "n_versions", "n_current", "n_valid_at_t",
                "avg_version_hours")
    )


def q_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: revenue by (year, month) + yearly subtotals +
    grand total in ONE pass — Spark expands grouping sets map-side, so the
    three aggregation levels share a single shuffle instead of three jobs."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.col("o_totalprice"),
    )
    return base.rollup("order_year", "order_month").agg(
        _dsum(F.col("o_totalprice")).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets: all four aggregation levels of
    (priority, year) — per-cell, per-priority, per-year, grand total —
    in one pass / one shuffle (same machinery as ROLLUP with the full
    power set)."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        "o_orderpriority",
        F.year("o_orderdate").alias("order_year"),
        F.col("o_totalprice"),
    )
    return base.cube("o_orderpriority", "order_year").agg(
        _dsum(F.col("o_totalprice")).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_month_over_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytics window: monthly revenue with previous-month delta.
    The window partitions by nothing but operates on the (tiny) monthly
    rollup — the wide input is reduced BEFORE the global sort."""
    o = _t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(_dsum(F.col("o_totalprice")).alias("revenue"))
    w = Window.orderBy("order_month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "order_month",
        "revenue",
        F.round(prev, 2).alias("prev_revenue"),
        F.when(prev > 0, F.round((F.col("revenue") - prev) / prev, 6)).alias("mom_change"),
    )


def q_docs_shared_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shared passages (containment/plagiarism primitive):
    rolling 8-token fingerprints → explode → groupBy fingerprint → keep
    fingerprints seen in ≥2 distinct docs. One uniform hash-key shuffle."""
    d = _docs(spark, sf_dir)
    fps = (
        d.select(
            "doc_id",
            F.explode_outer(tx.rolling_fingerprints(F.col("text"), 8)).alias("fp"),
        )
        .where(F.col("fp").isNotNull())
        .dropDuplicates(["doc_id", "fp"])
    )
    return (
        fps.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= 2)
    )


def q_docs_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup CORRECTION (operators/text.py::dedup_passages
    — the Lee et al. 2022 pass): documents are REWRITTEN with every
    non-canonical occurrence of a cross-doc duplicated 8-token passage
    spliced out; the md5 of each rewritten text hash-checks the whole
    splice. The detection twin is ``docs_shared_passages``; this acts on
    what that query reports. Reference has detection-only shape (quirk Q9
    family) — capability extension, full DuckDB replay as the oracle."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    out = tx.dedup_passages(d, window_tokens=8, min_docs=2)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_tokens_removed",
        "n_dup_windows",
        F.md5("text_deduped").alias("dedup_md5"),
    )


def q_docs_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source template/boilerplate removal (operators/text.py::
    strip_boilerplate — the CCNet-style correction pass): an 8-token
    passage recurring in >= 2 distinct docs of the SAME source is
    template chrome and is spliced from EVERY occurrence (no canonical
    survivor — template text is not content anywhere), while the same
    passage shared across different sources is preserved (a quotation is
    not boilerplate). Complements docs_passage_dedup, whose global
    counts + keep-one semantics serve dedup rather than template
    removal. The md5 of each rewritten text hash-checks the splice."""
    d = _docs(spark, sf_dir).select("doc_id", "source", "text")
    out = tx.strip_boilerplate(d, window_tokens=8, min_docs=2)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_tokens_removed",
        "n_boiler_windows",
        F.md5("text_stripped").alias("stripped_md5"),
    )


def q_docs_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (operators/sampling.py::dsir_importance —
    Xie et al. 2023): every document scored by the log-likelihood ratio
    of its hashed unigram+bigram features under bag models of the TARGET
    (here: the corpus's own English split, the 'look like the
    high-resource language' selector) vs the raw corpus; the top-100 by
    (weight desc, doc_id) are flagged selected. The oracle replays the
    md5 feature hashing, add-1 bucket models, decimal(30,4)-quantized
    log2 ratios and the exact decimal sums, so the WEIGHTS hash-check,
    not just the selection."""
    from commercepulse_data_pipeline_spark.operators.sampling import (
        dsir_importance,
    )

    d = _docs(spark, sf_dir)
    # scored feeds BOTH the top-k branch and the final join; without a
    # lineage cut the whole two-model scoring pipeline (two explodes +
    # model join + per-doc sum) executes twice — Spark shares no subplans
    # across DataFrame branches (r15 optimization pass: 3.0s -> ~2.1s at
    # sf0.1). Lazy checkpoint: the top-k job materializes it, the join
    # then reads the cached rows.
    scored = dsir_importance(
        d.select("doc_id", "text"),
        d.where(F.col("lang") == "en").select("text"),
        n_buckets=256,
    ).localCheckpoint(eager=False)
    topk = (
        scored.orderBy(F.col("dsir_logratio").desc(), F.col("doc_id").asc())
        .limit(100)
        .select("doc_id", F.lit(1).alias("__sel"))
    )
    return scored.join(F.broadcast(topk), "doc_id", "left").select(
        "doc_id",
        "n_feats",
        "dsir_logratio",
        F.coalesce(F.col("__sel"), F.lit(0)).alias("selected"),
    )


def q_embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining (operators/similarity.py::
    hard_negatives): for each query vector the top-5 corpus neighbors by
    cosine INSIDE the band [0.05, 0.25) — confusable but safely below the
    near-duplicate cut, the negatives an embedding model actually learns
    from (mining too-close negatives poisons training with mislabeled
    positives). Band and rank operate on the 6-dp ROUNDED score so the
    oracle replays the selection bit-for-bit. The query set is a FIXED
    10 ids (the operator's small-query-side broadcast contract): work
    scales linearly with the corpus, not with corpus × queries."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < 10)
    out = sim.hard_negatives(e, q, k=5, sim_lo=0.05, sim_hi=0.25)
    return out.select(
        "query_id",
        "neighbor_id",
        "cosine_sim",
        F.col("rank").cast("long").alias("rank"),
    )


def q_merge_upsert_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE emulation (plans/scd.py::merge_upsert — the reference's
    Mongo row-level upsert K1 on plain parquet): a derived update batch
    (every 7th order re-priced +10%, duplicated per-batch with a later
    sequence so last-writer-wins must pick the right copy) merges into the
    orders table; the query aggregates the post-merge state so the whole
    anti-join + union + LWW result is hash-checked. Oracle replays the
    same two-branch union in SQL."""
    from commercepulse_data_pipeline_spark.plans.scd import merge_upsert

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice",
        F.lit(0).alias("seq"),
    )
    upd1 = (
        o.where(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("P").alias("o_orderstatus"),
            (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
            F.lit(1).alias("seq"),
        )
    )
    # second copy of every other update with a LATER seq and a different
    # price — merge_upsert's within-batch LWW must keep exactly this one
    upd2 = (
        upd1.where(F.col("o_orderkey") % 14 == 0)
        .select(
            "o_orderkey",
            F.lit("F").alias("o_orderstatus"),
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            F.lit(2).alias("seq"),
        )
    )
    merged = merge_upsert(o, upd1.unionByName(upd2), ["o_orderkey"], "seq")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _dsum(F.col("o_totalprice")).alias("total_price"),
        F.sum((F.col("seq") > 0).cast("long")).alias("n_updated"),
    )


def q_salted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-tooling correctness on the driver scoreboard: the two-phase
    ``operators/skew.py::salted_agg`` (content-hash salt → partial
    aggregate per (key, salt) → merge) must equal the PLAIN group-by —
    so its oracle IS the plain SQL aggregate. Decimal partials keep the
    sum order-independent across the extra phase."""
    from commercepulse_data_pipeline_spark.operators.skew import salted_agg

    l = _t(spark, sf_dir, "lineitem")
    staged = l.select(
        "l_returnflag",
        F.col("l_quantity"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(30,8)")
        .alias("__rev"),
    )
    out = salted_agg(
        staged,
        ["l_returnflag"],
        {
            "revenue_dec": ("__rev", F.sum, F.sum),
            "n_items": ("l_quantity", F.count, F.sum),
            "max_qty": ("l_quantity", F.max, F.max),
        },
        salt_buckets=16,
        salt_cols=["l_quantity", "__rev"],
    )
    return out.select(
        "l_returnflag",
        F.round(F.col("revenue_dec"), 2).cast("double").alias("revenue"),
        "n_items",
        "max_qty",
    )


def q_corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-MIXING planner: given per-source mixture weights (derived
    deterministically from the source name so both engines agree), compute
    the largest total token budget T whose per-source demand T*frac stays
    within each source's available tokens, and the per-source sampling
    rate that realizes it — the table a trainer feeds into
    ``deterministic_sample`` per source. The binding (scarcest-relative)
    source gets rate 1.0; everything else downsamples.

    Scale shape: one map-side-combined rollup per source (the token count
    is the only corpus-sized pass), then two 1-row aggregates combined by
    broadcast cross joins (plans/quality.py pattern) — the plan is
    O(corpus scan) + driver-trivial arithmetic, no shuffle beyond the
    20-row source rollup."""
    d = _docs(spark, sf_dir)
    per = (
        d.select("source", F.size(tx.tokens(F.col("text"))).alias("__t"))
        .groupBy("source")
        .agg(F.sum("__t").alias("available_tokens"))
        # the source-count-sized rollup feeds three branches (W, T, and
        # the final projection) — pin it so the CORPUS pass runs once
        .localCheckpoint(eager=False)
    )
    weight = (
        F.regexp_replace("source", "^src", "").cast("int") % 4 + 1
    ).cast("double")
    w = per.withColumn("weight", weight)
    tot = w.agg(F.sum("weight").alias("__W"))
    fr = w.crossJoin(F.broadcast(tot)).withColumn(
        "target_fraction", F.col("weight") / F.col("__W")
    )
    tmax = fr.agg(
        F.min(F.col("available_tokens") / F.col("target_fraction")).alias("__T")
    )
    out = fr.crossJoin(F.broadcast(tmax))
    demand = F.col("__T") * F.col("target_fraction")
    return out.select(
        "source",
        "available_tokens",
        F.round("target_fraction", 6).alias("target_fraction"),
        F.round(demand / F.col("available_tokens"), 6).alias("sampling_rate"),
        F.round(demand, 2).alias("target_tokens"),
    )


def q_docs_mixture_applied(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing plan APPLIED (the acting sibling of
    ``corpus_mixture_plan``, same detect→act symmetry as the r9 dedup/
    decontamination correction passes): the per-source sampling rates the
    planner derives are executed as deterministic md5-bucket sampling
    (``operators/sampling.py::hash_bucket``, threshold =
    floor(rate·2³²) — an integer both engines compute from the identical
    IEEE rate), and the result is the realized per-source mixture:
    docs/tokens kept and the realized rate vs the plan's target. The
    binding (rate-1.0) source keeps everything; the rest downsample to
    the planned token budget. Scale shape: one rollup pass for the plan +
    one sampling pass (map-only after a broadcast plan join)."""
    from commercepulse_data_pipeline_spark.operators.sampling import hash_bucket

    d = _docs(spark, sf_dir)
    per = (
        d.select("source", F.size(tx.tokens(F.col("text"))).alias("__t"))
        .groupBy("source")
        .agg(F.sum("__t").alias("available_tokens"))
        .localCheckpoint(eager=False)
    )
    weight = (
        F.regexp_replace("source", "^src", "").cast("int") % 4 + 1
    ).cast("double")
    w = per.withColumn("weight", weight)
    tot = w.agg(F.sum("weight").alias("__W"))
    fr = w.crossJoin(F.broadcast(tot)).withColumn(
        "frac", F.col("weight") / F.col("__W")
    )
    tmax = fr.agg(
        F.min(F.col("available_tokens") / F.col("frac")).alias("__T")
    )
    # UNROUNDED rate, same operation order as the planner / its oracle:
    # (T * frac) / available
    plan = fr.crossJoin(F.broadcast(tmax)).select(
        "source",
        "available_tokens",
        F.floor(
            (F.col("__T") * F.col("frac")) / F.col("available_tokens")
            * F.lit(4294967296.0)
        ).cast("long").alias("__thr"),
    )
    docs = d.select(
        "source", "doc_id", F.size(tx.tokens(F.col("text"))).alias("__t")
    )
    kept = docs.join(F.broadcast(plan), "source").where(
        hash_bucket(F.col("doc_id"), "mixture-v1:") < F.col("__thr")
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("__t").cast("long").alias("tokens_kept"),
        F.max("available_tokens").alias("available_tokens"),
        F.round(
            F.sum("__t") / F.max("available_tokens").cast("double"), 6
        ).alias("realized_rate"),
    )


def q_docs_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multilingual α=0.5 temperature rebalancing (operators/sampling.py::
    temperature_mixture — the mBERT/XLM-R exponentiated-smoothing
    recipe): keep ~half the corpus with per-language counts rebalanced
    toward sqrt(n_lang), boosting low-resource languages. α is fixed at
    0.5 because IEEE requires sqrt to be correctly rounded — the weights
    (and the floor(rate·2³²) thresholds) are bit-identical across
    engines, where a general pow would wobble by 1 ulp. The oracle
    replays the counts, decimal weight sum, pinned-order rate arithmetic
    and every bucket verdict."""
    from commercepulse_data_pipeline_spark.operators.sampling import (
        temperature_mixture,
    )

    d = _docs(spark, sf_dir)
    kept = temperature_mixture(
        d.select("lang", "doc_id"), "lang", "doc_id", target_frac=0.5
    )
    totals = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        kept.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .join(totals, "lang")
        .select(
            "lang",
            "n_docs",
            "n_kept",
            F.round(
                F.col("n_kept") / F.col("n_docs").cast("double"), 6
            ).alias("realized_rate"),
        )
    )


def q_docs_hashed_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick document vectors (operators/text.py::
    hashed_doc_vectors — feature hashing, Weinberger et al. 2009):
    model-free 64-dim L2-normalized token-bucket vectors that plug the
    documents table into the whole vector stack (cosine/kNN/semantic
    dedup/IVF/PQ) when no trained embedding exists. The oracle replays
    bucketing, counts, the dense build, the ordered norm fold and every
    component (pinned as round(x·10⁶) integer mantissas), so the VECTORS
    hash-check component-for-component."""
    d = _docs(spark, sf_dir)
    out = tx.hashed_doc_vectors(d, dim=64)
    return out.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("norm"), 6).alias("norm_r"),
        F.md5(
            F.array_join(
                F.transform(
                    F.col("vector"),
                    lambda x: F.round(x * 1000000.0, 0).cast("long").cast("string"),
                ),
                ",",
            )
        ).alias("vec_md5"),
    )


def q_docs_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-weighted hashing-trick vectors (hashed_doc_vectors with
    weighting="tfidf"): bucket counts scaled by a smoothed bucket-level
    idf quantized to DECIMAL(30,6) — the content-over-stopword form the
    semantic-dedup compositions should feed on. The oracle replays the
    df table, the quantized ln() factor and every weighted component
    (round(x·10⁶) integer mantissas)."""
    d = _docs(spark, sf_dir)
    out = tx.hashed_doc_vectors(d, dim=64, weighting="tfidf")
    return out.select(
        "doc_id",
        "n_tokens",
        F.round(F.col("norm"), 6).alias("norm_r"),
        F.md5(
            F.array_join(
                F.transform(
                    F.col("vector"),
                    lambda x: F.round(x * 1000000.0, 0).cast("long").cast("string"),
                ),
                ",",
            )
        ).alias("vec_md5"),
    )


def q_docs_unigram_ce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (operators/text.py::
    unigram_cross_entropy): per-doc bits-per-token under the corpus's own
    add-1 unigram LM — low = fluent/corpus-typical, high = rare-word soup.
    One token explode feeds both the LM build and the scoring join; the
    oracle replays the identical integer-ratio probabilities."""
    d = _docs(spark, sf_dir)
    return tx.unigram_cross_entropy(d, "text", "doc_id")


def q_docs_ce_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail banding (operators/sampling.py::score_bands,
    Wenzek et al. 2020 §4.3): per-LANGUAGE perplexity bands over the
    corpus's own unigram LM score — the selection CCNet runs before
    keeping head+middle. The window partitions by lang (exactly how
    CCNet applies it), so no global sort; the (bits_per_token, doc_id)
    order is total, so every ntile verdict is deterministic and the
    oracle replays band labels exactly."""
    from commercepulse_data_pipeline_spark.operators.sampling import score_bands

    d = _docs(spark, sf_dir)
    ce = tx.unigram_cross_entropy(d, "text", "doc_id")
    scored = ce.join(d.select("doc_id", "lang"), "doc_id")
    return score_bands(scored, "bits_per_token", partition_col="lang").select(
        "doc_id", "lang", "bits_per_token", "band"
    )


def q_docs_ce_bands_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL perplexity banding via the histogram two-pass
    (operators/sampling.py::score_bands_histogram) — the 100 TB-safe form
    the per-partition ntile cannot give for one giant group: the corpus
    reduces to a distinct-score histogram (kilobytes — scores are
    4dp-quantized), the band thresholds are exact integer arithmetic
    over the histogram's cumulative counts, and the score→band map
    broadcast-joins back. Ties share a band by construction. The oracle
    replays the identical histogram, cumulative window, and integer
    floor-division."""
    from commercepulse_data_pipeline_spark.operators.sampling import (
        score_bands_histogram,
    )

    d = _docs(spark, sf_dir)
    ce = tx.unigram_cross_entropy(d, "text", "doc_id")
    return score_bands_histogram(ce, "bits_per_token").select(
        "doc_id", "bits_per_token", "band"
    )


def q_bitext_margin_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (operators/similarity.py::
    margin_knn_join, Artetxe & Schwenk 2019 ratio margin): even vec_ids
    play the source language, odd the target; each source's best target
    is kept by MARGIN — cosine relative to both sides' neighborhood
    averages, the hubness-suppressing criterion raw cosine lacks. The
    oracle replays both kNN directions from one symmetric similarity
    CTE and the same exact-decimal margin arithmetic; margins
    hash-check, not just the matched ids."""
    e = _t(spark, sf_dir, "embeddings")
    src = e.where(F.col("vec_id") % 2 == 0)
    tgt = e.where(F.col("vec_id") % 2 == 1)
    return sim.margin_knn_join(src, tgt, k=4).where(F.col("margin_rank") == 1)


def q_docs_bigram_ce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-2 LM quality scoring (operators/text.py::bigram_cross_entropy):
    per-doc bits-per-bigram under the corpus's add-1 bigram LM — the
    word-ORDER fluency signal the unigram bag cannot see (CCNet/KenLM
    filtering at bigram order). One bigram explode feeds LM build and
    scoring; the oracle replays the identical integer-ratio
    probabilities with the decimal(30,4) quantization discipline."""
    d = _docs(spark, sf_dir)
    return tx.bigram_cross_entropy(d, "text", "doc_id")


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval DECONTAMINATION report: does any val/test document share
    an 8-token passage fingerprint with the training split? Audits the
    SAME deterministic split assignment `docs_split_manifest` ships
    (operators/sampling.py::assign_splits, salt 'split-v1:'), using the
    same rolling fingerprints as `docs_shared_passages` — the leak report
    a training pipeline runs before an eval set is trusted.

    Scale shape: fingerprints explode once; the train-side fingerprint
    set reduces to DISTINCT hashes (uniform shuffle), and eval
    fingerprints LEFT-SEMI join it on the hash — no doc×doc pair space,
    no broadcast of anything corpus-sized. Output: one row per
    contaminated eval split."""
    from commercepulse_data_pipeline_spark.operators.sampling import assign_splits

    d = _docs(spark, sf_dir)
    labeled = assign_splits(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split-v1:"
    )
    fps = (
        labeled.select(
            "doc_id",
            "split",
            F.explode_outer(tx.rolling_fingerprints(F.col("text"), 8)).alias("fp"),
        )
        .where(F.col("fp").isNotNull())
        .dropDuplicates(["doc_id", "fp"])
        # fps feeds the train-side distinct AND the eval-side probe;
        # uncut, the fingerprint explode + dedup shuffle executed twice
        # (r15 optimization pass). Eager: both consumers meet in the one
        # semi-join job, so a lazy pin could still race the lineage.
        .localCheckpoint(eager=True)
    )
    train_fps = fps.where(F.col("split") == "train").select("fp").distinct()
    leaks = fps.where(F.col("split") != "train").join(train_fps, "fp", "left_semi")
    counts = labeled.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        leaks.groupBy("split")
        .agg(
            F.countDistinct("doc_id").alias("n_contaminated_docs"),
            F.countDistinct("fp").alias("n_leaked_fingerprints"),
        )
        .join(counts, "split")
        .select(
            "split",
            "n_docs",
            "n_contaminated_docs",
            "n_leaked_fingerprints",
            F.round(
                F.col("n_contaminated_docs") / F.col("n_docs").cast("double"), 4
            ).alias("contamination_rate"),
        )
    )


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation per source: whitespace tokens vs BPE-ish
    sub-word tokens (boundary-split regex) — the corpus-sizing query run
    before a training job. Pure codegen'd projections + one tiny rollup."""
    d = _docs(spark, sf_dir)
    staged = d.select(
        "source",
        F.size(tx.tokens(F.col("text"))).alias("ws_tokens"),
        F.size(tx.bpe_ish_tokens(F.col("text"))).alias("bpe_tokens"),
        F.length("text").alias("n_chars_raw"),
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws_tokens").alias("total_ws_tokens"),
        F.sum("bpe_tokens").alias("total_bpe_tokens"),
        F.sum("n_chars_raw").alias("total_chars"),
        F.round(F.sum("bpe_tokens") / F.sum("ws_tokens"), 4).alias("bpe_per_word"),
    )


def q_docs_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test manifest (r11 — operators/sampling.py::
    assign_splits_grouped): the split bucket is computed on the NEAR-DUP
    CLUSTER key (MinHash pair graph → connected components, the
    docs_dup_clusters table), so two near-duplicates can never straddle
    train and test — the eval-contamination mode a per-row split cannot
    close (Lee et al. 2022). Docs outside any cluster are singleton
    groups keyed on their own id; the partition stays disjoint and
    exhaustive. The oracle replays the banding + recursive-CTE hull +
    the identical hex-digit bucket arithmetic on the coalesced key.
    CC input is the star-edge form (see q_docs_dup_clusters —
    components identical, linear in bucket occupancy)."""
    from commercepulse_data_pipeline_spark.operators import graph
    from commercepulse_data_pipeline_spark.operators.sampling import (
        assign_splits_grouped,
    )

    d = _docs(spark, sf_dir)
    edges = dd.minhash_star_edges(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )
    clusters = graph.dedup_clusters(edges).select("doc_id", "cluster_id")
    return assign_splits_grouped(
        d.select("doc_id"),
        "doc_id",
        clusters,
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="clustersplit-v1:",
    )


def _cluster_safe_split_oracle_sql() -> str:
    """DuckDB twin of q_docs_cluster_safe_split: the shared MinHash
    banding CTE + recursive transitive hull (the docs_dup_clusters
    replay), LEFT JOIN back to the corpus, bucket on
    COALESCE(component, own id) with the split-manifest thresholds."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    bucket = _sample_bucket_sql("split_key", "clustersplit-v1:")
    t_test = threshold_for(0.1)
    t_train = t_test + threshold_for(0.8)
    return f"""
        WITH RECURSIVE {_MINHASH_PAIRS_CTE},
        edges AS (
            SELECT id_a AS u, id_b AS v FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs
        ),
        reach(node, m) AS (
            SELECT u, u FROM edges
            UNION
            SELECT e.u, r.m FROM edges e JOIN reach r ON r.node = e.v
        ),
        cc AS (SELECT node, min(m) AS component FROM reach GROUP BY node),
        keyed AS (
            SELECT d.doc_id,
                   COALESCE(CAST(cc.component AS VARCHAR),
                            CAST(d.doc_id AS VARCHAR)) AS split_key
            FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
        )
        SELECT doc_id, split_key, CASE
            WHEN {bucket} < {t_test} THEN 'test'
            WHEN {bucket} < {t_train} THEN 'train'
            ELSE 'val' END AS split
        FROM keyed
    """


def q_corpus_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source crawl-novelty report (r11): for an ARRIVING batch
    (every 10th doc, the minhash_incremental split), how much of it is
    near-duplicate of the already-indexed corpus — the dashboard number
    a continuous-crawl pipeline watches to decide whether a source is
    still yielding new data ("dedup rate" in the Common-Crawl-curation
    sense), plus the genuinely novel token mass the batch contributes.
    Composition of the incremental-dedup primitives: index side banded
    once (operators/dedup.py::minhash_bands), arriving side probed via
    minhash_pairs_between (O(batch) against the persisted-index shape),
    then one groupBy(source). The oracle replays the banding join and
    the per-source aggregate."""
    d = _docs(spark, sf_dir)
    new = d.where(F.col("doc_id") % 10 == 0)
    old = d.where(F.col("doc_id") % 10 != 0)
    idx_bands = dd.minhash_bands(
        old, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3
    )
    pairs = dd.minhash_pairs_between(
        new, idx_bands, "text", "doc_id",
        num_hashes=8, bands=4, shingle_n=3, max_bucket=100000,
    ).localCheckpoint(eager=True)
    # ^ pairs feeds both union branches of dup_ids INSIDE one job, so a
    # lazy cut would still compute the banding+probe lineage twice on the
    # only run; eager materializes once (r15 optimization pass — the
    # uncut plan scanned documents 9×).
    dup_ids = (
        pairs.selectExpr("id_a AS doc_id")
        .union(pairs.selectExpr("id_b AS doc_id"))
        .join(new.select("doc_id"), "doc_id", "left_semi")
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    flagged = new.join(dup_ids, "doc_id", "left").withColumn(
        "__tok",
        F.when(
            F.col("text").isNotNull(), F.size(tx.tokens(F.col("text")))
        ).otherwise(F.lit(0)),
    )
    return flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_arriving"),
        F.sum(F.when(F.col("__dup") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_vs_index"),
        F.round(
            F.sum(F.when(F.col("__dup") == 1, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("dup_rate"),
        F.sum(F.when(F.col("__dup").isNull(), F.col("__tok")).otherwise(0))
        .cast("long")
        .alias("novel_tokens"),
    )


def _corpus_novelty_oracle_sql() -> str:
    """DuckDB twin of q_corpus_novelty: the shared banding CTE, the
    old×new band-collision join (the minhash_incremental replay), a
    left join marking arriving dups, one per-source aggregate."""
    return f"""
        WITH {_MINHASH_PAIRS_CTE},
        dups AS (
            SELECT DISTINCT n.doc_id
            FROM bands o
            JOIN bands n
              ON o.band_id = n.band_id AND o.band_key = n.band_key
            WHERE o.doc_id % 10 <> 0 AND n.doc_id % 10 = 0
        ),
        arriving AS (
            SELECT d.doc_id, d.source,
                   coalesce(len({_TOKS}), 0) AS n_tok,
                   CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_dup
            FROM documents d LEFT JOIN dups dup USING (doc_id)
            WHERE d.doc_id % 10 = 0
        )
        SELECT source,
               count(*) AS n_arriving,
               CAST(sum(is_dup) AS BIGINT) AS n_dup_vs_index,
               round(sum(is_dup) / CAST(count(*) AS DOUBLE), 6) AS dup_rate,
               CAST(sum(CASE WHEN is_dup = 0 THEN n_tok ELSE 0 END) AS BIGINT)
                   AS novel_tokens
        FROM arriving GROUP BY source
    """


def q_docs_derepeated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repeated-span removal (r11 — operators/text.py::
    strip_intradoc_repeats): the acting complement to the Gopher
    repetition SCORES (docs_repetition flags; this rewrites) — a window
    repeating inside one doc keeps its first occurrence, later
    occurrences splice out through the shared splice_covered_tokens
    arithmetic. window_tokens=3 here (operator default is 8): the
    synthetic docs are short, and 3-token windows give the oracle live
    splice coverage (27 docs with repeats at sf0.01) instead of a
    trivially-empty rewrite. The md5 of each rewritten text hash-checks
    the whole splice."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    out = tx.strip_intradoc_repeats(d, window_tokens=3, min_repeats=2)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_tokens_removed",
        "n_repeat_windows",
        F.md5("text_derepeated").alias("derep_md5"),
    )


def _derepeated_oracle_sql() -> str:
    """DuckDB twin of q_docs_derepeated: per-(doc, fp) window counts with
    min-pos survivor, the same coverage-splice as the passage-dedup
    oracle at window 3."""
    w = 3
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        occ AS (
            SELECT doc_id, i - 1 AS pos,
                   md5(array_to_string(toks[i:i+{w - 1}], ' ')) AS fp
            FROM t, unnest(range(1, greatest(len(toks) - {w - 1}, 0) + 1)) AS u(i)
        ),
        stats AS (
            SELECT doc_id, fp, count(*) AS n_occ, min(pos) AS first_pos
            FROM occ GROUP BY doc_id, fp
        ),
        dups AS (
            SELECT o.doc_id, o.pos
            FROM occ o JOIN stats s ON o.doc_id = s.doc_id AND o.fp = s.fp
            WHERE s.n_occ >= 2 AND o.pos <> s.first_pos
        ),
        dup_lists AS (
            SELECT doc_id, list_sort(list(DISTINCT pos)) AS dup_pos
            FROM dups GROUP BY doc_id
        ),
        spliced AS (
            SELECT t.doc_id, t.toks,
                   coalesce(d.dup_pos, []) AS dp,
                   list_filter(
                       list_transform(
                           range(1, len(t.toks) + 1),
                           i -> CASE WHEN len(list_filter(
                                         coalesce(d.dup_pos, []),
                                         p -> p <= i - 1 AND i - 1 < p + {w}
                                     )) = 0
                                THEN t.toks[i] END
                       ),
                       x -> x IS NOT NULL
                   ) AS kept
            FROM t LEFT JOIN dup_lists d USING (doc_id)
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(toks) - len(kept) AS n_tokens_removed,
               len(dp) AS n_repeat_windows,
               md5(coalesce(array_to_string(kept, ' '), '')) AS derep_md5
        FROM spliced
    """


def q_embedding_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding outlier mining (r11 — operators/similarity.py::
    label_centroid_outliers): the 3 vectors farthest (squared L2) from
    their own label's centroid — the curation pass that surfaces
    mislabeled/junk samples in a labeled corpus. Centroids are per-(label,
    dim) DECIMAL means (partition-order-free, the ivf_assign discipline)
    broadcast back for one scoring scan; ranking is on the 6-dp rounded
    distance with id tiebreak, so the oracle replays means, the
    sequential-fold distance and the window bit-for-bit."""
    e = _t(spark, sf_dir, "embeddings")
    return sim.label_centroid_outliers(e, top_n=3)


def _label_outliers_oracle_sql() -> str:
    """DuckDB twin of q_embedding_label_outliers: per-(label, dim)
    decimal means -> double centroids, list_sum squared-distance fold
    (the same IEEE left fold as _sq_dist), rank on the rounded distance
    desc with vec_id tiebreak."""
    dim = 64
    return f"""
        WITH dims AS (
            SELECT label, d.d,
                   CAST(CAST(embedding[d.d] AS DOUBLE) AS DECIMAL(30,15)) AS v
            FROM embeddings CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS d) d
        ),
        cm AS (
            SELECT label, d, CAST(sum(v) AS DOUBLE) / count(*) AS m
            FROM dims GROUP BY label, d
        ),
        cent AS (SELECT label, list(m ORDER BY d ASC) AS cvec FROM cm GROUP BY label),
        scored AS (
            SELECT e.label, e.vec_id,
                   round(list_sum(list_transform(range(1, {dim + 1}),
                       i -> (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i])
                            * (CAST(e.embedding[i] AS DOUBLE) - c.cvec[i]))), 6)
                       AS centroid_d2
            FROM embeddings e JOIN cent c USING (label)
        ),
        ranked AS (
            SELECT label, vec_id, centroid_d2,
                   row_number() OVER (
                       PARTITION BY label
                       ORDER BY centroid_d2 DESC, vec_id ASC) AS rank
            FROM scored
        )
        SELECT label, vec_id, centroid_d2, rank FROM ranked WHERE rank <= 3
    """


# ---------------------------------------------------------------------------
# Driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_daily_revenue(spark, "/root/testdata/sf0.001")


def q_dup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup savings (operators/graph.py::
    dedup_savings_by_source): MinHash pair graph -> CC clusters -> one
    row per ingest source with n_docs / n_clustered / n_dropped /
    dup_frac — the report that names which source feeds the corpus
    mirrors. Consumes the same cluster table the histogram does (and, in
    production, the write_cluster_table artifact — ONE materialized CC
    run fans out to every report); here self-contained by driver
    contract. CC input is the star-edge form (see q_docs_dup_clusters —
    components identical, linear in bucket occupancy). The oracle
    replays the recursive-CTE hull + the same left-join aggregate."""
    from commercepulse_data_pipeline_spark.operators import graph

    d = _docs(spark, sf_dir)
    edges = dd.minhash_star_edges(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )
    clusters = graph.dedup_clusters(edges)
    return graph.dedup_savings_by_source(clusters, d, "source").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_clustered").cast("long").alias("n_clustered"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        "dup_frac",
    )


def q_dup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confirm-threshold calibration (operators/similarity.py::
    pair_threshold_sweep): the MinHash candidates are scored once with
    exact pairwise embedding cosine (score_pairs), then ONE aggregation
    pass reports, per candidate tau, how many pairs the semantic gate
    would confirm — the table that picks clean-corpus --confirm-tau
    without re-scoring runs. Output is len(thresholds) rows at any
    corpus size. The oracle replays the identical scored-pair CTE and
    per-tau conditional counts."""
    d = _docs(spark, sf_dir)
    pairs = dd.minhash_candidate_pairs(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )
    emb = _t(spark, sf_dir, "embeddings")
    scored = sim.score_pairs(pairs, emb)
    return sim.pair_threshold_sweep(scored, (0.80, 0.85, 0.90, 0.95))


def q_dup_pair_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-detection matrix (operators/dedup.py::pair_group_matrix):
    every MinHash candidate pair classified by the unordered pair of
    sources its docs come from — heavy off-diagonal cells are two
    sources re-hosting the same content, heavy diagonal cells are one
    source re-ingesting itself. Two id-keyed joins over the bucket-capped
    candidate list, then a (#sources)^2-bounded aggregate. The oracle
    replays the pair CTE + the same least/greatest cell arithmetic."""
    d = _docs(spark, sf_dir)
    pairs = dd.minhash_candidate_pairs(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    )
    return dd.pair_group_matrix(pairs, d, "source")


def q_docs_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (operators/text.py::cdc_chunks — the
    Rabin/FastCDC idea over tokens): chunk boundaries fall where the
    md5-bucket of the 2-token window hits 0 mod 16, so boundaries depend
    only on local content and chunk hashes survive upstream insertions —
    the shift-robust granularity for chunk-level dedup of re-crawled
    pages (fixed windows shift; CDC re-synchronizes). One posexplode +
    one doc-keyed window cumsum + one (doc, chunk) aggregate. The oracle
    replays the same hex-digit boundary hash, cumulative window and
    order-safe chunk reassembly."""
    d = _docs(spark, sf_dir)
    return tx.cdc_chunks(d, "text", "doc_id", gram=2, divisor=16).select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_pos").cast("long").alias("start_pos"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "chunk_md5",
    )


def q_docs_cdc_dup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup over content-defined chunks: CDC chunk hashes
    shared by >= 2 docs, with occurrence counts and the canonical (min
    doc_id, min start_pos) occurrence — what chunk-level storage dedup /
    re-crawl reconciliation acts on. Because boundaries are
    content-defined, a re-crawled page with one edited paragraph still
    collides on every other chunk — the fixed-window form would miss all
    of them past the edit. One groupBy on chunk_md5 over the cdc_chunks
    output; emitted cells are duplicate chunks only (corpus-sublinear)."""
    d = _docs(spark, sf_dir)
    ch = tx.cdc_chunks(d, "text", "doc_id", gram=2, divisor=16)
    return (
        ch.groupBy("chunk_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.sum("n_tokens").alias("total_tokens"),
            # lexicographic (doc_id, start_pos) min as ONE exact integer
            # key (start_pos < 2^32 tokens/doc, doc_id < 2^31): replays
            # identically in any engine, unlike struct-min; decomposition
            # uses INTEGER division (div / //) — a double round-trip
            # would lose exactness past 2^53 for replica-offset ids
            # the pack is guarded: a doc_id >= 2^31 would silently wrap
            # the 64-bit long in non-ANSI Spark, so out-of-range ids
            # fail loudly instead of producing a wrong canonical id
            F.min(
                F.when(
                    (F.col("doc_id") >= F.lit(2147483648))
                    | (F.col("doc_id") < 0),
                    F.raise_error(
                        F.lit("doc_id out of packable range [0, 2^31)")
                    ).cast("long"),
                ).otherwise(
                    F.col("doc_id") * F.lit(4294967296) + F.col("start_pos")
                )
            ).alias("__c"),
        )
        .where(F.col("n_docs") >= 2)
        .select(
            "chunk_md5",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("total_tokens").cast("long").alias("total_tokens"),
            F.expr("__c div 4294967296").alias("canonical_doc_id"),
            (F.col("__c") % 4294967296).cast("long").alias("canonical_start_pos"),
        )
    )


def q_dup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental cluster maintenance (operators/graph.py::
    merge_cluster_update): every 10th doc plays the NEW ingest batch —
    the established cluster table folds the batch's pairs in WITHOUT
    re-running CC over the corpus (affected clusters via two semi-joins;
    the iterative CC sees only the batch-proportional affected subgraph,
    star edges keeping old clusters diameter <= 2). The oracle is the
    FROM-SCRATCH recursive-CTE membership over all pairs: hash equality
    IS the incremental-exactness claim (fold == rebuild, bit for bit)."""
    from commercepulse_data_pipeline_spark.operators import graph

    d = _docs(spark, sf_dir)
    # one materialization: the edge table feeds BOTH sides of the split
    # below, and its lineage is the full banding build. CC consumes STAR
    # edges (member→bucket-min, r16) instead of the |bucket|²/2 pair
    # explosion; equivalence of the FOLD under any old/new edge split:
    # merge_cluster_update(CC(old_edges), new_edges) = CC(old ∪ new) for
    # ANY partition of an edge set (untouched clusters share no endpoint
    # with new_edges, so they are exact in CC(old ∪ new); affected ones
    # re-run over connectivity-preserving star replacements ∪ new), and
    # CC(all star edges) = CC(all pairs) because a bucket's star spans
    # exactly its clique's vertex set — so the fold's output is
    # row-identical to the pair form's, which the from-scratch oracle
    # hash-confirms. Batch membership stays a pure predicate, so the
    # split is two map-only filters — no joins, no exceptAll shuffle.
    edges_all = dd.minhash_star_edges(
        d, "text", "doc_id", num_hashes=8, bands=4, shingle_n=3, max_bucket=100000
    ).localCheckpoint(eager=False)
    is_new_a, is_new_b = F.col("id_a") % 10 == 0, F.col("id_b") % 10 == 0
    old_edges = edges_all.where(~is_new_a & ~is_new_b)
    new_edges = edges_all.where(is_new_a | is_new_b)
    established = graph.dedup_clusters(old_edges)
    return graph.merge_cluster_update(established, new_edges).select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
    )


def q_dup_blocker_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocker recall measurement (operators/dedup.py::
    blocker_recall_report): on a deterministic half-sample of the corpus,
    exact n-gram Jaccard >= 0.5 is the ground truth and the 8-hash/4-band
    MinHash blocker is the candidate generator — the one-row report says
    what fraction of truly-similar pairs the banding actually surfaces
    (the S-curve gives the theory; this measures the corpus). The recall
    companion to dup_threshold_sweep's precision calibration. The oracle
    replays the same md5-bucket sample, exact posting-list Jaccard,
    banding, and the semi-join count."""
    d = _docs(spark, sf_dir)
    return dd.blocker_recall_report(
        d, "text", "doc_id",
        sample_rate=0.5, salt="recall-v1:", tau=0.5,
        shingle_n=3, num_hashes=8, bands=4, max_bucket=100000,
    )


def q_docs_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing gate (operators/text.py::code_detect): three
    regex-count signals — code-punctuation density, indented-line
    fraction, terminator-line fraction — vote is_code per doc; a mixed
    web corpus routes flagged docs to a code-specific pipeline (different
    tokenizer, dedup granularity, quality filters). One map-only
    codegen'd projection on simple character classes, so the RE2-based
    oracle replays every count bit-for-bit."""
    d = _docs(spark, sf_dir)
    return tx.code_detect(d, "text", "doc_id").select(
        "doc_id",
        "symbol_ratio",
        "indent_frac",
        "term_frac",
        F.col("is_code").cast("int").cast("long").alias("is_code"),
    )


def q_docs_winnow_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (operators/text.py::winnow_fingerprints —
    Schleimer et al. 2003, the MOSS algorithm): per doc, the rightmost
    minimum of each 4-window of 3-gram hashes, distinct — a fingerprint
    set carrying the guarantee that any shared run of >= w+k-1 = 6
    tokens between two docs shares a fingerprint, at ~2/(w+1) the
    density of keeping every gram. Pure per-row fold, no shuffle; the
    oracle replays the selection as a row_number pick over the exploded
    window space (min hash, rightmost tie)."""
    d = _docs(spark, sf_dir)
    return tx.winnow_fingerprints(d, "text", "doc_id", k=3, w=4).select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("fp").cast("long").alias("fp"),
    )


def q_docs_winnow_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style match report (operators/text.py::winnow_match_pairs):
    doc pairs ranked by shared winnowing-fingerprint count — every
    shared run >= w+k-1 = 6 tokens contributes evidence by the winnowing
    guarantee. Inverted-index shape: capped posting list per fp hash,
    pair expansion inside the aggregation, one pair-keyed count (caps
    effectively disabled at oracle SF, same discipline as
    ngram_jaccard). The oracle replays the fingerprint CTE and the
    distinct-fp self-join count."""
    d = _docs(spark, sf_dir)
    return tx.winnow_match_pairs(
        d, "text", "doc_id", k=3, w=4, min_shared=2, max_posting=100000
    ).select(
        "id_a", "id_b", F.col("n_shared").cast("long").alias("n_shared")
    )


def q_image_ahash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image perceptual-hash regression pin, oracle-backed
    (multimodal.image_ahash — r13; JPEG wired in r14): the checked-in
    raster-decodable fixtures (24-bit BMP, PPM P6, 8-bit truecolor PNG,
    palette GIF, and — r14 — baseline 4:2:0 JPEG, the dominant web-crawl
    format) flow through the Arrow-batched aHash+dHash path (dHash:
    horizontal gradient signs over an 8x9 grid — brightness/contrast-
    shift invariant); pins were computed by an INDEPENDENT pure-Python
    walk over the decoded rasters (the media_features_check
    discipline). The JPEG fixture's raster additionally cross-checks
    against the ENCODER-SOURCE exact luma (max |delta| = 1 gray level
    across all 128 pixels — the encoder in tests/test_multimodal.py is
    independent of the decoder), so the pin is anchored to ground truth,
    not just decoder replay; progressive JPEG stays a rejected err row.
    The hash feeds the text Hamming machinery unchanged:
    dedup.sig_hamming_pairs(sig_col='ahash') is image near-dup dedup."""
    import os

    from commercepulse_data_pipeline_spark import multimodal as mm

    fdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "fixtures", "media"
    )
    rows = []
    for name in ("bmp", "png", "ppm", "gif", "jpeg"):
        with open(os.path.join(fdir, f"{name}.bin"), "rb") as f:
            rows.append((name, f.read()))
    media = spark.createDataFrame(rows, "media_id string, content binary")
    out = mm.image_ahash(media)
    return out.select(
        "media_id",
        "ahash",
        "dhash",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("ahash").isNotNull().cast("long").alias("decodable"),
    )


def q_video_neardup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video near-dup regression pin, oracle-backed (r14 —
    multimodal.video_frame_hashes + video_neardup_pairs): the checked-in
    clip fixtures (fixtures/media/clips/*.bin, deterministic animated
    GIFs from tools/make_media_fixtures.py --clips) flow through the
    Arrow-batched per-frame decode+hash path, the signature-agnostic
    Hamming pair core (dedup.sig_hamming_pairs over (video, frame)
    keys), and the video-level containment aggregation. The oracle pins
    were computed by a PURE-PYTHON replay of the contract over the
    construction-parameter rasters (palette lookup + integer luma +
    independent aHash walk — no decoder, no Spark): the palette-shifted
    re-encode pairs with every frame matched (min_hamming 0 — aHash is
    mean-relative, so a global +6 brightness shift is invisible), the
    3-frame excerpt pairs by CONTAINMENT (its frac is 1.0, the full
    clip's 0.5), and the unrelated clip produces no row (the generator
    aborts if that separation ever breaks)."""
    import os

    from commercepulse_data_pipeline_spark import multimodal as mm

    cdir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures", "media", "clips",
    )
    rows = []
    for fn in sorted(os.listdir(cdir)):
        if fn.endswith(".bin"):
            with open(os.path.join(cdir, fn), "rb") as f:
                rows.append((fn[:-4], f.read()))
    media = spark.createDataFrame(rows, "media_id string, content binary")
    frames = mm.video_frame_hashes(media, max_frames=16)
    return mm.video_neardup_pairs(
        frames, hamming_threshold=4, min_match_frac=0.5
    ).select(
        "id_a", "id_b",
        F.col("n_frames_a").cast("long").alias("n_frames_a"),
        F.col("n_frames_b").cast("long").alias("n_frames_b"),
        "n_matched_a", "n_matched_b", "frac_a", "frac_b", "min_hamming",
    )


def q_audio_hash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup regression pin, oracle-backed (r14 —
    multimodal.audio_pcm_mono + audio_ehash64 + audio_hash): the
    checked-in audio fixtures (fixtures/media/audio/*.bin, deterministic
    integer waveforms from tools/make_media_fixtures.py --audio) flow
    through the Arrow-batched PCM-decode + energy-envelope-hash path.
    Pins from an INDEPENDENT pure-python walk over the CONSTRUCTION
    SAMPLES (no decoder involved); the generator aborts unless the
    lossless WAV->FLAC re-encode and the exact-2x gain copy pin
    IDENTICAL hashes (losslessness + the hash's exact gain invariance —
    the properties the tier exists for) and the unrelated waveform stays
    far. The mp3 row is the documented lossy-codec boundary: metadata
    decodes, PCM does not -> tolerant NULL row. ehash feeds
    dedup.sig_hamming_pairs(sig_col='ehash') unchanged — audio is the
    third modality on the same Hamming machinery."""
    import os

    from commercepulse_data_pipeline_spark import multimodal as mm

    adir = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "fixtures", "media", "audio",
    )
    rows = []
    for fn in sorted(os.listdir(adir)):
        if fn.endswith(".bin"):
            with open(os.path.join(adir, fn), "rb") as f:
                rows.append((fn[:-4], f.read()))
    media = spark.createDataFrame(rows, "media_id string, content binary")
    return mm.audio_hash(media).select(
        "media_id",
        "ehash",
        F.col("n_samples").cast("long").alias("n_samples"),
        F.col("sample_rate").cast("long").alias("sample_rate"),
        F.col("ehash").isNotNull().cast("long").alias("decodable"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Ordering contract: the driver checks queries in dict order and may cap
    # the number of rows it records (~50; r8-r15 recorded exactly 50). r16
    # executes the rotation VERDICT r15 item 10 asks for: (a) the 49-entry
    # r13-checked block (the oldest oracle-backed stratum — its last driver
    # rows are r13) goes FIRST, (b) the r14-checked block follows (its head
    # entry fills the 50th window slot), (c) the r15-checked head closes the
    # oracle-backed list, (d) the 3 rows-only entries stay last. After r16
    # every oracle-backed entry again has a driver row within three rounds.
    return {
        # -- r13-verification debt: last driver rows r13 — the oldest
        # -- --    oracle-backed stratum (49 entries) leads the r16
        # -- --    window (VERDICT r15 item 10)
        "merge_upsert_state": q_merge_upsert_state,
        "salted_revenue": q_salted_revenue,
        "incident_impact": q_incident_impact,
        "docs_curation_funnel": q_docs_curation_funnel,
        "incident_concurrency": q_incident_concurrency,
        "docs_per_lang_sample": q_docs_per_lang_sample,
        "user_conversion": q_user_conversion,
        "source_overlap": q_source_overlap,
        "retention_cohorts": q_retention_cohorts,
        "daily_revenue_7dma": q_daily_revenue_7dma,
        "lang_confusion": q_lang_confusion,
        "corpus_vocab": q_corpus_vocab,
        "docs_encoded": q_docs_encoded,
        "minhash_incremental": q_minhash_incremental,
        "docs_split_manifest": q_docs_split_manifest,
        "docs_repetition": q_docs_repetition,
        "corpus_top_ngrams": q_corpus_top_ngrams,
        "docs_chunked": q_docs_chunked,
        "docs_keywords": q_docs_keywords,
        "corpus_summary": q_corpus_summary,
        "docs_fingerprint": q_docs_fingerprint,
        "embedding_selfknn": q_embedding_selfknn,
        "ann_lsh_topk": q_ann_lsh_topk,
        "simhash_pairs": q_simhash_pairs,
        "docs_lang_detect": q_docs_lang_detect,
        "docs_pii_scrub": q_docs_pii_scrub,
        "dup_savings_by_source": q_dup_savings_by_source,
        "dup_threshold_sweep": q_dup_threshold_sweep,
        "dup_pair_source_matrix": q_dup_pair_source_matrix,
        "docs_cdc_chunks": q_docs_cdc_chunks,
        "docs_cdc_dup_chunks": q_docs_cdc_dup_chunks,
        "dup_clusters_incremental": q_dup_clusters_incremental,
        "dup_blocker_recall": q_dup_blocker_recall,
        "docs_code_detect": q_docs_code_detect,
        "docs_winnow_fp": q_docs_winnow_fp,
        "docs_winnow_matches": q_docs_winnow_matches,
        "docs_dup_clusters": q_docs_dup_clusters,
        "docs_stratified_sample": q_docs_stratified_sample,
        "docs_packed_windows": q_docs_packed_windows,
        "docs_contamination": q_docs_contamination,
        "kmv_set_overlap": q_kmv_set_overlap,
        "containment_pairs": q_containment_pairs,
        "docs_epoch_shuffle": q_docs_epoch_shuffle,
        "skew_report": q_skew_report,
        "corpus_collocations": q_corpus_collocations,
        "embedding_gram": q_embedding_gram,
        "revenue_anomalies": q_revenue_anomalies,
        "bpe_pair_counts": q_bpe_pair_counts,
        "order_value_hist_quantiles": q_order_value_hist_quantiles,
        # -- r14-checked block: next-oldest stratum; its head entry
        # -- --    fills the 50th window slot this round
        "funnel_steps": q_funnel_steps,
        "bloom_range_members": q_bloom_range_members,
        "docs_cluster_safe_split": q_docs_cluster_safe_split,
        "embedding_label_outliers": q_embedding_label_outliers,
        "docs_derepeated": q_docs_derepeated,
        "corpus_novelty": q_corpus_novelty,
        "simhash_incremental": q_simhash_incremental,
        "ann_ivf_topk": q_ann_ivf_topk,
        "docs_dedup_keep_best": q_docs_dedup_keep_best,
        "split_leakage": q_split_leakage,
        "docs_passage_dedup": q_docs_passage_dedup,
        "media_features_check": q_media_features_check,
        "docs_decontaminated": q_docs_decontaminated,
        "ann_pq_topk": q_ann_pq_topk,
        "docs_mixture_applied": q_docs_mixture_applied,
        "orders_above_customer_avg": q_orders_above_customer_avg,
        "cross_source_fuzzy_join": q_cross_source_fuzzy_join,
        "pricing_summary": q_pricing_summary,
        "daily_revenue": q_daily_revenue,
        "order_daily_rollup": q_order_daily_rollup,
        "dedup_last_writer": q_dedup_last_writer,
        "dedup_keep_first": q_dedup_keep_first,
        "drift_coalesce": q_drift_coalesce,
        "status_canonical": q_status_canonical,
        "timestamp_multiformat": q_timestamp_multiformat,
        "calendar_dim": q_calendar_dim,
        "customer_first_order": q_customer_first_order,
        "orphan_customers": q_orphan_customers,
        "big_spender_segments": q_big_spender_segments,
        "ship_latency": q_ship_latency,
        "fact_shipments_rollup": q_fact_shipments_rollup,
        "completeness": q_completeness,
        "top_customers": q_top_customers,
        "status_pivot": q_status_pivot,
        "sql_regional_revenue": q_sql_regional_revenue,
        "order_value_percentiles": q_order_value_percentiles,
        "revenue_rollup": q_revenue_rollup,
        "image_ahash_check": q_image_ahash_check,
        "video_neardup_check": q_video_neardup_check,
        "audio_hash_check": q_audio_hash_check,
        "revenue_cube": q_revenue_cube,
        "month_over_month": q_month_over_month,
        "docs_shared_passages": q_docs_shared_passages,
        "token_budget": q_token_budget,
        "running_total": q_running_total,
        "sessionize": q_sessionize,
        "session_windows": q_session_windows,
        "event_daily_stats": q_event_daily_stats,
        "minhash_signature": q_minhash_signature,
        "minhash_pairs": q_minhash_pairs,
        # -- r15-checked block (the r15 driver window, freshest rows)
        "ngram_jaccard": q_ngram_jaccard,
        "approx_stats_check": q_approx_stats_check,
        "order_value_percentiles_check": q_order_value_percentiles_check,
        "purge_audit": q_purge_audit,
        "sketch_range_users": q_sketch_range_users,
        "token_heavy_hitters": q_token_heavy_hitters,
        "docs_weighted_sample": q_docs_weighted_sample,
        "docs_length_deciles": q_docs_length_deciles,
        "corpus_snapshot_diff": q_corpus_snapshot_diff,
        "docs_exact_dedup": q_docs_exact_dedup,
        "docs_quarantine": q_docs_quarantine,
        "dup_cluster_size_hist": q_dup_cluster_size_hist,
        "dup_pairs_confirmed": q_dup_pairs_confirmed,
        "docs_ce_bands": q_docs_ce_bands,
        "docs_ce_bands_global": q_docs_ce_bands_global,
        "bitext_margin_pairs": q_bitext_margin_pairs,
        "docs_token_stats": q_docs_token_stats,
        "docs_quality": q_docs_quality,
        "docs_lang_breakdown": q_docs_lang_breakdown,
        "ann_cosine_topk": q_ann_cosine_topk,
        "embedding_knn": q_embedding_knn,
        "embedding_norms_by_label": q_embedding_norms_by_label,
        "union_actors": q_union_actors,
        "set_ops": q_set_ops,
        "unpivot_daily": q_unpivot_daily,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "docs_boilerplate_strip": q_docs_boilerplate_strip,
        "docs_dsir_sample": q_docs_dsir_sample,
        "embedding_hard_negatives": q_embedding_hard_negatives,
        "ann_pq_knn_join": q_ann_pq_knn_join,
        "docs_bigram_ce": q_docs_bigram_ce,
        "docs_temperature_mixture": q_docs_temperature_mixture,
        "docs_hashed_vectors": q_docs_hashed_vectors,
        "docs_tfidf_vectors": q_docs_tfidf_vectors,
        "fx_normalized_revenue": q_fx_normalized_revenue,
        "last_touch_asof": q_last_touch_asof,
        "scd2_asof": q_scd2_asof,
        "semantic_dedup": q_semantic_dedup,
        "docs_unigram_ce": q_docs_unigram_ce,
        "corpus_mixture_plan": q_corpus_mixture_plan,
        "dup_bucket_occupancy": q_dup_bucket_occupancy,
        "docs_classifier_scores": q_docs_classifier_scores,
        "docs_html_extracted": q_docs_html_extracted,
        "docs_classifier_eval": q_docs_classifier_eval,
        "docs_lang_classifier": q_docs_lang_classifier,
        "docs_classifier_sweep": q_docs_classifier_sweep,
        "docs_bm25_topk": q_docs_bm25_topk,
        "docs_passage_hits": q_docs_passage_hits,
        "bm25_indexed_topk": q_bm25_indexed_topk,
        "docs_phrase_hits": q_docs_phrase_hits,
        # -- rows-only entries (no DuckDB oracle; each has an
        # -- --    oracle-backed *_check companion) stay last so the
        # -- --    driver window holds hash-checked rows only
        "media_features": q_media_features,
        "approx_stats": q_approx_stats,
        "order_value_percentiles_approx": q_order_value_percentiles_approx,
    }
# DuckDB shared text-tokenization fragment (kept identical across oracles).
_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)
_SHINGLES3 = (
    "list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),"
    " i -> array_to_string(t[i:i+2], ' ')))"
)
# 2-token shingles (simhash_table default), same construction.
_SHINGLES2 = (
    "list_distinct(list_transform(range(1, greatest(len(t) - 1, 0) + 1),"
    " i -> array_to_string(t[i:i+1], ' ')))"
)

# Quality-score twin (operators/text.py::quality_score) — shared between
# the docs_quality oracle and the docs_dedup_keep_best composition.
_QUALITY_SQL = f"""
            WITH t AS (
                SELECT doc_id, text, {_TOKS} AS toks FROM documents
            ), m AS (
                SELECT doc_id, text, toks,
                       CAST(len(toks) AS DOUBLE) AS n_tok,
                       CASE WHEN len(toks) > 0
                            THEN len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) ELSE 0.0 END AS distinct_ratio,
                       CASE WHEN length(text) > 0
                            THEN length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) / CAST(length(text) AS DOUBLE)
                            ELSE 0.0 END AS alpha_ratio,
                       CASE WHEN len(toks) BETWEEN 20 AND 10000 THEN 1.0
                            WHEN len(toks) > 0 THEN 0.5 ELSE 0.0 END AS len_band,
                       CASE WHEN len(toks) > 0
                            THEN list_sum(list_transform(toks, x -> length(x))) / CAST(len(toks) AS DOUBLE)
                            ELSE 0.0 END AS mean_len
                FROM t
            )
            SELECT doc_id,
                   round((distinct_ratio + alpha_ratio + len_band
                          + CASE WHEN mean_len BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) / 4.0, 6) AS quality_score
            FROM m
        """

# MinHash-LSH candidate pairs (k=8, 4 bands × 2 rows) — shared between the
# minhash_pairs oracle and the docs_dup_clusters recursive-CTE oracle.
# Add-1 unigram cross-entropy fragment (kept identical across the CE
# oracle and both banding oracles — the _QUALITY_SQL discipline: one
# definition so twins cannot drift; r12 review finding).
_UNIGRAM_CE_CTE = f"""toks AS (
                SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
            ),
            counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY 1),
            tot AS (SELECT sum(c) AS n, count(*) AS v FROM counts),
            scored AS (
                SELECT t.doc_id,
                       CAST(-log2((c.c + 1) / CAST(tot.n + tot.v AS DOUBLE))
                            AS DECIMAL(30,4)) AS bits
                FROM toks t JOIN counts c USING (tok) CROSS JOIN tot
            ),
            ce AS (
                SELECT doc_id, count(*) AS n_tokens,
                       round(CAST(sum(bits) AS DOUBLE) / count(*), 4) AS bits_per_token
                FROM scored GROUP BY 1
            )"""


_MINHASH_PAIRS_CTE = f"""
            t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
                SELECT doc_id, unnest({_SHINGLES3}) AS s FROM t WHERE len(t) >= 3
            ), sig AS (
                SELECT doc_id,
                       min(md5('0:' || s)) AS h0, min(md5('1:' || s)) AS h1,
                       min(md5('2:' || s)) AS h2, min(md5('3:' || s)) AS h3,
                       min(md5('4:' || s)) AS h4, min(md5('5:' || s)) AS h5,
                       min(md5('6:' || s)) AS h6, min(md5('7:' || s)) AS h7
                FROM sh GROUP BY doc_id
            ), bands AS (
                SELECT doc_id, 0 AS band_id, h0 || '|' || h1 AS band_key FROM sig
                UNION ALL SELECT doc_id, 1, h2 || '|' || h3 FROM sig
                UNION ALL SELECT doc_id, 2, h4 || '|' || h5 FROM sig
                UNION ALL SELECT doc_id, 3, h6 || '|' || h7 FROM sig
            ), pairs AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bands a JOIN bands b
                  ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
            )"""


def _stratified_sample_oracle_sql() -> str:
    """DuckDB twin of q_docs_stratified_sample: identical md5 bucket
    arithmetic, identical integer thresholds (both sides use
    sampling.threshold_for, so there is no float-boundary skew)."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    bucket = _sample_bucket_sql("doc_id", "corpus-v1:")
    return f"""
        SELECT doc_id, lang, source, n_chars FROM documents
        WHERE {bucket} < (CASE
            WHEN lang = 'zh' THEN {threshold_for(0.5)}
            WHEN lang = 'es' THEN {threshold_for(0.5)}
            WHEN lang = 'en' THEN {threshold_for(0.25)}
            ELSE {threshold_for(0.9)} END)
    """


def _curation_funnel_oracle_sql() -> str:
    """DuckDB twin of q_docs_curation_funnel: same quality twin
    (_QUALITY_SQL — its rounded values are hash-identical to Spark's, so
    threshold comparisons agree), same md5 canonical window, same
    hex-digit sample bucket, same cumulative stage conjunctions."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    bucket = _sample_bucket_sql("doc_id", "funnel-v1:")
    thr = threshold_for(0.5)
    return f"""
        WITH q AS ({_QUALITY_SQL}),
        b AS (
            SELECT doc_id, lang, len({_TOKS}) AS tok,
                   (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS f2,
                   {bucket} AS bucket
            FROM documents
        ),
        f AS (
            SELECT b.tok, b.f2,
                   b.f2 AND q.quality_score >= 0.8 AS f3,
                   b.f2 AND q.quality_score >= 0.8 AND b.lang = 'en' AS f4,
                   b.f2 AND q.quality_score >= 0.8 AND b.lang = 'en'
                        AND b.bucket < {thr} AS f5
            FROM b JOIN q USING (doc_id)
        ),
        a AS (
            SELECT count(*) AS c1, CAST(sum(tok) AS BIGINT) AS t1,
                   CAST(sum(CASE WHEN f2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
                   CAST(sum(CASE WHEN f2 THEN tok ELSE 0 END) AS BIGINT) AS t2,
                   CAST(sum(CASE WHEN f3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
                   CAST(sum(CASE WHEN f3 THEN tok ELSE 0 END) AS BIGINT) AS t3,
                   CAST(sum(CASE WHEN f4 THEN 1 ELSE 0 END) AS BIGINT) AS c4,
                   CAST(sum(CASE WHEN f4 THEN tok ELSE 0 END) AS BIGINT) AS t4,
                   CAST(sum(CASE WHEN f5 THEN 1 ELSE 0 END) AS BIGINT) AS c5,
                   CAST(sum(CASE WHEN f5 THEN tok ELSE 0 END) AS BIGINT) AS t5
            FROM f
        )
        SELECT 1 AS stage_idx, 'raw' AS stage, c1 AS n_docs, t1 AS surviving_tokens FROM a
        UNION ALL SELECT 2, 'exact_dedup', c2, t2 FROM a
        UNION ALL SELECT 3, 'quality_gate', c3, t3 FROM a
        UNION ALL SELECT 4, 'lang_en', c4, t4 FROM a
        UNION ALL SELECT 5, 'sampled', c5, t5 FROM a
    """


def _packed_windows_oracle_sql(capacity: int = 512, n_shards: int = 8) -> str:
    """DuckDB twin of q_docs_packed_windows: identical md5 shard buckets,
    identical in-shard next-fit walk replayed as a recursive CTE (one
    recursion step per row per shard — shards advance independently)."""
    bucket = _sample_bucket_sql("doc_id", "pack-v1:")
    return f"""
        WITH RECURSIVE t AS (
            SELECT doc_id, len({_TOKS}) AS tok FROM documents
        ),
        sh AS (
            SELECT doc_id, least(tok, {capacity}) AS tok,
                   CAST({bucket} % {n_shards} AS INT) AS shard
            FROM t
        ),
        ord AS (
            SELECT *, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
            FROM sh
        ),
        walk(shard, rn, bin_idx, fill) AS (
            SELECT shard, rn, CAST(0 AS BIGINT), CAST(tok AS BIGINT)
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.shard, o.rn,
                   CASE WHEN w.fill > 0 AND w.fill + o.tok > {capacity}
                        THEN w.bin_idx + 1 ELSE w.bin_idx END,
                   CASE WHEN w.fill > 0 AND w.fill + o.tok > {capacity}
                        THEN CAST(o.tok AS BIGINT) ELSE w.fill + o.tok END
            FROM ord o JOIN walk w ON o.shard = w.shard AND o.rn = w.rn + 1
        )
        SELECT shard, bin_idx, count(*) AS n_docs, max(fill) AS window_tokens
        FROM walk GROUP BY 1, 2
    """


def _blocker_recall_oracle_sql() -> str:
    """DuckDB twin of q_dup_blocker_recall: identical md5-bucket sample,
    exact shingle-join Jaccard truth at tau=0.5, the 8-hash/4-band
    MinHash banding over the SAME sample, and the semi-join recall
    count."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    bucket = _sample_bucket_sql("doc_id", "recall-v1:")
    return f"""
        WITH sampled AS (
            SELECT doc_id, text FROM documents WHERE {bucket} < {threshold_for(0.5)}
        ),
        t AS (SELECT doc_id, {_TOKS} AS t FROM sampled),
        sh AS (
            SELECT doc_id, unnest({_SHINGLES3}) AS s FROM t WHERE len(t) >= 3
        ),
        sizes AS (SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id),
        shared AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        truth AS (
            SELECT s.id_a, s.id_b
            FROM shared s
            JOIN sizes sa ON s.id_a = sa.doc_id
            JOIN sizes sb ON s.id_b = sb.doc_id
            WHERE s.shared / CAST(sa.set_size + sb.set_size - s.shared AS DOUBLE) >= 0.5
        ),
        sig AS (
            SELECT doc_id,
                   min(md5('0:' || s)) AS h0, min(md5('1:' || s)) AS h1,
                   min(md5('2:' || s)) AS h2, min(md5('3:' || s)) AS h3,
                   min(md5('4:' || s)) AS h4, min(md5('5:' || s)) AS h5,
                   min(md5('6:' || s)) AS h6, min(md5('7:' || s)) AS h7
            FROM sh GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, 0 AS band_id, h0 || '|' || h1 AS band_key FROM sig
            UNION ALL SELECT doc_id, 1, h2 || '|' || h3 FROM sig
            UNION ALL SELECT doc_id, 2, h4 || '|' || h5 FROM sig
            UNION ALL SELECT doc_id, 3, h6 || '|' || h7 FROM sig
        ),
        blocked AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM bands a JOIN bands b
              ON a.band_id = b.band_id AND a.band_key = b.band_key
             AND a.doc_id < b.doc_id
        ),
        hit AS (
            SELECT t.id_a FROM truth t
            JOIN blocked p ON p.id_a = t.id_a AND p.id_b = t.id_b
        )
        SELECT CAST((SELECT count(*) FROM sampled) AS BIGINT) AS n_sampled_docs,
               CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_pairs,
               CAST((SELECT count(*) FROM blocked) AS BIGINT) AS n_blocked_pairs,
               CAST((SELECT count(*) FROM hit) AS BIGINT) AS n_found,
               CASE WHEN (SELECT count(*) FROM truth) > 0
                    THEN round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
                               / CAST((SELECT count(*) FROM truth) AS DOUBLE), 6)
               END AS recall
    """


def _winnow_fp_oracle_sql(k: int = 3, w: int = 4) -> str:
    """DuckDB twin of q_docs_winnow_fp: positional k-gram hashes via the
    shared hex-digit md5 bucket, the window space exploded row-wise, and
    the paper's selection (min hash, RIGHTMOST tie) as a row_number pick
    — short docs (< w grams) winnow as one whole-doc window."""
    gram = f"array_to_string(t[i:i+{k - 1}], ' ')"
    bucket = _sample_bucket_sql(gram, "winnow-v1:")
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        g AS (
            SELECT doc_id, i, CAST({bucket} AS BIGINT) AS h
            FROM (
                SELECT doc_id, t,
                       unnest(range(1, greatest(len(t) - {k - 1}, 0) + 1)) AS i
                FROM t
            )
        ),
        c AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
        wins AS (
            SELECT doc_id, least({w}, ng) AS wl,
                   unnest(range(1, greatest(ng - {w - 1}, 1) + 1)) AS wi
            FROM c
        ),
        j AS (
            SELECT wn.doc_id, wn.wi, g.i, g.h
            FROM wins wn JOIN g
              ON g.doc_id = wn.doc_id
             AND g.i BETWEEN wn.wi AND wn.wi + wn.wl - 1
        ),
        pick AS (
            SELECT doc_id, wi, i, h,
                   row_number() OVER (
                       PARTITION BY doc_id, wi ORDER BY h ASC, i DESC
                   ) AS rn
            FROM j
        )
        SELECT DISTINCT doc_id, CAST(i AS BIGINT) AS pos, CAST(h AS BIGINT) AS fp
        FROM pick WHERE rn = 1
    """


def _cdc_dup_chunks_oracle_sql() -> str:
    """DuckDB twin of q_docs_cdc_dup_chunks: the cdc-chunks CTE grouped by
    chunk hash, duplicate (>= 2 docs) chunks only, min-(doc, start)
    canonical."""
    inner = _cdc_chunks_oracle_sql()
    return f"""
        WITH chunks AS ({inner})
        SELECT chunk_md5,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
               CAST(min(doc_id * 4294967296 + start_pos) // 4294967296
                    AS BIGINT) AS canonical_doc_id,
               CAST(min(doc_id * 4294967296 + start_pos) % 4294967296
                    AS BIGINT) AS canonical_start_pos
        FROM chunks
        GROUP BY chunk_md5
        HAVING count(DISTINCT doc_id) >= 2
    """


def _cdc_chunks_oracle_sql() -> str:
    """DuckDB twin of q_docs_cdc_chunks: identical whitespace tokens,
    identical hex-digit md5 bucket over the salted 2-token gram (the
    sampling.hash_bucket idiom), identical 0-mod-16 boundary rule,
    cumulative-window chunk ids, and order-safe chunk reassembly."""
    gram = "array_to_string(t[greatest(i - 1, 1):i], ' ')"
    bucket = _sample_bucket_sql(gram, "cdc-v1:")
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        p AS (
            SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i
            FROM t WHERE len(t) > 0
        ),
        b AS (
            SELECT doc_id, i, t[i] AS tok,
                   CASE WHEN ({bucket}) % 16 = 0 THEN 1 ELSE 0 END AS bnd
            FROM p
        ),
        c AS (
            SELECT doc_id, i, tok,
                   COALESCE(SUM(bnd) OVER (
                       PARTITION BY doc_id ORDER BY i
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS chunk_idx
            FROM b
        )
        SELECT doc_id,
               CAST(chunk_idx AS BIGINT) AS chunk_idx,
               CAST(min(i) - 1 AS BIGINT) AS start_pos,
               CAST(count(*) AS BIGINT) AS n_tokens,
               md5(string_agg(tok, ' ' ORDER BY i)) AS chunk_md5
        FROM c GROUP BY doc_id, chunk_idx
    """


def _sample_bucket_sql(key_expr: str, salt: str) -> str:
    """DuckDB twin of operators/sampling.py::hash_bucket — first 8 hex
    chars of md5(salt || key) as an unsigned 32-bit value via hex-digit
    arithmetic (identical to Spark's conv(substring(md5..),16,10))."""
    h = f"md5('{salt}' || CAST({key_expr} AS VARCHAR))"
    nib = f"(strpos('0123456789abcdef', substr({h}, {{pos}}, 1)) - 1)"
    terms = [f"{nib.format(pos=j + 1)} * {16 ** (7 - j)}" for j in range(8)]
    return "(" + " + ".join(terms) + ")"


def _split_manifest_oracle_sql() -> str:
    """DuckDB twin of q_docs_split_manifest: the same cumulative integer
    thresholds over the same md5 bucket, sorted-name order (test < train
    < val), remainder to the last split."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    # COALESCE matches assign_splits' NULL-key handling (hash as '')
    bucket = _sample_bucket_sql("COALESCE(CAST(doc_id AS VARCHAR), '')", "split-v1:")
    t_test = threshold_for(0.1)
    t_train = t_test + threshold_for(0.8)
    return f"""
        SELECT doc_id, CASE
            WHEN {bucket} < {t_test} THEN 'test'
            WHEN {bucket} < {t_train} THEN 'train'
            ELSE 'val' END AS split
        FROM documents
    """


def _split_leakage_oracle_sql() -> str:
    """DuckDB twin of q_split_leakage: same split CASE as the manifest
    oracle, same 8-token md5 fingerprints as docs_shared_passages."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    bucket = _sample_bucket_sql("COALESCE(CAST(doc_id AS VARCHAR), '')", "split-v1:")
    t_test = threshold_for(0.1)
    t_train = t_test + threshold_for(0.8)
    return f"""
        WITH labeled AS (
            SELECT doc_id, {_TOKS} AS t, CASE
                WHEN {bucket} < {t_test} THEN 'test'
                WHEN {bucket} < {t_train} THEN 'train'
                ELSE 'val' END AS split
            FROM documents
        ),
        fps AS (
            SELECT DISTINCT doc_id, split,
                   unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                          i -> md5(array_to_string(t[i:i+7], ' ')))) AS fp
            FROM labeled WHERE len(t) >= 8
        ),
        train_fps AS (SELECT DISTINCT fp FROM fps WHERE split = 'train'),
        leaks AS (
            SELECT e.split, e.doc_id, e.fp FROM fps e
            WHERE e.split <> 'train' AND e.fp IN (SELECT fp FROM train_fps)
        ),
        counts AS (SELECT split, count(*) AS n_docs FROM labeled GROUP BY 1)
        SELECT l.split, c.n_docs,
               count(DISTINCT l.doc_id) AS n_contaminated_docs,
               count(DISTINCT l.fp) AS n_leaked_fingerprints,
               round(count(DISTINCT l.doc_id) / CAST(c.n_docs AS DOUBLE), 4) AS contamination_rate
        FROM leaks l JOIN counts c USING (split)
        GROUP BY 1, 2
    """


def _simhash_oracle_sql(hamming_threshold: int = 6) -> str:
    """DuckDB twin of q_simhash_pairs. The Spark side generates candidates
    with block-LSH, but the pigeonhole guarantee (threshold < blocks ⇒
    every true pair shares a block) makes the OUTPUT exactly 'all pairs
    with hamming(sig_a, sig_b) <= threshold' — engine-independent given
    the same signatures. Signatures derive from md5: first 16 hex chars
    as a signed big-endian 64-bit value (operators/dedup.py::_md5_long),
    per-bit majority vote."""
    # hex nibble j (0-based, big-endian) of md5(shingle)
    nib = "(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"
    terms = [f"(CASE WHEN {nib.format(pos=1)} >= 8 THEN {nib.format(pos=1)} - 16 ELSE {nib.format(pos=1)} END) * {16**15}"]
    terms += [f"{nib.format(pos=j + 1)} * {16 ** (15 - j)}" for j in range(1, 16)]
    v64 = " + ".join(terms)
    bit_sums = ",\n                   ".join(
        f"sum(CAST((v >> {i}) & 1 AS BIGINT)) AS b{i}" for i in range(64)
    )
    sig_terms = [f"(CASE WHEN 2 * b{i} > n THEN CAST({2**i} AS BIGINT) ELSE 0 END)" for i in range(63)]
    sig_terms.append("(CASE WHEN 2 * b63 > n THEN (-9223372036854775807 - 1) ELSE 0 END)")
    sig = " + ".join(sig_terms)
    return f"""
        WITH {_simhash_sigs_cte()}
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= {hamming_threshold}
    """


def _html_extracted_oracle_sql(
    min_block_tokens: int = 3, max_link_pct: int = 50
) -> str:
    """DuckDB twin of q_docs_html_extracted: the SAME page synthesis
    from _HTML_TPL, then the SAME RE2 regex chain html_extract runs —
    comment/script/style removal, block-tag segmentation, per-block
    tag-strip + entity decode + whitespace collapse, integer
    link-density filter — rebuilt with list/ordinality SQL. DuckDB's
    regexp_replace needs the explicit 'g' option to match Spark's
    global-by-default semantics."""
    from commercepulse_data_pipeline_spark.operators.text import (
        _HTML_BLOCK_TAGS,
        _HTML_ENTITIES,
    )

    def clean(expr: str) -> str:
        c = f"regexp_replace({expr}, '<[^>]*>', ' ', 'g')"
        for ent, ch in _HTML_ENTITIES:
            rep = ch.replace("'", "''")
            c = f"replace({c}, '{ent}', '{rep}')"
        return f"trim(regexp_replace({c}, '\\s+', ' ', 'g'))"

    seg = "coalesce(html, '')"
    seg = f"regexp_replace({seg}, '(?s)<!--.*?-->', ' ', 'g')"
    for tag in ("script", "style", "noscript"):
        seg = (
            f"regexp_replace({seg}, "
            f"'(?is)<{tag}\\b[^>]*>.*?</{tag}>', ' ', 'g')"
        )
    seg = (
        f"regexp_replace({seg}, "
        f"'(?i)</?({_HTML_BLOCK_TAGS})\\b[^>]*>', chr(10), 'g')"
    )
    tpl = [t.replace("'", "''") for t in _HTML_TPL]
    lc = (
        "coalesce(list_sum(list_transform("
        "regexp_extract_all(blk, '(?is)<a\\b[^>]*>(.*?)</a>', 1), "
        f"x -> length({clean('x')}))), 0)"
    )
    keep = (
        f"ntok >= {min_block_tokens} AND lc * 100 <= length(txt) * {max_link_pct}"
    )
    return f"""
        WITH pages AS (
            SELECT doc_id,
                   '{tpl[0]}' || CAST(doc_id AS VARCHAR)
                   || '{tpl[1]}' || coalesce(lang, 'und')
                   || '{tpl[2]}' || coalesce(text, '')
                   || '{tpl[3]}' AS html
            FROM documents
        ),
        seg AS (SELECT doc_id, {seg} AS segd FROM pages),
        blocks AS (
            SELECT doc_id, u.blk AS blk, u.i AS i FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           string_split(segd, chr(10)),
                           (x, j) -> {{'blk': x, 'i': j}}
                       )) AS u
                FROM seg
            )
        ),
        st AS (
            SELECT doc_id, i, {clean('blk')} AS txt, {lc} AS lc
            FROM blocks
        ),
        m AS (
            SELECT doc_id, i, txt, lc,
                   len(list_filter(string_split(txt, ' '), x -> x <> '')) AS ntok
            FROM st
        ),
        kept AS (
            SELECT doc_id, array_to_string(list(txt ORDER BY i), chr(10)) AS text
            FROM m WHERE {keep}
            GROUP BY doc_id
        ),
        counts AS (
            SELECT doc_id,
                   CAST(count(*) FILTER (WHERE length(txt) > 0) AS BIGINT) AS n_blocks,
                   CAST(count(*) FILTER (WHERE {keep}) AS BIGINT) AS n_kept_blocks
            FROM m GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(k.text, '') AS text,
               coalesce(c.n_blocks, 0) AS n_blocks,
               coalesce(c.n_kept_blocks, 0) AS n_kept_blocks
        FROM documents d
        LEFT JOIN kept k USING (doc_id)
        LEFT JOIN counts c USING (doc_id)
    """


def _classifier_oracle_sql(B: int = 256) -> str:
    """DuckDB twin of q_docs_classifier_scores: identical md5 half-split
    (nbtrain-v1:), identical en-vs-rest labels, the same hashed
    unigram+bigram feature buckets (nbq-v1:, the DSIR feature space),
    add-1 smoothed per-bucket log2 ratios quantized DECIMAL(30,4), a
    DENSE 0..B-1 weight table (unseen buckets carry the smoothed prior
    ratio), exact decimal per-doc sums + the doc-prior bias, and the
    prediction from the EXACT decimal total's sign."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    split = _sample_bucket_sql("doc_id", "nbtrain-v1:")
    fbucket = f"({_sample_bucket_sql('f', 'nbq-v1:')} % {B})"
    thr = threshold_for(0.5)
    return f"""
        WITH tr AS (
            SELECT doc_id, text,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS lab
            FROM documents WHERE {split} < {thr}
        ),
        trt AS (SELECT lab, {_TOKS} AS toks FROM tr),
        trf AS (
            SELECT lab, unnest(toks) AS f FROM trt
            UNION ALL
            SELECT lab, array_to_string(toks[i:i+1], ' ') AS f
            FROM trt, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
        ),
        trb AS (SELECT lab, {fbucket} AS b FROM trf),
        bc AS (
            SELECT b, CAST(sum(lab) AS BIGINT) AS cp,
                   CAST(count(*) - sum(lab) AS BIGINT) AS cn
            FROM trb GROUP BY b
        ),
        tots AS (
            SELECT coalesce(sum(cp), 0) AS tp, coalesce(sum(cn), 0) AS tn
            FROM bc
        ),
        w AS (
            SELECT t.i AS b,
                   CAST(log2((coalesce(bc.cp, 0) + 1)
                             / CAST(tots.tp + {B} AS DOUBLE))
                        - log2((coalesce(bc.cn, 0) + 1)
                             / CAST(tots.tn + {B} AS DOUBLE))
                        AS DECIMAL(30,4)) AS wt
            FROM range(0, {B}) t(i)
            LEFT JOIN bc ON bc.b = t.i CROSS JOIN tots
        ),
        prior AS (
            SELECT CAST(log2((coalesce(sum(lab), 0) + 1)
                             / CAST(count(*) - coalesce(sum(lab), 0) + 1
                                    AS DOUBLE))
                        AS DECIMAL(30,4)) AS bias
            FROM tr
        ),
        at AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        af AS (
            SELECT doc_id, unnest(toks) AS f FROM at
            UNION ALL
            SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS f
            FROM at, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
        ),
        ab AS (SELECT doc_id, {fbucket} AS b FROM af),
        s AS (
            SELECT ab.doc_id, count(*) AS n_feats, sum(w.wt) AS sw
            FROM ab JOIN w ON ab.b = w.b GROUP BY ab.doc_id
        )
        SELECT d.doc_id,
               CAST(coalesce(s.n_feats, 0) AS BIGINT) AS n_feats,
               round(CAST(coalesce(s.sw, CAST(0 AS DECIMAL(30,4)))
                          + prior.bias AS DOUBLE), 4) AS nb_logodds,
               CAST(CASE WHEN coalesce(s.sw, CAST(0 AS DECIMAL(30,4)))
                              + prior.bias > 0
                         THEN 1 ELSE 0 END AS INT) AS predicted
        FROM documents d LEFT JOIN s ON s.doc_id = d.doc_id
        CROSS JOIN prior
    """


def _lang_classifier_oracle_sql(B: int = 256) -> str:
    """DuckDB twin of q_docs_lang_classifier: same md5 half-split and
    hashed unigram+bigram buckets, per-class add-1 smoothed log2
    weights over a DENSE labels x buckets grid (each DECIMAL(30,4)-
    quantized), add-1 priors over the K observed classes, exact decimal
    per-(doc,class) sums, and the argmax row_number with the identical
    (score DESC, label DESC) tie-break."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    split = _sample_bucket_sql("doc_id", "nbtrain-v1:")
    fbucket = f"({_sample_bucket_sql('f', 'nbq-v1:')} % {B})"
    thr = threshold_for(0.5)
    return f"""
        WITH tr AS (
            SELECT doc_id, text, lang AS lab FROM documents
            WHERE {split} < {thr} AND lang IS NOT NULL
        ),
        labels AS (SELECT DISTINCT lab FROM tr),
        trt AS (SELECT lab, {_TOKS} AS toks FROM tr),
        trf AS (
            SELECT lab, unnest(toks) AS f FROM trt
            UNION ALL
            SELECT lab, array_to_string(toks[i:i+1], ' ') AS f
            FROM trt, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
        ),
        trb AS (SELECT lab, {fbucket} AS b FROM trf),
        bc AS (SELECT lab, b, count(*) AS c FROM trb GROUP BY 1, 2),
        tots AS (SELECT lab, sum(c) AS t FROM bc GROUP BY 1),
        w AS (
            SELECT l.lab, g.i AS b,
                   CAST(log2((coalesce(bc.c, 0) + 1)
                             / CAST(coalesce(tots.t, 0) + {B} AS DOUBLE))
                        AS DECIMAL(30,4)) AS wt
            FROM labels l
            CROSS JOIN range(0, {B}) g(i)
            LEFT JOIN bc ON bc.lab = l.lab AND bc.b = g.i
            LEFT JOIN tots ON tots.lab = l.lab
        ),
        nd AS (SELECT count(*) AS n, count(DISTINCT lab) AS k FROM tr),
        prior AS (
            SELECT lab,
                   CAST(log2((count(*) + 1) / CAST(nd.n + nd.k AS DOUBLE))
                        AS DECIMAL(30,4)) AS bias
            FROM tr CROSS JOIN nd GROUP BY lab, nd.n, nd.k
        ),
        at AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        af AS (
            SELECT doc_id, unnest(toks) AS f FROM at
            UNION ALL
            SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS f
            FROM at, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
        ),
        ab AS (SELECT doc_id, {fbucket} AS b FROM af),
        per AS (
            SELECT ab.doc_id, w.lab, count(*) AS nf, sum(w.wt) AS sw
            FROM ab JOIN w ON ab.b = w.b GROUP BY 1, 2
        ),
        base AS (
            SELECT d.doc_id, p.lab, p.bias FROM documents d CROSS JOIN prior p
        ),
        tot AS (
            SELECT b.doc_id, b.lab,
                   coalesce(per.sw, CAST(0 AS DECIMAL(30,4))) + b.bias AS s,
                   coalesce(per.nf, 0) AS nf
            FROM base b
            LEFT JOIN per ON per.doc_id = b.doc_id AND per.lab = b.lab
        ),
        best AS (
            SELECT doc_id, lab, s, nf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY s DESC, lab DESC
                   ) AS rn
            FROM tot
        )
        SELECT doc_id, lab AS predicted_label,
               round(CAST(s AS DOUBLE), 4) AS score,
               CAST(nf AS BIGINT) AS n_feats
        FROM best WHERE rn = 1
    """


def _classifier_sweep_oracle_sql(B: int = 256) -> str:
    """DuckDB twin of q_docs_classifier_sweep: the classifier oracle as
    a derived table, one aggregation of conditional sums (comparisons
    run on the identically-rounded nb_logodds doubles), one literal row
    per tau."""
    ks = ", ".join(
        f"sum(CASE WHEN nb_logodds >= {t!r} THEN 1 ELSE 0 END) AS k{i}"
        for i, t in enumerate(_QUALITY_SWEEP_TAUS)
    )
    branches = "\n        UNION ALL ".join(
        f"SELECT {t!r} AS tau, CAST(k{i} AS BIGINT) AS n_kept, "
        f"round(k{i} / CAST(n AS DOUBLE), 4) AS keep_rate FROM a"
        for i, t in enumerate(_QUALITY_SWEEP_TAUS)
    )
    return f"""
        WITH s AS ({_classifier_oracle_sql(B=B)}),
        a AS (SELECT count(*) AS n, {ks} FROM s)
        {branches}
    """


def _classifier_eval_oracle_sql(B: int = 256) -> str:
    """DuckDB twin of q_docs_classifier_eval: the classifier oracle as a
    derived table, joined back to documents, restricted to the held-out
    half (same md5 split, complementary side), grouped into the exact
    integer confusion matrix."""
    from commercepulse_data_pipeline_spark.operators.sampling import threshold_for

    split = _sample_bucket_sql("d.doc_id", "nbtrain-v1:")
    return f"""
        SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS actual,
               s.predicted,
               CAST(count(*) AS BIGINT) AS n
        FROM ({_classifier_oracle_sql(B=B)}) s
        JOIN documents d ON d.doc_id = s.doc_id
        WHERE {split} >= {threshold_for(0.5)}
        GROUP BY 1, 2
    """


def _bm25_oracle_sql(
    toked_sql: str,
    id_col: str,
    extra_cols: tuple[str, ...] = (),
    *,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB twin of operators/retrieval.py::bm25_topk over a relation
    ``toked_sql`` exposing ``(id_col, *extra_cols, toks)``. Mirrors the
    Spark arithmetic exactly: log2 idf quantized DECIMAL(30,6) then back
    to double, every float constant crossing as its Python repr
    (shortest-round-trip — both engines parse it to the same double),
    the per-term sum in fixed left-to-right _BM25_TERMS order, round-6,
    and the (score desc, id asc) total order."""
    ids = ", ".join([id_col, *extra_cols])
    tfs = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    dfs = ", ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    hits = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)" for i in range(len(_BM25_TERMS))
    )
    terms = " + ".join(
        f"CAST(CAST(log2({1.0!r} + (n_docs - df{i} + {0.5!r}) / (df{i} + {0.5!r}))"
        f" AS DECIMAL(30,6)) AS DOUBLE)"
        f" * ((CAST(tf{i} AS DOUBLE) * {k1 + 1.0!r})"
        f" / (CAST(tf{i} AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r}"
        f" * (CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
        WITH base AS (
            SELECT {ids}, len(toks) AS dl, {tfs}
            FROM ({toked_sql})
        ),
        stats AS (
            SELECT count(*) AS n_docs, sum(dl) AS sum_dl, {dfs} FROM base
        ),
        scored AS (
            SELECT {ids}, dl,
                   CAST({hits} AS INT) AS n_match,
                   round({terms}, 6) AS score
            FROM base CROSS JOIN stats
        )
        SELECT CAST(row_number() OVER (ORDER BY score DESC, {id_col}) AS INT) AS rank,
               {ids}, n_match, dl, score
        FROM scored WHERE n_match > 0
        ORDER BY score DESC, {id_col} LIMIT {k}
    """


def _bm25_indexed_oracle_sql(*, k: int = 20, k1: float = 1.2, b: float = 0.75) -> str:
    """DuckDB twin of q_bm25_indexed_topk: postings = the tf>0 rows per
    query term, document frequencies from those postings, per-term
    scores quantized DECIMAL(30,10) and summed EXACTLY per doc (the
    order-independent accumulation the indexed scorer uses), round-6,
    same (score desc, doc_id) order."""
    tfs = ", ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    postings = "\n            UNION ALL ".join(
        f"SELECT doc_id, dl, tf{i} AS tf, {i} AS ti FROM base WHERE tf{i} > 0"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
        WITH base AS (
            SELECT doc_id, len(toks) AS dl, {tfs}
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents)
        ),
        stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base),
        postings AS (
            {postings}
        ),
        dfs AS (SELECT ti, count(*) AS df FROM postings GROUP BY 1),
        scored AS (
            SELECT p.doc_id, p.dl,
                   CAST(
                     CAST(CAST(log2({1.0!r} + (s.n_docs - d.df + {0.5!r}) / (d.df + {0.5!r}))
                          AS DECIMAL(30,6)) AS DOUBLE)
                     * ((CAST(p.tf AS DOUBLE) * {k1 + 1.0!r})
                        / (CAST(p.tf AS DOUBLE) + {k1!r} * ({1.0 - b!r} + {b!r}
                           * (CAST(p.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / s.n_docs)))))
                   AS DECIMAL(30,10)) AS ts
            FROM postings p JOIN dfs d USING (ti) CROSS JOIN stats s
        ),
        agg AS (
            SELECT doc_id, CAST(count(*) AS INT) AS n_match, max(dl) AS dl,
                   round(CAST(sum(ts) AS DOUBLE), 6) AS score
            FROM scored GROUP BY 1
        )
        SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank,
               doc_id, n_match, dl, score
        FROM agg ORDER BY score DESC, doc_id LIMIT {k}
    """


def _phrase_oracle_sql(*, k: int = 20) -> str:
    """DuckDB twin of q_docs_phrase_hits: per-term position lists via the
    indexed (x, i) lambda, the identical adjacency fold (start positions
    of term 0 with term i at +i), integer counts only."""
    terms = _PHRASE_TERMS
    pos_cols = ", ".join(
        f"list_filter(list_transform(toks, (x, i) -> CASE WHEN x = '{t}' THEN i END),"
        f" p -> p IS NOT NULL) AS p{j}"
        for j, t in enumerate(dict.fromkeys(terms))
    )
    slot = {t: j for j, t in enumerate(dict.fromkeys(terms))}
    conds = " AND ".join(
        f"list_contains(p{slot[t]}, c + {i})" for i, t in enumerate(terms[1:], 1)
    )
    return f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        p AS (
            SELECT doc_id, len(toks) AS dl, {pos_cols} FROM t
        ),
        scored AS (
            SELECT doc_id, dl,
                   CAST(len(list_filter(p{slot[terms[0]]}, c -> {conds})) AS INT)
                       AS n_phrase
            FROM p
        )
        SELECT CAST(row_number() OVER (ORDER BY n_phrase DESC, doc_id) AS INT) AS rank,
               doc_id, n_phrase, dl
        FROM scored WHERE n_phrase > 0
        ORDER BY n_phrase DESC, doc_id LIMIT {k}
    """


def _bucket_occupancy_oracle_sql(max_bucket: int = 5) -> str:
    """DuckDB twin of q_dup_bucket_occupancy: the same md5-derived
    simhash signatures (_simhash_sigs_cte), the same 7-block/9-bit
    pigeonhole keys — Spark's shiftrightunsigned replayed as HUGEINT
    division on the two's-complement-unsigned value — and the same
    three-band CASE rollup."""
    two64 = 1 << 64
    branches = "\n            UNION ALL ".join(
        f"SELECT doc_id, {i} AS block_id, "
        f"CAST((us // {1 << (9 * i)}) % 512 AS BIGINT) AS block_val FROM u"
        for i in range(7)
    )
    return f"""
        WITH {_simhash_sigs_cte()},
        u AS (
            SELECT doc_id,
                   CAST(sig AS HUGEINT)
                   + CASE WHEN sig < 0 THEN CAST({two64} AS HUGEINT)
                          ELSE CAST(0 AS HUGEINT) END AS us
            FROM sigs
        ),
        blk AS (
            {branches}
        ),
        bs AS (
            SELECT block_id, block_val, count(*) AS n
            FROM blk GROUP BY 1, 2
        )
        SELECT CASE WHEN n < 2 THEN 'singleton'
                    WHEN n <= {max_bucket} THEN 'pairable'
                    ELSE 'dropped' END AS status,
               CAST(count(*) AS BIGINT) AS n_buckets,
               CAST(sum(n) AS BIGINT) AS n_items,
               CAST(max(n) AS BIGINT) AS max_bucket_n
        FROM bs GROUP BY 1
    """


def _simhash_sigs_cte() -> str:
    """Shared CTE body replaying simhash_table over the documents table
    (md5-derived signed 64-bit shingle hashes, per-bit majority vote) —
    defines ``sigs(doc_id, sig)`` for both the self-pairs oracle
    (simhash_pairs) and the incremental between-split oracle
    (simhash_incremental)."""
    nib = "(strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1)"
    terms = [f"(CASE WHEN {nib.format(pos=1)} >= 8 THEN {nib.format(pos=1)} - 16 ELSE {nib.format(pos=1)} END) * {16**15}"]
    terms += [f"{nib.format(pos=j + 1)} * {16 ** (15 - j)}" for j in range(1, 16)]
    v64 = " + ".join(terms)
    bit_sums = ",\n                   ".join(
        f"sum(CAST((v >> {i}) & 1 AS BIGINT)) AS b{i}" for i in range(64)
    )
    sig_terms = [f"(CASE WHEN 2 * b{i} > n THEN CAST({2**i} AS BIGINT) ELSE 0 END)" for i in range(63)]
    sig_terms.append("(CASE WHEN 2 * b63 > n THEN (-9223372036854775807 - 1) ELSE 0 END)")
    sig = " + ".join(sig_terms)
    return f"""toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        sh AS (SELECT doc_id, unnest({_SHINGLES2}) AS s FROM toks),
        hx AS (SELECT doc_id, md5(s) AS h FROM sh),
        hv AS (SELECT doc_id, {v64} AS v FROM hx),
        bits AS (SELECT doc_id, count(*) AS n,
                   {bit_sums}
                 FROM hv GROUP BY doc_id),
        sigs AS (SELECT doc_id, {sig} AS sig FROM bits WHERE n > 0)"""


def _bloom_oracle_sql(m_bits: int = 4096, k: int = 4) -> str:
    """DuckDB twin of q_bloom_range_members: the SAME md5-derived bit
    positions (``uint32(md5('i:' || user_id)) % m_bits``, i in 0..k-1 —
    hex-digit arithmetic identical to operators/sampling.py::hash_bucket),
    the same sparse per-day filter (DISTINCT (day, pos)), the same
    all-bits-set probe, and the same exact-truth comparison — so the
    result matches Spark's bit-for-bit, false positives included."""
    pos_branches = "\n                UNION ALL ".join(
        f"SELECT day, ({_sample_bucket_sql('user_id', f'{i}:')}) % {m_bits} AS pos FROM days"
        for i in range(k)
    )
    probe_branches = "\n                UNION ALL ".join(
        f"SELECT user_id, ({_sample_bucket_sql('user_id', f'{i}:')}) % {m_bits} AS pos FROM cands"
        for i in range(k)
    )
    return f"""
        WITH days AS (
            SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id
            FROM events WHERE user_id IS NOT NULL
        ), b AS (
            SELECT min(day) AS d0 FROM days
        ), rollup AS (
            SELECT DISTINCT day, pos FROM (
                {pos_branches}
            )
        ), cands AS (
            SELECT DISTINCT user_id FROM days WHERE user_id % 5 = 0
        ), probes AS (
            SELECT DISTINCT user_id, pos FROM (
                {probe_branches}
            )
        ), np AS (
            SELECT user_id, count(*) AS n_pos FROM probes GROUP BY 1
        ), hits AS (
            SELECT p.user_id, r.day, count(*) AS n_hit
            FROM probes p JOIN rollup r USING (pos), b
            WHERE r.day >= b.d0 + 10 AND r.day <= b.d0 + 19
            GROUP BY 1, 2
        ), maybe AS (
            SELECT h.user_id, CAST(count(*) AS BIGINT) AS n_days_maybe
            FROM hits h JOIN np USING (user_id)
            WHERE h.n_hit = np.n_pos GROUP BY 1
        ), truth AS (
            SELECT user_id, CAST(count(DISTINCT day) AS BIGINT) AS n_days_true
            FROM days, b
            WHERE day >= b.d0 + 10 AND day <= b.d0 + 19 AND user_id % 5 = 0
            GROUP BY 1
        )
        SELECT c.user_id,
               COALESCE(m.n_days_maybe, 0) AS n_days_maybe,
               COALESCE(t.n_days_true, 0) AS n_days_true,
               CAST(CASE WHEN COALESCE(m.n_days_maybe, 0)
                              >= COALESCE(t.n_days_true, 0)
                         THEN 1 ELSE 0 END AS INT) AS no_false_neg
        FROM cands c
        LEFT JOIN maybe m USING (user_id)
        LEFT JOIN truth t USING (user_id)
    """


def _kmv_oracle_sql(k: int = 128) -> str:
    """DuckDB twin of q_kmv_set_overlap: the SAME md5-derived 32-bit
    hashes (hex-digit arithmetic identical to
    operators/sampling.py::hash_bucket), per-set k-smallest truncation,
    per-pair union re-truncation, and the SAME two IEEE double divisions
    — so n_kept/theta/n_matches AND the rounded estimates and envelope
    verdicts match Spark's bit-for-bit."""
    bucket = _sample_bucket_sql("ukey", "kmv-v1:")
    num = (k - 1) * (1 << 32)
    u_tol = 5.0 / (k - 2) ** 0.5
    i_tol = u_tol + 2.5 / k ** 0.5
    return f"""
        WITH ud AS (
            SELECT DISTINCT event_type,
                   CAST(user_id AS VARCHAR) || ':' ||
                   CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) AS ukey
            FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ), hv AS (
            SELECT DISTINCT event_type, {bucket} AS hv FROM ud
        ), sk AS (
            SELECT event_type, hv FROM (
                SELECT event_type, hv,
                       row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
                FROM hv
            ) WHERE rn <= {k}
        ), pairs AS (
            SELECT a.event_type AS set_a, b.event_type AS set_b
            FROM (SELECT DISTINCT event_type FROM sk) a,
                 (SELECT DISTINCT event_type FROM sk) b
            WHERE a.event_type < b.event_type
        ), un AS (
            SELECT p.set_a, p.set_b, s.hv,
                   max(CASE WHEN s.event_type = p.set_a THEN 1 ELSE 0 END) AS in_a,
                   max(CASE WHEN s.event_type = p.set_b THEN 1 ELSE 0 END) AS in_b
            FROM pairs p JOIN sk s ON s.event_type IN (p.set_a, p.set_b)
            GROUP BY 1, 2, 3
        ), unk AS (
            SELECT * FROM (
                SELECT set_a, set_b, hv, in_a, in_b,
                       row_number() OVER (PARTITION BY set_a, set_b ORDER BY hv) AS rn
                FROM un
            ) WHERE rn <= {k}
        ), agg AS (
            SELECT set_a, set_b,
                   CAST(count(*) AS BIGINT) AS n_kept,
                   CAST(max(hv) AS BIGINT) AS theta,
                   CAST(sum(in_a * in_b) AS BIGINT) AS n_matches
            FROM unk GROUP BY 1, 2
        ), est AS (
            SELECT *,
                   CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
                        ELSE CAST({num} AS DOUBLE) / CAST(theta AS DOUBLE)
                   END AS u_raw
            FROM agg
        ), est2 AS (
            SELECT *,
                   CASE WHEN n_kept < {k} THEN CAST(n_matches AS DOUBLE)
                        ELSE (CAST(n_matches AS DOUBLE) / {float(k)!r}) * u_raw
                   END AS i_raw
            FROM est
        ), inter AS (
            SELECT a.event_type AS set_a, b.event_type AS set_b,
                   CAST(count(*) AS BIGINT) AS exact_inter
            FROM ud a JOIN ud b
              ON a.ukey = b.ukey AND a.event_type < b.event_type
            GROUP BY 1, 2
        ), sizes AS (
            SELECT event_type, count(*) AS sz FROM ud GROUP BY 1
        )
        SELECT e.set_a, e.set_b, e.n_kept, e.theta, e.n_matches,
               round(e.u_raw, 4) AS union_est,
               round(e.i_raw, 4) AS inter_est,
               CAST(sa.sz + sb.sz - i.exact_inter AS BIGINT) AS exact_union,
               i.exact_inter,
               CAST(CASE WHEN abs(round(e.u_raw, 4)
                                  - (sa.sz + sb.sz - i.exact_inter))
                              <= {u_tol!r} * (sa.sz + sb.sz - i.exact_inter) + 2.0
                         THEN 1 ELSE 0 END AS INT) AS union_ok,
               CAST(CASE WHEN abs(round(e.i_raw, 4) - i.exact_inter)
                              <= {i_tol!r} * (sa.sz + sb.sz - i.exact_inter) + 2.0
                         THEN 1 ELSE 0 END AS INT) AS inter_ok
        FROM est2 e
        JOIN inter i ON i.set_a = e.set_a AND i.set_b = e.set_b
        JOIN sizes sa ON sa.event_type = e.set_a
        JOIN sizes sb ON sb.event_type = e.set_b
    """


def _lang_detect_oracle_sql() -> str:
    """DuckDB twin of q_docs_lang_detect: per-language stopword-hit
    ratios, argmax with the SAME tie-break Spark's array_max over
    struct(score, lang) applies — greatest score, then LEXICOGRAPHICALLY
    GREATEST language code."""
    from commercepulse_data_pipeline_spark.operators.text import _STOPWORDS

    per_lang = "\n            UNION ALL\n".join(
        "SELECT doc_id, '{lang}' AS lang, CASE WHEN len(t) > 0 THEN "
        "len(list_filter(t, x -> x IN ({words}))) / CAST(len(t) AS DOUBLE) "
        "ELSE 0.0 END AS score FROM toks".format(
            lang=lang, words=", ".join("'" + w + "'" for w in words)
        )
        for lang, words in _STOPWORDS.items()
    )
    return f"""
        WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
        scored AS ({per_lang}),
        best AS (
            SELECT doc_id, lang, score,
                   row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
            FROM scored
        )
        SELECT doc_id,
               CASE WHEN score > 0 THEN lang ELSE 'und' END AS detected_lang,
               round(score, 6) AS lang_score
        FROM best WHERE rn = 1
    """


def _dsir_sample_oracle_sql() -> str:
    """DuckDB twin of q_docs_dsir_sample: hashed unigram+bigram feature
    buckets via the hash_bucket hex arithmetic, add-1 smoothed bucket
    models over raw corpus and English target, per-feature
    log2(p_t/p_raw) quantized DECIMAL(30,4), exact decimal per-doc sums,
    top-100 selection by (weight DESC, doc_id ASC)."""
    B, K = 256, 100
    bucket = f"({_sample_bucket_sql('f', 'dsir-v1:')} % {B})"
    return f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        tt AS (SELECT {_TOKS} AS toks FROM documents WHERE lang = 'en'),
        rawf AS (
            SELECT doc_id, unnest(toks) AS f FROM t
            UNION ALL
            SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS f
            FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
        ),
        tgtf AS (
            SELECT unnest(toks) AS f FROM tt
            UNION ALL
            SELECT array_to_string(toks[i:i+1], ' ') AS f
            FROM tt, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
        ),
        rawb AS (SELECT doc_id, {bucket} AS b FROM rawf),
        tgtb AS (SELECT {bucket} AS b FROM tgtf),
        rc AS (SELECT b, count(*) AS cr FROM rawb GROUP BY b),
        tc AS (SELECT b, count(*) AS ct FROM tgtb GROUP BY b),
        rtot AS (SELECT sum(cr) AS r FROM rc),
        ttot AS (SELECT sum(ct) AS tot FROM tc),
        ratios AS (
            SELECT rc.b,
                   CAST(
                       log2((coalesce(tc.ct, 0) + 1)
                            / CAST(coalesce(ttot.tot, 0) + {B} AS DOUBLE))
                       - log2((rc.cr + 1)
                            / CAST(rtot.r + {B} AS DOUBLE))
                   AS DECIMAL(30,4)) AS lr
            FROM rc LEFT JOIN tc USING (b) CROSS JOIN rtot CROSS JOIN ttot
        ),
        scored AS (
            SELECT rb.doc_id, count(*) AS n_feats,
                   round(CAST(sum(rt.lr) AS DOUBLE), 4) AS dsir_logratio
            FROM rawb rb JOIN ratios rt ON rb.b = rt.b
            GROUP BY rb.doc_id
        )
        SELECT doc_id, n_feats, dsir_logratio,
               CASE WHEN row_number() OVER (
                        ORDER BY dsir_logratio DESC, doc_id ASC
                    ) <= {K} THEN 1 ELSE 0 END AS selected
        FROM scored
    """


def oracle_sql() -> dict[str, str]:
    return {
        "fx_normalized_revenue": """
            WITH rates AS (
                SELECT DISTINCT CAST(o_orderdate AS DATE) AS fx_date,
                       CAST(1500 AS DOUBLE)
                         + CAST(dayofyear(CAST(o_orderdate AS DATE)) % 50 AS DOUBLE) AS usd_ngn
                FROM orders
                WHERE day(CAST(o_orderdate AS DATE)) % 7 = 1
            ), facts AS (
                SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS fd,
                       CASE WHEN o_orderkey % 3 = 0 THEN 'USD' ELSE 'NGN' END AS currency
                FROM orders
            ), joined AS (
                SELECT f.*, r.usd_ngn
                FROM facts f ASOF LEFT JOIN rates r ON f.fd >= r.fx_date
            ), conv AS (
                SELECT fd,
                       CAST(round(CAST(CASE WHEN currency = 'USD' AND usd_ngn IS NOT NULL
                                            THEN o_totalprice * usd_ngn
                                            ELSE o_totalprice END AS DECIMAL(30,8)), 2)
                            AS DOUBLE) AS amt_ngn,
                       CASE WHEN currency = 'USD' THEN usd_ngn END AS fx_rate_applied
                FROM joined
            )
            SELECT strftime(fd, '%Y-%m') AS order_month,
                   count(*) AS n_orders,
                   CAST(round(sum(CAST(amt_ngn AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue_ngn,
                   count(fx_rate_applied) AS usd_with_rate,
                   round(CAST(sum(CAST(fx_rate_applied AS DECIMAL(30,8))) AS DOUBLE)
                         / count(fx_rate_applied), 4) AS avg_usd_rate
            FROM conv GROUP BY 1
        """,
        "last_touch_asof": """
            WITH ev AS (
                SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
                FROM events
            ), purchases AS (
                SELECT * FROM ev WHERE event_type = 'purchase'
            ), touches AS (
                SELECT user_id, ts, ts AS touch_ts, event_type AS touch_type FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                    FROM ev WHERE event_type IN ('click', 'view')
                ) WHERE rn = 1
            ), attributed AS (
                SELECT p.ts, p.value, t.touch_ts, t.touch_type
                FROM purchases p
                ASOF LEFT JOIN touches t ON p.user_id = t.user_id AND p.ts >= t.ts
            )
            SELECT coalesce(touch_type, 'none') AS attributed_touch,
                   count(*) AS n_purchases,
                   CAST(round(sum(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_value,
                   round(CAST(sum(CAST((epoch_us(ts) - epoch_us(touch_ts))
                                       / CAST(60000000 AS DOUBLE) AS DECIMAL(30,8))) AS DOUBLE)
                         / count(touch_ts), 4) AS avg_mins_to_purchase
            FROM attributed GROUP BY 1
        """,
        "incident_impact": """
            WITH ev AS (
                SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
            ), inc AS (
                SELECT event_id AS incident_id, ts AS inc_start,
                       ts + INTERVAL 10 MINUTE AS inc_end
                FROM ev WHERE event_type = 'error'
            ), pur AS (
                SELECT ts AS p_ts, value FROM ev WHERE event_type = 'purchase'
            )
            SELECT i.incident_id,
                   count(p.p_ts) AS n_purchases,
                   CAST(coalesce(round(sum(CAST(p.value AS DECIMAL(30,8))), 2), 0)
                        AS DOUBLE) AS purchase_value
            FROM inc i LEFT JOIN pur p
              ON p.p_ts >= i.inc_start AND p.p_ts < i.inc_end
            GROUP BY 1
        """,
        "lang_confusion": f"""
            WITH det AS ({_lang_detect_oracle_sql()})
            SELECT d.lang AS label_lang, det.detected_lang,
                   count(*) AS n_docs
            FROM documents d JOIN det USING (doc_id)
            GROUP BY 1, 2
        """,
        "daily_revenue_7dma": """
            WITH daily AS (
                SELECT CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE) AS day,
                       sum(CAST(o_totalprice AS DECIMAL(30,8))) AS rev_dec
                FROM orders GROUP BY 1
            )
            SELECT strftime(day, '%Y-%m-%d') AS day,
                   CAST(round(rev_dec, 2) AS DOUBLE) AS revenue,
                   CAST(round(sum(rev_dec) OVER (
                       ORDER BY day
                       RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
                   ), 2) AS DOUBLE) AS revenue_7d
            FROM daily
        """,
        "retention_cohorts": """
            WITH ev AS (
                SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events
            ), su AS (
                SELECT user_id, date_trunc('week', min(ts)) AS cohort_wk
                FROM ev WHERE event_type = 'signup' GROUP BY 1
            ), act AS (
                SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM ev
            )
            SELECT strftime(s.cohort_wk, '%Y-%m-%d') AS cohort_week,
                   CAST(date_diff('day', s.cohort_wk, a.wk) / 7 AS INT) AS week_offset,
                   count(DISTINCT s.user_id) AS n_active
            FROM su s JOIN act a USING (user_id)
            WHERE date_diff('day', s.cohort_wk, a.wk) >= 0
            GROUP BY 1, 2
        """,
        "corpus_vocab": f"""
            WITH u AS (
                SELECT unnest({_TOKS}) AS token FROM documents
            ), c AS (
                SELECT token, count(*) AS n FROM u GROUP BY 1
                ORDER BY n DESC, token ASC LIMIT 500
            )
            SELECT row_number() OVER (ORDER BY n DESC, token ASC) AS vocab_id,
                   token, n
            FROM c
        """,
        "docs_encoded": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            u AS (SELECT unnest(t) AS token FROM t),
            c AS (
                SELECT token, count(*) AS n FROM u GROUP BY 1
                ORDER BY n DESC, token ASC LIMIT 500
            ),
            vocab AS (
                SELECT token,
                       row_number() OVER (ORDER BY n DESC, token ASC) AS vocab_id
                FROM c
            ),
            ex AS (
                SELECT doc_id, unnest(t) AS token,
                       generate_subscripts(t, 1) AS pos
                FROM t
            ),
            enc AS (
                SELECT e.doc_id, e.pos, coalesce(v.vocab_id, 0) AS vid
                FROM ex e LEFT JOIN vocab v USING (token)
            )
            SELECT doc_id,
                   count(*) AS n_tokens,
                   CAST(sum(CASE WHEN vid = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                   array_to_string(list(vid ORDER BY pos)
                                   FILTER (WHERE pos <= 8), '|') AS encoded_prefix
            FROM enc GROUP BY 1
        """,
        "source_overlap": f"""
            WITH t AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
            fps AS (
                SELECT DISTINCT source,
                       unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                              i -> md5(array_to_string(t[i:i+7], ' ')))) AS fp
                FROM t WHERE len(t) >= 8
            )
            SELECT a.source AS source_a, b.source AS source_b,
                   count(*) AS n_shared_fps
            FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
            GROUP BY 1, 2
        """,
        "corpus_snapshot_diff": """
            WITH v1 AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 7 = 0 THEN text || ' v1' ELSE text END AS text
                FROM documents WHERE doc_id % 10 <> 0
            ), v2 AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 3
            ), d AS (
                SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
                       CASE WHEN a.doc_id IS NULL THEN 'added'
                            WHEN b.doc_id IS NULL THEN 'removed'
                            WHEN md5(a.text) <> md5(b.text) THEN 'changed'
                            ELSE 'unchanged' END AS status
                FROM v1 a FULL OUTER JOIN v2 b USING (doc_id)
            )
            SELECT status, count(*) AS n_docs FROM d GROUP BY 1
        """,
        # The *_check oracles assert the sketch error envelopes HOLD (the
        # booleans are claims about Spark's own estimators, so the oracle's
        # job is the exact aggregates + the all-ones envelope verdict; a
        # sketch drifting out of envelope → hash mismatch → red driver row).
        "approx_stats_check": """
            SELECT event_type,
                   count(*) AS n_events,
                   count(DISTINCT user_id) AS exact_users,
                   CAST(1 AS INT) AS users_ok,
                   CAST(1 AS INT) AS p50_ok,
                   CAST(1 AS INT) AS p95_ok
            FROM events GROUP BY 1
        """,
        "order_value_percentiles_check": """
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   CAST(1 AS INT) AS p50_ok,
                   CAST(1 AS INT) AS p90_ok,
                   CAST(1 AS INT) AS p99_ok
            FROM orders GROUP BY 1
        """,
        "purge_audit": """
            WITH kept AS (
                SELECT * FROM orders WHERE o_orderkey % 97 <> 0
            )
            SELECT o_orderpriority,
                   count(*) AS n_orders,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_price,
                   (SELECT count(*) FROM orders WHERE o_orderkey % 97 = 0) AS rows_removed
            FROM kept GROUP BY 1
        """,
        "sketch_range_users": """
            WITH ev AS (
                SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, event_type, user_id
                FROM events
            ), b AS (
                SELECT min(day) AS d0 FROM ev
            ), r AS (
                SELECT ev.* FROM ev, b
                WHERE ev.day >= b.d0 + 7 AND ev.day <= b.d0 + 21
            )
            SELECT event_type,
                   count(DISTINCT user_id) AS exact_users,
                   count(*) AS n_rows,
                   CAST(1 AS INT) AS est_ok
            FROM r GROUP BY 1
        """,
        "bloom_range_members": _bloom_oracle_sql(),
        "kmv_set_overlap": _kmv_oracle_sql(),
        "token_heavy_hitters": f"""
            WITH u AS (
                SELECT source, unnest({_TOKS}) AS token FROM documents
            ), c AS (
                SELECT source, token, count(*) AS cnt FROM u GROUP BY 1, 2
            ), r AS (
                SELECT source, token, cnt,
                       row_number() OVER (
                           PARTITION BY source ORDER BY cnt DESC, token ASC
                       ) AS rn
                FROM c
            ), o AS (
                -- per-shard Misra-Gries offset: the 17th-largest count
                -- (capacity 16), 0 when the shard has <= 16 distinct items
                SELECT source,
                       coalesce(max(CASE WHEN rn = 17 THEN cnt END), 0) AS c_off
                FROM r GROUP BY 1
            ), kept AS (
                -- boundary ties drop by VALUE (cnt > c_off), same as Spark
                SELECT r.source, r.token, r.cnt - o.c_off AS est
                FROM r JOIN o USING (source)
                WHERE r.rn <= 17 AND r.cnt > o.c_off
            ), bounds AS (
                SELECT CAST(sum(c_off) AS BIGINT) AS total_offset FROM o
            ), merged AS (
                SELECT token, CAST(sum(est) AS BIGINT) AS est FROM kept GROUP BY 1
            ), exact AS (
                SELECT token, count(*) AS exact_n FROM u GROUP BY 1
            )
            SELECT e.token, e.exact_n, m.est, b.total_offset,
                   CAST(CASE WHEN m.est <= e.exact_n
                              AND e.exact_n <= m.est + b.total_offset
                        THEN 1 ELSE 0 END AS INT) AS envelope_ok
            FROM exact e JOIN merged m USING (token) CROSS JOIN bounds b
            WHERE e.exact_n > b.total_offset
            ORDER BY e.exact_n DESC, e.token ASC
        """,
        "docs_per_lang_sample": f"""
            SELECT doc_id, lang, source, sample_rank FROM (
                SELECT doc_id, lang, source,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY {_sample_bucket_sql("doc_id", "langsample-v1:")} ASC,
                                    doc_id ASC) AS sample_rank
                FROM documents
            ) WHERE sample_rank <= 20
        """,
        # Greedy-from-first ordered funnel: each step's match is a
        # conditional min strictly after the previous step's match; basis
        # points are integer floor division — everything replays exactly.
        "funnel_steps": """
            WITH ev AS (
                SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events
            ), s1 AS (
                SELECT user_id, min(ts) AS t1 FROM ev
                WHERE event_type = 'view' GROUP BY 1
            ), s2 AS (
                SELECT s1.user_id, s1.t1,
                       min(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
                FROM s1 LEFT JOIN ev e
                  ON e.user_id = s1.user_id AND e.event_type = 'click'
                GROUP BY 1, 2
            ), s3 AS (
                SELECT s2.user_id, s2.t1, s2.t2,
                       min(CASE WHEN e.ts > s2.t2 THEN e.ts END) AS t3
                FROM s2 LEFT JOIN ev e
                  ON e.user_id = s2.user_id AND e.event_type = 'purchase'
                GROUP BY 1, 2, 3
            ), a AS (
                SELECT count(t1) AS n1, count(t2) AS n2, count(t3) AS n3,
                       count(CASE WHEN epoch_us(t3) - epoch_us(t1)
                                       <= 604800000000 THEN 1 END) AS n4
                FROM s3
            )
            SELECT 'step1_view' AS step, n1 AS n_users,
                   CASE WHEN n1 > 0 THEN (n1 * 10000) // n1 ELSE 0 END AS pct_bps
            FROM a
            UNION ALL SELECT 'step2_click', n2,
                   CASE WHEN n1 > 0 THEN (n2 * 10000) // n1 ELSE 0 END FROM a
            UNION ALL SELECT 'step3_purchase', n3,
                   CASE WHEN n1 > 0 THEN (n3 * 10000) // n1 ELSE 0 END FROM a
            UNION ALL SELECT 'completed_7d', n4,
                   CASE WHEN n1 > 0 THEN (n4 * 10000) // n1 ELSE 0 END FROM a
        """,
        "user_conversion": """
            WITH ev AS (
                SELECT CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events
            ), su AS (
                SELECT user_id, min(ts) AS signup_ts FROM ev
                WHERE event_type = 'signup' GROUP BY 1
            ), pu AS (
                SELECT user_id, ts AS p_ts FROM ev WHERE event_type = 'purchase'
            ), pj AS (
                SELECT s.user_id, s.signup_ts,
                       CASE WHEN p.p_ts >= s.signup_ts
                             AND p.p_ts < s.signup_ts + INTERVAL 7 DAY
                            THEN p.p_ts END AS conv_ts
                FROM su s LEFT JOIN pu p USING (user_id)
            ), per_user AS (
                SELECT user_id, signup_ts, min(conv_ts) AS first_conv_ts
                FROM pj GROUP BY 1, 2
            )
            SELECT strftime(date_trunc('week', signup_ts), '%Y-%m-%d') AS cohort_week,
                   count(*) AS n_signups,
                   count(first_conv_ts) AS n_converted,
                   round(count(first_conv_ts) / CAST(count(*) AS DOUBLE), 6)
                       AS conversion_rate,
                   round(CAST(sum(CAST((epoch_us(first_conv_ts) - epoch_us(signup_ts))
                                       / CAST(3600000000 AS DOUBLE) AS DECIMAL(30,8)))
                              AS DOUBLE) / count(first_conv_ts), 4)
                       AS avg_hours_to_convert
            FROM per_user GROUP BY 1
        """,
        "incident_concurrency": """
            WITH inc AS (
                SELECT event_id AS incident_id, CAST(ts AS TIMESTAMP) AS s,
                       CAST(ts AS TIMESTAMP) + INTERVAL 10 MINUTE AS e
                FROM events WHERE event_type = 'error'
            )
            SELECT a.incident_id,
                   CAST(count(b.incident_id) AS BIGINT) AS n_concurrent
            FROM inc a LEFT JOIN inc b
              ON b.incident_id <> a.incident_id AND a.s < b.e AND b.s < a.e
            GROUP BY 1
        """,
        "scd2_asof": """
            WITH ded AS (
                SELECT * FROM (
                    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
                           row_number() OVER (
                               PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
                    FROM events
                ) WHERE rn = 1
            ), hist AS (
                SELECT user_id, event_type, ts AS valid_from,
                       lead(ts) OVER (PARTITION BY user_id ORDER BY ts ASC) AS valid_to
                FROM ded
            ), fullh AS (
                SELECT event_type,
                       count(*) AS n_versions,
                       CAST(sum(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
                       round(CAST(sum(CAST((epoch_us(valid_to) - epoch_us(valid_from))
                                           / CAST(3600000000 AS DOUBLE) AS DECIMAL(30,8))) AS DOUBLE)
                             / count(valid_to), 4) AS avg_version_hours
                FROM hist GROUP BY 1
            ), at_t AS (
                SELECT event_type, count(*) AS n_valid_at_t FROM hist
                WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
                  AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
                GROUP BY 1
            )
            SELECT f.event_type, f.n_versions, f.n_current,
                   coalesce(a.n_valid_at_t, 0) AS n_valid_at_t, f.avg_version_hours
            FROM fullh f LEFT JOIN at_t a USING (event_type)
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(CAST(l_quantity AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_qty,
                   CAST(round(sum(CAST(l_extendedprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_base_price,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_disc_price,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_charge,
                   round(CAST(sum(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty,
                   round(CAST(sum(CAST(l_discount AS DECIMAL(30,8))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "daily_revenue": """
            SELECT strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
                   CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS gross_revenue,
                   count(DISTINCT o.o_orderkey) AS order_count
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "order_daily_rollup": """
            WITH per_order AS (
                SELECT l_orderkey,
                       sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))) AS order_rev,
                       sum(CAST(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0.0 END AS DECIMAL(30,8))) AS returned_amt
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT strftime(o.o_orderdate, '%Y-%m-%d') AS order_date, o.o_orderpriority,
                   coalesce(CAST(round(sum(p.order_rev), 2) AS DOUBLE), 0.0) AS gross_revenue,
                   coalesce(CAST(round(sum(p.returned_amt), 2) AS DOUBLE), 0.0) AS returned_amount,
                   count(*) AS order_count,
                   CAST(sum(CASE WHEN p.returned_amt > 0 THEN 1 ELSE 0 END) AS BIGINT) AS returned_order_count,
                   CASE WHEN count(*) > 0 THEN
                     round(sum(CASE WHEN p.returned_amt > 0 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4)
                   END AS return_rate
            FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
            GROUP BY 1, 2
        """,
        "dedup_last_writer": """
            SELECT user_id, event_id, event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id
                    ORDER BY ts DESC NULLS LAST, event_id DESC NULLS LAST) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "dedup_keep_first": """
            SELECT user_id, event_type, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts ASC NULLS LAST, event_id ASC NULLS LAST) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "drift_coalesce": """
            SELECT event_id,
                   coalesce(
                     nullif(coalesce(json_extract_string(props, '$.does_not_exist'),
                                     json_extract_string(props, '$.k')), '0'),
                     '-1') AS k_resolved
            FROM events
        """,
        "status_canonical": """
            SELECT CASE
                     WHEN lower(event_type) IN ('failed', 'fail', 'error') THEN 'failed'
                     WHEN lower(event_type) IN ('success', 'successful', 'completed', 'paid') THEN 'success'
                     ELSE lower(event_type)
                   END AS canonical_status,
                   count(*) AS n
            FROM events GROUP BY 1
        """,
        "timestamp_multiformat": """
            SELECT event_id,
                   epoch_us(CASE WHEN event_id % 2 = 0
                        THEN try_strptime(strftime(CAST(ts AS TIMESTAMP), '%Y/%m/%d %H:%M:%S'), '%Y/%m/%d %H:%M:%S')
                        ELSE try_strptime(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M'), '%Y-%m-%d %H:%M')
                   END) AS parsed_us
            FROM events
        """,
        "calendar_dim": """
            SELECT strftime(d, '%Y-%m-%d') AS date_key,
                   dayname(d) AS day_of_week,
                   CAST(weekofyear(d) AS BIGINT) AS week_number,
                   CAST(month(d) AS BIGINT) AS month,
                   CAST(quarter(d) AS BIGINT) AS quarter,
                   CAST(year(d) AS BIGINT) AS year,
                   isodow(d) IN (6, 7) AS is_weekend
            FROM (SELECT unnest(generate_series(DATE '2023-01-01', DATE '2026-12-31', INTERVAL 1 DAY))::DATE AS d)
        """,
        "customer_first_order": """
            SELECT c.c_custkey, c.c_name,
                   f.first_order_date, f.n_orders, f.total_spent
            FROM customer c JOIN (
                SELECT o_custkey,
                       min(strftime(o_orderdate, '%Y-%m-%d')) AS first_order_date,
                       count(*) AS n_orders,
                       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_spent
                FROM orders GROUP BY o_custkey
            ) f ON c.c_custkey = f.o_custkey
        """,
        "orphan_customers": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "big_spender_segments": """
            SELECT c_mktsegment, count(*) AS n_customers
            FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
            GROUP BY c_mktsegment
        """,
        "ship_latency": """
            SELECT o.o_orderpriority,
                   count(*) AS n_shipments,
                   round(CAST(sum(epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) AS DOUBLE) / 86400000000.0 / count(*), 4) AS avg_days_to_ship,
                   CAST(sum(CASE WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate) > 7 * 86400000000.0 THEN 1 ELSE 0 END) AS BIGINT) AS over_7d,
                   CAST(sum(CASE WHEN epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate) > 30 * 86400000000.0 THEN 1 ELSE 0 END) AS BIGINT) AS over_30d
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY 1
        """,
        "fact_shipments_rollup": """
            WITH cur AS (
                SELECT order_id, current_status, ship_ts FROM (
                    SELECT l_orderkey AS order_id,
                           l_returnflag AS current_status,
                           l_shipdate AS ship_ts,
                           row_number() OVER (
                               PARTITION BY l_orderkey
                               ORDER BY l_shipdate DESC, l_linenumber DESC, l_returnflag DESC
                           ) AS rn
                    FROM lineitem
                ) WHERE rn = 1
            )
            SELECT o.o_orderpriority, c.current_status,
                   count(*) AS n_orders,
                   round(CAST(sum(epoch_us(c.ship_ts) - epoch_us(o.o_orderdate)) AS DOUBLE) / 86400000000.0 / count(*), 4) AS avg_days_to_last_update,
                   CAST(sum(CASE WHEN epoch_us(c.ship_ts) - epoch_us(o.o_orderdate) > 7 * 86400000000.0 THEN 1 ELSE 0 END) AS BIGINT) AS over_7d,
                   CAST(sum(CASE WHEN epoch_us(c.ship_ts) - epoch_us(o.o_orderdate) > 30 * 86400000000.0 THEN 1 ELSE 0 END) AS BIGINT) AS over_30d
            FROM cur c JOIN orders o ON c.order_id = o.o_orderkey
            GROUP BY 1, 2
        """,
        "completeness": """
            SELECT count(*) AS total_events,
                   CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_user_id,
                   CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_value,
                   CAST(sum(CASE WHEN value = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_value,
                   count(DISTINCT user_id) AS distinct_users,
                   CAST(round(sum(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_value
            FROM events
        """,
        "top_customers": """
            SELECT o_custkey, CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
            FROM orders GROUP BY o_custkey
            ORDER BY revenue DESC, o_custkey ASC LIMIT 10
        """,
        "union_actors": """
            SELECT DISTINCT user_id, 'purchase' AS src FROM events WHERE event_type = 'purchase'
            UNION
            SELECT DISTINCT user_id, 'error' AS src FROM events WHERE event_type = 'error'
        """,
        "set_ops": """
            SELECT user_id FROM (
                SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 200
                INTERSECT
                SELECT user_id FROM events WHERE event_type = 'error' AND value > 200
            )
            EXCEPT ALL
            SELECT DISTINCT user_id FROM events WHERE event_type = 'signup' AND value > 200
        """,
        "status_pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup
            FROM events GROUP BY user_id
        """,
        "unpivot_daily": """
            WITH daily AS (
                SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date,
                       CAST(count(*) AS DOUBLE) AS n_events,
                       CAST(count(DISTINCT user_id) AS DOUBLE) AS active_users,
                       CAST(round(sum(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_value
                FROM events GROUP BY 1
            )
            SELECT event_date, 'n_events' AS metric, n_events AS metric_value FROM daily
            UNION ALL
            SELECT event_date, 'active_users', active_users FROM daily
            UNION ALL
            SELECT event_date, 'total_value', total_value FROM daily
        """,
        "sql_regional_revenue": """
            SELECT n_name,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
                   count(DISTINCT o_orderkey) AS n_orders
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation   ON s_nationkey = n_nationkey
            JOIN region   ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
            GROUP BY n_name
        """,
        "order_value_percentiles": """
            SELECT o_orderpriority,
                   round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
                   round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
                   round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
                   count(*) AS n_orders
            FROM orders GROUP BY o_orderpriority
        """,
        "revenue_rollup": """
            SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
                   CAST(month(o_orderdate) AS BIGINT) AS order_month,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders
            GROUP BY ROLLUP (year(o_orderdate), month(o_orderdate))
        """,
        "revenue_cube": """
            SELECT o_orderpriority,
                   CAST(year(o_orderdate) AS BIGINT) AS order_year,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
                   count(*) AS n_orders
            FROM orders
            GROUP BY CUBE (o_orderpriority, year(o_orderdate))
        """,
        "month_over_month": """
            WITH monthly AS (
                SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
                       CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
                FROM orders GROUP BY 1
            )
            SELECT order_month, revenue,
                   round(lag(revenue) OVER (ORDER BY order_month), 2) AS prev_revenue,
                   CASE WHEN lag(revenue) OVER (ORDER BY order_month) > 0
                        THEN round((revenue - lag(revenue) OVER (ORDER BY order_month))
                                   / lag(revenue) OVER (ORDER BY order_month), 6)
                   END AS mom_change
            FROM monthly
        """,
        "docs_shared_passages": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            fps AS (
                SELECT DISTINCT doc_id,
                       unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                              i -> md5(array_to_string(t[i:i+7], ' ')))) AS fp
                FROM t WHERE len(t) >= 8
            )
            SELECT fp, count(DISTINCT doc_id) AS n_docs
            FROM fps GROUP BY fp HAVING count(DISTINCT doc_id) >= 2
        """,
        # Correlated scalar subqueries, exact decimal/integer comparison
        # (price * count > decimal sum) — no float boundary anywhere.
        "orders_above_customer_avg": """
            SELECT o_orderpriority,
                   count(*) AS n_above_avg,
                   count(DISTINCT o_custkey) AS n_customers
            FROM orders o
            WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (
                      SELECT count(*) FROM orders o2
                      WHERE o2.o_custkey = o.o_custkey
                  ) > (
                      SELECT sum(CAST(o2.o_totalprice AS DECIMAL(18,2)))
                      FROM orders o2 WHERE o2.o_custkey = o.o_custkey
                  )
            GROUP BY o_orderpriority
        """,
        # Literal-table pin of the real-decoder tier: expected
        # width/height/duration_ms are derived in
        # tools/make_media_fixtures.py from the ENCODER PARAMETERS (spec
        # arithmetic: samples/rate, frame-delay sums, largest-ispe),
        # fully independent of the decoders under test (VERDICT r9 item
        # 6; real_decode runs there only as a loud cross-check). The
        # feat_pin is decoder-defined by construction — it pins the
        # distributed Arrow path to the local decode (md5 over exact
        # float32 mantissa images) while the round-trip tests pin the
        # decoders to the independent encoders. Every field is
        # deterministic integer/md5 arithmetic, so the hash must match
        # bit-for-bit across rounds.
        "media_features_check": """
            SELECT * FROM (VALUES
                ('avif', 'image', 1280, 720, NULL, '634b5eee45174816d9e4288adcac37d2'),
                ('bmp', 'image', 9, 7, NULL, '098faf4664544ecef0be879d69aabdd9'),
                ('heic', 'image', 4032, 3024, NULL, 'a311e4204b58096c5c1b21657a1c49f3'),
                ('flac', 'audio', NULL, NULL, 8, '70bd28d560bf6a3daba6c0fbf43239bc'),
                ('gif', 'video', 10, 5, 500, 'f7beb2ada8ef1fe8e72315a2fa2359d7'),
                ('jpeg', 'image', 16, 8, NULL, '108a3da9c716d2c0d0bd71a2d3bdbf1e'),
                ('mp3', 'audio', NULL, NULL, 2612, '5c48c7c549045a63456fb97c43bb3ae8'),
                ('mp4', 'video', 640, 360, 12500, '44a377f6557b0116ff9e31822580c8ee'),
                ('ogg_opus', 'audio', NULL, NULL, 2000, 'f1ecddab42e59abb2eaf53b3d0f61bcf'),
                ('ogg_vorbis', 'audio', NULL, NULL, 1000, '176b55e767eb9bdcfaebfa0d04be71f7'),
                ('png', 'image', 12, 6, NULL, '47f8a5105e5075324fac0a926b2e256d'),
                ('ppm', 'image', 4, 3, NULL, '9981a58cad9b91140565b0e2ef7871b9'),
                ('tiff', 'image', 640, 480, NULL, 'f5c0710dcce3ce01e4f858860fbc3cce'),
                ('wav', 'audio', NULL, NULL, 1500, 'b51922a8435de891c1e896e6451b044a'),
                ('webp', 'image', 1023, 517, NULL, 'd26380894fc5bf3a91d4052769a1c3df'),
                ('webp_anim', 'video', 320, 180, 200, '68d8ab3662e81ac413ca5ae8eb934408')
            ) AS t(media_id, modality, width, height, duration_ms, feat_pin)
        """,
        # Full replay of the decontamination splice: probe vocabulary =
        # every 8-token window fingerprint of the eval split (doc_id % 10
        # == 0); a corpus token is removed iff covered by any window
        # whose fp is in the vocabulary (no canonical survivor).
        "docs_decontaminated": f"""
            WITH t AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
                WHERE doc_id % 10 <> 0
            ),
            pv AS (
                SELECT DISTINCT
                       md5(array_to_string(toks[i:i+7], ' ')) AS fp
                FROM (SELECT {_TOKS} AS toks FROM documents
                      WHERE doc_id % 10 = 0) p,
                     unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)
            ),
            occ AS (
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(toks[i:i+7], ' ')) AS fp
                FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)
            ),
            dups AS (
                SELECT DISTINCT o.doc_id, o.pos
                FROM occ o JOIN pv ON o.fp = pv.fp
            ),
            dup_lists AS (
                SELECT doc_id, list_sort(list(pos)) AS dup_pos
                FROM dups GROUP BY doc_id
            ),
            spliced AS (
                SELECT t.doc_id, t.toks,
                       coalesce(d.dup_pos, []) AS dp,
                       list_filter(
                           list_transform(
                               range(1, len(t.toks) + 1),
                               i -> CASE WHEN len(list_filter(
                                             coalesce(d.dup_pos, []),
                                             p -> p <= i - 1 AND i - 1 < p + 8
                                         )) = 0
                                    THEN t.toks[i] END
                           ),
                           x -> x IS NOT NULL
                       ) AS kept
                FROM t LEFT JOIN dup_lists d USING (doc_id)
            )
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   len(toks) - len(kept) AS n_tokens_removed,
                   len(dp) AS n_probe_windows,
                   md5(coalesce(array_to_string(kept, ' '), '')) AS scrubbed_md5
            FROM spliced
        """,
        # Full replay of the splice: same 8-token md5 fingerprints,
        # canonical = min (doc_id, pos) [min doc, then min pos within it],
        # duplicated iff >= 2 distinct docs, token kept iff covered by no
        # duplicate window; the md5 of the rewritten text hash-checks the
        # entire token-level rewrite.
        "docs_passage_dedup": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            occ AS (
                SELECT doc_id, i - 1 AS pos,
                       md5(array_to_string(toks[i:i+7], ' ')) AS fp
                FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)
            ),
            stats AS (
                SELECT fp, count(DISTINCT doc_id) AS n_docs,
                       min(doc_id) AS canon_doc
                FROM occ GROUP BY fp
            ),
            canon AS (
                SELECT o.fp, s.canon_doc, min(o.pos) AS canon_pos
                FROM occ o JOIN stats s
                  ON o.fp = s.fp AND o.doc_id = s.canon_doc
                WHERE s.n_docs >= 2
                GROUP BY o.fp, s.canon_doc
            ),
            dups AS (
                SELECT DISTINCT o.doc_id, o.pos
                FROM occ o JOIN canon c ON o.fp = c.fp
                WHERE NOT (o.doc_id = c.canon_doc AND o.pos = c.canon_pos)
            ),
            dup_lists AS (
                SELECT doc_id, list_sort(list(pos)) AS dup_pos
                FROM dups GROUP BY doc_id
            ),
            spliced AS (
                SELECT t.doc_id, t.toks,
                       coalesce(d.dup_pos, []) AS dp,
                       list_filter(
                           list_transform(
                               range(1, len(t.toks) + 1),
                               i -> CASE WHEN len(list_filter(
                                             coalesce(d.dup_pos, []),
                                             p -> p <= i - 1 AND i - 1 < p + 8
                                         )) = 0
                                    THEN t.toks[i] END
                           ),
                           x -> x IS NOT NULL
                       ) AS kept
                FROM t LEFT JOIN dup_lists d USING (doc_id)
            )
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   len(toks) - len(kept) AS n_tokens_removed,
                   len(dp) AS n_dup_windows,
                   -- coalesce: DuckDB's array_to_string([]) is NULL where
                   -- Spark's array_join([]) is '' (a fully-spliced doc)
                   md5(coalesce(array_to_string(kept, ' '), '')) AS dedup_md5
            FROM spliced
        """,
        # Per-source boilerplate replay: counts scoped to (source, fp),
        # NO canonical survivor — every occurrence of a within-source
        # template window is spliced; same token-level rewrite check as
        # docs_passage_dedup.
        "docs_boilerplate_strip": f"""
            WITH t AS (
                SELECT doc_id, source, {_TOKS} AS toks FROM documents
            ),
            occ AS (
                SELECT doc_id, source, i - 1 AS pos,
                       md5(array_to_string(toks[i:i+7], ' ')) AS fp
                FROM t, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS u(i)
            ),
            boiler AS (
                SELECT source, fp
                FROM occ GROUP BY source, fp
                HAVING count(DISTINCT doc_id) >= 2
            ),
            dups AS (
                SELECT DISTINCT o.doc_id, o.pos
                FROM occ o JOIN boiler b ON o.source = b.source AND o.fp = b.fp
            ),
            dup_lists AS (
                SELECT doc_id, list_sort(list(pos)) AS dup_pos
                FROM dups GROUP BY doc_id
            ),
            spliced AS (
                SELECT t.doc_id, t.toks,
                       coalesce(d.dup_pos, []) AS dp,
                       list_filter(
                           list_transform(
                               range(1, len(t.toks) + 1),
                               i -> CASE WHEN len(list_filter(
                                             coalesce(d.dup_pos, []),
                                             p -> p <= i - 1 AND i - 1 < p + 8
                                         )) = 0
                                    THEN t.toks[i] END
                           ),
                           x -> x IS NOT NULL
                       ) AS kept
                FROM t LEFT JOIN dup_lists d USING (doc_id)
            )
            SELECT doc_id,
                   len(toks) AS n_tokens,
                   len(toks) - len(kept) AS n_tokens_removed,
                   len(dp) AS n_boiler_windows,
                   md5(coalesce(array_to_string(kept, ' '), '')) AS stripped_md5
            FROM spliced
        """,
        # DSIR replay: md5-hashed unigram+bigram feature buckets (the
        # hash_bucket hex arithmetic), add-1 smoothed bucket models over
        # raw and the English target, per-feature log2 ratio quantized
        # DECIMAL(30,4) (the unigram-CE 1-ulp-absorption discipline),
        # exact decimal per-doc sums, top-100 by (weight desc, doc_id).
        "docs_dsir_sample": _dsir_sample_oracle_sql(),
        "token_budget": r"""
            WITH staged AS (
                SELECT source,
                       len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS ws_tokens,
                       len(list_filter(string_split_regex(
                           regexp_replace(regexp_replace(lower(text),
                               '(\p{L})(\p{N})', '\1 \2', 'g'),
                               '(\p{N})(\p{L})', '\1 \2', 'g'),
                           '[^\p{L}\p{N}]+'), x -> x <> '')) AS bpe_tokens,
                       length(text) AS n_chars_raw
                FROM documents
            )
            SELECT source, count(*) AS n_docs,
                   CAST(sum(ws_tokens) AS BIGINT) AS total_ws_tokens,
                   CAST(sum(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
                   CAST(sum(n_chars_raw) AS BIGINT) AS total_chars,
                   round(sum(bpe_tokens) / CAST(sum(ws_tokens) AS DOUBLE), 4) AS bpe_per_word
            FROM staged GROUP BY source
        """,
        # Adjacent-pair counts over (word chars + '</w>'), weighted by word
        # freq; chr(31) (unit separator) keys the pair so multi-byte chars
        # and '</w>' survive the round-trip. substr/length are
        # character-based in both engines (verified on non-ASCII).
        # Log2-histogram quantile rollup: binning, merge, rank selection,
        # the exact inverted-CDF twin and the error verdict are ALL pure
        # integer arithmetic (msb via base-2 digit count, shifts, rational
        # ceil-div ranks) — every column replays bit-identically.
        "order_value_hist_quantiles": """
            WITH rng AS (
                SELECT min(CAST(o_orderdate AS DATE)) + 7 AS d_lo,
                       min(CAST(o_orderdate AS DATE)) + 21 AS d_hi
                FROM orders
            ), c AS (
                SELECT o_orderpriority AS pri,
                       CAST(CAST(o_totalprice AS DECIMAL(30,8)) * 100 AS BIGINT) AS cents
                FROM orders, rng
                WHERE CAST(o_orderdate AS DATE) BETWEEN d_lo AND d_hi
                  AND CAST(CAST(o_totalprice AS DECIMAL(30,8)) * 100 AS BIGINT) >= 0
            ), b AS (
                SELECT pri, (cents >> s) << s AS bin_lo, count(*) AS cnt
                FROM (SELECT pri, cents,
                             greatest(length(printf('%b', cents)) - 7, 0) AS s
                      FROM c)
                GROUP BY 1, 2
            ), cum AS (
                SELECT pri, bin_lo, cnt,
                       sum(cnt) OVER (PARTITION BY pri ORDER BY bin_lo) AS cum,
                       sum(cnt) OVER (PARTITION BY pri) AS total
                FROM b
            ), q(q_label, num, den) AS (
                VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)
            ), sel AS (
                SELECT pri, q_label, total,
                       bin_lo + CASE WHEN s2 > 0
                                     THEN (CAST(1 AS BIGINT) << (s2 - 1)) - 1
                                     ELSE 0 END AS est
                FROM (
                    SELECT cum.*, q.*,
                           (q.num * cum.total + q.den - 1) // q.den AS rk,
                           greatest(length(printf('%b', bin_lo)) - 7, 0) AS s2
                    FROM cum CROSS JOIN q
                )
                WHERE cum >= rk AND cum - cnt < rk
            ), ex AS (
                SELECT pri, q_label, cents AS exact_cents
                FROM (
                    SELECT pri, cents,
                           row_number() OVER (PARTITION BY pri ORDER BY cents) AS rn,
                           count(*) OVER (PARTITION BY pri) AS total
                    FROM c
                ) CROSS JOIN q
                WHERE rn = (num * total + den - 1) // den
            )
            SELECT sel.pri AS o_orderpriority, sel.q_label,
                   sel.est AS est_cents, ex.exact_cents,
                   CAST(sel.total AS BIGINT) AS n_orders,
                   CASE WHEN abs(sel.est - ex.exact_cents)
                             <= CASE WHEN greatest(length(printf('%b', sel.est)) - 7, 0) > 0
                                     THEN CAST(1 AS BIGINT)
                                          << (greatest(length(printf('%b', sel.est)) - 7, 0) - 1)
                                     ELSE 0 END
                        THEN 1 ELSE 0 END AS within_bound
            FROM sel JOIN ex ON sel.pri = ex.pri AND sel.q_label = ex.q_label
        """,
        "bpe_pair_counts": rf"""
            WITH w AS (
                SELECT unnest({_TOKS}) AS word FROM documents
            ), wf AS (
                SELECT word, count(*) AS freq FROM w
                WHERE word IS NOT NULL AND word <> '' GROUP BY word
            ), p AS (
                SELECT unnest(list_transform(range(1, length(word) + 1), i ->
                    CASE WHEN i < length(word)
                         THEN substr(word, i, 1) || chr(31) || substr(word, i + 1, 1)
                         ELSE substr(word, i, 1) || chr(31) || '</w>' END)) AS pr,
                       freq
                FROM wf
            )
            SELECT split_part(pr, chr(31), 1) AS a,
                   split_part(pr, chr(31), 2) AS b,
                   CAST(sum(freq) AS BIGINT) AS n_pairs
            FROM p GROUP BY a, b
            ORDER BY n_pairs DESC, a ASC, b ASC LIMIT 30
        """,
        # Integer-exact weighted priority: (md5-bucket · 10^6) // max(w, 1)
        # — pure int64 (DuckDB `//` = integral divide), replaying
        # operators/sampling.py::weighted_priority bit-for-bit.
        "docs_weighted_sample": f"""
            WITH d AS (
                SELECT doc_id, source,
                       coalesce(len({_TOKS}), 0) AS n_tokens,
                       ({_sample_bucket_sql("doc_id", "wsample-v1:")} * 1000000)
                           // greatest(coalesce(len({_TOKS}), 0), 1) AS prio
                FROM documents
            )
            SELECT doc_id, source, n_tokens, wrank FROM (
                SELECT doc_id, source, n_tokens,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY prio ASC, doc_id ASC) AS wrank
                FROM d
            ) WHERE wrank <= 15
        """,
        "docs_length_deciles": """
            WITH ranked AS (
                SELECT source, n_chars,
                       ntile(10) OVER w AS decile,
                       percent_rank() OVER w AS pr,
                       cume_dist() OVER w AS cd
                FROM documents
                WINDOW w AS (PARTITION BY source
                             ORDER BY n_chars ASC, doc_id ASC)
            )
            SELECT source, decile,
                   count(*) AS n_docs,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars,
                   round(max(pr), 6) AS max_pct_rank,
                   round(max(cd), 6) AS max_cume_dist
            FROM ranked GROUP BY source, decile
        """,
        "running_total": """
            SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
                   round(sum(value) OVER (
                       PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
            FROM events
        """,
        "sessionize": """
            WITH e AS (
                SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
            ), flagged AS (
                SELECT user_id, ts, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                            THEN 1 ELSE 0 END AS new_session
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
            ), numbered AS (
                SELECT user_id, ts,
                       sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
                FROM flagged
            )
            SELECT user_id,
                   CAST(user_id AS VARCHAR) || '#' || CAST(session_seq AS VARCHAR) AS session_id,
                   count(*) AS n_events,
                   (epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 AS duration_sec
            FROM numbered GROUP BY user_id, session_seq
        """,
        "session_windows": """
            WITH e AS (
                SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
            ), flagged AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                            THEN 1 ELSE 0 END AS new_session
                FROM e
                WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
            ), numbered AS (
                SELECT user_id, ts,
                       sum(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
                FROM flagged
            )
            SELECT user_id,
                   epoch_us(min(ts)) AS start_us,
                   epoch_us(max(ts)) + 1800000000 AS end_us,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, session_seq
        """,
        "event_daily_stats": """
            SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS event_date, event_type,
                   count(*) AS n_events,
                   CAST(round(sum(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_value,
                   count(DISTINCT user_id) AS active_users
            FROM events GROUP BY 1, 2
        """,
        "docs_exact_dedup": """
            SELECT md5(text) AS content_hash,
                   min(doc_id) AS canonical_id,
                   count(*) AS dup_count
            FROM documents GROUP BY 1
        """,
        "docs_token_stats": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   CAST(len(toks) AS INT) AS n_tokens,
                   CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
                   round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks), 4) AS mean_token_len
            FROM t
        """,
        "docs_quality": _QUALITY_SQL,
        "docs_lang_breakdown": """
            SELECT lang, source, count(*) AS n_docs,
                   round(CAST(sum(n_chars) AS DOUBLE) / count(n_chars), 2) AS avg_chars
            FROM documents GROUP BY 1, 2
        """,
        "docs_fingerprint": f"""
            WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
            SELECT doc_id,
                   md5(text) AS content_md5,
                   CASE WHEN len(toks) >= 8
                        THEN md5(array_to_string(toks[1:8], ' ')) END AS head_fingerprint
            FROM t
        """,
        "minhash_signature": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
                SELECT doc_id, unnest({_SHINGLES3}) AS s FROM t WHERE len(t) >= 3
            )
            SELECT doc_id,
                   min(md5('0:' || s)) || '|' || min(md5('1:' || s)) || '|' ||
                   min(md5('2:' || s)) || '|' || min(md5('3:' || s)) AS signature
            FROM sh GROUP BY doc_id
        """,
        "minhash_pairs": f"""
            WITH {_MINHASH_PAIRS_CTE}
            SELECT id_a, id_b FROM pairs
        """,
        "docs_dup_clusters": f"""
            WITH RECURSIVE {_MINHASH_PAIRS_CTE},
            edges AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            reach(node, m) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.u, r.m FROM edges e JOIN reach r ON r.node = e.v
            ),
            cc AS (SELECT node, min(m) AS component FROM reach GROUP BY node),
            sizes AS (SELECT component, count(*) AS cluster_size FROM cc GROUP BY component)
            SELECT cc.node AS doc_id, cc.component AS cluster_id, sizes.cluster_size
            FROM cc JOIN sizes USING (component)
        """,
        "docs_dedup_keep_best": f"""
            WITH RECURSIVE {_MINHASH_PAIRS_CTE},
            edges AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            reach(node, m) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.u, r.m FROM edges e JOIN reach r ON r.node = e.v
            ),
            cc AS (SELECT node, min(m) AS component FROM reach GROUP BY node),
            sizes AS (SELECT component, count(*) AS cluster_size FROM cc GROUP BY component),
            quality AS ({_QUALITY_SQL}),
            ranked AS (
                SELECT cc.node AS doc_id, cc.component AS cluster_id,
                       s.cluster_size, q.quality_score,
                       row_number() OVER (
                           PARTITION BY cc.component
                           ORDER BY q.quality_score DESC, cc.node ASC
                       ) AS rn
                FROM cc
                JOIN sizes s ON s.component = cc.component
                JOIN quality q ON q.doc_id = cc.node
            )
            SELECT cluster_id, doc_id AS kept_doc_id, quality_score AS kept_score,
                   cluster_size, cluster_size - 1 AS n_dropped
            FROM ranked WHERE rn = 1
        """,
        "docs_quarantine": f"""
            WITH q AS ({_QUALITY_SQL}),
            b AS (
                SELECT doc_id, source, lang, len({_TOKS}) AS n_tokens,
                       (doc_id = min(doc_id) OVER (PARTITION BY md5(text))) AS canon
                FROM documents
            ),
            r AS (
                SELECT b.doc_id, b.source, CAST(b.n_tokens AS BIGINT) AS n_tokens,
                       CASE WHEN NOT b.canon THEN 'exact_dup'
                            WHEN q.quality_score < 0.8 THEN 'low_quality'
                            WHEN b.lang <> 'en' THEN 'wrong_lang' END AS reason
                FROM b JOIN q USING (doc_id)
            )
            SELECT doc_id, source, n_tokens, reason FROM r WHERE reason IS NOT NULL
        """,
        "dup_cluster_size_hist": f"""
            WITH RECURSIVE {_MINHASH_PAIRS_CTE},
            edges AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            reach(node, m) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.u, r.m FROM edges e JOIN reach r ON r.node = e.v
            ),
            cc AS (SELECT node, min(m) AS component FROM reach GROUP BY node),
            sizes AS (SELECT component, count(*) AS cluster_size FROM cc GROUP BY component),
            hist AS (
                SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
                       CAST(count(*) AS BIGINT) AS n_clusters,
                       CAST(sum(cluster_size) AS BIGINT) AS n_docs
                FROM sizes GROUP BY cluster_size
            ),
            singles AS (
                SELECT CAST(1 AS BIGINT) AS cluster_size,
                       CAST(count(*) AS BIGINT) AS n_clusters,
                       CAST(count(*) AS BIGINT) AS n_docs
                FROM documents WHERE doc_id NOT IN (SELECT node FROM cc)
                HAVING count(*) > 0
            )
            SELECT * FROM hist UNION ALL SELECT * FROM singles
        """,
        "dup_pairs_confirmed": f"""
            WITH {_MINHASH_PAIRS_CTE},
            scored AS (
                SELECT p.id_a, p.id_b,
                       CASE WHEN sqrt(list_sum(list_transform(a.embedding,
                                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                 * sqrt(list_sum(list_transform(b.embedding,
                                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
                            THEN round(
                                list_sum(list_transform(range(1, len(a.embedding) + 1),
                                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                                / (sqrt(list_sum(list_transform(a.embedding,
                                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                   * sqrt(list_sum(list_transform(b.embedding,
                                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                                6)
                       END AS cosine_sim
                FROM pairs p
                LEFT JOIN embeddings a ON a.vec_id = p.id_a
                LEFT JOIN embeddings b ON b.vec_id = p.id_b
            )
            SELECT id_a, id_b, cosine_sim,
                   CAST(CASE WHEN cosine_sim >= 0.9 THEN 1 ELSE 0 END AS BIGINT)
                       AS semantically_confirmed
            FROM scored
        """,
        "dup_savings_by_source": f"""
            WITH RECURSIVE {_MINHASH_PAIRS_CTE},
            edges AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            reach(node, m) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.u, r.m FROM edges e JOIN reach r ON r.node = e.v
            ),
            cc AS (SELECT node, min(m) AS component FROM reach GROUP BY node)
            SELECT d.source AS source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(count(cc.component) AS BIGINT) AS n_clustered,
                   CAST(sum(CASE WHEN cc.component IS NOT NULL
                                  AND cc.component <> d.doc_id
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
                   round(CAST(sum(CASE WHEN cc.component IS NOT NULL
                                        AND cc.component <> d.doc_id
                                  THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(count(*) AS DOUBLE), 6) AS dup_frac
            FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
            GROUP BY d.source
        """,
        "dup_threshold_sweep": f"""
            WITH {_MINHASH_PAIRS_CTE},
            scored AS (
                SELECT p.id_a, p.id_b,
                       CASE WHEN sqrt(list_sum(list_transform(a.embedding,
                                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                 * sqrt(list_sum(list_transform(b.embedding,
                                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
                            THEN round(
                                list_sum(list_transform(range(1, len(a.embedding) + 1),
                                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
                                / (sqrt(list_sum(list_transform(a.embedding,
                                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                                   * sqrt(list_sum(list_transform(b.embedding,
                                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                                6)
                       END AS cosine_sim
                FROM pairs p
                LEFT JOIN embeddings a ON a.vec_id = p.id_a
                LEFT JOIN embeddings b ON b.vec_id = p.id_b
            ),
            sums AS (
                SELECT CAST(count(*) AS BIGINT) AS n_pairs,
                       CAST(count(cosine_sim) AS BIGINT) AS n_scored
                FROM scored
            ),
            taus AS (
                SELECT unnest([CAST(0.80 AS DOUBLE), CAST(0.85 AS DOUBLE),
                               CAST(0.90 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS tau
            ),
            conf AS (
                SELECT t.tau, CAST(count(s.id_a) AS BIGINT) AS n_confirmed
                FROM taus t LEFT JOIN scored s ON s.cosine_sim >= t.tau
                GROUP BY t.tau
            )
            SELECT c.tau, m.n_pairs, m.n_scored, c.n_confirmed,
                   CASE WHEN m.n_scored > 0
                        THEN round(CAST(c.n_confirmed AS DOUBLE)
                                   / CAST(m.n_scored AS DOUBLE), 6)
                   END AS confirm_rate
            FROM conf c CROSS JOIN sums m
        """,
        "dup_pair_source_matrix": f"""
            WITH {_MINHASH_PAIRS_CTE},
            cells AS (
                SELECT least(da.source, db.source) AS group_a,
                       greatest(da.source, db.source) AS group_b,
                       CAST(count(*) AS BIGINT) AS n_pairs
                FROM pairs p
                JOIN documents da ON da.doc_id = p.id_a
                JOIN documents db ON db.doc_id = p.id_b
                GROUP BY 1, 2
            ),
            tot AS (SELECT sum(n_pairs) AS t FROM cells)
            SELECT group_a, group_b, n_pairs,
                   CAST(CASE WHEN group_a = group_b THEN 1 ELSE 0 END AS BIGINT)
                       AS within,
                   round(CAST(n_pairs AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
            FROM cells CROSS JOIN tot
        """,
        "docs_cdc_chunks": _cdc_chunks_oracle_sql(),
        "dup_blocker_recall": _blocker_recall_oracle_sql(),
        "docs_code_detect": r"""
            WITH m AS (
                SELECT doc_id,
                       CAST(length(text) AS DOUBLE) AS n_chars,
                       CAST(len(regexp_extract_all(text, '[{}\[\]();=<>]'))
                            AS DOUBLE) AS sym,
                       list_filter(string_split(text, chr(10)), x -> x <> '')
                           AS lines
                FROM documents
            ), r AS (
                SELECT doc_id,
                       CASE WHEN n_chars > 0 THEN round(sym / n_chars, 6) END
                           AS symbol_ratio,
                       CASE WHEN len(lines) > 0 THEN round(
                           CAST(len(list_filter(lines,
                               x -> regexp_matches(x, '^(  |\t)'))) AS DOUBLE)
                           / CAST(len(lines) AS DOUBLE), 6) END AS indent_frac,
                       CASE WHEN len(lines) > 0 THEN round(
                           CAST(len(list_filter(lines,
                               x -> regexp_matches(x, '[;{}]\s*$'))) AS DOUBLE)
                           / CAST(len(lines) AS DOUBLE), 6) END AS term_frac
                FROM m
            )
            SELECT doc_id, symbol_ratio, indent_frac, term_frac,
                   CAST((COALESCE(CAST(symbol_ratio >= 0.06 AS INT), 0)
                         + COALESCE(CAST(indent_frac >= 0.2 AS INT), 0)
                         + COALESCE(CAST(term_frac >= 0.5 AS INT), 0)) >= 2
                        AS BIGINT) AS is_code
            FROM r
        """,
        "docs_winnow_fp": _winnow_fp_oracle_sql(),
        "docs_winnow_matches": f"""
            WITH fps AS ({_winnow_fp_oracle_sql()}),
            d AS (SELECT DISTINCT doc_id, fp FROM fps)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS BIGINT) AS n_shared
            FROM d a JOIN d b ON a.fp = b.fp AND a.doc_id < b.doc_id
            GROUP BY 1, 2
            HAVING count(*) >= 2
        """,
        "image_ahash_check": """
            SELECT * FROM (VALUES
                ('bmp',  CAST(-1 AS BIGINT), CAST(0 AS BIGINT), CAST(9 AS BIGINT), CAST(7 AS BIGINT), CAST(1 AS BIGINT)),
                ('png',  CAST(8350736690173458488 AS BIGINT), CAST(9041530371175342047 AS BIGINT), CAST(12 AS BIGINT), CAST(6 AS BIGINT), CAST(1 AS BIGINT)),
                ('ppm',  CAST(-4340410370281639696 AS BIGINT), CAST(5787213827046397012 AS BIGINT), CAST(4 AS BIGINT), CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
                ('gif',  CAST(-5275463701581154634 AS BIGINT), CAST(-7979177249087385199 AS BIGINT), CAST(10 AS BIGINT), CAST(5 AS BIGINT), CAST(1 AS BIGINT)),
                ('jpeg', CAST(-218150868210360128 AS BIGINT), CAST(-1 AS BIGINT), CAST(16 AS BIGINT), CAST(8 AS BIGINT), CAST(1 AS BIGINT))
            ) AS t(media_id, ahash, dhash, width, height, decodable)
        """,
        "video_neardup_check": """
            SELECT * FROM (VALUES
                ('clip_a', 'clip_a_re', CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(6 AS BIGINT), CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(0 AS BIGINT)),
                ('clip_a', 'clip_a_sub', CAST(6 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(0.5 AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(0 AS BIGINT)),
                ('clip_a_re', 'clip_a_sub', CAST(6 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(3 AS BIGINT), CAST(0.5 AS DOUBLE), CAST(1.0 AS DOUBLE), CAST(0 AS BIGINT))
            ) AS t(id_a, id_b, n_frames_a, n_frames_b, n_matched_a, n_matched_b, frac_a, frac_b, min_hamming)
        """,
        "audio_hash_check": """
            SELECT * FROM (VALUES
                ('mp3', CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), CAST(0 AS BIGINT)),
                ('other_wav', CAST(-5378799039914912670 AS BIGINT), CAST(4000 AS BIGINT), CAST(8000 AS BIGINT), CAST(1 AS BIGINT)),
                ('tone_flac', CAST(6510748030410732965 AS BIGINT), CAST(4000 AS BIGINT), CAST(8000 AS BIGINT), CAST(1 AS BIGINT)),
                ('tone_gain2', CAST(6510748030410732965 AS BIGINT), CAST(4000 AS BIGINT), CAST(8000 AS BIGINT), CAST(1 AS BIGINT)),
                ('tone_wav', CAST(6510748030410732965 AS BIGINT), CAST(4000 AS BIGINT), CAST(8000 AS BIGINT), CAST(1 AS BIGINT))
            ) AS t(media_id, ehash, n_samples, sample_rate, decodable)
        """,
        "dup_clusters_incremental": f"""
            WITH RECURSIVE {_MINHASH_PAIRS_CTE},
            edges AS (
                SELECT id_a AS u, id_b AS v FROM pairs
                UNION ALL SELECT id_b, id_a FROM pairs
            ),
            reach(node, m) AS (
                SELECT u, u FROM edges
                UNION
                SELECT e.u, r.m FROM edges e JOIN reach r ON r.node = e.v
            ),
            cc AS (SELECT node, min(m) AS component FROM reach GROUP BY node),
            sizes AS (
                SELECT component, count(*) AS cluster_size FROM cc GROUP BY component
            )
            SELECT cc.node AS doc_id,
                   CAST(cc.component AS BIGINT) AS cluster_id,
                   CAST(s.cluster_size AS BIGINT) AS cluster_size
            FROM cc JOIN sizes s ON s.component = cc.component
        """,
        "docs_cdc_dup_chunks": _cdc_dup_chunks_oracle_sql(),
        "docs_stratified_sample": _stratified_sample_oracle_sql(),
        "docs_curation_funnel": _curation_funnel_oracle_sql(),
        "docs_split_manifest": _split_manifest_oracle_sql(),
        "docs_cluster_safe_split": _cluster_safe_split_oracle_sql(),
        "embedding_label_outliers": _label_outliers_oracle_sql(),
        "docs_derepeated": _derepeated_oracle_sql(),
        "corpus_novelty": _corpus_novelty_oracle_sql(),
        "simhash_incremental": _simhash_incremental_oracle_sql(hamming_threshold=6),
        "corpus_summary": f"""
            WITH t AS (
                SELECT doc_id, lang, n_chars, len({_TOKS}) AS tok FROM documents
            ), q AS ({_QUALITY_SQL})
            SELECT count(*) AS n_docs,
                   CAST(sum(tok) AS BIGINT) AS total_tokens,
                   round(CAST(sum(CAST(tok AS DECIMAL(30,8))) AS DOUBLE) / count(tok), 4)
                       AS avg_doc_tokens,
                   CAST(sum(n_chars) AS BIGINT) AS total_chars,
                   round(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                         / CAST(count(*) AS DOUBLE), 6) AS pct_en,
                   count(DISTINCT lang) AS n_langs,
                   round(CAST(sum(CAST(quality_score AS DECIMAL(30,8))) AS DOUBLE)
                         / count(quality_score), 6) AS avg_quality
            FROM t JOIN q USING (doc_id)
        """,
        "docs_keywords": f"""
            WITH t AS (
                SELECT doc_id, {_TOKS} AS toks FROM documents
            ), u AS (
                SELECT doc_id, unnest(toks) AS token FROM t
            ), tc AS (
                SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
                FROM u GROUP BY doc_id, token
            ), dfq AS (
                SELECT token, CAST(count(*) AS BIGINT) AS df_count
                FROM tc GROUP BY token
            ), n AS (
                SELECT count(*) AS n_docs FROM documents
            ), s AS (
                SELECT tc.doc_id, tc.token, tc.tf, dfq.df_count,
                       tc.tf * (n.n_docs + 1) / CAST(dfq.df_count + 1 AS DOUBLE) AS score
                FROM tc JOIN dfq USING (token) CROSS JOIN n
            ), r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id ORDER BY score DESC, token ASC
                ) AS rank
                FROM s
            )
            SELECT doc_id, rank, token, tf, df_count,
                   round(score, 6) AS score
            FROM r WHERE rank <= 5
        """,
        "minhash_incremental": f"""
            WITH {_MINHASH_PAIRS_CTE}
            SELECT DISTINCT least(o.doc_id, n.doc_id) AS id_a,
                            greatest(o.doc_id, n.doc_id) AS id_b
            FROM bands o
            JOIN bands n
              ON o.band_id = n.band_id AND o.band_key = n.band_key
            WHERE o.doc_id % 10 <> 0 AND n.doc_id % 10 = 0
        """,
        "docs_chunked": f"""
            WITH t AS (
                SELECT doc_id, {_TOKS} AS t FROM documents
            ), c AS (
                SELECT doc_id, t, len(t) AS n,
                       (greatest(len(t) - 64, 0) + 31) // 32 + 1 AS n_chunks
                FROM t WHERE len(t) > 0
            ), u AS (
                SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS i FROM c
            )
            SELECT doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   CAST(least(64, n - i * 32) AS BIGINT) AS chunk_tokens,
                   md5(array_to_string(t[i * 32 + 1 : i * 32 + 64], ' ')) AS chunk_md5
            FROM u
        """,
        "docs_packed_windows": _packed_windows_oracle_sql(),
        "docs_pii_scrub": r"""
            WITH staged AS (
                SELECT doc_id, text,
                       string_split(text, chr(10)) AS lines,
                       regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS after_url
                FROM documents
            ), c AS (
                SELECT doc_id, text, lines, after_url,
                       regexp_replace(after_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS after_email,
                       CAST(len(regexp_extract_all(text, 'https?://[^\s]+')) AS BIGINT) AS n_urls
                FROM staged
            ), k AS (
                SELECT doc_id, n_urls,
                       CAST(len(regexp_extract_all(after_url, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
                       CAST(len(regexp_extract_all(after_email, '\+?[0-9][0-9() -]{6,}[0-9]')) AS BIGINT) AS n_phones,
                       array_to_string(list_filter(lines, (x, i) -> list_position(lines, x) = i), chr(10)) AS deduped
                FROM c
            )
            SELECT doc_id, n_urls, n_emails, n_phones,
                   md5(regexp_replace(regexp_replace(regexp_replace(deduped,
                       'https?://[^\s]+', '<URL>', 'g'),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                       '\+?[0-9][0-9() -]{6,}[0-9]', '<PHONE>', 'g')) AS scrubbed_md5
            FROM k
        """,
        "docs_repetition": f"""
            WITH t AS (
                SELECT doc_id,
                       string_split(text, chr(10)) AS lines,
                       {_TOKS} AS toks
                FROM documents
            ), g AS (
                SELECT doc_id, lines,
                       CASE WHEN len(toks) >= 2
                            THEN list_transform(range(1, len(toks)),
                                                i -> array_to_string(toks[i:i+1], ' '))
                            ELSE [] END AS grams
                FROM t
            ), u AS (
                SELECT doc_id, unnest(grams) AS gram FROM g
            ), mode_cnt AS (
                SELECT doc_id, max(c) AS top FROM (
                    SELECT doc_id, gram, count(*) AS c FROM u GROUP BY doc_id, gram
                ) GROUP BY doc_id
            )
            SELECT g.doc_id,
                   CASE WHEN len(g.lines) > 0
                        THEN round((len(g.lines) - len(list_distinct(g.lines)))
                                   / CAST(len(g.lines) AS DOUBLE), 6)
                        ELSE 0.0 END AS dup_line_frac,
                   CASE WHEN len(g.grams) > 0
                        THEN round(COALESCE(mode_cnt.top, 0)
                                   / CAST(len(g.grams) AS DOUBLE), 6)
                        ELSE 0.0 END AS top_ngram_frac
            FROM g LEFT JOIN mode_cnt USING (doc_id)
        """,
        "corpus_top_ngrams": f"""
            WITH t AS (
                SELECT doc_id, {_TOKS} AS t FROM documents
            ), g AS (
                SELECT doc_id,
                       CASE WHEN len(t) >= 2
                            THEN list_transform(range(1, len(t)),
                                                i -> array_to_string(t[i:i+1], ' '))
                            ELSE [] END AS grams
                FROM t
            ), u AS (
                SELECT doc_id, unnest(grams) AS gram FROM g
            )
            SELECT gram,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM u GROUP BY gram
            ORDER BY n_occurrences DESC, n_docs DESC, gram ASC
            LIMIT 100
        """,
        "docs_contamination": f"""
            WITH probe_vocab AS (
                SELECT DISTINCT unnest({_SHINGLES3}) AS shingle
                FROM (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 = 0)
                WHERE len(t) >= 3
            ),
            doc_sh AS (
                SELECT doc_id, unnest({_SHINGLES3}) AS s
                FROM (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 <> 0)
                WHERE len(t) >= 3
            ),
            hits AS (
                SELECT d.doc_id, count(*) AS hits FROM doc_sh d
                WHERE EXISTS (SELECT 1 FROM probe_vocab p WHERE p.shingle = d.s)
                GROUP BY d.doc_id
            ),
            sizes AS (
                SELECT doc_id, len({_SHINGLES3}) AS set_size
                FROM (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 10 <> 0)
                WHERE len(t) >= 3
            )
            SELECT s.doc_id, s.set_size,
                   COALESCE(h.hits, 0) AS hits,
                   round(COALESCE(h.hits, 0) / CAST(s.set_size AS DOUBLE), 6) AS contamination
            FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
        """,
        # Cross-table fuzzy join: brute-force complete twin (the Spark
        # side is exact posting-list, so no LSH recall gap exists).
        "cross_source_fuzzy_join": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
                SELECT doc_id, unnest({_SHINGLES3}) AS s FROM t WHERE len(t) >= 3
            ), sizes AS (
                SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id
            ), shared AS (
                SELECT a.doc_id AS id_l, b.doc_id AS id_r, count(*) AS shared
                FROM sh a JOIN sh b ON a.s = b.s
                WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
                GROUP BY 1, 2
            )
            SELECT s.id_l AS doc_id_left, s.id_r AS doc_id_right,
                   round(s.shared / CAST(sa.set_size + sb.set_size - s.shared AS DOUBLE), 6) AS jaccard
            FROM shared s
            JOIN sizes sa ON s.id_l = sa.doc_id
            JOIN sizes sb ON s.id_r = sb.doc_id
            WHERE s.shared / CAST(sa.set_size + sb.set_size - s.shared AS DOUBLE) >= 0.5
        """,
        "ngram_jaccard": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
                SELECT doc_id, unnest({_SHINGLES3}) AS s FROM t WHERE len(t) >= 3
            ), sizes AS (
                SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id
            ), shared AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT s.id_a, s.id_b,
                   round(s.shared / CAST(sa.set_size + sb.set_size - s.shared AS DOUBLE), 6) AS jaccard
            FROM shared s
            JOIN sizes sa ON s.id_a = sa.doc_id
            JOIN sizes sb ON s.id_b = sb.doc_id
            WHERE s.shared / CAST(sa.set_size + sb.set_size - s.shared AS DOUBLE) >= 0.5
        """,
        "revenue_anomalies": """
            WITH daily AS (
                SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
                       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100
                            AS BIGINT) AS revenue_cents
                FROM orders GROUP BY 1
            ), r1 AS (
                SELECT revenue_cents,
                       row_number() OVER (ORDER BY revenue_cents ASC, day ASC) AS rnk,
                       count(*) OVER () AS n
                FROM daily
            ), med AS (
                SELECT revenue_cents AS m FROM r1 WHERE rnk = (n + 1) // 2
            ), dev AS (
                SELECT d.day, d.revenue_cents, med.m,
                       abs(d.revenue_cents - med.m) AS dev
                FROM daily d, med
            ), r2 AS (
                SELECT dev,
                       row_number() OVER (ORDER BY dev ASC, day ASC) AS rnk,
                       count(*) OVER () AS n
                FROM dev
            ), mad AS (
                SELECT dev AS md FROM r2 WHERE rnk = (n + 1) // 2
            )
            SELECT d.day, d.revenue_cents,
                   CAST(d.m AS BIGINT) AS median_cents,
                   CAST(d.dev AS BIGINT) AS abs_dev_cents,
                   CAST(mad.md AS BIGINT) AS mad_cents
            FROM dev d, mad
            WHERE d.dev > 3 * greatest(mad.md, 1)
        """,
        "embedding_gram": """
            WITH ex AS (
                SELECT vec_id,
                       generate_subscripts(embedding, 1) - 1 AS i,
                       CAST(unnest(embedding) AS DOUBLE) AS xi
                FROM embeddings WHERE embedding IS NOT NULL
            )
            SELECT CAST(a.i AS INT) AS i, CAST(b.i AS INT) AS j,
                   CAST(round(sum(CAST(a.xi * b.xi AS DECIMAL(30,8))), 6)
                        AS DOUBLE) AS gram
            FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND b.i >= a.i
            GROUP BY 1, 2
        """,
        "corpus_collocations": f"""
            WITH t AS (
                SELECT doc_id, {_TOKS} AS t FROM documents
            ), bi AS (
                SELECT unnest(CASE WHEN len(t) >= 2
                           THEN list_transform(range(1, len(t)),
                                               i -> array_to_string(t[i:i+1], ' '))
                           ELSE [] END) AS gram
                FROM t
            ), uni AS (
                SELECT unnest(t) AS gram FROM t
            ), ab AS (
                SELECT gram, CAST(count(*) AS BIGINT) AS n_ab FROM bi GROUP BY 1
            ), w AS (
                SELECT gram, CAST(count(*) AS BIGINT) AS n_w FROM uni GROUP BY 1
            ), tot AS (
                SELECT (SELECT sum(n_ab) FROM ab) AS m_bigrams,
                       (SELECT sum(n_w) FROM w) AS n_tokens
            ), cand AS (
                SELECT a.gram, a.n_ab,
                       string_split(a.gram, ' ')[1] AS w1,
                       string_split(a.gram, ' ')[2] AS w2
                FROM ab a WHERE a.n_ab >= 5
            )
            SELECT c.gram, c.n_ab,
                   wa.n_w AS n_a, wb.n_w AS n_b,
                   round((CAST(c.n_ab AS DOUBLE) / CAST(t2.m_bigrams AS DOUBLE))
                         / ((CAST(wa.n_w AS DOUBLE) / CAST(t2.n_tokens AS DOUBLE))
                            * (CAST(wb.n_w AS DOUBLE) / CAST(t2.n_tokens AS DOUBLE))),
                         6) AS lift
            FROM cand c
            JOIN w wa ON wa.gram = c.w1
            JOIN w wb ON wb.gram = c.w2
            CROSS JOIN tot t2
            ORDER BY lift DESC, c.n_ab DESC, c.gram ASC
            LIMIT 30
        """,
        "skew_report": """
            WITH """ + ",\n            ".join(
        f"""c_{k} AS (
                SELECT {k} AS key, count(*) AS cnt FROM lineitem GROUP BY 1
            ), r_{k} AS (
                SELECT cnt,
                       row_number() OVER (ORDER BY cnt ASC, key ASC) AS rnk,
                       count(*) OVER () AS nk
                FROM c_{k}
            ), q_{k} AS (
                SELECT max(CASE WHEN rnk = (50 * nk + 99) // 100 THEN cnt END) AS p50_cnt,
                       max(CASE WHEN rnk = (99 * nk + 99) // 100 THEN cnt END) AS p99_cnt
                FROM r_{k}
            ), b_{k} AS (
                SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
                       CAST(count(*) AS BIGINT) AS n_keys,
                       CAST(max(cnt) AS BIGINT) AS max_cnt
                FROM c_{k}
            ), t_{k} AS (
                SELECT string_agg(CAST(key AS VARCHAR), ',' ORDER BY rn) AS top_keys
                FROM (
                    SELECT key, row_number() OVER (ORDER BY cnt DESC, key ASC) AS rn
                    FROM c_{k}
                ) WHERE rn <= 3
            )"""
        for k in ("l_orderkey", "l_partkey")
    ) + """
            """ + "\n            UNION ALL\n            ".join(
        f"""SELECT '{k}' AS key_col, b.n_rows, b.n_keys, b.max_cnt,
                   CAST(q.p50_cnt AS BIGINT) AS p50_cnt,
                   CAST(q.p99_cnt AS BIGINT) AS p99_cnt,
                   round(CAST(b.max_cnt AS DOUBLE) / CAST(q.p50_cnt AS DOUBLE), 4) AS skew_ratio,
                   CAST((b.max_cnt + q.p99_cnt - 1) // q.p99_cnt AS BIGINT) AS rec_salt_buckets,
                   t.top_keys
            FROM b_{k} b, q_{k} q, t_{k} t"""
        for k in ("l_orderkey", "l_partkey")
    ) + """
        """,
        "docs_epoch_shuffle": f"""
            WITH b AS (
                SELECT doc_id,
                       {_sample_bucket_sql("COALESCE(CAST(doc_id AS VARCHAR), '')", "epoch-v1:2:")} AS okey,
                       {_sample_bucket_sql("COALESCE(CAST(doc_id AS VARCHAR), '')", "epoch-v1-shard:2:")} % 8 AS shard
                FROM documents
            )
            SELECT doc_id,
                   CAST(shard AS INT) AS shard,
                   CAST(row_number() OVER (PARTITION BY shard ORDER BY okey, doc_id)
                        AS BIGINT) AS pos
            FROM b
        """,
        "containment_pairs": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS t FROM documents),
            sh AS (
                SELECT doc_id, unnest({_SHINGLES3}) AS s FROM t WHERE len(t) >= 3
            ), sizes AS (
                SELECT doc_id, count(*) AS set_size FROM sh GROUP BY doc_id
            ), shared AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), directed AS (
                SELECT id_a AS id_src, id_b AS id_dst, shared FROM shared
                UNION ALL
                SELECT id_b AS id_src, id_a AS id_dst, shared FROM shared
            )
            SELECT d.id_src, d.id_dst,
                   round(d.shared / CAST(ss.set_size AS DOUBLE), 6) AS containment
            FROM directed d
            JOIN sizes ss ON d.id_src = ss.doc_id
            WHERE d.shared / CAST(ss.set_size AS DOUBLE) >= 0.6
        """,
        "ann_cosine_topk": """
            WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
            scored AS (
                SELECT e.vec_id,
                       list_sum(list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) AS dot,
                       sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne,
                       sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq
                FROM embeddings e, q
            )
            SELECT vec_id, round(dot / (ne * nq), 6) AS cosine_sim
            FROM scored WHERE ne * nq > 0
            ORDER BY dot / (ne * nq) DESC, vec_id ASC LIMIT 10
        """,
        "embedding_knn": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
            ),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       list_sum(list_transform(range(1, len(e.embedding) + 1),
                           i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))) AS dot,
                       sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS ne,
                       sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nq
                FROM embeddings e, q
                WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
                SELECT query_id, neighbor_id, dot / (ne * nq) AS sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY dot / (ne * nq) DESC, neighbor_id ASC) AS rank
                FROM scored WHERE ne * nq > 0
            )
            SELECT query_id, neighbor_id, round(sim, 6) AS cosine_sim, rank
            FROM ranked WHERE rank <= 3
        """,
        "embedding_hard_negatives": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qv
                FROM embeddings WHERE vec_id < 10
            ),
            scored AS (
                SELECT q.query_id, e.vec_id AS neighbor_id,
                       round(
                           list_sum(list_transform(range(1, len(e.embedding) + 1),
                               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
                           / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                              * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                           6) AS cosine_sim
                FROM embeddings e, q
                WHERE e.vec_id <> q.query_id
                  AND sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
            ),
            ranked AS (
                SELECT query_id, neighbor_id, cosine_sim,
                       row_number() OVER (
                           PARTITION BY query_id
                           ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
                FROM scored
                WHERE cosine_sim >= 0.05 AND cosine_sim < 0.25
            )
            SELECT query_id, neighbor_id, cosine_sim, rank
            FROM ranked WHERE rank <= 5
        """,
        "embedding_selfknn": _selfknn_oracle_sql(),
        "semantic_dedup": _semantic_dedup_oracle_sql(),
        "split_leakage": _split_leakage_oracle_sql(),
        "merge_upsert_state": """
            WITH base AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice, 0 AS seq FROM orders
            ),
            upd1 AS (
                SELECT o_orderkey, 'P' AS o_orderstatus,
                       o_totalprice * 1.1 AS o_totalprice, 1 AS seq
                FROM base WHERE o_orderkey % 7 = 0
            ),
            upd2 AS (
                SELECT o_orderkey, 'F' AS o_orderstatus,
                       o_totalprice * 2 AS o_totalprice, 2 AS seq
                FROM upd1 WHERE o_orderkey % 14 = 0
            ),
            updates AS (SELECT * FROM upd1 UNION ALL SELECT * FROM upd2),
            deduped AS (
                SELECT o_orderkey, o_orderstatus, o_totalprice, seq FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY o_orderkey ORDER BY seq DESC NULLS LAST) AS rn
                    FROM updates
                ) WHERE rn = 1
            ),
            merged AS (
                SELECT b.* FROM base b
                WHERE b.o_orderkey NOT IN (SELECT o_orderkey FROM deduped)
                UNION ALL SELECT * FROM deduped
            )
            SELECT o_orderstatus, count(*) AS n_orders,
                   CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS total_price,
                   CAST(sum(CASE WHEN seq > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_updated
            FROM merged GROUP BY 1
        """,
        "salted_revenue": """
            SELECT l_returnflag,
                   CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue,
                   count(l_quantity) AS n_items,
                   max(l_quantity) AS max_qty
            FROM lineitem GROUP BY 1
        """,

        "corpus_mixture_plan": f"""
            WITH per AS (
                SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS available_tokens
                FROM documents GROUP BY 1
            ),
            w AS (
                SELECT *, CAST(CAST(regexp_replace(source, '^src', '') AS INT) % 4 + 1
                               AS DOUBLE) AS weight
                FROM per
            ),
            tot AS (SELECT sum(weight) AS W FROM w),
            fr AS (
                SELECT w.*, weight / tot.W AS frac FROM w CROSS JOIN tot
            ),
            tmax AS (SELECT min(available_tokens / frac) AS T FROM fr)
            SELECT source, available_tokens,
                   round(frac, 6) AS target_fraction,
                   round((tmax.T * frac) / available_tokens, 6) AS sampling_rate,
                   round(tmax.T * frac, 2) AS target_tokens
            FROM fr CROSS JOIN tmax
        """,

        # Apply the mixture plan: identical planner arithmetic (same
        # operation order -> identical IEEE rates), threshold =
        # floor(rate * 2^32) as BIGINT, identical md5 hex-digit bucket.
        "docs_mixture_applied": f"""
            WITH per AS (
                SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS available_tokens
                FROM documents GROUP BY 1
            ),
            w AS (
                SELECT *, CAST(CAST(regexp_replace(source, '^src', '') AS INT) % 4 + 1
                               AS DOUBLE) AS weight
                FROM per
            ),
            tot AS (SELECT sum(weight) AS W FROM w),
            fr AS (
                SELECT w.*, weight / tot.W AS frac FROM w CROSS JOIN tot
            ),
            tmax AS (SELECT min(available_tokens / frac) AS T FROM fr),
            plan AS (
                SELECT source, available_tokens,
                       CAST(floor(((tmax.T * frac) / available_tokens)
                                  * 4294967296.0) AS BIGINT) AS thr
                FROM fr CROSS JOIN tmax
            ),
            docs AS (
                SELECT source, doc_id, len({_TOKS}) AS t FROM documents
            ),
            kept AS (
                SELECT d.source, d.t, p.available_tokens
                FROM docs d JOIN plan p USING (source)
                WHERE {_sample_bucket_sql("doc_id", "mixture-v1:")} < p.thr
            )
            SELECT source,
                   count(*) AS n_docs_kept,
                   CAST(sum(t) AS BIGINT) AS tokens_kept,
                   max(available_tokens) AS available_tokens,
                   round(CAST(sum(t) AS BIGINT)
                         / CAST(max(available_tokens) AS DOUBLE), 6)
                       AS realized_rate
            FROM kept GROUP BY source
        """,

        "docs_unigram_ce": f"""
            WITH {_UNIGRAM_CE_CTE}
            SELECT doc_id, n_tokens, bits_per_token FROM ce
        """,

        "docs_ce_bands": f"""
            WITH {_UNIGRAM_CE_CTE},
            ranked AS (
                SELECT ce.doc_id, d.lang, ce.bits_per_token,
                       ntile(3) OVER (
                           PARTITION BY d.lang
                           ORDER BY ce.bits_per_token ASC, ce.doc_id ASC
                       ) AS nt
                FROM ce JOIN documents d USING (doc_id)
            )
            SELECT doc_id, lang, bits_per_token,
                   CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                           ELSE 'tail' END AS band
            FROM ranked
        """,
        "bitext_margin_pairs": """
            WITH s AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
            t AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1),
            fs AS (
                SELECT s.vec_id AS src_id, t.vec_id AS tgt_id,
                       list_sum(list_transform(range(1, len(s.embedding) + 1),
                           i -> CAST(s.embedding[i] AS DOUBLE) * CAST(t.embedding[i] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(s.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
                FROM s, t
                WHERE sqrt(list_sum(list_transform(s.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                      * sqrt(list_sum(list_transform(t.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) > 0
            ),
            fwd AS (
                SELECT src_id, tgt_id, round(sim, 6) AS cosine_sim,
                       row_number() OVER (
                           PARTITION BY src_id ORDER BY sim DESC, tgt_id ASC) AS r
                FROM fs
            ),
            bwd AS (
                SELECT tgt_id, src_id, round(sim, 6) AS cosine_sim,
                       row_number() OVER (
                           PARTITION BY tgt_id ORDER BY sim DESC, src_id ASC) AS r
                FROM fs
            ),
            af AS (
                SELECT src_id, sum(CAST(cosine_sim AS DECIMAL(18,6))) AS sf,
                       count(*) AS cf
                FROM fwd WHERE r <= 4 GROUP BY 1
            ),
            ab AS (
                SELECT tgt_id, sum(CAST(cosine_sim AS DECIMAL(18,6))) AS sb,
                       count(*) AS cb
                FROM bwd WHERE r <= 4 GROUP BY 1
            ),
            m AS (
                SELECT f.src_id, f.tgt_id, f.cosine_sim,
                       CASE WHEN CAST(af.sf * ab.cb + ab.sb * af.cf AS DOUBLE) > 0
                            THEN round(
                                f.cosine_sim * CAST(2 * af.cf * ab.cb AS DOUBLE)
                                / CAST(af.sf * ab.cb + ab.sb * af.cf AS DOUBLE), 6)
                       END AS margin
                FROM fwd f JOIN af USING (src_id) JOIN ab USING (tgt_id)
                WHERE f.r <= 4
            ),
            ranked AS (
                SELECT src_id, tgt_id, cosine_sim, margin,
                       row_number() OVER (
                           PARTITION BY src_id
                           ORDER BY margin DESC NULLS LAST, tgt_id ASC) AS margin_rank
                FROM m
            )
            SELECT src_id, tgt_id, cosine_sim, margin,
                   CAST(margin_rank AS INT) AS margin_rank
            FROM ranked WHERE margin_rank = 1
        """,
        "docs_ce_bands_global": f"""
            WITH {_UNIGRAM_CE_CTE},
            hist AS (
                SELECT bits_per_token AS s, count(*) AS c FROM ce GROUP BY 1
            ),
            cum AS (
                SELECT s,
                       sum(c) OVER (ORDER BY s ASC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                           - c AS cum_start,
                       sum(c) OVER () AS total
                FROM hist
            ),
            bands AS (
                SELECT s,
                       least(CAST(cum_start AS BIGINT) * 3 // CAST(total AS BIGINT), 2) AS b
                FROM cum
            )
            SELECT ce.doc_id, ce.bits_per_token,
                   CASE b.b WHEN 0 THEN 'head' WHEN 1 THEN 'middle'
                            ELSE 'tail' END AS band
            FROM ce JOIN bands b ON ce.bits_per_token = b.s
        """,
        "docs_bigram_ce": f"""
            WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
            grams AS (
                SELECT doc_id, array_to_string(toks[i:i+1], ' ') AS bg
                FROM t, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS u(i)
            ),
            c2 AS (SELECT bg, count(*) AS c2 FROM grams GROUP BY 1),
            hist AS (
                SELECT string_split(bg, ' ')[1] AS w1, sum(c2) AS c1
                FROM c2 GROUP BY 1
            ),
            vv AS (SELECT count(*) AS v FROM c2),
            scored AS (
                SELECT g.doc_id,
                       CAST(-log2((c.c2 + 1) / CAST(h.c1 + vv.v AS DOUBLE))
                            AS DECIMAL(30,4)) AS bits
                FROM grams g JOIN c2 c USING (bg)
                JOIN hist h ON string_split(g.bg, ' ')[1] = h.w1
                CROSS JOIN vv
            )
            SELECT doc_id, count(*) AS n_bigrams,
                   round(CAST(sum(bits) AS DOUBLE) / count(*), 4) AS bits_per_bigram
            FROM scored GROUP BY 1
        """,

        "docs_temperature_mixture": f"""
            WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
            tot AS (
                SELECT sum(n) AS nn,
                       CAST(sum(CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(30,15))) AS DOUBLE) AS s
                FROM c
            ),
            plan AS (
                SELECT c.lang, c.n,
                       CAST(floor(least(1.0,
                           ((CAST(floor(0.5 * tot.nn) AS DOUBLE)
                             * sqrt(CAST(c.n AS DOUBLE))) / tot.s)
                           / CAST(c.n AS DOUBLE)
                       ) * 4294967296.0) AS BIGINT) AS thr
                FROM c CROSS JOIN tot
            ),
            kept AS (
                SELECT d.lang
                FROM documents d JOIN plan p ON d.lang = p.lang
                WHERE {_sample_bucket_sql("doc_id", "alpha-mix-v1:")} < p.thr
            )
            SELECT p.lang, p.n AS n_docs, count(*) AS n_kept,
                   round(count(*) / CAST(p.n AS DOUBLE), 6) AS realized_rate
            FROM kept k JOIN plan p ON k.lang = p.lang
            GROUP BY p.lang, p.n
        """,

        "docs_hashed_vectors": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
            ),
            bs AS (
                SELECT doc_id,
                       ({_sample_bucket_sql("tok", "hashvec-v1:")} % 64) AS b
                FROM toks
            ),
            cs AS (SELECT doc_id, b, count(*) AS c FROM bs GROUP BY 1, 2),
            m AS (
                SELECT doc_id,
                       map_from_entries(list(struct_pack(k := b, v := c))) AS mm,
                       sum(c) AS n_tokens
                FROM cs GROUP BY doc_id
            ),
            vecs AS (
                SELECT doc_id, n_tokens,
                       list_transform(range(0, 64),
                           d -> CAST(coalesce(list_extract(map_extract(mm, d), 1), 0) AS DOUBLE)) AS vec
                FROM m
            ),
            normd AS (
                SELECT doc_id, n_tokens, vec,
                       sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
                FROM vecs
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   round(nrm, 6) AS norm_r,
                   md5(array_to_string(
                       list_transform(vec,
                           x -> CAST(CAST(round(x / nrm * 1000000.0, 0) AS BIGINT) AS VARCHAR)),
                       ',')) AS vec_md5
            FROM normd
        """,

        "docs_tfidf_vectors": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_TOKS}) AS tok FROM documents
            ),
            bs AS (
                SELECT doc_id,
                       ({_sample_bucket_sql("tok", "hashvec-v1:")} % 64) AS b
                FROM toks
            ),
            cs AS (SELECT doc_id, b, count(*) AS c FROM bs GROUP BY 1, 2),
            dfreq AS (SELECT b, count(*) AS dfq FROM cs GROUP BY b),
            nd AS (SELECT count(DISTINCT doc_id) AS nd FROM cs),
            wcs AS (
                SELECT cs.doc_id, cs.b, cs.c,
                       cs.c * (CAST(CAST(ln((nd.nd + 1)
                                   / CAST(d.dfq + 1 AS DOUBLE))
                               AS DECIMAL(30,6)) AS DOUBLE) + 1.0) AS w
                FROM cs JOIN dfreq d USING (b) CROSS JOIN nd
            ),
            m AS (
                SELECT doc_id,
                       map_from_entries(list(struct_pack(k := b, v := w))) AS mm,
                       sum(c) AS n_tokens
                FROM wcs GROUP BY doc_id
            ),
            vecs AS (
                SELECT doc_id, n_tokens,
                       list_transform(range(0, 64),
                           d -> CAST(coalesce(list_extract(map_extract(mm, d), 1), 0) AS DOUBLE)) AS vec
                FROM m
            ),
            normd AS (
                SELECT doc_id, n_tokens, vec,
                       sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm
                FROM vecs
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   round(nrm, 6) AS norm_r,
                   md5(array_to_string(
                       list_transform(vec,
                           x -> CAST(CAST(round(x / nrm * 1000000.0, 0) AS BIGINT) AS VARCHAR)),
                       ',')) AS vec_md5
            FROM normd
        """,

        "ann_lsh_topk": _lsh_topk_oracle_sql(),
        "ann_ivf_topk": _ivf_topk_oracle_sql(),
        "ann_pq_topk": _pq_topk_oracle_sql(),
        "ann_ivfpq_topk": _ivfpq_topk_oracle_sql(),
        "ann_pq_knn_join": _pq_knn_join_oracle_sql(),
        "simhash_pairs": _simhash_oracle_sql(hamming_threshold=6),
        "dup_bucket_occupancy": _bucket_occupancy_oracle_sql(max_bucket=5),
        "docs_classifier_scores": _classifier_oracle_sql(B=256),
        "docs_html_extracted": _html_extracted_oracle_sql(),
        "docs_classifier_eval": _classifier_eval_oracle_sql(B=256),
        "docs_lang_classifier": _lang_classifier_oracle_sql(B=256),
        "docs_classifier_sweep": _classifier_sweep_oracle_sql(B=256),
        "docs_bm25_topk": _bm25_oracle_sql(
            f"SELECT doc_id, {_TOKS} AS toks FROM documents", "doc_id"
        ),
        "docs_passage_hits": _bm25_oracle_sql(
            f"""
            WITH t AS (
                SELECT doc_id, {_TOKS} AS t FROM documents
            ), c AS (
                SELECT doc_id, t, len(t) AS n,
                       (greatest(len(t) - 32, 0) + 15) // 16 + 1 AS n_chunks
                FROM t WHERE len(t) > 0
            ), u AS (
                SELECT doc_id, t, n, unnest(range(0, n_chunks)) AS i FROM c
            )
            SELECT doc_id * 1000 + i AS chunk_key,
                   doc_id,
                   CAST(i AS BIGINT) AS chunk_idx,
                   list_filter(string_split_regex(lower(array_to_string(t[i * 16 + 1 : i * 16 + 32], ' ')), '\\s+'), x -> x <> '') AS toks
            FROM u
            """,
            "chunk_key",
            ("doc_id", "chunk_idx"),
        ),
        "bm25_indexed_topk": _bm25_indexed_oracle_sql(),
        "docs_phrase_hits": _phrase_oracle_sql(),
        "docs_lang_detect": _lang_detect_oracle_sql(),
        "embedding_norms_by_label": """
            SELECT label,
                   count(*) AS n_vectors,
                   round(CAST(sum(CAST(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS DECIMAL(30,15))) AS DOUBLE)
                         / count(*), 6) AS avg_norm
            FROM embeddings GROUP BY label
        """,
    }
