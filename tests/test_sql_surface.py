"""The ad-hoc SQL surface: register_tables + spark.sql replaces the
reference's 'connect a SQL client to RDS' path (SURVEY.md §3.3).  Arbitrary
ANSI SQL over the lake must agree with the DataFrame API."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.sources.readers import (
    load_table,
    register_tables,
)


def test_sql_over_registered_lake_matches_dataframe(spark, sf_dir):
    register_tables(spark, sf_dir)
    sql = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderstatus = 'O'
        GROUP BY n_name
        ORDER BY n_name
        """
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    api = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("n_name")
    )
    assert [tuple(r) for r in sql.collect()] == [tuple(r) for r in api.collect()]


def test_sql_ddl_ctas_and_query(spark, sf_dir):
    register_tables(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS urgent_orders")
    spark.sql(
        """
        CREATE TABLE urgent_orders USING parquet AS
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_orderpriority = '1-URGENT'
        """
    )
    try:
        n_tbl = spark.sql("SELECT COUNT(*) AS n FROM urgent_orders").first().n
        n_src = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderpriority") == "1-URGENT")
            .count()
        )
        assert n_tbl == n_src
    finally:
        spark.sql("DROP TABLE IF EXISTS urgent_orders")


def test_sql_insert_into(spark, sf_dir):
    """INSERT INTO (values + select) on a catalog parquet table — the load
    path of the delegated SQL surface beyond CTAS."""
    spark.sql("DROP TABLE IF EXISTS ins_demo")
    spark.sql("CREATE TABLE ins_demo (k INT, v STRING) USING parquet")
    try:
        spark.sql("INSERT INTO ins_demo VALUES (1, 'a'), (2, 'b')")
        spark.sql("INSERT INTO ins_demo SELECT 3, 'c'")
        got = sorted((r.k, r.v) for r in spark.sql("SELECT * FROM ins_demo").collect())
        assert got == [(1, "a"), (2, "b"), (3, "c")]
    finally:
        spark.sql("DROP TABLE IF EXISTS ins_demo")


def test_time_weighted_value_bounded_by_observed_values(spark, sf_dir):
    """The hold-until-next TWA is a convex combination of a user's values,
    so it must lie within [min, max] of the values that opened a segment."""
    import __spark_entry__ as entry_mod

    twa = {
        r["user_id"]: r["twa_value"]
        for r in entry_mod.queries()["time_weighted_value"](spark, sf_dir).collect()
    }
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    ev = load_table(spark, sf_dir, "events")
    bounds = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    assert twa, "no users produced segments"
    for uid, v in twa.items():
        lo, hi = bounds[uid]
        assert lo - 1e-6 <= v <= hi + 1e-6, (uid, v, lo, hi)


def test_bigram_logprob_upper_bound_and_repetition_ceiling(spark, sf_dir):
    """Conditional log-probs are <= 0, and a perfectly repetitive doc
    (single repeated token) must score exactly 0 (its one bigram is fully
    predictable) — pinned by injecting such a doc."""
    import __spark_entry__ as entry_mod
    from european_emissions_data_warehouse_spark.plans.llm import q_bigram_logprob
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    rows = entry_mod.queries()["bigram_logprob"](spark, sf_dir).collect()
    assert rows and all(r["avg_logprob"] <= 0.0 for r in rows)

    import tempfile

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    inj = spark.createDataFrame(
        [(20_000_001, "zqxj zqxj zqxj zqxj")], "doc_id long, text string"
    )
    with tempfile.TemporaryDirectory() as td:
        base.unionByName(inj).write.mode("overwrite").parquet(f"{td}/documents.parquet")
        out = {r["doc_id"]: r["avg_logprob"] for r in q_bigram_logprob(spark, td).collect()}
    assert out[20_000_001] == 0.0


def test_session_window_exact_gap_boundary_merges(spark):
    """Pin the empirically-verified boundary semantics: a gap of EXACTLY
    the 30-minute threshold merges into one session (Spark's session_window
    splits only on gap > threshold), so the lag+cumsum oracles correctly use
    strict `>` — a `>=` would diverge on threshold-exact data (code-review
    r4 finding adjudicated false-positive, pinned here so it stays settled)."""
    import pyspark.sql.functions as F

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00"),
            (1, "2024-01-01 00:30:00"),  # exactly 1800s after the first
            (1, "2024-01-01 01:00:01"),  # 1801s after the second -> splits
        ],
        "user_id int, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    n = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .count()
    )
    assert n == 2, f"expected [merge, split] -> 2 sessions, got {n}"


def test_q6_quotient_rounding_is_lockstep_with_duckdb_on_boundaries(spark):
    """Pin the _q6 contract (code-review r4): the lockstep
    FLOOR(x*1e6+0.5)/1e6 form produces bit-identical doubles in Spark and
    DuckDB on quotient boundary cases (power-of-two rank denominators,
    shortest-repr ...5 at the 7th decimal) — by construction, not by the
    engines' ROUND internals happening to agree."""
    import duckdb
    import pyspark.sql.functions as F

    from european_emissions_data_warehouse_spark.plans.analytics import _q6

    cases = [1.0 / 128, 3.0 / 128, -1.0 / 128, 0.1234565, 0.0078125]
    df = spark.createDataFrame([(c,) for c in cases], "x double")
    got = {
        r["x"]: r["q"]
        for r in df.select("x", _q6(F.col("x")).alias("q")).collect()
    }
    con = duckdb.connect()
    for c in cases:
        (want,) = con.execute(
            "SELECT FLOOR(? * 1000000 + 0.5) / 1000000", [c]
        ).fetchone()
        assert got[c] == want, (c, got[c], want)
    con.close()
