"""Parity operator library — every reference operator (SURVEY.md §2.1
O1..O16) as a named query over the driver testdata, each with a DuckDB
oracle (ANSI SQL string) for the correctness gate.

Mapping of the emissions domain onto the TPC-H-ish testdata follows
FIXTURES.md F4: `lineitem` is the raw fact, `supplier`+`nation` the
code->name dimension path, (l_orderkey, l_linenumber) the logical key.

Conventions shared with the oracles (see __spark_entry__.py docstring):
- every computed column is aliased identically on both sides;
- computed integers are cast to BIGINT on both sides (pandas dtype parity);
- multi-row float aggregates are ROUND()ed to 2 decimals (summation order
  is nondeterministic in any parallel engine; rounding removes ulp noise);
- timestamps in outputs are formatted to 'yyyy-MM-dd' strings.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.merge import (
    dedupe_last,
    upsert_anti_join,
    with_surrogate_key,
)
from european_emissions_data_warehouse_spark.sources.readers import load_table

# --- O1/O2/O10: scan + projection (column pruning reaches the parquet scan) --


def q_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O10 projection: the scan must read only 3 of 6 part columns
    (check ReadSchema in .explain)."""
    return load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")


ORACLE_PROJECTION = "SELECT p_partkey, p_brand, p_size FROM part"


# --- O3: null-drop ----------------------------------------------------------


def q_null_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 `.na.drop(how='any')` (reference scripts/etl_process.py:83)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.na.drop(how="any", subset=["user_id", "event_type", "value"]).select(
        "event_id", "user_id", "event_type", "value"
    )


# NOT isnan: Spark's na.drop treats NaN doubles as missing (a legal
# parquet value IS NOT NULL would keep) — the extra term pins the oracle
# to the engine's actual semantics (code-review r4; dormant on current
# NaN-free testdata)
ORACLE_NULL_DROP = """
SELECT event_id, user_id, event_type, value FROM events
WHERE user_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
  AND NOT isnan(value)
"""


# --- O4: predicate filter (equality + IN-list) ------------------------------


def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4 equality + isin (reference scripts/etl_process.py:84-85); both
    predicates push down to the parquet scan (PushedFilters)."""
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        (F.col("p_type") == "PROMO") & F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
    ).select("p_partkey", "p_name", "p_brand", "p_type")


ORACLE_FILTER_PRED = """
SELECT p_partkey, p_name, p_brand, p_type FROM part
WHERE p_type = 'PROMO' AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
"""


# --- O5/O6: conditional derive + recode (CASE WHEN) -------------------------


def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5/O6 when/otherwise chains (reference scripts/etl_process.py:86-89)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, F.lit("low"))
        .when(F.col("o_totalprice") < 200000, F.lit("mid"))
        .otherwise(F.lit("high"))
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", F.lit("FINISHED"))
        .otherwise(F.col("o_orderstatus"))
        .alias("status_recode"),
    )


ORACLE_CASE_WHEN = """
SELECT o_orderkey,
       CASE WHEN o_totalprice < 50000 THEN 'low'
            WHEN o_totalprice < 200000 THEN 'mid'
            ELSE 'high' END AS price_band,
       CASE WHEN o_orderstatus = 'F' THEN 'FINISHED' ELSE o_orderstatus END AS status_recode
FROM orders
"""


# --- O8: rename -------------------------------------------------------------


def q_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O8 withColumnRenamed (reference scripts/etl_process.py:91) — a pure
    Project alias in the plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumnRenamed("l_extendedprice", "reported_value")
    )


ORACLE_RENAME = "SELECT l_orderkey, l_linenumber, l_extendedprice AS reported_value FROM lineitem"


# --- O9: dimension decode, both forms ---------------------------------------


def _nation_map_expr(spark: SparkSession, sf_dir: str):
    # dim-scale collect (25 rows) mirroring the reference's hard-coded dict
    # -> map literal (scripts/etl_process.py:33-67); only valid for true
    # dimension scale, documented as such.
    rows = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name").collect()
    pairs = dict(sorted((r.n_nationkey, r.n_name) for r in rows))
    if not pairs:
        # zero-arg create_map is an AnalysisException; an empty dim decodes
        # everything to NULL, same as the join form's unmatched left rows
        # (round-5 empty-fixture gate)
        return F.map_from_arrays(
            F.array().cast("array<int>"), F.array().cast("array<string>")
        )
    return F.create_map([F.lit(x) for x in chain(*pairs.items())])


def q_decode_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9a map-literal lookup (reference scripts/etl_process.py:67,92)."""
    cust = load_table(spark, sf_dir, "customer")
    mapping = _nation_map_expr(spark, sf_dir)
    return cust.select(
        "c_custkey", mapping[F.col("c_nationkey")].alias("nation_name"), "c_acctbal"
    )


def q_decode_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9b the idiomatic form: broadcast left join against the dim table —
    identical output to O9a, but scales past literal-map size and never
    shuffles the fact side (BroadcastHashJoin in .explain)."""
    cust = load_table(spark, sf_dir, "customer")
    dim = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(dim, cust.c_nationkey == dim.n_nationkey, "left")
        .select("c_custkey", F.col("n_name").alias("nation_name"), "c_acctbal")
    )


ORACLE_DECODE = """
SELECT c_custkey, n_name AS nation_name, c_acctbal
FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
"""


# --- O16: upsert / merge ----------------------------------------------------


def q_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O16 last-write-wins merge (reference
    scripts/lambda_handler_warehouse.py:95-101): re-ingest every open ('O')
    order with a +10% price against the existing warehouse of all orders.
    The oracle states the *semantic* result; the Spark side runs the real
    anti-join + union operator.

    Load-bearing assumption, asserted by test_merge_properties'
    orders-key-uniqueness check: o_orderkey is unique in the orders drop.
    With a duplicated key carrying mixed statuses, upsert_anti_join drops
    EVERY old row under that key while the oracle's per-row CASE keeps
    them — the engine/oracle pair is only equivalent on key-unique input
    (the documented upsert contract; dedupe_last is the feed-side fix)
    (code-review r4)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    old = orders.withColumn("src", F.lit("initial"))
    new = (
        orders.filter(F.col("o_orderstatus") == "O")
        .withColumn("o_totalprice", F.col("o_totalprice") * 1.1)
        .withColumn("src", F.lit("reingest"))
    )
    return upsert_anti_join(old, new, ["o_orderkey"])


ORACLE_UPSERT = """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 1.1 ELSE o_totalprice END AS o_totalprice,
       o_orderstatus,
       CASE WHEN o_orderstatus = 'O' THEN 'reingest' ELSE 'initial' END AS src
FROM orders
"""


# --- O13: surrogate key -----------------------------------------------------


def q_surrogate_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O13 SERIAL surrogate key as a deterministic row_number (SURVEY.md
    §2.1: reference ids are arrival-ordered; ours are order-defined)."""
    nation = load_table(spark, sf_dir, "nation")
    return with_surrogate_key(nation, ["n_nationkey"])


ORACLE_SURROGATE_KEY = """
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_nationkey) AS BIGINT) AS id,
       n_nationkey, n_name, n_regionkey
FROM nation
"""


# --- intra-batch dedupe (the per-file sequential-import semantics) ----------


def q_dedupe_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Later-import-wins collapse within one batch (reference
    lambda_handler_warehouse.py:79): one surviving lineitem row per order,
    the highest line number."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    # the ordering must be TOTAL for cross-engine determinism: the testdata
    # has duplicate (l_orderkey, l_linenumber) pairs at sf>=0.01, so value
    # columns join the sort key as tie-breaks.
    return dedupe_last(li, ["l_orderkey"], ["l_linenumber", "l_quantity", "l_extendedprice"])


ORACLE_DEDUPE_LAST = """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
        ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC) = 1
"""


# --- the flagship pipeline on testdata (FIXTURES.md F4) ---------------------


def q_etl_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole O1..O10 chain on the F4 stand-ins: project 6 cols from the
    raw fact, null-drop, equality+IN filter, constant derive, recode,
    rename, broadcast dim decode (supplier->nation), final projection.
    Narrow plan except the (broadcast) dim join — zero shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # nation keeps its hint (25 rows at every SF — the reference's actual
    # country dim); supplier is SF-PROPORTIONAL, so its decode join is
    # size-based: the planner broadcasts it at bench scale and correctly
    # shuffle-joins at 100 TB where an explicit hint would hard-fail on
    # the 8 GB broadcast ceiling (code-review r4, scale pass — the same
    # policy as plans/analytics.py's module header)
    dim = supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    cols = ["l_orderkey", "l_linenumber", "l_suppkey", "l_returnflag", "l_linestatus", "l_extendedprice"]
    return (
        li.select(*cols)  # O2
        .na.drop(how="any", subset=cols)  # O3
        .filter((F.col("l_returnflag") == "A") & F.col("l_linestatus").isin("F", "O"))  # O4
        .withColumn(  # O5: constant derive gated on the filtered value
            "unit",
            F.when(F.col("l_returnflag") == "A", F.lit("accepted-line")).otherwise(F.lit(None)),
        )
        .withColumn(  # O6: recode
            "l_returnflag",
            F.when(F.col("l_returnflag") == "A", F.lit("ACCEPTED")).otherwise(F.col("l_returnflag")),
        )
        .withColumnRenamed("l_extendedprice", "reported_value")  # O8
        .join(dim, F.col("l_suppkey") == F.col("s_suppkey"), "left")  # O9b
        .select(  # O10
            "l_orderkey",
            "l_linenumber",
            F.col("n_name").alias("supp_nation"),
            F.col("l_returnflag").alias("flag"),
            F.col("l_linestatus").alias("status"),
            "reported_value",
            "unit",
        )
    )


ORACLE_ETL_FLAGSHIP = """
SELECT l_orderkey, l_linenumber, n_name AS supp_nation,
       'ACCEPTED' AS flag, l_linestatus AS status,
       l_extendedprice AS reported_value, 'accepted-line' AS unit
FROM lineitem
LEFT JOIN supplier ON l_suppkey = s_suppkey
LEFT JOIN nation ON s_nationkey = n_nationkey
WHERE l_returnflag = 'A' AND l_linestatus IN ('F', 'O')
  AND l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL AND l_suppkey IS NOT NULL
  AND l_returnflag IS NOT NULL AND l_linestatus IS NOT NULL AND l_extendedprice IS NOT NULL
  AND NOT isnan(l_extendedprice)
"""


QUERIES = {
    "projection": q_projection,
    "null_drop": q_null_drop,
    "filter_pred": q_filter_pred,
    "case_when": q_case_when,
    "rename": q_rename,
    "dim_decode_map": q_decode_map,
    "dim_decode_join": q_decode_join,
    "upsert_lww": q_upsert,
    "surrogate_key": q_surrogate_key,
    "dedupe_last": q_dedupe_last,
    "etl_flagship": q_etl_flagship,
}

ORACLES = {
    "projection": ORACLE_PROJECTION,
    "null_drop": ORACLE_NULL_DROP,
    "filter_pred": ORACLE_FILTER_PRED,
    "case_when": ORACLE_CASE_WHEN,
    "rename": ORACLE_RENAME,
    "dim_decode_map": ORACLE_DECODE,
    "dim_decode_join": ORACLE_DECODE,
    "upsert_lww": ORACLE_UPSERT,
    "surrogate_key": ORACLE_SURROGATE_KEY,
    "dedupe_last": ORACLE_DEDUPE_LAST,
    "etl_flagship": ORACLE_ETL_FLAGSHIP,
}
