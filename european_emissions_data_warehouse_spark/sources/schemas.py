"""Explicit StructType schemas for every table the engine reads.

The reference reads CSV with *no* schema, so everything is StringType
end-to-end and types are applied only by the Postgres COPY at load time
(reference scripts/etl_process.py:71-74, scripts/lambda_handler_warehouse.py:80-92).
We fix that weakness: every scan carries an explicit schema so Catalyst can
prune/pushdown correctly and type errors surface at ingest, while the *output*
types still match the reference's warehouse DDL
(reference scripts/lambda_handler_warehouse.py:53-65).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _struct(*fields: tuple[str, object]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in fields])


# --- emissions domain (reference parity) -----------------------------------

# Raw EEA CSV as landed (FIXTURES.md F1): the pipeline must *project away*
# extra columns; raw header `Reported Value` contains a space
# (reference scripts/etl_process.py:80-82,91).
EMISSIONS_RAW_SCHEMA = _struct(
    ("CountryCode", StringType()),
    ("Year", StringType()),
    ("Scenario", StringType()),
    ("Category", StringType()),
    ("Gas", StringType()),
    ("Reported Value", StringType()),
    ("InventorySubmissionYear", StringType()),
    ("Notation", StringType()),
)

# Warehouse table european_ghg_projections minus the surrogate id
# (reference scripts/lambda_handler_warehouse.py:53-65; id is generated at
# load by operators.merge.with_surrogate_key).
WAREHOUSE_SCHEMA = _struct(
    ("Country", StringType()),
    ("Year", IntegerType()),
    ("Scenario", StringType()),
    ("Category", StringType()),
    ("Gas", StringType()),
    ("ReportedValue", DoubleType()),
    ("Unit", StringType()),
)

# Logical unique key of the warehouse table
# (reference scripts/lambda_handler_warehouse.py:63).
WAREHOUSE_KEY = ["Country", "Year", "Scenario", "Category", "Gas", "Unit"]


# --- driver testdata (TESTDATA.md): TPC-H-ish star schema + LLM tables ------

TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _struct(
        ("r_regionkey", IntegerType()),
        ("r_name", StringType()),
    ),
    "nation": _struct(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _struct(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _struct(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _struct(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _struct(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _struct(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    # events.ts precision varies by lake vintage — TIMESTAMP(NANOS,false) in
    # older drops (illegal for Spark's reader, scanned as nanos-long via the
    # spark.sql.legacy.parquet.nanosAsLong conf), TIMESTAMP(MICROS,false) in
    # current ones.  readers.load_table sniffs the footer and substitutes the
    # right ts field type; the entry here is the post-load engine type.
    "events": _struct(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _struct(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _struct(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

# Multimodal asset table (north-star extension, SURVEY.md §2.3): opaque binary
# payload + typed metadata.  Decode/feature-extraction runs as Arrow-batched
# mapInPandas over the `payload` column (operators.multimodal).
MEDIA_SCHEMA = _struct(
    ("asset_id", LongType()),
    ("media_type", StringType()),  # image | audio | video
    ("payload", BinaryType()),
    ("meta_source", StringType()),
    ("meta_bytes", LongType()),
)
