"""SCD2 history invariants (operators/merge.py scd2_from_changelog).

The oracle-parity test proves value equality with the SQL formulation;
these tests pin the *structural* contract of a type-2 dimension: per key,
exactly one current row, non-overlapping contiguous intervals, and no
consecutive rows with the same attribute value.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.merge import scd2_from_changelog
from european_emissions_data_warehouse_spark.sources.readers import load_table


def build_history(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    log = orders.select("o_custkey", "o_orderdate", "o_orderpriority", "o_orderkey")
    return scd2_from_changelog(
        log, ["o_custkey"], "o_orderdate", "o_orderpriority", tie_break=["o_orderkey"]
    )


def test_exactly_one_current_per_key(spark, sf_dir):
    hist = build_history(spark, sf_dir)
    bad = (
        hist.groupBy("o_custkey")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_current"))
        .filter(F.col("n_current") != 1)
        .count()
    )
    assert bad == 0


def test_intervals_contiguous_and_ordered(spark, sf_dir):
    from pyspark.sql import Window

    hist = build_history(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("valid_from")
    gaps = (
        hist.withColumn("next_from", F.lead("valid_from").over(w))
        .filter(F.col("valid_to").isNotNull())
        .filter(
            (F.col("valid_to") != F.col("next_from"))
            | (F.col("valid_from") >= F.col("valid_to"))
        )
        .count()
    )
    assert gaps == 0


def test_no_consecutive_duplicate_values(spark, sf_dir):
    from pyspark.sql import Window

    hist = build_history(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("valid_from")
    dups = (
        hist.withColumn("prev_attr", F.lag("o_orderpriority").over(w))
        .filter(F.col("prev_attr") == F.col("o_orderpriority"))
        .count()
    )
    assert dups == 0


def test_history_covers_every_key(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    hist = build_history(spark, sf_dir)
    n_keys = orders.select("o_custkey").distinct().count()
    assert hist.select("o_custkey").distinct().count() == n_keys
