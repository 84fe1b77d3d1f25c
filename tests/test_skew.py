"""Skew operators must be result-identical to their plain equivalents."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.skew import (
    salted_count_distinct,
    salted_join,
)
from european_emissions_data_warehouse_spark.sources.readers import load_table


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    # a 5-row "dim" on a low-cardinality key: every key is hot by construction
    dim = (
        orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("status_n"))
    )
    plain = orders.join(dim, ["o_orderstatus"]).select("o_orderkey", "status_n")
    salted = salted_join(orders, dim, ["o_orderstatus"], n_salts=4).select(
        "o_orderkey", "status_n"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_distinct_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    want = sorted(
        map(
            tuple,
            ev.groupBy("event_type")
            .agg(F.count_distinct("user_id").alias("n_distinct_user_id"))
            .collect(),
        )
    )
    got = sorted(map(tuple, salted_count_distinct(ev, ["event_type"], "user_id").collect()))
    assert got == want


def test_salted_join_rejects_outer_how(spark):
    """right/full outer would emit n_salts null-extended copies of every
    unmatched replicated-side row — rejected loudly (code-review r4)."""
    df = spark.createDataFrame([(1, "x")], "k long, a string")
    other = spark.createDataFrame([(2, "y")], "k long, b string")
    for how in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="duplicate"):
            salted_join(df, other, ["k"], how=how)
    # allowed forms still serve
    assert salted_join(df, other, ["k"], how="left").count() == 1


def test_salted_helpers_reject_column_collisions(spark):
    """A caller column named __salt/__partial would be silently replaced
    and dropped, breaking the exact-equality contract (code-review r4)."""
    df = spark.createDataFrame([(1, 0)], "k long, __salt int")
    other = spark.createDataFrame([(1, "y")], "k long, b string")
    with pytest.raises(ValueError, match="__salt"):
        salted_join(df, other, ["k"])
    with pytest.raises(ValueError, match="__salt"):
        salted_join(other, df, ["k"])
    from european_emissions_data_warehouse_spark.operators.skew import (
        salted_count_distinct,
    )

    with pytest.raises(ValueError, match="__salt"):
        salted_count_distinct(df, ["k"], "__salt")


def test_salted_join_rejects_nonpositive_n_salts(spark):
    """n_salts=-1 silently emptied the replicated side (explode of a
    zero-length array) and the join returned nothing; 0 died later as an
    ANSI pmod-by-zero (code-review r4) — both now rejected up front."""
    import pytest

    from european_emissions_data_warehouse_spark.operators.skew import salted_join

    a = spark.createDataFrame([(1, "x")], "k long, v string")
    b = spark.createDataFrame([(1, "y")], "k long, w string")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="n_salts must be >= 1"):
            salted_join(a, b, ["k"], n_salts=bad)
