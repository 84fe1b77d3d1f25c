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


def test_aqe_skew_split_vs_salting_adjudication(spark):
    """When does the built-in AQE skew-join split suffice, and when is
    manual salting still needed (VERDICT r4 #7; measurements in
    EXPLAIN.md "AQE skew-join vs manual salting")?

    1. Pure shuffle-join skew: AQE splits the oversized partition — the
       final adaptive plan carries SortMergeJoin(skew=true) — and manual
       salting there only adds replication overhead (measured 0.92s vs
       0.55s at 4M rows).
    2. Join feeding a same-key aggregate: Catalyst elides the aggregate's
       exchange because the join output already satisfies its required
       distribution — which PINS the join partitioning, so AQE refuses to
       split (with or without forceOptimizeSkewedJoin) and the hot key
       rides one task end-to-end.  Manual salting is the only lever (and
       aggregation skew itself has no AQE rule at all —
       salted_count_distinct exists for exactly that)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    n_left, n_keys = 400_000, 2_000
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(n_left).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(n_keys)))
            .alias("k"),
            (F.col("id") * 7).alias("payload"),
        )
        right = spark.range(n_keys).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("attr"),
        )
        # collect() on the SAME DataFrame whose plan we inspect: a write/
        # count would build a separate QueryExecution and the inspected
        # plan would still say isFinalPlan=false
        join_only = left.join(right, "k").groupBy().count()
        assert join_only.collect()[0][0] == n_left
        plan = join_only._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed join"

        pinned = (
            left.join(right, "k")
            .groupBy("k")
            .agg(F.sum("payload").alias("s"))
            .groupBy()
            .count()
        )
        assert pinned.collect()[0][0] == n_keys
        plan2 = pinned._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" not in plan2, (
            "AQE split a join whose output partitioning a same-key "
            "aggregate depends on — if Spark ever learns to do this "
            "safely, the EXPLAIN.md adjudication needs rewriting"
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
