"""Incremental aggregate maintenance laws: the state after folding deltas
must equal the one-shot aggregate (monoid measures), in any fold order."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.incremental import (
    agg_state,
    merge_state,
)
from european_emissions_data_warehouse_spark.sources.readers import load_table


def _final(state):
    return {
        r["o_custkey"]: (round(r["sum_v"], 2), r["n_rows"], r["min_v"], r["max_v"])
        for r in state.collect()
    }


def test_fold_order_independent(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").limit(2000)
    batches = [
        agg_state(o.filter(F.pmod("o_orderkey", F.lit(4)) == i), ["o_custkey"], "o_totalprice")
        for i in range(4)
    ]
    fwd = batches[0]
    for b in batches[1:]:
        fwd = merge_state(fwd, b, ["o_custkey"])
    rev = batches[3]
    for b in reversed(batches[:3]):
        rev = merge_state(rev, b, ["o_custkey"])
    truth = agg_state(o, ["o_custkey"], "o_totalprice")
    assert _final(fwd) == _final(truth)
    assert _final(rev) == _final(truth)
