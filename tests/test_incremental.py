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


def test_apply_cdf_equals_recompute(spark, tmp_path):
    """state(v0) + diff(v0, v1) == recomputed state(v1), including a group
    that disappears entirely and a NULL-value update."""
    from european_emissions_data_warehouse_spark.operators.incremental import (
        apply_cdf,
        invertible_state,
    )
    from european_emissions_data_warehouse_spark.operators.snapshots import (
        SnapshotTable,
    )

    t = SnapshotTable(spark, str(tmp_path / "fact"))
    v0 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 5.0), (3, "b", 7.0), (4, "c", 2.0)],
        "id long, grp string, v double",
    )
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 8.0), (5, "b", 1.0), (3, "b", 7.0)],
        "id long, grp string, v double",
    )
    t.commit(v0)
    t.commit(v1)
    state0 = invertible_state(t.read(0), ["grp"], "v")
    maintained = apply_cdf(state0, t.diff(0, 1, key=["id"]), ["grp"], "v")
    recomputed = invertible_state(t.read(1), ["grp"], "v")
    m = {r["grp"]: (r["sum_v"], r["n_rows"]) for r in maintained.collect()}
    r = {x["grp"]: (x["sum_v"], x["n_rows"]) for x in recomputed.collect()}
    assert m == r
    assert "c" not in m  # fully-deleted group vanished


def test_apply_cdf_raises_on_replayed_deletes(spark):
    """A duplicated delete feed drives a group's count negative — an
    impossible state under exactly-once delivery.  It must raise, not be
    silently filtered with the legitimately-empty groups (code-review r4)."""
    import pytest
    from european_emissions_data_warehouse_spark.operators.incremental import (
        apply_cdf,
        invertible_state,
    )

    base = spark.createDataFrame([("a", 1.0)], "k string, v double")
    state = invertible_state(base, ["k"], "v")
    deletes = spark.createDataFrame(
        [("a", 1.0, "delete"), ("a", 1.0, "delete")],
        "k string, v double, _change_type string",
    )
    with pytest.raises(Exception, match="negative"):
        apply_cdf(state, deletes, ["k"], "v").collect()


def test_apply_cdf_rejects_unknown_change_type(spark):
    """An unrecognized or NULL _change_type must raise, not default to
    DELETE: the silent subtract corrupted sum_v/n_rows without ever
    tripping the negative-count guard (code-review r4)."""
    import pytest

    from european_emissions_data_warehouse_spark.operators.incremental import (
        apply_cdf,
    )

    state = spark.createDataFrame([(1, 10.0, 5)], "k long, sum_v double, n_rows long")
    bad = spark.createDataFrame(
        [(1, 2.0, "Insert")], "k long, v double, _change_type string"
    )
    with pytest.raises(Exception, match="unknown _change_type"):
        apply_cdf(state, bad, ["k"], "v").collect()
    nulls = spark.createDataFrame(
        [(1, 2.0, None)], "k long, v double, _change_type string"
    )
    with pytest.raises(Exception, match="unknown _change_type"):
        apply_cdf(state, nulls, ["k"], "v").collect()
    ok = spark.createDataFrame(
        [(1, 2.0, "insert")], "k long, v double, _change_type string"
    )
    [r] = apply_cdf(state, ok, ["k"], "v").collect()
    assert (r["sum_v"], r["n_rows"]) == (12.0, 6)
