"""Property-based checks (hypothesis) of the change-data-feed algebra
(operators/snapshots.diff + operators/incremental.apply_cdf):

1. row algebra — old − preimages − deletes + postimages + inserts == new,
   as multisets, for ANY pair of versions;
2. maintenance law — invertible_state(v0) + diff(v0,v1) ==
   invertible_state(v1), including groups that empty out;
3. self-diff — diff(v, v) is empty.
"""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.incremental import (
    apply_cdf,
    invertible_state,
)
from european_emissions_data_warehouse_spark.operators.snapshots import SnapshotTable

# rows: (id, grp, value).  Small id space forces overlap between versions;
# values are integral doubles so sums are exact.
row = st.tuples(st.integers(0, 7), st.sampled_from(["a", "b"]), st.integers(0, 50))
version = st.lists(row, min_size=0, max_size=10, unique_by=lambda r: r[0])


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, g, float(v)) for i, g, v in rows] or [(None, None, None)],
        "id long, grp string, v double",
    ).filter("id is not null")


@pytest.mark.usefixtures("spark")
class TestCdfLaws:
    @given(v0=version, v1=version)
    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    def test_row_algebra_and_maintenance(self, spark, tmp_path_factory, v0, v1):
        t = SnapshotTable(
            spark, str(tmp_path_factory.mktemp("cdf") / "tbl")
        )
        t.commit(_df(spark, v0))
        t.commit(_df(spark, v1))
        changes = t.diff(0, 1, key=["id"]).collect()

        old = Counter((i, g, v) for i, g, v in v0)
        new = Counter((i, g, v) for i, g, v in v1)
        derived = Counter(old)
        for r in changes:
            tup = (r["id"], r["grp"], r["v"])
            if r["_change_type"] in ("delete", "update_preimage"):
                derived[tup] -= 1
            else:
                derived[tup] += 1
        assert +derived == new  # multiset equality after dropping zeros

        maintained = apply_cdf(
            invertible_state(t.read(0), ["grp"], "v"),
            t.diff(0, 1, key=["id"]),
            ["grp"],
            "v",
        )
        m = {r["grp"]: (r["sum_v"], r["n_rows"]) for r in maintained.collect()}
        rec = {
            r["grp"]: (r["sum_v"], r["n_rows"])
            for r in invertible_state(t.read(1), ["grp"], "v").collect()
        }
        assert m == rec

    @given(v=version)
    @settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
    def test_self_diff_is_empty(self, spark, tmp_path_factory, v):
        t = SnapshotTable(spark, str(tmp_path_factory.mktemp("cdf") / "tbl"))
        t.commit(_df(spark, v))
        t.commit(_df(spark, v))
        assert t.diff(0, 1, key=["id"]).count() == 0


def test_cdf_law_holds_with_null_values(spark):
    """Deleting the only non-null row of a group: the maintained sum must
    equal the recomputed state (null-as-0 on both sides) — SQL SUM's
    null-skip previously left 0.0 vs NULL divergence (code-review r4)."""
    from european_emissions_data_warehouse_spark.operators.incremental import (
        apply_cdf,
        invertible_state,
    )

    base = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, None), ("b", 3, 7.0)],
        "k string, id long, v double",
    )
    after = spark.createDataFrame(
        [("a", 2, None), ("b", 3, 7.0)], "k string, id long, v double"
    )
    changes = spark.createDataFrame(
        [("a", 1, 5.0, "delete")], "k string, id long, v double, _change_type string"
    )
    maintained = {
        r["k"]: (r["sum_v"], r["n_rows"])
        for r in apply_cdf(invertible_state(base, ["k"], "v"), changes, ["k"], "v").collect()
    }
    recomputed = {
        r["k"]: (r["sum_v"], r["n_rows"])
        for r in invertible_state(after, ["k"], "v").collect()
    }
    assert maintained == recomputed, (maintained, recomputed)
