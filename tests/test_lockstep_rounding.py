"""The FLOOR(x*10^d + 0.5)/10^d lockstep-rounding primitive is the
foundation under every rounded oracle comparison (_q6, the 2-decimal
forms in percentiles/weighted_avg_udaf): its claim is that Spark and
DuckDB evaluate it BIT-IDENTICALLY because it is pure IEEE ops, unlike
their ROUND builtins which disagree on .xx5 boundaries.  This test pins
that claim empirically over adversarial values — exact boundary cases,
near-boundary ulps, negatives, large magnitudes, and a seeded random
sweep — at both grids the repo uses (2 and 6 decimals)."""

from __future__ import annotations

import math
import random

import duckdb
import pytest


def _cases() -> list[float]:
    vals = [
        0.0, -0.0, 1.0, -1.0,
        # exact .xx5 boundaries (not representable -> engines' ROUND differ;
        # the FLOOR form must still agree because both evaluate the same
        # IEEE expression)
        0.005, 0.015, 0.025, 2.675, 4702.605, 1.0000005, 0.0000005,
        -0.005, -2.675, -4702.605,
        # one-ulp neighbours of a boundary
        math.nextafter(0.005, 0.0), math.nextafter(0.005, 1.0),
        math.nextafter(4702.605, 0.0), math.nextafter(4702.605, 1e9),
        # magnitudes across the repo's value ranges
        53129.178304867295, 53129.17830486732, 1e-12, 1e9 + 0.005, 123456789.987654321,
        # 1/128-style dyadic quotients (the documented ROUND-divergence case)
        1.0 / 128.0, 3.0 / 128.0, 0.1234565,
    ]
    rng = random.Random(5)
    vals += [rng.uniform(-1e6, 1e6) for _ in range(200)]
    vals += [rng.uniform(-1, 1) for _ in range(200)]
    return vals


@pytest.mark.parametrize("decimals", [2, 6])
def test_floor_lockstep_agrees_bitwise_across_engines(spark, decimals):
    vals = _cases()
    scale = float(10**decimals)

    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    from pyspark.sql import functions as F

    spark_out = [
        r["y"]
        for r in sdf.select(
            (F.floor(F.col("x") * F.lit(scale) + F.lit(0.5)) / F.lit(scale)).alias("y")
        ).collect()
    ]

    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, x DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(vals)))
    duck_out = [
        r[0]
        for r in con.execute(
            f"SELECT FLOOR(x * {scale} + 0.5) / {scale} FROM t ORDER BY i"
        ).fetchall()
    ]

    mismatches = [
        (v, s, d)
        for v, s, d in zip(vals, spark_out, duck_out)
        # struct-compare including the sign of zero: repr captures -0.0
        if repr(s) != repr(d)
    ]
    assert not mismatches, f"first lockstep mismatches: {mismatches[:5]}"
