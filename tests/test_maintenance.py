"""Compaction: fewer files, identical data, clustered layout when sorted."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.maintenance import compact_parquet
from european_emissions_data_warehouse_spark.sources.readers import load_table


def test_compaction_preserves_data_and_reduces_files(spark, sf_dir, tmp_path):
    out = str(tmp_path / "frag")
    ev = load_table(spark, sf_dir, "events")
    # simulate streaming debris: 20 small files
    ev.repartition(20).write.mode("overwrite").parquet(out)
    want = sorted(map(tuple, spark.read.parquet(out).collect()))

    before, after = compact_parquet(spark, out, target_file_mb=128, sort_by=["user_id", "ts"])
    assert before == 20
    assert after < before
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == want

    # clustered layout: each file covers a disjoint user_id range, so a
    # single-user filter reads a bounded subset of rows across row groups
    one_user = spark.read.parquet(out).filter(F.col("user_id") == 3)
    assert one_user.count() == ev.filter(F.col("user_id") == 3).count()


def test_z_value_bit_interleaving(spark):
    from european_emissions_data_warehouse_spark.operators.maintenance import z_value

    df = spark.createDataFrame(
        [(0b11, 0b00), (0b00, 0b11), (0b01, 0b01), (0b10, 0b11)], "a long, b long"
    )
    got = [r.z for r in df.select(z_value(F.col("a"), F.col("b")).alias("z")).collect()]
    # a's bit i -> position 2i+1, b's bit i -> position 2i
    assert got == [0b1010, 0b0101, 0b0011, 0b1101]


def test_zorder_cluster_preserves_data_with_disjoint_file_ranges(spark, sf_dir, tmp_path):
    from european_emissions_data_warehouse_spark.operators.maintenance import (
        cluster_zorder,
        z_value,
    )

    out = str(tmp_path / "zfrag")
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.dayofyear("ts").cast("long").alias("day")
    )
    ev.repartition(12).write.mode("overwrite").parquet(out)
    want = sorted(map(tuple, ev.collect()))

    before, after = cluster_zorder(spark, out, "user_id", "day", target_file_mb=1)
    assert before == 12
    got_df = spark.read.parquet(out)
    assert sorted(map(tuple, got_df.collect())) == want

    # clustering contract: per-file z ranges are pairwise disjoint
    spans = (
        got_df.withColumn("z", z_value(F.col("user_id"), F.col("day")))
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in spans)
    assert all(prev_hi <= lo for (_, prev_hi), (lo, _) in zip(spans, spans[1:]))
