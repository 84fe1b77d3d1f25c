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
