"""Write-path layout: partitioned parquet writes must yield partition-pruned
scans (PartitionFilters, not data filters) for partition-key predicates."""

from __future__ import annotations

from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.sources.readers import load_table


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("day").parquet(out)

    days = [r.day for r in ev.select("day").distinct().orderBy("day").limit(2).collect()]
    back = spark.read.parquet(out).filter(F.col("day") == days[0])

    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and days[0] not in "", plan
    # pruned scan must touch only the one partition's rows
    want = ev.filter(F.col("day") == days[0]).count()
    assert back.count() == want

    # and the partition column round-trips with correct grouping semantics
    # (partition values are directory names; Spark infers date type back —
    # cast to string to compare against the pre-write column)
    got = (
        spark.read.parquet(out)
        .withColumn("day", F.col("day").cast("string"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("day")
        .collect()
    )
    want_counts = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n")).orderBy("day").collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want_counts]


def test_schema_evolution_merge_on_read(spark, sf_dir, tmp_path):
    """A later drop may carry new columns (the lake's vintages differ — the
    events feed's ts precision already did).  mergeSchema reads the union
    schema with NULLs for the old files' missing columns; the explicit-
    schema read keeps the pinned view.  Both must work over mixed drops."""
    import shutil

    from european_emissions_data_warehouse_spark.sources.readers import load_table

    out = str(tmp_path / "mixed")
    v1 = load_table(spark, sf_dir, "nation")
    v1.write.mode("overwrite").parquet(out)
    v2 = v1.withColumn("iso_code", F.concat(F.lit("N"), F.col("n_nationkey")))
    v2.write.mode("append").parquet(out)

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert "iso_code" in merged.columns
    assert merged.count() == v1.count() * 2
    # old-drop rows surface the new column as NULL, new-drop rows carry it
    assert merged.filter(F.col("iso_code").isNull()).count() == v1.count()

    pinned = spark.read.schema(v1.schema).parquet(out)
    assert pinned.columns == v1.columns
    assert pinned.count() == v1.count() * 2
    shutil.rmtree(str(tmp_path), ignore_errors=True)


def test_orc_roundtrip_preserves_values_and_pushes_filters(spark, sf_dir, tmp_path):
    """ORC as a second columnar lake format: parquet -> ORC rewrite must be
    value-identical, and comparison predicates must reach the ORC scan
    (stripe-statistics pushdown, like parquet footers)."""
    from european_emissions_data_warehouse_spark.sources.readers import load_table, read_orc

    src = load_table(spark, sf_dir, "orders")
    dst = str(tmp_path / "orders_orc")
    src.write.mode("overwrite").orc(dst)

    back = read_orc(spark, dst, src.schema)
    assert back.count() == src.count()
    a = src.agg(F.sum("o_totalprice"), F.min("o_orderkey"), F.max("o_orderkey")).first()
    b = back.agg(F.sum("o_totalprice"), F.min("o_orderkey"), F.max("o_orderkey")).first()
    assert tuple(a) == tuple(b)

    plan = (
        back.filter(F.col("o_totalprice") > 100_000.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice," in plan, plan


def test_parquet_ts_unit_directory_contract(tmp_path):
    """_parquet_ts_unit over a directory (VERDICT r3 item #2): agreeing
    parts resolve to one unit; a NANOS/MICROS mix fails loudly (one scan
    can apply only one physical-type treatment); an empty directory raises
    an explicit error, not a bare StopIteration."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from european_emissions_data_warehouse_spark.sources.readers import (
        _parquet_ts_unit,
    )

    def write_part(dirname, fname, unit):
        d = tmp_path / dirname
        d.mkdir(exist_ok=True)
        tbl = pa.table({"ts": pa.array([0, 1_000_000], type=pa.timestamp(unit))})
        pq.write_table(tbl, str(d / fname))

    write_part("uniform", "part-0.parquet", "us")
    write_part("uniform", "part-1.parquet", "us")
    assert _parquet_ts_unit(str(tmp_path / "uniform")) == ("us", False)

    write_part("mixed", "part-0.parquet", "us")
    write_part("mixed", "part-1.parquet", "ns")
    with pytest.raises(ValueError, match="mixed timestamp layouts"):
        _parquet_ts_unit(str(tmp_path / "mixed"))

    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError, match="no .parquet part files"):
        _parquet_ts_unit(str(tmp_path / "empty"))


def test_parquet_ts_unit_zero_row_parts_and_remote_schemes(tmp_path):
    """Zero-row-group parts carry no physical-type evidence (pyarrow shows
    INT96 as ns in the arrow schema), so they must not constrain the unit
    — an empty part next to data parts previously turned a homogeneous
    directory into a 'mixed layouts' error.  Remote URIs must fail loudly
    instead of probing a nonexistent local path (code-review r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from european_emissions_data_warehouse_spark.sources.readers import (
        _parquet_ts_unit,
    )

    d = tmp_path / "with_empty"
    d.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([0, 1_000_000], type=pa.timestamp("us"))}),
        str(d / "part-0.parquet"),
    )
    pq.write_table(
        pa.table({"ts": pa.array([], type=pa.timestamp("ns"))}),
        str(d / "part-1.parquet"),
    )
    # the empty ns-schema part contributes no rows: unit follows the data
    assert _parquet_ts_unit(str(d)) == ("us", False)

    all_empty = tmp_path / "all_empty"
    all_empty.mkdir()
    pq.write_table(
        pa.table({"ts": pa.array([], type=pa.timestamp("us"))}),
        str(all_empty / "part-0.parquet"),
    )
    assert _parquet_ts_unit(str(all_empty)) == ("us", False)

    with pytest.raises(NotImplementedError, match="local filesystem"):
        _parquet_ts_unit("s3a://lake/events.parquet")


def test_parquet_ts_unit_walks_hive_partitioned_directories(tmp_path):
    """A hive-partitioned drop (events.parquet/day=.../part-*.parquet) keeps
    its part files in subdirectories: the footer probe must find them the
    same way Spark's partition discovery does, and must still catch a unit
    mix hidden across partitions (code-review r4)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from european_emissions_data_warehouse_spark.sources.readers import (
        _parquet_ts_unit,
    )

    def write_part(reldir, fname, unit):
        d = tmp_path / reldir
        d.mkdir(parents=True, exist_ok=True)
        tbl = pa.table({"ts": pa.array([0, 1_000_000], type=pa.timestamp(unit))})
        pq.write_table(tbl, str(d / fname))

    write_part("nested/day=2026-01-01", "part-0.parquet", "us")
    write_part("nested/day=2026-01-02", "part-0.parquet", "us")
    assert _parquet_ts_unit(str(tmp_path / "nested")) == ("us", False)

    write_part("nested_mix/day=2026-01-01", "part-0.parquet", "us")
    write_part("nested_mix/day=2026-01-02", "part-0.parquet", "ns")
    with pytest.raises(ValueError, match="mixed timestamp layouts"):
        _parquet_ts_unit(str(tmp_path / "nested_mix"))
