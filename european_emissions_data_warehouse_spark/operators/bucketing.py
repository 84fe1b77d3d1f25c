"""Bucketed (pre-partitioned) tables — shuffle elimination for repeated joins.

At 100 TB the dominant cost of fact-fact joins (orders ⨝ lineitem on
orderkey) is the shuffle of both sides.  Bucketing both tables on the join
key at write time makes the partitioning part of the table layout, so every
subsequent join or aggregation on that key is co-located: Catalyst plans a
SortMergeJoin with **zero Exchange** — the per-bucket files are read
bucket-aligned instead of reshuffled per query.

This is the Spark-native equivalent of the reference warehouse's B-tree
unique index (reference scripts/lambda_handler_warehouse.py:63): a physical
design choice paid once at load, amortized over every query.  The upsert
operators in operators/merge.py benefit the same way — a warehouse bucketed
on the merge key turns the anti-join's shuffle into a local join.

Rules of thumb encoded here:
- bucket count should divide evenly into cluster cores (we default 16);
- both sides must have the SAME bucket count for shuffle-free joins;
- sortBy(key) within buckets lets the join skip its per-task sort.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    key: Sequence[str],
    n_buckets: int = 16,
    sort: Sequence[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted table.  With ``path`` the
    table is external (data at an explicit writable location — use this when
    the session's warehouse dir may be read-only, e.g. a driver launched
    from a read-only cwd); otherwise managed in the session warehouse."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *key)
    writer = writer.sortBy(*(sort if sort is not None else key))
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(table)


def cluster_for_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    left_table: str,
    right_table: str,
    n_buckets: int = 16,
    base_path: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Co-locate two DataFrames for repeated joining on ``key``: bucket both
    at the same count, return the catalog-backed frames.  The first join
    after this call (and every one after) plans without an Exchange."""
    lp = f"{base_path}/{left_table}" if base_path else None
    rp = f"{base_path}/{right_table}" if base_path else None
    save_bucketed(left, left_table, key, n_buckets, path=lp)
    save_bucketed(right, right_table, key, n_buckets, path=rp)
    return spark.table(left_table), spark.table(right_table)
