"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``european_emissions_data_warehouse_spark.plans``:
- ``parity``    — the reference's operator inventory (SURVEY.md §2.1).
- ``analytics`` — the delegated ad-hoc SQL surface (SURVEY.md §2.2/§0(c)).
- ``llm``       — LLM-data-pipeline extensions (SURVEY.md §2.3).

Name/typing conventions shared by Spark queries and oracles:
computed columns aliased identically, computed ints cast to BIGINT both
sides, float aggregates ROUND()ed to 2, timestamps formatted as strings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from european_emissions_data_warehouse_spark.plans.parity import q_etl_flagship

    return q_etl_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from european_emissions_data_warehouse_spark.plans import analytics, llm, parity

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(parity.QUERIES)
    out.update(analytics.QUERIES)
    out.update(llm.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; keys missing here get the
    weaker rows-only check (non-SQL-expressible ops: hash-seeded dedup
    sketches, LSH internals)."""
    from european_emissions_data_warehouse_spark.plans import analytics, llm, parity

    out: dict[str, str] = {}
    out.update(parity.ORACLES)
    out.update(analytics.ORACLES)
    out.update(llm.ORACLES)
    return out
