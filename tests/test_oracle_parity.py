"""Local replica of the driver's correctness gate: every `queries()` entry
with an `oracle_sql()` entry must match DuckDB on the same parquet tables —
row count, column names, and order-insensitive values (sf0.001 here; the
driver uses sf0.01)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(rows, columns):
    """Sort columns by name (like the driver), normalize cell values, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])

    def cell(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.12g}"
        if isinstance(v, bool):
            return str(int(v))
        return str(v)

    return sorted(tuple(cell(row[i]) for i in order) for row in rows)


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()
CHECKED = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


def _spark_family(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        return "decimal"
    if s == "boolean":
        return "bool"
    if s.startswith("timestamp"):
        return "timestamp"
    if s == "date":
        return "date"
    if s.startswith("array"):
        return "list"
    if s == "string":
        return "str"
    return s


def _arrow_family(t) -> str:
    import pyarrow.types as pt

    if pt.is_integer(t):
        return "int"
    if pt.is_floating(t):
        return "float"
    if pt.is_decimal(t):
        return "decimal"
    if pt.is_boolean(t):
        return "bool"
    if pt.is_timestamp(t):
        return "timestamp"
    if pt.is_date(t):
        return "date"
    if pt.is_list(t) or pt.is_large_list(t):
        return "list"
    if pt.is_string(t) or pt.is_large_string(t):
        return "str"
    return str(t)


@pytest.mark.parametrize("name", CHECKED)
def test_oracle_match(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    # Dtype-family drift guard: the driver's value hash is dtype-aware
    # (DuckDB SUM(BIGINT) -> HUGEINT surfaces as decimal128 via Arrow and
    # hash-mismatches Spark's BIGINT even when values are identical), so
    # assert per-column type families agree before comparing values.
    # ONE execution: the arrow table carries schema, columns, AND rows —
    # the old fetch-schema-then-re-execute ran every oracle twice per
    # suite (code-review r4, instruments pass).
    tbl = duck.execute(ORACLES[name]).fetch_arrow_table()
    arrow_types = {f.name: _arrow_family(f.type) for f in tbl.schema}
    spark_types = {f.name: _spark_family(f.dataType) for f in sdf.schema.fields}
    drift = {
        c: (spark_types[c], arrow_types[c])
        for c in spark_types
        if c in arrow_types and spark_types[c] != arrow_types[c]
    }
    assert not drift, f"{name}: dtype family drift (spark, oracle): {drift}"
    duck_cols = tbl.schema.names
    duck_rows = [tuple(r.values()) for r in tbl.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    left = normalize(spark_rows, spark_cols)
    right = normalize(duck_rows, duck_cols)
    mismatches = [(l, r) for l, r in zip(left, right) if l != r]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    # determinism: running twice yields the same rows
    again = QUERIES[name](spark, sf_dir)
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
