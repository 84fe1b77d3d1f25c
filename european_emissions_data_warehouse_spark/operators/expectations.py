"""Declarative data-quality expectations over warehouse tables.

The reference trusts its loader end-to-end (typed COPY aborts on bad rows,
reference scripts/lambda_handler_warehouse.py:80-92, and nothing validates
referential or domain rules after load).  A warehouse at scale needs the
checks as a first-class queryable report: null rates, key uniqueness,
referential integrity, accepted-value domains, numeric ranges.

Scale design (100 TB facts):
- every single-table rule over one table compiles into ONE conditional
  aggregation pass (``SUM(CASE WHEN violated THEN 1 END)`` per rule), so N
  rules cost one scan, not N scans; the 1×N result row unpivots map-side
  into tidy (check, violations) rows;
- key-uniqueness is ``COUNT(*) - COUNT(DISTINCT key)`` inside the same
  pass (distinct-count is partial-aggregable);
- referential checks are anti-join counts: broadcast when the parent is a
  dimension, shuffle-join on the key otherwise — either way the output is
  a count, never a row transfer of the fact table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _violations(cond: Column) -> Column:
    """Count of rows violating ``cond`` (cond expresses the EXPECTATION).
    Coalesced to 0 on an EMPTY table: SUM over zero rows is NULL, which
    made a gate's `violations == 0` fail and `violations > 0` pass at the
    same time — ambiguous exactly when a table unexpectedly lands empty
    (code-review r4)."""
    return F.coalesce(
        F.sum(F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)), F.lit(0)
    )


def table_expectations(
    df: DataFrame,
    table: str,
    not_null: list[str] = (),
    unique: list[str] = (),
    accepted: dict[str, list[str]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    count_as: str | None = "row_count",
) -> DataFrame:
    """Compile per-table rules into one aggregation + map-side unpivot.
    Returns (check string, violations bigint) rows; ``row_count`` reports
    the table cardinality (value, not a violation count) so the report
    always carries data-volume evidence alongside the zero/nonzero rules."""
    aggs = []
    if count_as:
        aggs.append(F.count(F.lit(1)).alias(f"{table}.{count_as}"))
    for c in not_null:
        aggs.append(_violations(F.col(c).isNotNull()).alias(f"{table}.{c}.not_null"))
    for c in unique:
        # COUNT(c) - COUNT(DISTINCT c) both SKIP nulls — Postgres UNIQUE
        # parity (multiple NULLs never conflict).  merge.check_unique is
        # deliberately stricter (NULL keys group, matching the null-safe
        # merge identity); the two validators answer different questions
        # (code-review r4, operators pass)
        aggs.append(
            (F.count(c) - F.countDistinct(c)).alias(f"{table}.{c}.unique")
        )
    # accepted_values / in_range PASS NULLs, like the SQL CHECK constraints
    # they compile from: counting NULL as a violation double-reported every
    # legitimately-nullable column against its separate not_null rule and
    # permanently failed violations==0 gates on valid data (code-review
    # r4).  Nullability is the not_null rule's job — state it explicitly.
    for c, vals in (accepted or {}).items():
        aggs.append(
            _violations(F.col(c).isNull() | F.col(c).isin(list(vals))).alias(
                f"{table}.{c}.accepted_values"
            )
        )
    for c, (lo, hi) in (ranges or {}).items():
        aggs.append(
            _violations(
                F.col(c).isNull() | F.col(c).between(F.lit(lo), F.lit(hi))
            ).alias(f"{table}.{c}.in_range")
        )
    wide = df.agg(*aggs)
    # check names are dotted (table.column.rule): backtick them so unpivot
    # treats each as one column, not a struct-field path
    return wide.unpivot(
        ids=[],
        values=[f"`{c}`" for c in wide.columns],
        variableColumnName="check",
        valueColumnName="violations",
    ).select("check", F.col("violations").cast("long").alias("violations"))


def foreign_key_check(
    child: DataFrame, parent: DataFrame, child_key: str, parent_key: str, name: str,
    broadcast_parent: bool = False,
) -> DataFrame:
    """Orphan count: NON-NULL child keys with no parent.  SQL FK
    constraints pass NULL child rows (MATCH SIMPLE), so counting them as
    orphans diverged from the semantics this module claims parity with
    and double-reported nullable FKs against their not_null rule
    (code-review r4).

    ``broadcast_parent`` defaults to PLANNER-DECIDED (False): most FK
    parents are themselves fact-scale (orders under lineitem, customer
    under orders), and a forced broadcast of the parent key set is the
    hint that dies at scale — the sf100 probe measured lineitem->orders
    at a 12 GiB key broadcast, over Spark's 8 GiB ceiling, where the
    un-hinted plan lets AQE broadcast genuinely small sides and
    shuffle-join the rest.  Pass True only for parents bounded by
    schema (enum-like dims such as nation/region)."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    if broadcast_parent:
        keys = F.broadcast(keys)
    orphans = child.filter(F.col(child_key).isNotNull()).join(
        keys, child_key, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).alias("violations")).select(
        F.lit(name).alias("check"), "violations"
    )


def vector_expectations(
    df: DataFrame,
    table: str,
    vec_col: str = "embedding",
    dim: int | None = None,
    min_norm: float | None = None,
) -> DataFrame:
    """Ingest gate for embedding columns — the vector-typed complement of
    :func:`table_expectations`, motivated directly by what the fuzz gate
    kept finding downstream: zero/denormal vectors turn every cosine into
    a 0/0 and NaN components poison whole aggregates, and production ANN
    stacks reject both AT INGEST rather than teaching every query to
    special-case them (the engine's ANN verdict queries currently filter
    degenerate probes ad hoc; this is the upstream contract that makes
    those filters dead code on gated data).

    Rules, each a (check, violations) row like table_expectations — NULL
    vectors pass every rule but not_null (nullability is stated once):
    - ``not_null``  — NULL embeddings;
    - ``finite``    — any NaN or ±Inf component;
    - ``dim``       — wrong component count (when ``dim`` given);
    - ``min_norm``  — |v| below ``min_norm`` (when given): zero and
      denormal vectors have no usable direction; 1e-6 matches the probe
      filter the ANN verdict queries use.

    One aggregation, map-side partial, unpivoted — same scan cost as any
    other expectation at 100 TB."""
    from european_emissions_data_warehouse_spark.functions.vectors import norm

    v = F.col(vec_col).cast("array<double>")
    is_finite = F.forall(
        v, lambda x: ~F.isnan(x) & (F.abs(x) < F.lit(float("inf")))
    )
    aggs = [
        F.count(F.lit(1)).alias(f"{table}.{vec_col}.row_count"),
        _violations(F.col(vec_col).isNotNull()).alias(
            f"{table}.{vec_col}.not_null"
        ),
        _violations(F.col(vec_col).isNull() | is_finite).alias(
            f"{table}.{vec_col}.finite"
        ),
    ]
    if dim is not None:
        aggs.append(
            _violations(F.col(vec_col).isNull() | (F.size(v) == dim)).alias(
                f"{table}.{vec_col}.dim"
            )
        )
    if min_norm is not None:
        # NaN guard: norm(NaN-vector) is NaN and NaN >= x is true under
        # Spark's total float ordering, so a non-finite vector would PASS
        # min_norm while failing finite — confusing double-report; gate
        # min_norm on finiteness so each defect trips exactly one rule
        aggs.append(
            _violations(
                F.col(vec_col).isNull()
                | ~is_finite
                | (norm(v) >= F.lit(min_norm))
            ).alias(f"{table}.{vec_col}.min_norm")
        )
    wide = df.agg(*aggs)
    return wide.unpivot(
        ids=[],
        values=[f"`{c}`" for c in wide.columns],
        variableColumnName="check",
        valueColumnName="violations",
    ).select("check", F.col("violations").cast("long").alias("violations"))


def expectations_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-table/per-FK pieces into one tidy, ordered report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check")


def k_anonymity_check(
    df: DataFrame, quasi_identifiers: list[str], k: int
) -> DataFrame:
    """Privacy audit: is every quasi-identifier combination shared by at
    least ``k`` rows?  The check you run BEFORE publishing a projection —
    the release-side complement of SnapshotTable.delete_where's
    erase-side GDPR path.

    Returns one row: (k, n_groups, n_violating_groups, n_exposed_rows,
    is_k_anonymous) — exact integers from one groupBy on the
    quasi-identifier tuple (partial-aggregated; the only shuffle).  At
    100 TB this is a scan plus a |distinct combinations|-sized exchange.
    An EMPTY input is trivially k-anonymous (0 groups, 0 violations) —
    the SUMs coalesce so the verdict is 1, not NULL (code-review r4)."""
    groups = df.groupBy(*quasi_identifiers).agg(F.count(F.lit(1)).alias("n"))
    n_viol = F.coalesce(
        F.sum(F.when(F.col("n") < k, 1).otherwise(0)), F.lit(0)
    )
    return groups.agg(
        F.lit(k).cast("bigint").alias("k"),
        F.count(F.lit(1)).alias("n_groups"),
        n_viol.alias("n_violating_groups"),
        F.coalesce(
            F.sum(F.when(F.col("n") < k, F.col("n")).otherwise(0)), F.lit(0)
        ).alias("n_exposed_rows"),
        (n_viol == 0).cast("int").alias("is_k_anonymous"),
    )
