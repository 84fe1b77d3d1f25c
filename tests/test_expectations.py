"""Expectation rules must count actual violations — the lake fixtures are
clean (dq_report proves all-zero there), so each rule family is exercised
here against a frame with known defects."""

from __future__ import annotations

from european_emissions_data_warehouse_spark.operators.expectations import (
    expectations_report,
    foreign_key_check,
    k_anonymity_check,
    table_expectations,
)


def _report_dict(df):
    return {r["check"]: r["violations"] for r in df.collect()}


def test_single_table_rules_count_violations(spark):
    rows = [
        # (id, status, amount)
        (1, "O", 10.0),
        (1, "F", -5.0),      # dup id, amount below range
        (2, None, 10.0),     # status null -> accepted_values violation
        (None, "X", 200.0),  # id null; status out of domain; amount above range
        (3, "P", None),      # amount null -> in_range violation
    ]
    df = spark.createDataFrame(rows, "id long, status string, amount double")
    rep = _report_dict(
        table_expectations(
            df,
            "t",
            not_null=["id"],
            unique=["id"],
            accepted={"status": ["O", "F", "P"]},
            ranges={"amount": (0.0, 100.0)},
        )
    )
    assert rep == {
        "t.row_count": 5,
        "t.id.not_null": 1,
        # COUNT(id)=4 non-null minus 3 distinct
        "t.id.unique": 1,
        # NULL PASSES accepted_values/in_range (SQL CHECK semantics,
        # code-review r4): only 'X' violates the domain, only -5 and 200
        # violate the range; nullability is the not_null rule's job
        "t.status.accepted_values": 1,
        "t.amount.in_range": 2,
    }


def test_foreign_key_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,), (None,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    rep = _report_dict(
        foreign_key_check(child, parent, "fk", "pk", "child.fk.fk_parent")
    )
    # two orphan rows with fk=9; the NULL fk PASSES (SQL MATCH SIMPLE —
    # a nullable FK is valid data, not an orphan; code-review r4)
    assert rep == {"child.fk.fk_parent": 2}


def test_report_union_is_ordered(spark):
    a = spark.createDataFrame([(1, "b")], "x long, s string")
    parts = [
        table_expectations(a, "zz", count_as="row_count"),
        table_expectations(a, "aa", count_as="row_count"),
    ]
    rep = expectations_report(parts)
    checks = [r["check"] for r in rep.collect()]
    assert checks == sorted(checks)


def test_expectations_empty_table_reports_zero_not_null(spark):
    """SUM over zero rows is NULL: an empty table made every rule's
    violation count NULL — `== 0` failed AND `> 0` passed (code-review
    r4).  Empty tables now report 0 violations alongside row_count=0, and
    an empty input is explicitly k-anonymous."""
    empty = spark.createDataFrame([], "c string, n long")
    rows = {r["check"]: r["violations"] for r in table_expectations(
        empty, "t", not_null=["c"], accepted={"c": ["x"]}, ranges={"n": (0, 9)}
    ).collect()}
    assert rows["t.row_count"] == 0
    assert rows["t.c.not_null"] == 0
    assert rows["t.c.accepted_values"] == 0
    assert rows["t.n.in_range"] == 0
    ka = k_anonymity_check(empty, ["c"], k=2).first()
    assert ka["is_k_anonymous"] == 1 and ka["n_violating_groups"] == 0


def test_vector_expectations_gates_each_defect_once(spark):
    """Every defect class trips exactly ONE rule: NULL -> not_null only,
    NaN/Inf -> finite only (min_norm must not double-report a NaN norm),
    wrong length -> dim only, zero/denormal -> min_norm only; a clean
    vector trips nothing."""
    from european_emissions_data_warehouse_spark.operators.expectations import (
        vector_expectations,
    )

    rows = [
        (1, [1.0, 2.0]),            # clean
        (2, None),                  # not_null
        (3, [float("nan"), 1.0]),   # finite
        (4, [float("inf"), 1.0]),   # finite
        (5, [1.0, 2.0, 3.0]),       # dim
        (6, [0.0, 0.0]),            # min_norm (zero norm)
        (7, [1e-30, 0.0]),          # min_norm (denormal)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rep = {
        r["check"]: r["violations"]
        for r in vector_expectations(
            df, "emb", dim=2, min_norm=1e-6
        ).collect()
    }
    assert rep["emb.embedding.row_count"] == 7
    assert rep["emb.embedding.not_null"] == 1
    assert rep["emb.embedding.finite"] == 2
    assert rep["emb.embedding.dim"] == 1
    assert rep["emb.embedding.min_norm"] == 2

    # empty table: every rule coalesces to zero violations, not NULL
    empty = df.limit(0)
    rep0 = {
        r["check"]: r["violations"]
        for r in vector_expectations(empty, "emb", dim=2, min_norm=1e-6).collect()
    }
    assert rep0["emb.embedding.row_count"] == 0
    assert all(v == 0 for k, v in rep0.items() if not k.endswith("row_count"))

    # the real fixture passes the gate it would ship with (finite + dim);
    # min_norm is intentionally omitted: the driver fixture's low-norm
    # vectors are a documented probe-filter case, not an ingest defect
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    repf = {
        r["check"]: r["violations"]
        for r in vector_expectations(emb, "embeddings", dim=64).collect()
    }
    assert repf["embeddings.embedding.finite"] == 0
    assert repf["embeddings.embedding.dim"] == 0
