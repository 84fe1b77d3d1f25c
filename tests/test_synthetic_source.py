"""Python DataSource connector (sources/synthetic.py): determinism,
range partitioning, filter pushdown semantics, and drop-in schema
compatibility with the corpus operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.sources.synthetic import (
    SyntheticDocsDataSource,
)


@pytest.fixture(scope="module")
def docs_reader(spark):
    spark.dataSource.register(SyntheticDocsDataSource)

    def make(**opts):
        r = spark.read.format("synthetic_docs")
        for k, v in opts.items():
            r = r.option(k, v)
        return r.load()

    return make


def test_deterministic_and_partitioned(docs_reader):
    a = docs_reader(n_docs=300, n_partitions=3)
    b = docs_reader(n_docs=300, n_partitions=7)
    assert a.rdd.getNumPartitions() == 3
    assert a.count() == 300
    # same seed => identical corpus regardless of how generation was split
    assert a.orderBy("doc_id").collect() == b.orderBy("doc_id").collect()
    # different seed => different corpus
    c = docs_reader(n_docs=300, seed="other")
    assert a.orderBy("doc_id").collect() != c.orderBy("doc_id").collect()


def test_pushdown_equals_post_filter(docs_reader):
    """Generator-side pruning must be a pure optimization: identical rows
    to generating everything and letting Spark filter."""
    df = docs_reader(n_docs=400, n_partitions=4)
    pushed = df.filter(
        (F.col("doc_id") >= 50) & (F.col("doc_id") < 200) & (F.col("lang") == "en")
    ).collect()
    manual = [
        r
        for r in df.collect()
        if 50 <= r.doc_id < 200 and r.lang == "en"
    ]
    assert sorted(map(tuple, pushed)) == sorted(map(tuple, manual))
    assert pushed, "the filtered read must not be empty at this size"


def test_unsupported_filters_are_reapplied_by_spark(docs_reader):
    """A predicate the source hands back (n_chars) still filters correctly."""
    df = docs_reader(n_docs=200)
    rows = df.filter(F.col("n_chars") > 100).collect()
    assert rows and all(r.n_chars > 100 for r in rows)


def test_generated_corpus_feeds_corpus_operators(docs_reader):
    """Schema-compatible with the documents table: a corpus operator runs
    on generated data unchanged."""
    from european_emissions_data_warehouse_spark.operators.dedup import dedup_exact

    df = docs_reader(n_docs=150)
    out = dedup_exact(df)
    # short docs from a 16-word vocab collide; dedup must see real groups
    assert out.agg(F.sum("n_copies")).collect()[0][0] == 150


def test_stream_reader_matches_batch_and_replays(spark, docs_reader, tmp_path):
    """Micro-batch stream over the generator: drains n_docs in
    docs_per_batch chunks, content-identical to the batch read; any batch
    replays bit-identically from its offset range (crash recovery)."""
    from european_emissions_data_warehouse_spark.sources.synthetic import (
        SyntheticDocsStreamReader,
    )

    sdf = (
        spark.readStream.format("synthetic_docs")
        .option("n_docs", 250)
        .option("docs_per_batch", 100)
        .load()
    )
    out: list = []
    q = (
        sdf.writeStream.foreachBatch(lambda b, i: out.extend(b.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    batch_rows = docs_reader(n_docs=250).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, batch_rows))

    r = SyntheticDocsStreamReader({"n_docs": "250", "docs_per_batch": "100"})
    replay1 = r.readBetweenOffsets({"next": 100}, {"next": 200})
    replay2 = r.readBetweenOffsets({"next": 100}, {"next": 200})
    assert replay1 == replay2 and len(replay1) == 100


def test_contradictory_equality_filters_return_empty(docs_reader):
    """lang = 'en' AND lang = 'de' must yield zero rows — the source
    consumes one equality and hands the second back to Spark."""
    df = docs_reader(n_docs=120)
    assert df.filter((F.col("lang") == "en") & (F.col("lang") == "de")).count() == 0


def test_empty_string_equality_filter_matches_nothing(docs_reader):
    """lang = '' is a real pushed predicate: the reader's old truthiness
    check (`self.eq.get('lang')`) skipped it entirely and — because the
    filter was CONSUMED — Spark never re-applied it, returning every row
    for a predicate that matches none (code-review r4)."""
    df = docs_reader(n_docs=80)
    assert df.filter(F.col("lang") == "").count() == 0
    assert df.filter(F.col("source") == "").count() == 0


def test_user_schema_reorder_and_subset_bind_by_name(spark, docs_reader):
    """Spark binds Python-source output tuples to the effective schema
    POSITIONALLY, so a user .schema() that reorders (or subsets) columns
    must change the reader's emit order — the old fixed-order emit silently
    swapped same-typed columns like lang/source (code-review r4)."""
    base = {r["doc_id"]: r for r in docs_reader(n_docs=50).collect()}

    reordered = (
        spark.read.format("synthetic_docs")
        .schema("doc_id bigint, text string, source string, lang string, n_chars bigint")
        .option("n_docs", 50)
        .load()
        .collect()
    )
    assert len(reordered) == 50
    for r in reordered:
        b = base[r["doc_id"]]
        assert r["lang"] == b["lang"] and r["source"] == b["source"], (
            "lang/source swapped under a reordered user schema"
        )

    subset = (
        spark.read.format("synthetic_docs")
        .schema("source string, doc_id bigint")
        .option("n_docs", 50)
        .load()
        .collect()
    )
    assert {r["doc_id"]: r["source"] for r in subset} == {
        k: v["source"] for k, v in base.items()
    }

    # pushdown still prunes correctly under the reordered schema
    filtered = (
        spark.read.format("synthetic_docs")
        .schema("doc_id bigint, text string, source string, lang string, n_chars bigint")
        .option("n_docs", 200)
        .load()
        .filter(F.col("lang") == "en")
        .collect()
    )
    want_en = {k for k, v in
               {r["doc_id"]: r for r in docs_reader(n_docs=200).collect()}.items()
               if v["lang"] == "en"}
    assert {r["doc_id"] for r in filtered} == want_en
    assert all(r["lang"] == "en" for r in filtered)


def test_unknown_schema_column_and_bad_n_partitions_fail_loudly(spark):
    """A user schema naming a column the generator doesn't have must raise
    a clear error (not bind garbage positionally), and n_partitions=0 must
    fail at validation, not as a planner ZeroDivisionError (code-review r4)."""
    import pytest

    from european_emissions_data_warehouse_spark.sources.synthetic import (
        SyntheticDocsReader,
    )

    with pytest.raises(Exception, match="no column"):
        (
            spark.read.format("synthetic_docs")
            .schema("doc_id bigint, nonexistent string")
            .option("n_docs", 5)
            .load()
            .collect()
        )

    with pytest.raises(ValueError, match="n_partitions must be >= 1"):
        SyntheticDocsReader({"n_docs": "10", "n_partitions": "0"})
