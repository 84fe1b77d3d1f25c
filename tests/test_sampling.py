"""Sampling/split operator contracts (operators/sampling.py).

The oracle-parity test proves split_by_hash value equality with SQL; here we
pin the semantic contracts: split stability under corpus growth (no
train/test leakage across versions), partition coverage, and the stratified
sample's subset + approximate-rate properties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.sampling import (
    split_by_hash,
    stratified_sample,
)
from european_emissions_data_warehouse_spark.sources.readers import load_table

SF_BIG = "/root/testdata/sf0.01"


def test_split_covers_all_rows_and_labels(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    split = split_by_hash(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "valid", "test"}
    # 80/10/10 within binomial tolerance on 500 docs
    total = sum(counts.values())
    assert abs(counts["train"] / total - 0.80) < 0.08
    assert abs(counts["valid"] / total - 0.10) < 0.06
    assert abs(counts["test"] / total - 0.10) < 0.06


def test_split_stable_under_corpus_growth(spark, sf_dir):
    """A document keeps its split when the corpus doubles — membership is a
    pure key function, so growing the table cannot leak test docs into
    train."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    half = docs.filter(F.col("doc_id") % 2 == 0)
    small = {r["doc_id"]: r["split"] for r in split_by_hash(half, "doc_id").collect()}
    full = {r["doc_id"]: r["split"] for r in split_by_hash(docs, "doc_id").collect()}
    assert all(full[k] == v for k, v in small.items())


def test_split_percents_must_sum_to_100():
    with pytest.raises(ValueError):
        split_by_hash(None, "doc_id", splits=(("train", 80), ("test", 10)))


def test_stratified_sample_subset_and_rates(spark):
    docs = load_table(spark, SF_BIG, "documents").select("doc_id", "lang")
    fractions = {"en": 0.25, "de": 0.8, "es": 0.8, "fr": 0.8, "zh": 0.8}
    sampled = stratified_sample(docs, "lang", fractions, seed=42)
    # subset: every sampled doc_id exists in the source with the same lang
    assert sampled.join(docs, ["doc_id", "lang"], "left_anti").count() == 0
    # per-stratum rate near target (binomial, n>=64 per stratum at sf0.01)
    base = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in sampled.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, frac in fractions.items():
        rate = got.get(lang, 0) / base[lang]
        assert abs(rate - frac) < 0.2, (lang, rate, frac)


class TestSplitLaws:
    """Property-based laws of the hash splitter (hypothesis): total
    partition, determinism, bucket range, and growth stability for
    arbitrary keys and split tables."""

    import pytest as _pytest
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    keys = st.lists(
        st.integers(min_value=0, max_value=2**40), unique=True, min_size=1, max_size=30
    )
    pcts = st.sampled_from([(50, 50), (80, 10, 10), (99, 1), (34, 33, 33), (100,)])

    @given(keys=keys, pcts=pcts)
    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    def test_total_partition_and_stability(self, spark, keys, pcts):
        from european_emissions_data_warehouse_spark.operators.sampling import (
            hash_bucket,
            split_by_hash,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
        splits = tuple((f"s{i}", p) for i, p in enumerate(pcts))
        out = split_by_hash(df, "doc_id", splits=splits)
        rows = {r["doc_id"]: r["split"] for r in out.collect()}
        # total partition: every key labeled, labels drawn from the table
        assert set(rows) == set(keys)
        assert set(rows.values()) <= {name for name, _ in splits}
        # determinism + growth stability: a subset sees identical labels
        sub = split_by_hash(df.limit(max(1, len(keys) // 2)), "doc_id", splits=splits)
        assert all(rows[r["doc_id"]] == r["split"] for r in sub.collect())
        # bucket range
        b = df.select(hash_bucket("doc_id").alias("b")).agg(
            F.min("b").alias("lo"), F.max("b").alias("hi")
        ).collect()[0]
        assert 0 <= b["lo"] and b["hi"] <= 99


def test_stratified_sample_drops_unlisted_strata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    only_en = stratified_sample(docs, "lang", {"en": 1.0}, seed=7)
    assert only_en.select("lang").distinct().collect() == [("en",)]
    assert only_en.count() == docs.filter(F.col("lang") == "en").count()


def test_corpus_shuffle_is_deterministic_partition_of_corpus(spark, sf_dir):
    """Every doc lands in exactly one shard (0..7); positions within a
    shard are dense 1..n; a second run is bit-identical (seeded digest)."""
    import __spark_entry__ as entry_mod

    q = entry_mod.queries()["corpus_shuffle"]
    a = q(spark, sf_dir).collect()
    b = q(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(a) == n_docs
    by_shard = {}
    for r in a:
        assert 0 <= r["shard"] <= 7
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_padding_efficiency_bucketed_never_worse_than_fixed(spark, sf_dir):
    """Bucketed padding is pointwise <= fixed-128 padding, and useful+pad
    reconstructs each bucket's token budget exactly."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["padding_efficiency"](spark, sf_dir).collect()
    assert rows, "empty report"
    for r in rows:
        assert r["pad_bucketed"] <= r["pad_fixed"]
        assert r["useful_tokens"] + r["pad_bucketed"] == r["bucket_len"] * r["n_docs"]


def test_hash_bucket_negative_keys_stay_in_range(spark):
    """Hash-derived keys are negative half the time; every bucket must land
    in [0, n) regardless of sign (SQL %% follows the dividend — the bare
    fold handed negative buckets to keys below -salt; code-review r4)."""
    from european_emissions_data_warehouse_spark.operators.sampling import (
        hash_bucket,
        split_by_hash,
    )

    df = spark.range(2000).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("key")
    )
    assert df.filter(F.col("key") < 0).count() > 0, "fixture needs negatives"
    buckets = df.select(hash_bucket("key", 100).alias("b"))
    assert buckets.filter((F.col("b") < 0) | (F.col("b") >= 100)).count() == 0
    split = split_by_hash(df, "key")
    shares = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(shares.values())
    assert 0.7 < shares["train"] / n < 0.9, shares
    assert shares.get("valid", 0) > 0 and shares.get("test", 0) > 0, shares


def test_hash_bucket_extreme_and_null_keys(spark):
    """Long.MAX must bucket (key + salt overflowed bigint and aborted the
    job under ANSI) and a NULL key must raise — silently, the null routed
    to split_by_hash's LAST split (the holdout) while the stratified
    sampler dropped it: two policies for unidentifiable rows
    (code-review r4)."""
    import pytest

    from european_emissions_data_warehouse_spark.operators.sampling import (
        hash_bucket,
    )

    extremes = spark.createDataFrame(
        [(9223372036854775807,), (-9223372036854775808,), (0,)], "key long"
    )
    got = [r["b"] for r in extremes.select(hash_bucket("key", 100).alias("b")).collect()]
    assert all(0 <= b < 100 for b in got), got
    nulls = spark.createDataFrame([(1,), (None,)], "key long")
    with pytest.raises(Exception, match="null key"):
        nulls.select(hash_bucket("key", 100).alias("b")).collect()


def test_surrogate_key_rejects_existing_column(spark):
    """withColumn would silently replace the caller's column and project
    it twice (code-review r4)."""
    import pytest

    from european_emissions_data_warehouse_spark.operators.merge import (
        with_surrogate_key,
    )

    df = spark.createDataFrame([(1, "a")], "id long, v string")
    with pytest.raises(ValueError, match="already exists"):
        with_surrogate_key(df, ["v"], name="id")


def test_hash_bucket_distribution_unbiased(spark):
    """At modulus 10000 the old 16-bit bucket had a 7:6 skew — realized
    fractions off by up to ~7%%.  With 26 bits the realized fraction of a
    0.5 cut must sit within ~2%% of 0.5 on sequential AND hashed keys."""
    from european_emissions_data_warehouse_spark.operators.sampling import hash_bucket

    for key in (F.col("id"), F.xxhash64(F.col("id").cast("string"))):
        df = spark.range(20000).select(key.alias("key"))
        kept = df.filter(hash_bucket("key", 10000) < 5000).count()
        assert abs(kept / 20000 - 0.5) < 0.02, kept


def test_sample_decorrelated_from_split(spark, sf_dir):
    """A stratified sample must draw from ALL splits in proportion — the
    shared-salt nested-moduli bug made every sampled doc a 'train' row
    (code-review r4).  At fraction 0.2, each split keeps some docs and the
    train share of the sample stays near the train share of the corpus."""
    from european_emissions_data_warehouse_spark.operators.sampling import (
        split_by_hash,
        stratified_sample_hash,
    )
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    split = split_by_hash(docs, "doc_id")
    sampled = stratified_sample_hash(
        split, "lang", {l: 0.2 for l in ("en", "de", "es", "fr", "zh")},
        key_col="doc_id",
    )
    by_split = {r["split"]: r["n"] for r in
                sampled.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(by_split) == {"train", "valid", "test"}, by_split


def test_small_fraction_sample_still_spans_splits(spark):
    """Distinct salts alone did NOT decorrelate sample from split: the hash
    was affine in the salt, so the two bucket streams sat a near-constant
    offset apart and a fraction-0.01 sample was 100%% 'train' (code-review
    r4, second pass — fixed by a salt-derived multiplier).  Over sequential
    keys at fraction 0.01, each split must keep roughly its own share."""
    from european_emissions_data_warehouse_spark.operators.sampling import (
        split_by_hash,
        stratified_sample_hash,
    )

    df = spark.range(200_000).select(F.col("id").alias("doc_id"), F.lit("en").alias("lang"))
    sampled = stratified_sample_hash(
        split_by_hash(df, "doc_id"), "lang", {"en": 0.01}, key_col="doc_id"
    )
    by_split = {r["split"]: r["n"] for r in
                sampled.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    n = sum(by_split.values())
    assert 1500 < n < 2500, by_split  # ~2000 expected at 0.01
    assert set(by_split) == {"train", "valid", "test"}, by_split
    assert 0.7 < by_split["train"] / n < 0.9, by_split
    assert by_split["valid"] / n > 0.05 and by_split["test"] / n > 0.05, by_split


def test_hash_bucket_uses_high_key_bits(spark):
    """Keys congruent mod 2^30 must NOT collide deterministically: under
    the old fold (key % 2^30 alone), monotonically_increasing_id-style keys
    (pid·2^33 + j, where 2^33 ≡ 0 mod 2^30) drew identical buckets for row
    j of EVERY partition, for every salt — correlated split/sample
    decisions at exactly the id scheme Spark hands out (code-review r4).
    Also pins that the mix is the identity for sub-2^30 keys (hi = 0), so
    historical small-key assignments never moved."""
    from european_emissions_data_warehouse_spark.operators.sampling import hash_bucket

    # 64 partitions x 32 rows of monotonically_increasing_id-shaped keys
    rows = [(pid * (1 << 33) + j,) for pid in range(64) for j in range(32)]
    df = spark.createDataFrame(rows, "k long")
    out = df.select("k", hash_bucket("k", 100).alias("b")).collect()
    by_offset = {}
    for r in out:
        by_offset.setdefault(r["k"] % (1 << 33), set()).add(r["b"])
    # every offset j must spread across many buckets, not collapse to one
    collapsed = [j for j, bs in by_offset.items() if len(bs) == 1]
    assert not collapsed, f"offsets {collapsed[:5]} bucket identically across partitions"

    # identity for small keys: hi = 0 path must equal the pre-mix arithmetic
    small = spark.createDataFrame([(i,) for i in range(1000)], "k long")
    got = {r["k"]: r["b"] for r in small.select("k", hash_bucket("k", 100).alias("b")).collect()}
    F_, M32, salt = 1 << 30, 1 << 32, 40503
    mult = (2654435761 + 2 * salt) % M32
    for k in range(1000):
        want = ((((k + salt) % F_) * mult) % M32 // 64) % 100
        assert got[k] == want, (k, got[k], want)
