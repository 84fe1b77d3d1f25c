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


def test_stratified_sample_drops_unlisted_strata(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    only_en = stratified_sample(docs, "lang", {"en": 1.0}, seed=7)
    assert only_en.select("lang").distinct().collect() == [("en",)]
    assert only_en.count() == docs.filter(F.col("lang") == "en").count()
