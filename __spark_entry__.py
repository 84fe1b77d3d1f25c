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


# The driver grades the FIRST 50 queries in registration order.  All 164
# registered queries hold a green driver row (cumulative r1-r7), so round 8
# rotates the window to the 50 queries with the OLDEST green rows (VERDICT
# r7 item #1), recomputed from the CORRECTNESS_r0*.json latest-green map:
# the 14 remaining r4-vintage rows plus the 36 alphabetically-first
# r5-vintage rows.  The driver row is the hard signal; re-grading a green
# query under the current engine is free insurance.
_GRADE_FIRST = [
    # --- r4-vintage driver rows (graded round 4, never since) ---
    "semdedup",
    "semdedup_scaled",
    "sessionize",
    "simhash_neardup",
    "skew_profile",
    "supplier_part_variety",
    "surrogate_key",
    "text_clean",
    "text_stats",
    "tfidf_terms",
    "token_topk",
    "train_test_split",
    "try_cast_import",
    "upsert_lww",
    # --- r5-vintage driver rows (alphabetically first 36 of 50) ---
    "anti_join",
    "approx_distinct",
    "array_hof",
    "bucketed_join",
    "case_when",
    "cheapest_supplier",
    "conditional_agg",
    "correlated_above_avg",
    "cosine_pairs",
    "cube_status",
    "dim_decode_map",
    "disjunct_revenue",
    "distinct_segments",
    "doc_chunks",
    "embedding_stats",
    "events_hourly",
    "events_sliding",
    "exists_late_orders",
    "explode_outer",
    "filter_pred",
    "full_outer_nation",
    "grouping_sets",
    "having_groups",
    "in_subquery_big_orders",
    "json_extract",
    "label_centroids",
    "lag_lead",
    "map_funcs",
    "media_features",
    "null_drop",
    "percentiles",
    "pivot_status",
    "projection",
    "range_frame_spend",
    "ranking_funcs",
    "region_revenue",
]
# (The remaining 14 r5-vintage rows are the stalest after this window and
# should lead round 9: rename, rollup_region, running_total,
# salted_distinct, scalar_funcs, scalar_subquery, semi_join,
# session_window, set_ops, string_agg_nations, top3_per_segment,
# top_building_orders, topk_orders, weighted_avg_udaf — recompute from
# the CORRECTNESS_r*.json latest-green map at rotation time.)

# Ungraded queries that do NOT fit this round's 50-entry window.  EMPTY as
# of round 4: every registered query either holds a driver CORRECTNESS row
# or sits in this round's graded window.  The contract guard asserts the
# set of ungraded-outside-window queries equals exactly this list — a
# silent deferral fails the suite.  (Used only when a round registers more
# new queries than the 50-slot window can grade; each entry must then be
# replica-gate green at sf0.001/0.01/0.1 and lead the next round's window.)
_DEFER_NEXT_ROUND: list[str] = []


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
