"""Benchmark harness — times the engine's headline queries at one scale factor.

Prints the full JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <sf>}
followed by ONE compact summary line re-stating the scalars (total, sf,
ann_fixed) so a tail-truncated artifact still carries the round's numbers
(VERDICT r5 item #2 — BENCH_r05's 2000-char tail lost the headline total).

Env knobs:
    SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS     local[] threads (default 32)
    SPARK_GRAFT_REPEATS  runs per query, min reported (default 3)
    SPARK_GRAFT_SHUFFLE_PARTITIONS
                         shuffle.partitions override (default = CPUS); the
                         higher-decade probes size this to the data
    SPARK_GRAFT_ONLY     comma-separated subset of HEADLINE to run (used by
                         tools/make_scale.py's higher-decade measurement,
                         where only the relational tables are scaled); the
                         fixed-size ANN side section is skipped when set

Each query is forced end-to-end with a noop sink (full execution, no
driver-side collect — the same measurement you'd take on a cluster).
Per-query time is the MIN over repeats: single runs at this scale carry
±10% JIT/GC noise, which round-over-round deltas were misread as
regressions (VERDICT r2 #7); the min is the stable estimator of plan cost.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

# Headline set: the flagship ETL pipeline, the shuffle-heavy analytics
# (joins, aggs, windows), the merge path, and the LLM-pipeline operators.
HEADLINE = [
    "etl_flagship",
    "upsert_lww",
    "pricing_summary",
    "top_building_orders",
    "region_revenue",
    "topk_orders",
    "top3_per_segment",
    "running_total",
    "events_hourly",
    "sessionize",
    "asof_join",
    "range_join_peak",
    "token_topk",
    "dedup_exact",
    "corpus_prep",
    "ngram_jaccard",
    "ngram_jaccard_capped",
    "minhash_neardup",
    "ann_topk",
    "text_stats",
    "revenue_filter",
    "scd2_dim",
    "train_test_split",
    "dedup_components",
    "local_supplier_revenue",
    "large_orders",
    "dq_report",
    "tfidf_terms",
    "bm25_search",
    "kmeans_clusters",
    "semdedup",
    "dsir_weights",
    "incremental_agg",
    # heavy operators previously outside the bench (VERDICT r2 #5)
    "decontaminate",
    "pmi_pairs",
    "dedup_components_star",
    "media_frames",
    # round-3 additions with real data motion
    "nation_trade_volume",
    "event_transitions",
    "lateral_top_orders",
    "recursive_ancestry",
    "unigram_logprob",
    "vocab_coverage",
    "bigram_logprob",
    "time_weighted_value",
    "chunk_dedup",
    "bpe_pair_counts",
    "corpus_shuffle",
    "important_parts",
    "supplier_part_variety",
    "bpe_apply_merge",
    "heavy_hitters_cms",
    "hll_distinct",
    "skew_profile",
    "dedup_rate_by_source",
    "nb_quality",
    "readability",
    "cohort_retention",
    # mutual_nn is excluded like ann_pq: embeddings is not sf-proportional,
    # so its O(n_a*n_b) exact baseline isn't a scaling signal
    # ann_pq / ann_ivfpq are deliberately NOT benched: the embeddings table
    # is fixed-size at every sf, so their cost is constant verdict overhead
    # (dozens of tiny codebook jobs), not scaling behavior — same reason
    # simhash_neardup isn't in the headline set
]


# The one tracker name table BOTH protocols read (in-session ann_fixed
# below, process-isolated tools/ann_isolated.py): a tracker added here and
# not given a plan fails main()'s coverage assert; ann_isolated.TRACKERS
# aliases this list, so neither protocol can silently drop a tracker
# (code-review r8).
ANN_TRACKER_NAMES = [
    "pq_encode",
    "ivfpq_build",
    "ivfpq_search",
    "mutual_nn",
    "mutual_nn_ann",
    "semdedup_scaled",
]


# --- fixed-size ANN tracker plans (VERDICT r3 item #7 / r5 item #3) --------
#
# The embeddings table is NOT sf-proportional, so the ANN/bitext operators
# stay out of the sf-scaling headline — but their index build/serve path
# still needs a round-over-round regression signal.  The tracked numbers are
# the operators themselves, not the verdict queries (whose extra brute-force
# verification arms would hide an index regression): pq_encode
# (pq_reconstruct), ivfpq_build (ivfpq_build_index forced to the searchable
# state), ivfpq_search (serve-only over an index persisted OUTSIDE the timer
# — the production build-once/serve-many split; k=5, n_probe=3, rerank=100),
# and the IVF-candidate bitext miner.  Module-level so tools/ann_isolated.py
# runs the IDENTICAL plans process-isolated (VERDICT r7 item #2).


def _ann_isolated_staleness(artifact_sha: str | None) -> str | None:
    """None when the committed ANN_ISOLATED.json still describes the code
    in the working tree; otherwise a short reason string (ADVICE r8).
    'Describes' = no diff between the artifact's stamped sha and the
    working tree across the tracker-relevant paths."""
    repo = os.path.dirname(os.path.abspath(__file__))
    if not artifact_sha:
        return "no git_sha stamp (pre-r9 artifact)"
    try:
        r = subprocess.run(
            ["git", "diff", "--quiet", artifact_sha, "--",
             "european_emissions_data_warehouse_spark", "bench.py",
             "tools/ann_isolated.py"],
            cwd=repo, capture_output=True, text=True, timeout=30,
        )
    except (OSError, subprocess.SubprocessError) as exc:
        return f"provenance check failed: {exc}"
    if r.returncode == 0:
        return None
    if r.returncode == 1:
        return f"tracker-relevant code changed since {artifact_sha[:12]}"
    return f"git diff failed (exit {r.returncode}): {r.stderr.strip()[:200]}"


# Tracker-only workload scale for mutual_nn (VERDICT r8 item #3): the
# registered query crosses ~199x182 vectors — its warm isolated runtime
# (~1.0-1.5 s) sat below the protocol's noise floor, where cold-JIT
# variance forced a "sub-1.5 s drift under 25% is noise" carve-out.  The
# tracker now runs the SAME operator on the embeddings table stacked
# this many times (shifted ids, per-copy deterministic sign flips so
# cross-copy cosines decorrelate — the make_scale.py recipe inline), which
# lifts warm compute above the ~2 s threshold where the +-10% band holds.
# The registered query and its oracle are untouched.
MUTUAL_NN_SCALE_COPIES = 4


def mutual_nn_plan(spark, sf_dir):
    from pyspark.sql import functions as F

    from european_emissions_data_warehouse_spark.operators.similarity import (
        mutual_nn_pairs,
    )
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    copies = spark.range(MUTUAL_NN_SCALE_COPIES).select(
        F.col("id").alias("_copy")
    )
    scaled = (
        emb.crossJoin(F.broadcast(copies))
        .withColumn("vec_id", F.col("vec_id") + F.col("_copy") * F.lit(1_000_000))
        .withColumn(
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x, i: x
                * (
                    F.lit(1)
                    - F.lit(2) * F.pmod(F.hash(F.col("_copy"), i), F.lit(2))
                ).cast("float"),
            ),
        )
        .drop("_copy")
    )
    return mutual_nn_pairs(scaled, group_a=0, group_b=1)


def mutual_nn_ann_plan(spark, sf_dir):
    # the IVF-candidate bitext miner is an operator, not a queries()
    # entry (its query twin is the exact baseline `mutual_nn`) — bench
    # it directly so the index build+probe path has a tracker too
    from european_emissions_data_warehouse_spark.operators.similarity import (
        mutual_nn_pairs_ann,
    )
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return mutual_nn_pairs_ann(emb, group_a=0, group_b=1, n_probe=2)


def pq_encode_plan(spark, sf_dir):
    from european_emissions_data_warehouse_spark.operators.similarity import (
        pq_reconstruct,
    )
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_reconstruct(emb, dim=64, m=4, k=16)


def ivfpq_build_plan(spark, sf_dir):
    from european_emissions_data_warehouse_spark.operators.similarity import (
        ivfpq_build_index,
    )
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    index, _coarse = ivfpq_build_index(
        emb, dim=64, n_centroids=8, m=4, pq_k=16
    )
    return index


def persist_ivfpq_index(spark, sf_dir: str) -> str:
    """Build and save the fixed-params IVF-PQ index to a temp dir OUTSIDE
    any timer, so ivfpq_search times only the serve path."""
    import tempfile

    from european_emissions_data_warehouse_spark.operators.similarity import (
        ivfpq_build_index,
        ivfpq_save_index,
    )
    from european_emissions_data_warehouse_spark.sources.readers import load_table

    idx_dir = tempfile.mkdtemp(prefix="bench_ivfpq_")
    index, coarse = ivfpq_build_index(
        load_table(spark, sf_dir, "embeddings"),
        dim=64, n_centroids=8, m=4, pq_k=16,
    )
    ivfpq_save_index(index, coarse, idx_dir)
    return idx_dir


def make_ivfpq_search_plan(index_path: str):
    def ivfpq_search_plan(spark, sf_dir):
        from pyspark.sql import functions as F

        from european_emissions_data_warehouse_spark.operators.similarity import (
            ivfpq_load_index,
            ivfpq_search,
        )
        from european_emissions_data_warehouse_spark.sources.readers import (
            load_table,
        )

        emb = load_table(spark, sf_dir, "embeddings")
        index, coarse = ivfpq_load_index(spark, index_path)
        # 400 query vectors since r9 (was 10): the 10-query serve wall was
        # ~1 s warm in a fresh process — below the floor where the isolated
        # protocol's +-10% band holds, same defect VERDICT r8 item #3
        # called on mutual_nn.  Serve path and parameters are unchanged.
        return ivfpq_search(
            emb.filter(F.col("vec_id") < 400), index, coarse,
            k=5, n_probe=3, rerank=100, raw_vectors=emb,
        )
    return ivfpq_search_plan


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    # the engine's own session factory, so benched plans run under the
    # EXACT defaults the engine ships (skew-join, maxPartitionBytes, UTC
    # timezone included — the old hand-built session silently dropped
    # them; code-review r4); bench-only knobs ride extra_conf
    from european_emissions_data_warehouse_spark.session import (
        get_session,
        restore_scoped_confs,
    )

    spark = get_session(
        app_name="bench",
        master=f"local[{cpus}]",
        # sized to the data, not the box: on a cluster shuffle.partitions
        # (or AQE's advisory size) scales with input — the higher-decade
        # probes (SCALING.md) override this; default stays one per core
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        ),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    # FATAL, not ERROR: a speculatively retried task logs its ERROR-level
    # stack to stderr even when the job succeeds, leaving truncated
    # DAGScheduler fragments in the BENCH tail where a real failure could
    # hide (VERDICT r3 item #5).  Genuine query failures are reported
    # through the Python exception channel below (-1 timing + one clean
    # stderr line), which log4j level does not touch.
    spark.sparkContext.setLogLevel("FATAL")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # JVM/codegen warm-up on a trivial plan so q1 isn't charged startup cost.
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        requested = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in requested if n not in HEADLINE]
        if unknown or not requested:
            # fail loudly: a typo'd/whitespace-damaged subset silently
            # benched NOTHING and printed a bogus 0-second total with exit
            # code 0 — which make_scale.py then recorded as a real scaling
            # data point (code-review r4, instruments pass)
            raise SystemExit(
                f"bench: SPARK_GRAFT_ONLY names {unknown or '(empty)'} not in "
                f"HEADLINE — nothing would be benched"
            )
        headline = [n for n in HEADLINE if n in requested]
    else:
        headline = HEADLINE

    def bench_one(name: str, fn) -> tuple[float, dict[str, float]]:
        """Min over repeats; a transient failure on a LATER repeat keeps the
        already-measured runs (the old overwrite-to--1 discarded a valid
        estimate and dropped the query from the scaling ratios); -1 only
        when no repeat succeeded (code-review r4, instruments pass).
        Also returns {min, med, max} over the successful repeats so a
        ±20%-noise claim is verifiable from the artifact itself and a real
        hot-operator regression can't hide inside it (VERDICT r4 item #3)."""
        runs: list[float] = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # a broken query must not zero the whole bench
                print(f"bench: {name} failed: {exc}", file=sys.stderr)
                break
            runs.append(time.perf_counter() - t0)
        # a call-site conf override (recursive_ancestry's row-brake ceiling)
        # must not leak into the next query's timing run (ADVICE r7)
        restore_scoped_confs(spark)
        if not runs:
            return -1.0, {}
        runs.sort()
        med = runs[len(runs) // 2] if len(runs) % 2 else (
            (runs[len(runs) // 2 - 1] + runs[len(runs) // 2]) / 2
        )
        spread = {
            "min": round(runs[0], 3),
            "med": round(med, 3),
            "max": round(runs[-1], 3),
        }
        return spread["min"], spread

    timings: dict[str, float] = {}
    spreads: dict[str, dict[str, float]] = {}
    for name in headline:
        fn = qs.get(name)
        if fn is not None:
            timings[name], sp = bench_one(name, fn)
            if sp:
                spreads[name] = sp

    ann_fixed: dict[str, float] = {}
    ann_spreads: dict[str, dict[str, float]] = {}
    # skipped when a subset is requested (only) or explicitly disabled —
    # tools/scaling_report.py's small-sf run only consumes the big run's
    # ann_fixed, so re-timing the fixed-size index builds there was pure
    # wasted wall-clock (code-review r4, instruments pass)
    if only or os.environ.get("SPARK_GRAFT_SKIP_ANN"):
        ann_fixed_entries: list[tuple[str, object]] = []
    else:
        # persist the searchable state OUTSIDE the timers so ivfpq_search
        # times ONLY the serve path (probe-pruned scan + ADC + rerank)
        idx_dir = persist_ivfpq_index(spark, sf_dir)
        plans = {
            "pq_encode": pq_encode_plan,
            "ivfpq_build": ivfpq_build_plan,
            "ivfpq_search": make_ivfpq_search_plan(idx_dir),
            # exact bitext baseline on the 4x-stacked workload (see
            # mutual_nn_plan — the registered query was below the isolated
            # protocol's noise floor); semdedup_scaled stays the registered
            # query itself — embedding-family, fixed-size like the rest
            "mutual_nn": mutual_nn_plan,
            "mutual_nn_ann": mutual_nn_ann_plan,
            "semdedup_scaled": qs.get("semdedup_scaled"),
        }
        missing = [n for n in ANN_TRACKER_NAMES if plans.get(n) is None]
        assert not missing, f"ANN trackers without a plan: {missing}"
        assert set(plans) == set(ANN_TRACKER_NAMES), (
            "plan table out of sync with ANN_TRACKER_NAMES"
        )
        ann_fixed_entries = [(n, plans[n]) for n in ANN_TRACKER_NAMES]
    for name, fn in ann_fixed_entries:
        if fn is not None:
            ann_fixed[name], sp = bench_one(name, fn)
            if sp:
                ann_spreads[name] = sp

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    # Process-isolated ANN tracker numbers (VERDICT r7 item #2): the
    # in-session ann_fixed min-of-3 drifted +13-20% round-over-round with
    # untouched code, so attribution needs the isolated protocol.
    # tools/ann_isolated.py runs the SAME tracker plans one-per-process and
    # writes ANN_ISOLATED.json; when that committed artifact exists it is
    # embedded here so BENCH_DETAIL stays the single authoritative record.
    ann_isolated = None
    iso_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "ANN_ISOLATED.json"
    )
    if not only and os.path.exists(iso_path):
        try:
            with open(iso_path) as f:
                ann_isolated = json.load(f)
        except (OSError, ValueError) as exc:
            print(f"bench: ANN_ISOLATED.json unreadable: {exc}", file=sys.stderr)
        # Provenance gate (ADVICE r8): an artifact produced at an earlier
        # code revision must not be silently presented as part of this
        # run's authoritative record.  The artifact carries the sha it was
        # produced at; it counts as current iff no tracker-relevant code
        # (package, bench.py, the rig itself) differs between that sha and
        # the working tree — plain sha equality would false-alarm on the
        # routine artifact-commit -> bench sequence within a round.
        if ann_isolated is not None:
            stale_reason = _ann_isolated_staleness(ann_isolated.get("git_sha"))
            if stale_reason:
                print(f"bench: ANN_ISOLATED.json is stale ({stale_reason}); "
                      f"embedding provenance stub only — regenerate with "
                      f"tools/ann_isolated.py", file=sys.stderr)
                ann_isolated = {
                    "stale_artifact": stale_reason,
                    "git_sha": ann_isolated.get("git_sha"),
                }
    full = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "ann_fixed": ann_fixed,
        "ann_isolated": ann_isolated,
        # per-query {min, med, max} over repeats (VERDICT r4 #3):
        # "queries"/"ann_fixed" stay min-floats for the driver and
        # tools/scaling_report.py; the spread rides alongside
        "spread": spreads,
        "ann_spread": ann_spreads,
        "sf": sf,
        "repeats": repeats,
    }
    print(json.dumps(full))
    # Truncation-proof DETAIL artifact (VERDICT r6 item #6): the recorded
    # BENCH_r{N} keeps only the last ~2000 chars of stdout, losing the
    # first ~30 per-query spreads — so the FULL object is also written to a
    # committed file the judge can diff across all queries.  Indented so
    # git diffs are per-query, not one opaque line.  Skipped for subset
    # runs (SPARK_GRAFT_ONLY): the decade probes would otherwise clobber
    # the full-suite artifact with a 1-query fragment.
    if not only:
        detail_path = os.environ.get(
            "SPARK_GRAFT_BENCH_DETAIL",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_DETAIL.json"),
        )
        with open(detail_path, "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")
    # Truncation-proof per-query line (VERDICT r9 item #2): the driver's
    # round-over-round per-query table was EMPTY in PERF_r09 because the
    # per-query mins ride only the big JSON line, whose recorded tail keeps
    # ~2000 chars.  Re-state the per-query mins on their own compact line
    # (separators squeezed, 3-decimal floats -> ~1.5 KB for 58 queries) so
    # the tail carries them; printed BEFORE the final totals line so the
    # most-protected last bytes stay the round's scalars.  Strictly
    # additive — existing consumers of the big line are unaffected.
    print(
        json.dumps(
            {"queries_min": timings, "ann_fixed_min": ann_fixed, "sf": sf},
            separators=(",", ":"),
        )
    )
    # Truncation-proof tail (VERDICT r5 item #2): BENCH_r05's recorded
    # artifact kept only the last ~2000 chars, losing the headline total
    # behind the spread section.  A final compact line re-states the
    # scalars (total + the ann index-path trackers), so ANY tail of the
    # output still parses to the round's numbers.  Consumers that parse
    # the full big line are unaffected — this line is strictly additive.
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "repeats": repeats,
                "n_queries": len(timings),
                "n_failed": sum(1 for t in timings.values() if t < 0),
                "ann_fixed": ann_fixed,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
