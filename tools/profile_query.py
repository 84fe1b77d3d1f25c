"""Per-query profiling rig for the optimization rounds (guide §1).

For each named headline query (or ANN tracker):
  - writes `.explain("formatted")` to plans/r09/<name>_<tag>.txt
  - times the noop-sink execution (min over repeats, same methodology as
    bench.py)
  - dumps per-stage wall/metrics from the local Spark UI REST API so the
    expensive stage (scan vs exchange vs compute) is attributable without
    guessing.

Usage:
    python tools/profile_query.py --tag before corpus_prep semdedup ...
    python tools/profile_query.py --tag before --no-plan corpus_prep

Env: same knobs as bench.py (SPARK_GRAFT_SF_DIR / _CPUS / _REPEATS).
This tool is measurement-only: it never touches registered query logic.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stage_report(ui_port: int) -> list[dict]:
    base = f"http://localhost:{ui_port}/api/v1/applications"
    with urllib.request.urlopen(base, timeout=10) as r:
        apps = json.load(r)
    app_id = apps[0]["id"]
    with urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10) as r:
        stages = json.load(r)
    out = []
    for s in stages:
        out.append(
            {
                "stageId": s["stageId"],
                "attempt": s["attemptId"],
                "name": s["name"][:80],
                "tasks": s["numCompleteTasks"],
                "executorRunTime_s": round(s["executorRunTime"] / 1000.0, 2),
                "executorCpuTime_s": round(s.get("executorCpuTime", 0) / 1e9, 2),
                "shuffleRead_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                "shuffleWrite_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                "jobDesc": (s.get("description") or "")[:60],
                "submitted": s.get("submissionTime"),
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--no-stages", action="store_true")
    ap.add_argument("--plans-dir", default=os.path.join(REPO, "plans", "r09"))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))

    from european_emissions_data_warehouse_spark.session import (
        get_session,
        restore_scoped_confs,
    )

    spark = get_session(
        app_name="profile",
        master=f"local[{cpus}]",
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
        ),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.ui.enabled": "false" if args.no_stages else "true",
            "spark.ui.port": "4055",
            "spark.ui.showConsoleProgress": "false",
            "spark.ui.retainedStages": "3000",
        },
    )
    spark.sparkContext.setLogLevel("FATAL")

    import bench
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # ANN tracker plans are module-level in bench.py
    idx_dir = None
    extra = {}
    if any(n in bench.ANN_TRACKER_NAMES for n in args.names):
        if "ivfpq_search" in args.names:
            idx_dir = bench.persist_ivfpq_index(spark, sf_dir)
        extra = {
            "pq_encode": bench.pq_encode_plan,
            "ivfpq_build": bench.ivfpq_build_plan,
            "mutual_nn": bench.mutual_nn_plan,
            "mutual_nn_ann": bench.mutual_nn_ann_plan,
            "semdedup_scaled": qs.get("semdedup_scaled"),
        }
        if idx_dir:
            extra["ivfpq_search"] = bench.make_ivfpq_search_plan(idx_dir)

    spark.read.parquet(f"{sf_dir}/nation.parquet").count()  # warm-up

    os.makedirs(args.plans_dir, exist_ok=True)
    results = {}
    for name in args.names:
        fn = qs.get(name) or extra.get(name)
        if fn is None:
            print(f"profile: unknown query {name}", file=sys.stderr)
            continue
        df = fn(spark, sf_dir)
        if not args.no_plan:
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans_dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
        runs = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            # fn() INSIDE the timed window, exactly like bench.bench_one —
            # queries with eager work in the builder (eager localCheckpoint
            # of the edge list, k-means init collects) spend most of their
            # wall there; timing only the noop save under-reported
            # dedup_components 0.09 s vs its true 2.2 s (r9 session 3 fix)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        restore_scoped_confs(spark)
        results[name] = {"min": min(runs), "runs": runs}
        print(json.dumps({"query": name, **results[name]}))

    if not args.no_stages:
        try:
            stages = stage_report(4055)
        except Exception as exc:
            print(f"profile: stage report failed: {exc}", file=sys.stderr)
            stages = []
        for s in stages:
            print(json.dumps(s))
    spark.stop()


if __name__ == "__main__":
    main()
