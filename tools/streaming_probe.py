"""Streaming-family decade probe (VERDICT r7 item #3) — the committed rig
behind SCALING.md's streaming section, protocol-matched to
tools/embedding_probe.py (one fresh process per invocation; the caller
loops invocations for isolation).

The streaming operators' scale claims are about PER-BATCH cost against
GROWING standing state:

- run_hll_stream / run_sketch_stream: state is a fixed set of sketches
  (per-key HLL registers / one depth x width CMS table), so a micro-batch
  costs O(batch) regardless of how much history the store has absorbed.
- run_neardup_dedup_stream: the standing LSH store grows with the corpus,
  but a batch touches it only through bucket-equality joins — per-batch
  cost O(new x bands + matching buckets + one store scan), NOT the
  O(store x new) re-pairing a naive full-batch LSH would do per trigger.
- the ledgered-commit protocol itself (generation probe + replay skip)
  must stay O(1)-ish per trigger as commits accumulate.

Protocol per invocation: build a scaled source (cached per scale in the
work dir), BOOTSTRAP the standing state through the stream's own first
drain (one availableNow batch carrying `--scale` rows), then land and
drain three FIXED-SIZE probe batches one at a time, timing every drain
wall-clock around the run_* call (so checkpoint probe, ledger, merge, and
publish are all inside the measurement — the honest per-trigger cost).
Decades come from the caller invoking this at 10x scales: the probe-drain
wall should stay ~flat while the bootstrap wall tracks the data.

    python tools/streaming_probe.py hll     --scale 1000000  [--probe 100000]
    python tools/streaming_probe.py cms     --scale 1000000  [--probe 100000]
    python tools/streaming_probe.py neardup --scale 100000   [--probe 2000]

Prints one JSON line:
    {"arm", "scale", "probe_rows", "bootstrap_sec",
     "probe_secs": [s1, s2, s3], "probe_min", "state_rows"}

Each drain includes ~1-2 s of structured-streaming query startup (constant,
part of real per-trigger cost under availableNow batch scheduling); the
flatness claim is therefore conservative — startup noise can only push the
measured ratio TOWARD 1, and the bootstrap walls carry the linear-in-new
pin independently.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
STRIDE = 10**9  # id shift per copy, same convention as tools/make_scale.py
PROBE_REPEATS = 3


def _scaled_events(spark, out: str, n_rows: int, first_copy: int, n_files: int):
    """Stack key-shifted copies of sf0.1 events (100k rows each) up to
    n_rows — make_scale.py's events semantics, inlined so the probe needs
    no cross-tool fixture contract.  first_copy offsets the id space so
    probe batches never collide with bootstrap ids."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{SRC}/events.parquet")
    per_copy = src.count()
    n_copies = max(1, (n_rows + per_copy - 1) // per_copy)
    copies = spark.range(first_copy, first_copy + n_copies).select(
        F.col("id").alias("_copy")
    )
    df = src.crossJoin(copies)
    for k in ("event_id", "user_id"):
        df = df.withColumn(k, F.col(k) + F.col("_copy") * F.lit(STRIDE))
    df = df.drop("_copy").limit(n_rows)
    df.repartition(n_files).write.mode("overwrite").parquet(out)


def _scaled_docs(spark, out: str, n_rows: int, first_copy: int, n_files: int):
    """Perturbed-copy documents (make_scale.py --perturb-docs semantics,
    inlined): every token is suffixed with the copy index, so cross-copy
    jaccard is ~0 while each copy keeps the source's internal near-dup
    structure — candidate volume grows linearly with copies, the honest
    growth model for the pair-forming family."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(f"{SRC}/documents.parquet")
    per_copy = src.count()
    n_copies = max(1, (n_rows + per_copy - 1) // per_copy)
    copies = spark.range(first_copy, first_copy + n_copies).select(
        F.col("id").alias("_copy")
    )
    df = (
        src.crossJoin(copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * F.lit(STRIDE))
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit("x"), F.col("_copy").cast("string")),
                ),
                " ",
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("_copy")
        .limit(n_rows)
    )
    df.repartition(n_files).write.mode("overwrite").parquet(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("arm", choices=["hll", "cms", "neardup"])
    ap.add_argument("--scale", type=int, required=True,
                    help="rows bootstrapped into the standing state")
    ap.add_argument("--probe", type=int, default=None,
                    help="rows per probe batch (default: 100000 events / "
                         "2000 docs)")
    ap.add_argument("--work", default="/tmp/streaming_probe")
    ap.add_argument("--sp", type=int, default=32)
    args = ap.parse_args()
    probe_rows = args.probe or (2000 if args.arm == "neardup" else 100000)

    from european_emissions_data_warehouse_spark.session import get_session

    spark = get_session(
        app_name=f"stream-probe-{args.arm}",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=args.sp,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("FATAL")

    make = _scaled_docs if args.arm == "neardup" else _scaled_events
    kind = "docs" if args.arm == "neardup" else "events"

    # sources are cached per (kind, rows, copy-offset); stream dirs are
    # always fresh per invocation
    def source(tag: str, n_rows: int, first_copy: int, n_files: int) -> str:
        path = f"{args.work}/src_{kind}_{tag}_{n_rows}"
        if not os.path.isdir(path):
            make(spark, path, n_rows, first_copy, n_files)
        return path

    boot_src = source("boot", args.scale, 0, 32)
    probe_srcs = [
        # copy offsets far above the bootstrap range: probe ids/tokens are
        # fresh, so neardup probes measure probing cost, not a pathological
        # all-duplicates batch
        source(f"probe{i}", probe_rows, 100_000 + i, 4)
        for i in range(PROBE_REPEATS)
    ]

    run = f"{args.work}/run_{args.arm}_{args.scale}"
    shutil.rmtree(run, ignore_errors=True)
    landing = f"{run}/landing"
    ckpt = f"{run}/ckpt"
    state = f"{run}/state"
    out = f"{run}/out"
    os.makedirs(landing)

    from european_emissions_data_warehouse_spark.streaming.ingest import (
        run_hll_stream,
        run_neardup_dedup_stream,
        run_sketch_stream,
        stream_from_directory,
    )

    schema = spark.read.parquet(boot_src).schema

    def land(src_path: str, tag: str) -> None:
        # hard-link into the flat landing dir under tag-unique names — the
        # file source tracks seen files, so each drain sees only new ones
        for j, fn in enumerate(sorted(os.listdir(src_path))):
            if fn.endswith(".parquet"):
                os.link(f"{src_path}/{fn}", f"{landing}/{tag}_{j}.parquet")

    def drain() -> float:
        stream = stream_from_directory(spark, landing, schema)
        t0 = time.perf_counter()
        if args.arm == "hll":
            run_hll_stream(stream, state, ckpt,
                           key_cols=["event_type"], value_col="user_id")
        elif args.arm == "cms":
            run_sketch_stream(
                stream.withColumn("token", stream["user_id"].cast("string")),
                state, ckpt,
            )
        else:
            run_neardup_dedup_stream(stream, state, out, ckpt)
        return time.perf_counter() - t0

    land(boot_src, "b0")
    bootstrap_sec = drain()
    probe_secs = []
    for i, src_path in enumerate(probe_srcs):
        land(src_path, f"p{i}")
        probe_secs.append(round(drain(), 3))

    if args.arm == "neardup":
        state_rows = spark.read.parquet(state).count()
    else:
        from european_emissions_data_warehouse_spark.operators.snapshots import (
            SnapshotTable,
        )

        state_rows = SnapshotTable(spark, state).read().count()

    print(json.dumps({
        "arm": args.arm,
        "scale": args.scale,
        "probe_rows": probe_rows,
        "bootstrap_sec": round(bootstrap_sec, 3),
        "probe_secs": probe_secs,
        "probe_min": min(probe_secs),
        "state_rows": state_rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
