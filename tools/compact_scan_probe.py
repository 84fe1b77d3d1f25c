"""Reader-side cost of the streaming store's commit-count layout, and what
one compact_batch_store fold buys BACK for consumers (round 9).

SCALING.md's round-9 ladder measured the PRODUCER side of the commit-count
term: per-trigger drain walls climb with the number of `batch_id=N`
partitions and one fold buys them back.  This probe measures the CONSUMER
side of the same layout at constant data: a downstream training-data
reader (full-corpus scan) and a lineage reader (single-batch partition-
pruned scan) against the same rows laid out as many commit partitions vs
the folded layout.

    python tools/compact_scan_probe.py [--partitions 200] [--files-per 3]
                                       [--copies 80] [--out JSONL]

Protocol: one session; each measured wall re-creates the DataFrame from
the path (so file listing + partition discovery are inside the timer, as
they are for a fresh consumer job) and runs a text-length aggregate
(forces every page of the `text` column through the scan); min-of-3 per
cell.  The corpus is sf0.1 documents stacked with shifted doc_ids (the
make_scale copy recipe) and sliced into `batch_id` partitions exactly as
run_neardup_dedup_stream lays out its output corpus; `--files-per` salts
the pre-write shuffle so each partition dir holds several small files,
as a stream whose triggers write a few files each would leave.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--partitions", type=int, default=200)
    ap.add_argument("--files-per", type=int, default=3)
    ap.add_argument("--copies", type=int, default=80)
    ap.add_argument("--target-file-mb", type=int, default=128,
                    help="fold target file size; at small absolute scale "
                         "128 MB folds everything into one scan split and "
                         "TRADES AWAY scan parallelism (measured below) — "
                         "size it so the folded slice still yields >= one "
                         "split per consumer core")
    ap.add_argument("--work", default="/tmp/compact_scan_probe")
    ap.add_argument("--out", default=os.path.join(
        _REPO, "tools", "artifacts", "compact_scan_r9.jsonl"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from european_emissions_data_warehouse_spark.operators.maintenance import (
        compact_batch_store,
    )
    from european_emissions_data_warehouse_spark.session import get_session

    spark = get_session(
        app_name="compact-scan-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"),
            "spark.ui.enabled": "false",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = f"{args.work}/corpus"
    docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    copies = spark.range(args.copies).select(F.col("id").alias("_copy"))
    stacked = (
        docs.crossJoin(F.broadcast(copies))
        .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * F.lit(1_000_000))
        .drop("_copy")
        .withColumn(
            "batch_id", F.pmod(F.hash("doc_id"), F.lit(args.partitions))
        )
        .withColumn("_salt", F.pmod(F.col("doc_id"), F.lit(args.files_per)))
    )
    (
        stacked.repartition(
            args.partitions * args.files_per, "batch_id", "_salt"
        )
        .drop("_salt")
        .write.partitionBy("batch_id").mode("overwrite").parquet(corpus)
    )

    def n_files() -> int:
        total = 0
        for root, _dirs, files in os.walk(corpus):
            total += sum(1 for f in files if f.endswith(".parquet"))
        return total

    def full_scan() -> float:
        t0 = time.perf_counter()
        spark.read.option("basePath", corpus).parquet(corpus).agg(
            F.sum(F.length("text")), F.count("*")
        ).collect()
        return time.perf_counter() - t0

    def one_batch_scan() -> float:
        # prune to the NEWEST partition — the one the fold must keep
        # (replay contract), so pre and post read the SAME rows and the
        # delta is pure partition discovery + listing
        t0 = time.perf_counter()
        (
            spark.read.option("basePath", corpus).parquet(corpus)
            .where(F.col("batch_id") == args.partitions - 1)
            .agg(F.sum(F.length("text")), F.count("*"))
            .collect()
        )
        return time.perf_counter() - t0

    def cell(fn, label: str) -> dict:
        walls = sorted(round(fn(), 3) for _ in range(3))
        rec = {"cell": label, "files": n_files(), "min": walls[0],
               "walls": walls}
        print(json.dumps(rec), flush=True)
        return rec

    rows = spark.read.parquet(corpus).count()
    out = [{"rows": rows, "partitions": args.partitions,
            "files_per": args.files_per}]
    out.append(cell(full_scan, "full_scan_pre"))
    out.append(cell(one_batch_scan, "one_batch_pre"))

    t0 = time.perf_counter()
    res = compact_batch_store(
        spark, corpus, upto_batch_id=args.partitions - 2,
        target_file_mb=args.target_file_mb,
    )
    fold_wall = round(time.perf_counter() - t0, 3)
    out.append({"cell": "fold", "wall": fold_wall, **res})
    print(json.dumps(out[-1]), flush=True)

    assert spark.read.option("basePath", corpus).parquet(corpus).count() == rows, \
        "fold must not lose rows"
    out.append(cell(full_scan, "full_scan_post"))
    out.append(cell(one_batch_scan, "one_batch_post"))

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "a") as f:
        f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
