"""File-layout fuzz gate (VERDICT r6 item #5) — converts the round-6
single-file-fixture lesson into a permanent per-round check.

Round 6 found that file layout gated operators harder than any plan
property: an sf's worth of data in ONE parquet file serializes every
pre-exchange stage onto one core (a scan split is at most a file), and no
optimizer setting recovers it.  Two regression classes follow:

1. PARITY — results must be layout-independent.  Every registered query
   runs on a 1-file-per-table and a 256-file-per-table variant of the SAME
   data; order-insensitive value hashes must match.  A mismatch means some
   query's output depends on file/partition layout (zipWithIndex-style
   ordering, first-file wins, etc.) and its oracle greens are layout luck.

2. WALL-TIME — the engine must actually EXTRACT the parallelism a
   multi-file layout offers.  A scan-bound composite (corpus_prep) runs on
   1-file and 32-file variants of a 50k-doc perturbed corpus; the
   single-file run must be >= RATIO_FLOOR x slower.  If the ratio collapses
   toward 1x, a plan change has serialized the multi-file scan path (a
   stray coalesce(1), a single-split source) — exactly the defect class
   the round-6 probes kept finding after the fact.

3. WALL-TIME, embedding family (round 8, VERDICT r7 item #4) — the same
   ratio floor on kmeans_two_level over a 200k-vector scaled embeddings
   table: the embedding operators were the worst victims of the round-6
   single-file artifact (72.4 -> 9.2 s), so the corpus_prep row alone
   does not cover their scan path.

Parity hashes quantize FLOATS (ADVICE r7): float aggregation order differs
across layouts, so last-ulp drift is benign; non-float values compare
exactly.  Each query hashes at TWO precisions (9 and 8 significant digits)
and is flagged only when both disagree — rounding alone is not a tolerance,
since benign drift straddling one precision's rounding boundary cannot also
straddle the other's (code-review r8); -0.0 folds into +0.0.

Usage:
    python tools/layout_fuzz.py [SRC_SF_DIR] [WORK_DIR]
        SRC_SF_DIR  default /root/testdata/sf0.01 (parity arm)
        WORK_DIR    default /tmp/layout_fuzz (variants + scaled corpus)

Exit 0 = both arms clean; 1 = any parity mismatch, query error, or
wall-time ratio under the floor.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
RATIO_FLOOR = 2.0  # measured ~3-5x at 50k docs; 2x is a noise-robust floor


def _cell(v, sig: int) -> str:
    """repr with floats quantized to `sig` significant digits (ADVICE r7):
    aggregation order differs across file layouts / partitionings, so float
    sums can drift in the last ulps — a benign property of float addition,
    not layout-dependence.  `v + 0.0` folds -0.0 into +0.0 (an order-
    dependent sum can legitimately produce either zero).  Non-float types
    stay exact.  Nested arrays / maps (embedding columns, map_funcs) are
    normalized element-wise."""
    if isinstance(v, float):
        return f"f:{v + 0.0:.{sig}g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x, sig) for x in v) + "]"
    if isinstance(v, dict):
        items = sorted(v.items(), key=lambda kv: str(kv[0]))
        return "{" + ",".join(
            f"{_cell(k, sig)}:{_cell(x, sig)}" for k, x in items
        ) + "}"
    return repr(v)


def vhash(df) -> tuple[str, str]:
    """Hash pair at two float precisions (9 and 8 significant digits).
    Quantization is rounding, not a tolerance: benign sub-ulp drift that
    happens to straddle a 9-digit rounding boundary would still flip one
    hash (code-review r8), but the same drift cannot also straddle the
    DIFFERENT 8-digit boundary — so the parity arm flags a query only when
    BOTH precisions disagree.  Real layout-dependence (different rows,
    different keys, value changes above 1e-8 relative) differs at both."""
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(r) for r in df.collect()]
    out = []
    for sig in (9, 8):
        lines = sorted(
            "\x01".join(_cell(r[i], sig) for i in order) for r in rows
        )
        out.append(hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16])
    return (out[0], out[1])


def write_variant(spark, src: str, out: str, n_files: int) -> None:
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        df = spark.read.parquet(f"{src}/{t}.parquet")
        part = df.coalesce(1) if n_files == 1 else df.repartition(n_files)
        part.write.mode("overwrite").parquet(f"{out}/{t}.parquet")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/layout_fuzz"

    import __spark_entry__ as mod
    from european_emissions_data_warehouse_spark.session import (
        get_session,
        restore_scoped_confs,
    )

    spark = get_session(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    lay1, lay256 = f"{work}/files1", f"{work}/files256"
    write_variant(spark, src, lay1, 1)
    write_variant(spark, src, lay256, 256)
    print(f"variants written under {work}", flush=True)

    failed = False

    # --- arm 1: parity across layouts, every registered query ---
    hashes: dict[str, dict[str, str]] = {lay1: {}, lay256: {}}
    for lay in (lay1, lay256):
        for k, fn in mod.queries().items():
            try:
                hashes[lay][k] = vhash(fn(spark, lay))
            except Exception as ex:  # noqa: BLE001
                hashes[lay][k] = f"ERR:{type(ex).__name__}"
            finally:
                # recursive_ancestry's row-brake ceiling must not leak into
                # the rest of the parity loop (ADVICE r7)
                restore_scoped_confs(spark)
    def _layout_dependent(a, b) -> bool:
        if isinstance(a, str) or isinstance(b, str):  # ERR:* sentinel
            return a != b
        # flag only when BOTH precisions disagree (see vhash docstring)
        return a[0] != b[0] and a[1] != b[1]

    diff = sorted(
        k for k in hashes[lay1]
        if _layout_dependent(hashes[lay1][k], hashes[lay256][k])
    )
    errs = sorted(
        k for k in hashes[lay1]
        if str(hashes[lay1][k]).startswith("ERR")
        or str(hashes[lay256][k]).startswith("ERR")
    )
    print(f"layout-dependent results: {diff}")
    print(f"errored in at least one layout: {errs}")
    failed |= bool(diff or errs)

    # --- arm 2: wall-time — multi-file scan parallelism must be real ---
    corpus = f"{work}/docs50k"
    if not os.path.isdir(corpus):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_scale.py"),
             corpus, "10", "--perturb-docs"],
            check=True,
        )
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    c1, c32 = f"{work}/docs50k_1f", f"{work}/docs50k_32f"
    for out, n in ((c1, 1), (c32, 32)):
        os.makedirs(out, exist_ok=True)
        part = docs.coalesce(1) if n == 1 else docs.repartition(n)
        part.write.mode("overwrite").parquet(f"{out}/documents.parquet")
        # corpus_prep reads only documents; dims stay symlink-cheap copies
        for t in TABLES:
            if t != "documents" and not os.path.exists(f"{out}/{t}.parquet"):
                os.symlink(f"{src}/{t}.parquet", f"{out}/{t}.parquet")

    def time_corpus_prep(sf_dir: str) -> float:
        fn = mod.queries()["corpus_prep"]
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    t32 = time_corpus_prep(c32)  # multi-file first: warmup charges to it
    t1 = time_corpus_prep(c1)
    ratio = t1 / t32 if t32 > 0 else float("inf")
    print(f"corpus_prep 50k docs: 1-file {t1:.2f}s vs 32-file {t32:.2f}s "
          f"-> ratio {ratio:.1f}x (floor {RATIO_FLOOR}x)")
    if ratio < RATIO_FLOOR:
        print("WALL-TIME GATE FAILED: multi-file layout no longer buys "
              "scan parallelism — a plan change serialized the scan path")
        failed = True

    # --- arm 3: embedding-family wall-time (VERDICT r7 item #4) ---
    # The embedding family was the worst victim of the round-6 single-file
    # artifact (kmeans_two_level 72.4 -> 9.2 s at 200k vectors once the
    # fixture stopped being one 110 MB file), so it gets its own ratio row:
    # two-level k-means over a 200k-vector sign-flip-scaled embeddings
    # table, 1-file vs 32-file.  Scan + per-partition assignment must
    # parallelize across files; a serialized scan path collapses the ratio.
    embsrc = f"{work}/emb200k"
    if not os.path.isdir(embsrc):
        subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(__file__), "make_scale.py"),
             embsrc, "100", "--with-embeddings", "--embeddings-only"],
            check=True,
        )
    emb_all = spark.read.parquet(f"{embsrc}/embeddings.parquet")
    e1, e32 = f"{embsrc}_1f", f"{embsrc}_32f"
    for out, n in ((e1, 1), (e32, 32)):
        part = emb_all.coalesce(1) if n == 1 else emb_all.repartition(n)
        part.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    def time_kmeans(path: str) -> float:
        from european_emissions_data_warehouse_spark.operators.similarity import (
            kmeans_two_level,
        )

        emb = spark.read.parquet(f"{path}/embeddings.parquet")
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = kmeans_two_level(emb, "vec_id", "embedding", k=64, n_iters=1)
            out.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        return best

    et32 = time_kmeans(e32)  # multi-file first: warmup charges to it
    et1 = time_kmeans(e1)
    eratio = et1 / et32 if et32 > 0 else float("inf")
    print(f"kmeans_two_level 200k vecs: 1-file {et1:.2f}s vs 32-file "
          f"{et32:.2f}s -> ratio {eratio:.1f}x (floor {RATIO_FLOOR}x)")
    if eratio < RATIO_FLOOR:
        print("WALL-TIME GATE FAILED (embedding arm): multi-file layout no "
              "longer buys scan parallelism for the embedding family")
        failed = True

    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
