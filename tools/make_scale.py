"""Materialize a larger synthetic scale factor from /root/testdata/sf0.1 by
stacking key-shifted copies of the RELATIONAL tables — the measurement rig
behind SCALING.md's higher-decade section.

    python tools/make_scale.py /tmp/sfscale/sf1 10
    python tools/make_scale.py /tmp/sfscale/sf10 100

Semantics: every copy shifts all PK/FK ids by the same stride, so joins
resolve exactly as in the source (copy i's orders join copy i's customers);
`nation` and `region` stay fixed like TPC-H dims do across scale factors,
and nationkey/regionkey columns are NOT shifted.  `events` keeps its time
range (more events per hour — growth, not a longer history).  `documents`
and `embeddings` are copied UNCHANGED: they are not sf-proportional in the
driver's testdata either, and naive duplication would measure the data's
duplication rate, not the engine (10 identical copies of a corpus make
every LSH bucket quadratically heavier — a property of that corpus, not a
plan regression).

`--with-docs` (third arg) scales `documents` by doc_id-shifted duplication
anyway — valid for the per-doc and groupBy text family (stats, LM scores,
rarity, BPE counts, sketches), whose work is linear in rows regardless of
content duplication; the pair-forming dedup/similarity operators must NOT
be read against such a corpus.  `--perturb-docs` instead suffixes every
token with the copy index: cross-copy jaccard drops to zero while each
copy keeps the source's internal near-duplicate structure — the honest
scaling corpus for the PAIR-FORMING family (MinHash/SimHash/n-gram
dedup, connected components): candidate volume grows linearly with
copies, as it would on a real corpus that grows without growing its
duplication rate.  By default `embeddings` stays fixed (duplicate vectors
create exact ANN ties that flip verdict booleans); `--with-embeddings`
scales it by vec_id shift + a per-copy deterministic SIGN FLIP of the
vector dimensions — an orthogonal transform, so every copy keeps the
source's internal cosine geometry exactly while cross-copy similarities
decorrelate to noise.  The honest growth model for embedding-space
operators, used by the embedding-family decade measurement (where
k-means k scales with n to hold cluster size constant — the production
SemDeDup knob).
"""

from __future__ import annotations

import os
import sys

STRIDE = 10**9

# table -> columns to shift by copy*STRIDE (PKs and the FKs that reference
# scaled tables; nation/region FKs stay put)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
}
FIXED = ["region", "nation", "documents", "embeddings"]


def _int_flag(name: str, default: int | None) -> int | None:
    if name in sys.argv:
        return int(sys.argv[sys.argv.index(name) + 1])
    return default


def main() -> None:
    out_dir, n_copies = sys.argv[1], int(sys.argv[2])
    with_docs = "--with-docs" in sys.argv[3:]
    perturb_docs = "--perturb-docs" in sys.argv[3:]
    with_embeddings = "--with-embeddings" in sys.argv[3:]
    # --first-copy N / --rows N (code-review r8, for tools/streaming_probe):
    # offset the copy-index space so independently generated slices never
    # share ids or perturbation tags, and cap the scaled table's row count.
    # Defaults preserve every existing call site exactly.
    first_copy = _int_flag("--first-copy", 0)
    rows_cap = _int_flag("--rows", None)
    shift = dict(SHIFT)
    fixed = list(FIXED)
    if with_docs or perturb_docs:
        shift["documents"] = ["doc_id"]
        fixed.remove("documents")
    if with_embeddings:
        shift["embeddings"] = ["vec_id"]
        fixed.remove("embeddings")
    # --embeddings-only: materialize JUST the scaled embeddings table —
    # the 2M-vector decade (x1000) needs no x1000 relational tables, and
    # the embedding-family operators read nothing else (round 6)
    if "--embeddings-only" in sys.argv[3:]:
        if not with_embeddings:
            raise SystemExit("--embeddings-only requires --with-embeddings")
        shift = {"embeddings": shift["embeddings"]}
        fixed = []
    # --events-only / --docs-only: materialize just the one scaled table —
    # tools/streaming_probe.py's sources need no scaled relational tables,
    # same rationale as --embeddings-only (code-review r8: the probe
    # previously re-implemented this file's copy-stacking semantics inline,
    # leaving two copies of the corpus growth model to drift apart)
    if "--events-only" in sys.argv[3:]:
        shift = {"events": shift["events"]}
        fixed = []
    if "--docs-only" in sys.argv[3:]:
        if "documents" not in shift:
            raise SystemExit("--docs-only requires --with-docs or --perturb-docs")
        shift = {"documents": shift["documents"]}
        fixed = []
    src = "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("make-scale")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    for t in fixed:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out_dir}/{t}.parquet"
        )
        print(f"{t}: copied")

    copies = spark.range(first_copy, first_copy + n_copies).select(
        F.col("id").alias("_copy")
    )
    for t, keys in shift.items():
        df = spark.read.parquet(f"{src}/{t}.parquet").crossJoin(copies)
        for k in keys:
            df = df.withColumn(k, F.col(k) + F.col("_copy") * F.lit(STRIDE))
        if t == "embeddings" and with_embeddings:
            # per-copy sign flip (orthogonal transform): within-copy cosines
            # identical to the source, cross-copy cosines decorrelate
            df = df.withColumn(
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
        if t == "documents" and perturb_docs:
            # token-suffix each copy: cross-copy similarity -> 0, per-copy
            # near-dup structure preserved (pure column expression, no UDF)
            df = df.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit("x"), F.col("_copy").cast("string")),
                    ),
                    " ",
                ),
            )
            # n_chars must track the rewritten text: chunking and padding
            # queries drive work off n_chars, so a stale copy silently
            # skipped the tail of every perturbed document (code-review
            # r4, instruments pass)
            df = df.withColumn("n_chars", F.length("text").cast("long"))
        df = df.drop("_copy")
        if rows_cap is not None:
            # deterministic cap (ADVICE r8): bare limit() picks whichever
            # rows arrive first, so a regenerated cache (other machine,
            # cleared /tmp) could hold a different subset and break
            # round-over-round probe comparability.  Ordering must be a
            # TOTAL order or ties at the cap boundary are still picked
            # arbitrarily — keys[0] alone is not unique for lineitem
            # (~4 rows per l_orderkey; code-review r9, second pass) — so
            # sort by every shift key plus the table's natural tiebreaker
            # where the shift keys alone don't identify a row.  The extra
            # sort is generation-only cost.
            tiebreak = {"lineitem": ["l_linenumber"]}.get(t, [])
            df = df.orderBy(*[F.col(k) for k in [*keys, *tiebreak]]).limit(rows_cap)
        # 32 files, not whatever the crossJoin's lineage leaves: the x1000
        # embeddings run came out as ONE 110 MB file — under the engine's
        # 128 MB maxPartitionBytes that is a single scan split, so every
        # pre-shuffle stage of the measured operators ran on ONE core and
        # the "decade" measured file layout, not operator scaling.  A real
        # corpus at any scale is many files; the rig now writes the
        # realistic layout (round 6).
        df.repartition(32).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        # count the WRITTEN parquet: df.count() re-executed the whole
        # cross-join + transform pipeline a second time just to print a
        # number (code-review r4, instruments pass)
        n_rows = spark.read.parquet(f"{out_dir}/{t}.parquet").count()
        print(f"{t}: x{n_copies} -> {n_rows} rows")

    spark.stop()


if __name__ == "__main__":
    main()
