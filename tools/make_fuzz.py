"""Seed-randomized adversarial replica fixture (VERDICT r4 #8).

Perturbs /root/testdata/sf0.001 into OUT_DIR with the SAME schemas and
key structure but seed-randomized edge-class values the fixed fixture
never exercises — the exact class the round-4 oracle-hardening commits
(NULL-safety, LEAST/GREATEST NULL-skipping, tie-breaks) kept finding bugs
in:

- documents: NULL / empty / whitespace-only / unicode (emoji+CJK+RTL+
  combining) / huge texts, exact-duplicate pairs; n_chars kept consistent
  (NULL text -> NULL n_chars).
- events: epoch and pre-epoch timestamps, DST-edge wall times, exact
  timestamp ties within a user, NULL value/user_id, NULL and MALFORMED
  props JSON.
- orders/lineitem/customer/supplier/part: NULL-dense nullable columns,
  negative and large-magnitude numerics (bounded at 1e9 so 2-decimal sums
  stay inside double exactness), unicode and empty strings; enum domains
  (o_orderstatus, l_returnflag, mktsegment) are PRESERVED because pivot
  queries enumerate them.
- embeddings: zero vectors and denormal-magnitude vectors (cosine
  div-by-zero class); duplicate vectors are deliberately NOT planted
  (exact ANN ties flip verdict booleans — a fixture property, not a bug).
- region/nation: untouched (dimension literals mirror them).
- EXTREME SKEW (round 6): one hot key absorbs 40-50% of fact rows
  (events.user_id/event_type, orders.o_custkey, lineitem.l_suppkey+
  l_partkey, customer.c_mktsegment, documents.source+lang) — giant
  window partitions, hot groupBy keys, and skewed join sides; answers
  must be key-shape-independent.
- PKs stay unique and FKs stay in-domain: key-uniqueness guards are a
  documented contract, not a fuzz target.

Usage:  python tools/make_fuzz.py OUT_DIR SEED
Gate:   SPARK_GRAFT_TEST_SF_DIR=OUT_DIR python -m pytest tests/test_oracle_parity.py
"""

from __future__ import annotations

import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"

UNICODE_TEXTS = [
    "héllo wörld 世界 \U0001f680 مرحبا café étude",
    "こんにちは 世界 ümläut שלום \U0001f600\U0001f680",
    "z̧ál̐g̏ô text ØÅÆ đħŧ",
]

DST_EDGES = [
    "1970-01-01 00:00:00",       # epoch
    "1969-12-31 23:59:59",       # pre-epoch (negative micros)
    "2021-03-28 02:30:00",       # EU spring-forward wall time
    "2021-10-31 02:30:00",       # EU fall-back ambiguous wall time
    "2262-04-11 00:00:00",       # near datetime64[ns] ceiling
]


def _ts(s: str):
    from datetime import datetime

    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


# ADVICE r5 adjudication: the advisor flagged o_orderdate/l_shipdate as
# date-typed columns where the DST wall-time datetimes would lose their
# time component.  Checked against the actual fixtures: BOTH columns are
# timestamp[us] in /root/testdata/sf*/{orders,lineitem}.parquet (pyarrow
# schema probe, round 6), so the wall-time edges land intact and the
# documented edge classes DO reach those tables.  (A .date() assignment
# is what actually breaks: ArrowTypeError, date not convertible to
# timestamp int.)  No change needed; _ts stays correct for all three
# timestamp columns.


def perturb(table: str, rows: list[dict], rng: random.Random) -> list[dict]:
    n = len(rows)

    def sample(frac: float) -> list[int]:
        k = max(1, int(n * frac))
        return rng.sample(range(n), min(k, n))

    def skew_to_hot(frac: float, cols: list[str]) -> None:
        # EXTREME-SKEW class (round 6): one hot key absorbs `frac` of the
        # fact rows — the shape AQE skew-join splitting and salting exist
        # for.  Values are copied from an existing row, so FKs stay
        # in-domain and enum domains are preserved; PKs are untouched.
        # Correctness must be key-shape-independent: a hot key changes
        # partition sizes, partial-agg fan-in, and tie populations — never
        # answers (both engines see the same skewed data).
        donor = rows[rng.randrange(n)]
        if any(donor[c] is None for c in cols):
            donor = next(
                (r for r in rows if all(r[c] is not None for c in cols)), donor
            )
        for i in sample(frac):
            for c in cols:
                rows[i][c] = donor[c]

    if table == "documents":
        skew_to_hot(0.5, ["source", "lang"])
        for i in sample(0.04):
            rows[i]["text"] = None
            rows[i]["n_chars"] = None
        for i in sample(0.04):
            rows[i]["text"] = ""
        for i in sample(0.03):
            rows[i]["text"] = " \t  \n " * rng.randint(1, 3)
        for i in sample(0.03):
            rows[i]["text"] = rng.choice(UNICODE_TEXTS) * rng.randint(1, 4)
        for i in sample(0.004):
            rows[i]["text"] = ("lorem ipsum dolor sit amet " * 4000)[:100_000]
        # exact duplicate pairs (text copied, ids untouched)
        for i in sample(0.04):
            j = rng.randrange(n)
            if rows[j]["text"] is not None:
                rows[i]["text"] = rows[j]["text"]
        # shingle-boundary lengths (round 6): docs with exactly k-1, k, and
        # k+1 whitespace tokens for the engine's k=5/k=8 gram sizes — the
        # pos==0 zero-padded-gram fallback and the "shorter than k" branch
        # of shingle_index/_rolling_grams, plus a single GIANT token (no
        # whitespace at all: one token, char shingles still form)
        for i in sample(0.02):
            k_edge = rng.choice([4, 5, 6, 7, 8, 9])
            rows[i]["text"] = " ".join(
                f"tok{rng.randint(0, 9)}" for _ in range(k_edge)
            )
        for i in sample(0.004):
            rows[i]["text"] = "x" * rng.randint(10_000, 50_000)  # one token
        for r in rows:
            r["n_chars"] = None if r["text"] is None else len(r["text"])
    elif table == "events":
        skew_to_hot(0.5, ["user_id"])
        skew_to_hot(0.4, ["event_type"])
        for i in sample(0.02):
            rows[i]["ts"] = _ts(rng.choice(DST_EDGES))
        # exact-ts ties within one user (session/window tie-break class)
        idx = sample(0.03)
        for a, b in zip(idx[::2], idx[1::2]):
            rows[b]["ts"] = rows[a]["ts"]
            rows[b]["user_id"] = rows[a]["user_id"]
        # FULL-row duplicates except the PK (round 6): every non-key
        # column copied, so even tie-break orderings tie — value-hashes
        # must still agree because the tied rows are value-identical
        idx2 = sample(0.02)
        for a, b in zip(idx2[::2], idx2[1::2]):
            for col in ("ts", "user_id", "event_type", "value", "props"):
                rows[b][col] = rows[a][col]
        for i in sample(0.03):
            rows[i]["value"] = None
        for i in sample(0.01):
            rows[i]["user_id"] = None
        for i in sample(0.02):
            rows[i]["props"] = None
        for i in sample(0.01):
            rows[i]["props"] = rng.choice(["not json", "{", '{"k": }', ""])
        # VALID JSON with non-integral / string / overflow / null k: the
        # coercion-vs-strict divergence class (DuckDB CAST coerces 2.5->2
        # and "12"->12 where from_json nulls; round-5 code review)
        for i in sample(0.01):
            rows[i]["props"] = rng.choice(
                ['{"k": 2.5}', '{"k": "12"}', '{"k": "x"}',
                 '{"k": 18446744073709551615}', '{"k": null}', '{"k": -3}']
            )
    elif table == "orders":
        skew_to_hot(0.4, ["o_custkey"])
        for i in sample(0.02):
            rows[i]["o_totalprice"] = None
        for i in sample(0.01):
            rows[i]["o_totalprice"] = -round(rng.uniform(1, 1e4), 2)
        for i in sample(0.005):
            rows[i]["o_totalprice"] = round(rng.uniform(1e8, 1e9), 2)
        for i in sample(0.01):
            rows[i]["o_orderdate"] = _ts(rng.choice(DST_EDGES))
        for i in sample(0.01):
            rows[i]["o_orderpriority"] = None
    elif table == "lineitem":
        skew_to_hot(0.4, ["l_suppkey", "l_partkey"])
        for i in sample(0.01):
            rows[i]["l_quantity"] = None
        for i in sample(0.01):
            rows[i]["l_discount"] = None
        for i in sample(0.01):
            rows[i]["l_tax"] = None
        for i in sample(0.005):
            rows[i]["l_quantity"] = -float(rng.randint(1, 10))
        for i in sample(0.01):
            rows[i]["l_shipdate"] = _ts(rng.choice(DST_EDGES))
    elif table == "customer":
        skew_to_hot(0.5, ["c_mktsegment"])
        for i in sample(0.02):
            rows[i]["c_acctbal"] = None
        for i in sample(0.01):
            rows[i]["c_name"] = rng.choice(UNICODE_TEXTS)
        for i in sample(0.01):
            rows[i]["c_name"] = ""
        for i in sample(0.01):
            rows[i]["c_mktsegment"] = None
    elif table == "supplier":
        for i in sample(0.02):
            rows[i]["s_name"] = rng.choice(UNICODE_TEXTS + [""])
    elif table == "part":
        for i in sample(0.02):
            rows[i]["p_name"] = rng.choice(UNICODE_TEXTS + [""])
        for i in sample(0.01):
            rows[i]["p_retailprice"] = None
    elif table == "embeddings":
        dim = len(rows[0]["embedding"])
        for i in sample(0.02):
            rows[i]["embedding"] = [0.0] * dim
        for i in sample(0.01):
            rows[i]["embedding"] = [1e-30 * rng.uniform(-1, 1) for _ in range(dim)]
    return rows


def main() -> None:
    out_dir, seed = sys.argv[1], int(sys.argv[2])
    import os

    os.makedirs(out_dir, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if t in ("region", "nation"):
            pq.write_table(tbl, f"{out_dir}/{t}.parquet")
            print(f"{t}: copied")
            continue
        # zlib.crc32, not hash(): str hash is salted per-process, which
        # would make the "seeded" fixture unreproducible
        import zlib

        rng = random.Random(seed * 1_000_003 + zlib.crc32(t.encode()))
        rows = tbl.to_pylist()
        rows = perturb(t, rows, rng)
        out = pa.Table.from_pylist(rows, schema=tbl.schema)
        pq.write_table(out, f"{out_dir}/{t}.parquet")
        print(f"{t}: perturbed ({out.num_rows} rows)")


if __name__ == "__main__":
    main()
