"""Partition-order-determinism sweep: run every registered query twice on
sessions with different parallelism/shuffle-partition counts and compare
order-insensitive value hashes.  A mismatch means the query's output
depends on accumulation order (the weighted_avg_udaf bug class) and its
oracle green rows are partition luck."""
import hashlib
import sys

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

import __spark_entry__ as mod  # noqa: E402
from european_emissions_data_warehouse_spark.session import (  # noqa: E402
    get_session,
    restore_scoped_confs,
)


def vhash(df):
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(r) for r in df.collect()]
    lines = sorted("\x01".join(repr(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def run_pass(master, sp):
    spark = get_session(master=master, shuffle_partitions=sp)
    out = {}
    for k, fn in mod.queries().items():
        try:
            out[k] = vhash(fn(spark, SF))
        except Exception as ex:  # noqa: BLE001
            out[k] = f"ERR:{type(ex).__name__}"
        finally:
            # a call-site conf override (recursive_ancestry's row-brake
            # ceiling) must not leak into later queries (ADVICE r7)
            restore_scoped_confs(spark)
        print(f"  [{sp}] {k}: {out[k]}", flush=True)
    spark.stop()
    return out


a = run_pass("local[3]", 3)
b = run_pass("local[16]", 17)
diff = [k for k in a if a[k] != b[k]]
# a query that throws in BOTH passes compares equal ("ERR:X" == "ERR:X")
# and would read as deterministic-and-green — report errors separately
# and fail on them too (round-5 code review)
errs = sorted(k for k in a if str(a[k]).startswith("ERR") or str(b[k]).startswith("ERR"))
print(f"\nnondeterministic under partitioning: {diff}")
print(f"errored in at least one pass: {errs}")
sys.exit(1 if (diff or errs) else 0)
