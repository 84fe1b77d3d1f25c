"""Zero-row replica fixtures — the before-first-ingest state.

Two variants (COVERAGE.md "zero-row gates"):
    python tools/make_empty.py /tmp/empty_facts facts   # dims kept, facts empty
    python tools/make_empty.py /tmp/empty_all   all     # every table empty

Gate:  SPARK_GRAFT_TEST_SF_DIR=<dir> pytest tests/test_oracle_parity.py
Schemas come from /root/testdata/sf0.001 via zero-length slices, so the
fixtures track the driver's schema exactly.
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()
DIMS = ("region", "nation")


def main() -> None:
    out, mode = sys.argv[1], sys.argv[2]
    assert mode in ("facts", "all"), "mode must be 'facts' or 'all'"
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        if mode == "facts" and t in DIMS:
            pq.write_table(tbl, f"{out}/{t}.parquet")
        else:
            pq.write_table(tbl.slice(0, 0), f"{out}/{t}.parquet")
        print(t, pq.read_metadata(f"{out}/{t}.parquet").num_rows)


if __name__ == "__main__":
    main()
