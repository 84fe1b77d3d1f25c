#!/bin/bash
# Relational decade probe (SCALING.md "higher decades" sections).
# bash, not sh: `set -o pipefail` below is not POSIX.
#
# Usage:
#   tools/decade_probe.sh SF_DIR SHUFFLE_PARTITIONS OUT_JSONL [insession]
#
# Default mode runs ONE bench.py process PER QUERY (min-of-2 inside each):
# at sf100 every query shuffles 10-20 GB and the async writeback +
# shuffle-file deletion from the previous query lands on the next one, so
# same-session per-query numbers swing +-2-3x in BOTH directions while the
# session TOTAL stays stable.  Publish the per-query MIN across passes
# (isolated + in-session); `insession` mode runs the classic single-process
# pass for the total and a second min source.
#
# The 28-query subset is every HEADLINE query whose load_table calls touch
# only the six key-shifted relational tables (verified by spying on
# load_table at plan-build time — documents/embeddings are not
# sf-proportional and are excluded from relational decades).
#
# Failure accounting (ADVICE r6): bench stderr goes to a per-probe log, and
# every bench.py invocation's exit status + presence of a result line is
# checked — a crash BEFORE the JSON line prints a loud MISSING warning and
# sets a nonzero exit, instead of silently contributing nothing to OUT.
# (In-process query failures are still visible as -1 entries in the JSON.)
# pipefail (ADVICE r7): without it, rc=$? after `bench.py | grep` captured
# grep's status, so a bench crash AFTER the JSON line printed passed
# silently — rc must reflect bench.py's own exit.
REL="etl_flagship upsert_lww pricing_summary top_building_orders region_revenue topk_orders top3_per_segment running_total events_hourly sessionize asof_join range_join_peak revenue_filter scd2_dim local_supplier_revenue large_orders dq_report incremental_agg nation_trade_volume event_transitions lateral_top_orders recursive_ancestry time_weighted_value important_parts supplier_part_variety hll_distinct skew_profile cohort_retention"

set -o pipefail

SF_DIR=${1:?usage: decade_probe.sh SF_DIR SHUFFLE_PARTITIONS OUT_JSONL [insession]}
SP=${2:?shuffle partitions (size to the decade: 64 at sf10, 512 at sf100)}
OUT=${3:?output jsonl path}
MODE=${4:-isolated}
ERRLOG="$OUT.stderr.log"

export SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_REPEATS=2 \
       SPARK_GRAFT_SHUFFLE_PARTITIONS="$SP" SPARK_GRAFT_SKIP_ANN=1 \
       SPARK_GRAFT_DRIVER_MEM=${SPARK_GRAFT_DRIVER_MEM:-80g}

: > "$OUT"
: > "$ERRLOG"
FAILED=0
if [ "$MODE" = "insession" ]; then
  SPARK_GRAFT_ONLY=$(echo "$REL" | tr ' ' ',') python bench.py 2>>"$ERRLOG" \
    | grep '"queries"' >> "$OUT"
  rc=$?
  lines=$(wc -l < "$OUT")
  if [ "$rc" -ne 0 ] || [ "$lines" -lt 1 ]; then
    echo "WARNING: in-session bench pass produced no result line (exit=$rc)" \
         "— see $ERRLOG" >&2
    FAILED=1
  fi
else
  for q in $REL; do
    echo "=== $q ===" >> "$ERRLOG"
    SPARK_GRAFT_ONLY=$q python bench.py 2>>"$ERRLOG" \
      | grep '"queries"' >> "$OUT"
    rc=$?
    if [ "$rc" -ne 0 ] || ! grep -q "\"$q\"" "$OUT"; then
      echo "WARNING: query '$q' produced NO result line (exit=$rc)" \
           "— bench crashed before printing; see $ERRLOG" >&2
      FAILED=1
    fi
  done
  want=$(echo "$REL" | wc -w)
  got=$(wc -l < "$OUT")
  if [ "$got" -ne "$want" ]; then
    echo "WARNING: $got/$want queries produced result lines in $OUT" >&2
    FAILED=1
  fi
fi
exit "$FAILED"
