#!/bin/sh
# Relational decade probe (SCALING.md "higher decades" sections).
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
REL="etl_flagship upsert_lww pricing_summary top_building_orders region_revenue topk_orders top3_per_segment running_total events_hourly sessionize asof_join range_join_peak revenue_filter scd2_dim local_supplier_revenue large_orders dq_report incremental_agg nation_trade_volume event_transitions lateral_top_orders recursive_ancestry time_weighted_value important_parts supplier_part_variety hll_distinct skew_profile cohort_retention"

SF_DIR=${1:?usage: decade_probe.sh SF_DIR SHUFFLE_PARTITIONS OUT_JSONL [insession]}
SP=${2:?shuffle partitions (size to the decade: 64 at sf10, 512 at sf100)}
OUT=${3:?output jsonl path}
MODE=${4:-isolated}

export SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_REPEATS=2 \
       SPARK_GRAFT_SHUFFLE_PARTITIONS="$SP" SPARK_GRAFT_SKIP_ANN=1 \
       SPARK_GRAFT_DRIVER_MEM=${SPARK_GRAFT_DRIVER_MEM:-80g}

: > "$OUT"
if [ "$MODE" = "insession" ]; then
  SPARK_GRAFT_ONLY=$(echo "$REL" | tr ' ' ',') python bench.py 2>/dev/null \
    | grep '"queries"' >> "$OUT"
else
  for q in $REL; do
    SPARK_GRAFT_ONLY=$q python bench.py 2>/dev/null | grep '"queries"' >> "$OUT"
  done
fi
