#!/bin/bash
# Repeated SHORT canary-gated sessions (same pre-registered rule,
# scripts/scaling_protocol.py): each session calibrates its own canary
# floor, so a uniformly-weathered window can accept pairs that a
# ratcheted all-night floor would reject.  All sessions' pairs are
# published; the consolidated median uses every accepted pair.
# 8M rows: pair ~4-5 min (vs 9 at 16M) -- better odds of a gust-free
# window; clean-window efficiency at 8M measured 0.83 (r2 curve).
cd /root/repo
N=${1:-8}
ROWS=${2:-8000000}
for i in $(seq 1 "$N"); do
  echo "=== session $i rows=$ROWS $(date +%H:%M:%S) ==="
  python scripts/scaling_protocol.py --cores 2 --rows "$ROWS" \
    --workload cells --target-accepted 1 --max-rounds 2 --budget-s 1200
  if [ -f "BENCH/scaling_pairs_local_cells_2x4_$ROWS.json" ]; then
    mv "BENCH/scaling_pairs_local_cells_2x4_$ROWS.json" "BENCH/sp_${ROWS}_s$i.json"
  fi
done
