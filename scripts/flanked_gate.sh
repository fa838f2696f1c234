#!/bin/bash
# Clean-window gate for the canary-flanked assign bench: poll the CPU
# canary; once REQUIRED_CLEAN consecutive readings are at/below
# THRESHOLD seconds, run the flanked session and archive the result.
# Parameterized (code-review r5 deduped the v1/v2 copies):
#   THRESHOLD        fire level in seconds          (default 0.9)
#   REQUIRED_CLEAN   consecutive clean readings     (default 2)
#   SUFFIX           archive BENCH/assign_flanked_${SUFFIX}.json (default s4)
#   MAX_POLLS        polls before giving up         (default 90)
# Exits 0 only when the freshly-written JSON has a non-null
# assign_flanked_min (a crashed run can NOT surface a stale file's
# number: the read is inside the && chain).
cd /root/repo
THRESHOLD=${THRESHOLD:-0.9}
REQUIRED_CLEAN=${REQUIRED_CLEAN:-2}
SUFFIX=${SUFFIX:-s4}
MAX_POLLS=${MAX_POLLS:-90}
STREAK=0
for i in $(seq 1 "$MAX_POLLS"); do
  C=$(python3 -c "import sys; sys.path.insert(0,'.'); from scripts.scaling_protocol import canary_seconds; print(canary_seconds())")
  echo "$(date +%H:%M:%S) canary=$C"
  OK=$(python3 -c "print(1 if float('$C') <= float('$THRESHOLD') else 0)")
  if [ "$OK" = "1" ]; then STREAK=$((STREAK+1)); else STREAK=0; fi
  if [ "$STREAK" -ge "$REQUIRED_CLEAN" ]; then
    echo "stable clean window — launching assign_flanked"
    if python scripts/assign_flanked.py 5 \
       && cp BENCH/assign_flanked.json "BENCH/assign_flanked_${SUFFIX}.json"; then
      J=$(python3 -c "import json; print(json.load(open('BENCH/assign_flanked.json'))['assign_flanked_min'])")
      echo "flanked_min=$J"
      if [ "$J" != "None" ]; then exit 0; fi
    else
      echo "assign_flanked run failed; resuming polling"
    fi
    STREAK=0
    continue
  fi
  sleep 140
done
echo "no accepted flanked number in this gate run"
exit 3
