#!/bin/bash
# v2 clean-window gate for assign_flanked: fire only after TWO
# consecutive true-idle canary readings (<= 0.9s), so the 5-trial
# session starts inside a stable window rather than a transient dip.
cd /root/repo
PREV=99
for i in $(seq 1 90); do
  C=$(python3 -c "import sys; sys.path.insert(0,'.'); from scripts.scaling_protocol import canary_seconds; print(canary_seconds())")
  echo "$(date +%H:%M:%S) canary=$C"
  OK=$(python3 -c "print(1 if float('$C') <= 0.9 and float('$PREV') <= 0.9 else 0)")
  if [ "$OK" = "1" ]; then
    echo "stable clean window — launching assign_flanked"
    python scripts/assign_flanked.py 5 && cp BENCH/assign_flanked.json BENCH/assign_flanked_s4.json
    J=$(python3 -c "import json; print(json.load(open('BENCH/assign_flanked.json'))['assign_flanked_min'])")
    echo "flanked_min=$J"
    if [ "$J" != "None" ]; then exit 0; fi
    PREV=99
    continue
  fi
  PREV=$C
  sleep 140
done
echo "no accepted flanked number in this gate run"
exit 3
