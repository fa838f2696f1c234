#!/bin/bash
# Clean-window gate for assign_flanked (VERDICT r4 next #10 retry):
# poll the CPU canary every ~3 min; when a reading is at/near the
# documented clean floor (<= 1.3s vs 0.5-0.9s typical), run the
# canary-flanked assign session and archive the result as _s2.
cd /root/repo
for i in $(seq 1 60); do
  C=$(python3 -c "import sys; sys.path.insert(0,'.'); from scripts.scaling_protocol import canary_seconds; print(canary_seconds())")
  echo "$(date +%H:%M:%S) canary=$C"
  OK=$(python3 -c "print(1 if float('$C') <= 1.3 else 0)")
  if [ "$OK" = "1" ]; then
    echo "clean window detected — launching assign_flanked"
    python scripts/assign_flanked.py 5 && cp BENCH/assign_flanked.json BENCH/assign_flanked_s2.json
    exit $?
  fi
  sleep 170
done
echo "no clean window in ~3h"
exit 3
