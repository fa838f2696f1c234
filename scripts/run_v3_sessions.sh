#!/bin/bash
# Round-5: accumulate formally accepted pairs under the PRE-REGISTERED v3
# rule (commit 739ee96; rule text in scripts/scaling_protocol.py) until the
# pooled accepted count across all v3 sessions reaches >=5.  Each session
# calibrates its own p25 canary reference, so sessions run at different
# times sample different machine weather.  The rule is NOT amended.
cd /root/repo
TARGET=${1:-5}   # pooled accepted pairs across ALL v3 session files
MAXSESS=${2:-5}
for i in $(seq 2 $((MAXSESS+1))); do
  POOLED=$(python - <<'PY'
import glob, json
n = 0
for f in glob.glob('BENCH/sp_v3_4000000_s*.json'):
    n += sum(1 for p in json.load(open(f))['pairs'] if p.get('accepted'))
print(n)
PY
)
  echo "=== pooled accepted so far: $POOLED (target $TARGET) $(date +%H:%M:%S) ==="
  if [ "$POOLED" -ge "$TARGET" ]; then echo DONE; break; fi
  python scripts/scaling_protocol.py --rule v3 --cores 2 --rows 4000000 \
    --workload cells --target-accepted 2 --max-rounds 10 --budget-s 2400
  if [ -f BENCH/scaling_pairs_v3_local_cells_2x4_4000000.json ]; then
    mv BENCH/scaling_pairs_v3_local_cells_2x4_4000000.json "BENCH/sp_v3_4000000_s$i.json"
  fi
done
python - <<'PY'
import glob, json, statistics
effs = []
for f in sorted(glob.glob('BENCH/sp_v3_4000000_s*.json')):
    d = json.load(open(f))
    acc = [p['eff'] for p in d['pairs'] if p.get('accepted')]
    print(f, 'accepted', len(acc), [round(e,2) for e in acc])
    effs += acc
print('POOLED', len(effs), 'median', round(statistics.median(effs), 3) if effs else None)
PY
