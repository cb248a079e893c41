#!/bin/bash
# Round-5 no-flags quality A/B regeneration on the real chip
# (VERDICT r4 next-round #1a). State/rows accumulate in
# artifacts/quality_ab_round5.jsonl (resumable per cell); a mid-run
# tunnel wedge just re-enters the loop and resumes. DEADLINE_EPOCH
# (env) caps the session so the device is free before round end.
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export ANERF_LIVENESS_RETRIES=8
DEADLINE=${DEADLINE_EPOCH:-$(( $(date +%s) + 21600 ))}
attempt=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  attempt=$((attempt+1))
  left=$(( DEADLINE - $(date +%s) ))
  echo "=== qab attempt $attempt $(date) (${left}s left)" >> /tmp/qab_r5.log
  timeout "$left" python bench.py --quality_ab \
      --ab_state artifacts/quality_ab_round5.jsonl >> /tmp/qab_r5.log 2>&1
  rc=$?
  echo "=== qab exit $rc" >> /tmp/qab_r5.log
  [ $rc -eq 0 ] && exit 0
  sleep 60
done
echo "=== qab deadline reached" >> /tmp/qab_r5.log
