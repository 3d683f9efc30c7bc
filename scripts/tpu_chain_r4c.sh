#!/bin/bash
# Round-4 follow-on chain (after the 50M demo releases the chip).
# Time-guarded: the driver runs bench.py on the chip at round end — no job
# starts after the cutoff so the final bench is uncontended.
CUTOFF=$(date -u -d "2026-08-19 14:25" +%s)
cd /root/repo || exit 1
while kill -0 "$(cat /tmp/demo50m.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 5
if [ "$(date -u +%s)" -lt "$CUTOFF" ]; then
  timeout 1500 python scripts/capacity_profile.py > logs/capacity_profile_r4b.log 2>&1
  echo "capacity done rc=$? $(date -u)" >> logs/tpu_chain_r4c.log
fi
if [ "$(date -u +%s)" -lt "$CUTOFF" ]; then
  timeout 1200 python scripts/gist_selfknn_time.py > logs/gist_selfknn_time4.log 2>&1
  echo "selfknn done rc=$? $(date -u)" >> logs/tpu_chain_r4c.log
fi
echo "chain r4c done $(date -u)" >> logs/tpu_chain_r4c.log
