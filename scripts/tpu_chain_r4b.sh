#!/bin/bash
# Round-4 follow-on measurement chain: waits for the 50M demo to release
# the chip (and the single vCPU), then runs the queued re-measurements:
#   1. capacity_profile with the in-run exact-kNN recall oracle
#      (VERDICT r3 item 4 — publish the capacity trade curve)
#   2. GIST 1M x 960 self-kNN warm timing on the windowed bound-queue
#      fetch (the contended 08:01 run was invalid; logs/gist_selfknn_time2.log)
#   3. bench.py headline re-check on the calibrated margins
cd /root/repo || exit 1
while kill -0 "$(cat /tmp/demo50m.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 5
python scripts/capacity_profile.py > logs/capacity_profile_r4.log 2>&1
python scripts/gist_selfknn_time.py > logs/gist_selfknn_time3.log 2>&1
python bench.py > logs/bench_r4_run2.log 2>&1
echo "chain r4b done $(date -u)" >> logs/tpu_chain_r4b.log
