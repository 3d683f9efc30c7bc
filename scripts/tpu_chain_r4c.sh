#!/bin/bash
# Round-4 follow-on chain (after the 50M demo releases the chip):
#   1. bvecs 10M disk e2e (VERDICT r3 missing item 4 — no measured
#      disk-bvecs -> index -> serve run yet)
#   2. clean GIST 1M x 960 self-kNN warm timing for the windowed fetch
#      (run 3 was on a degraded rig: 3.6x slower host I/O)
#   3. capacity profile re-run with the IVF-style prober (absolute recall)
cd /root/repo || exit 1
while kill -0 "$(cat /tmp/demo50m.pid 2>/dev/null)" 2>/dev/null; do sleep 60; done
sleep 5
timeout 7200 python scripts/bvecs_e2e_demo.py > logs/bvecs_e2e_r4.log 2>&1
echo "bvecs done rc=$? $(date -u)" >> logs/tpu_chain_r4c.log
timeout 3600 python scripts/gist_selfknn_time.py > logs/gist_selfknn_time4.log 2>&1
echo "selfknn done rc=$? $(date -u)" >> logs/tpu_chain_r4c.log
timeout 3600 python scripts/capacity_profile.py > logs/capacity_profile_r4b.log 2>&1
echo "chain r4c done $(date -u)" >> logs/tpu_chain_r4c.log
