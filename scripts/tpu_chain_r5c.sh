#!/bin/bash
# Round-5 chain c: queued behind the in-flight bvecs e2e run.
# qb re-measurement (post-pad-skip the measured-optimal block size may
# have moved) BEFORE the bench re-check, so a winning qb can be defaulted
# and re-benched in the same round.
cd /root/repo
mkdir -p logs
echo "=== tpu_chain_r5c start $(date) ===" | tee -a logs/tpu_queue.log

scripts/tpu_run.sh qb_sweep_r5 4800 python scripts/qb_sweep.py

scripts/tpu_run.sh bench_r5b_check 4200 python bench.py

echo "=== tpu_chain_r5c end $(date) ===" | tee -a logs/tpu_queue.log
