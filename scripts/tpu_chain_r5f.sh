#!/bin/bash
# Round-5 chain f: driver-comparable bench with the GT cache + 8-batch
# stream sidecar — validates the exact path BENCH_r05 will run.
cd /root/repo
mkdir -p logs
echo "=== tpu_chain_r5f start $(date) ===" | tee -a logs/tpu_queue.log
scripts/tpu_run.sh bench_r5f_check 3600 python bench.py
echo "=== tpu_chain_r5f end $(date) ===" | tee -a logs/tpu_queue.log
