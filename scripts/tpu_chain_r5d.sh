#!/bin/bash
# Round-5 chain d: bench re-check with the in-run block_q autotune at the
# recall>=0.95 operating point (engine/calibrate.autotune_block_q — the
# qb sweep measured that point 25% faster at qb=512, logs/qb_sweep_r5.log).
# The headline stays fixed at qb=1024 for cross-round comparability.
cd /root/repo
mkdir -p logs
echo "=== tpu_chain_r5d start $(date) ===" | tee -a logs/tpu_queue.log

scripts/tpu_run.sh bench_r5c_check 4800 python bench.py

echo "=== tpu_chain_r5d end $(date) ===" | tee -a logs/tpu_queue.log
