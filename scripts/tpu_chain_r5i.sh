#!/bin/bash
cd /root/repo
echo "=== tpu_chain_r5i start $(date) ===" | tee -a logs/tpu_queue.log
scripts/tpu_run.sh gist_qb_tune_r5 2400 python scripts/gist_qb_tune.py
echo "=== tpu_chain_r5i end $(date) ===" | tee -a logs/tpu_queue.log
