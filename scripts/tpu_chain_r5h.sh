#!/bin/bash
cd /root/repo
echo "=== tpu_chain_r5h start $(date) ===" | tee -a logs/tpu_queue.log
scripts/tpu_run.sh phase_trained_r5b 3000 python scripts/phase_profile_trained.py
echo "=== tpu_chain_r5h end $(date) ===" | tee -a logs/tpu_queue.log
