#!/bin/bash
cd /root/repo
echo "=== tpu_chain_r5g start $(date) ===" | tee -a logs/tpu_queue.log
scripts/tpu_run.sh phase_trained_r5 2400 python scripts/phase_profile_trained.py
echo "=== tpu_chain_r5g end $(date) ===" | tee -a logs/tpu_queue.log
