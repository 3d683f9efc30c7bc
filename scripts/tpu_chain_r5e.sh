#!/bin/bash
# Round-5 chain e: the 50M stream-vs-sync A/B that chain r5 queued but
# never reached (steps 5-6 were re-queued into r5b, which closed with the
# bvecs run).  The threaded probe prefetch (commit 6a9f912) + early result
# D2H (commit be3c0d7) are the round-5 stream fixes this measures at 50M
# scale — VERDICT r4 weak 5 / item 6's tail.  Rebuilds the 50M index from
# scratch (/tmp phase checkpoints were wiped); every phase checkpoints, so
# a timeout resumes instead of recomputing.
cd /root/repo
mkdir -p logs
echo "=== tpu_chain_r5e start $(date) ===" | tee -a logs/tpu_queue.log

scripts/tpu_run.sh tpu_50m_diag_r5 14400 \
  env LIRA_STREAM_DIAG=1 python scripts/tpu_50m_demo.py

echo "=== tpu_chain_r5e end $(date) ===" | tee -a logs/tpu_queue.log
