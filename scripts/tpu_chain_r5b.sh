#!/bin/bash
# Round-5 follow-on chain (replaces tpu_chain_r5.sh steps 5-6, whose 50M
# rebuild could not fit the remaining round budget after /tmp was wiped).
# Queues behind the in-flight gist step on tpu_run.sh's lockfile.
cd /root/repo
mkdir -p logs
echo "=== tpu_chain_r5b start $(date) ===" | tee -a logs/tpu_queue.log

# 1. VERDICT item 2: probe-skew attribution (refused twice for rig load;
#    cheap now — bench index cache is warm)
scripts/tpu_run.sh skew_profile_r5 4800 python scripts/skew_profile.py

# 2. VERDICT item 6: stream-vs-batch decomposition + threaded-prefetch
#    stream re-measurement (phase-marked pass committed in the log)
scripts/tpu_run.sh stream_profile_r5 2400 python scripts/stream_profile.py

# 3. VERDICT item 4 (round-3, twice deferred): disk bvecs -> index ->
#    serve, measured end to end on the chip
scripts/tpu_run.sh bvecs_e2e_r5 10800 python scripts/bvecs_e2e_demo.py

# 4. headline re-check on the fixed stream path (index cache makes this
#    ~15 min); the driver's round-end bench then has a warm compile cache
scripts/tpu_run.sh bench_r5b_check 4200 python bench.py

echo "=== tpu_chain_r5b end $(date) ===" | tee -a logs/tpu_queue.log
