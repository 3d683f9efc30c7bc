#!/bin/bash
# Round-5 TPU measurement chain — VERDICT r4 items, highest-value first,
# every step through scripts/tpu_run.sh (lockfile + rig-health preamble,
# VERDICT item 8).  A failed/timed-out step never blocks the next.
cd /root/repo
mkdir -p logs
echo "=== tpu_chain_r5 start $(date) ===" | tee -a logs/tpu_queue.log

# 1. VERDICT item 2: attribute + attack probe skew (trained-id vs
#    trained-tour vs uniform, interleaved in ONE session)
scripts/tpu_run.sh skew_profile_r5 4800 python scripts/skew_profile.py

# 2. VERDICT item 3: the headline bench with the interleaved int8/bf16
#    A/B (medians decide the ladder) + recall>=0.95 column + stream sidecar
scripts/tpu_run.sh bench_r5_check 4200 python bench.py

# 3. VERDICT item 9: QPS-at-recall>=0.95 vs redundancy duplication ratio
scripts/tpu_run.sh recall095_tune_r5 6000 python scripts/recall095_tune.py

# 4. VERDICT item 5: GIST 1M x 960 sweep with per-threshold warmup
#    (compile-free QPS column)
scripts/tpu_run.sh gist_dim_bench_r5 9000 python scripts/gist_dim_bench.py

# 5. VERDICT item 4 (round-3 item, twice deferred): disk bvecs -> index
#    -> serve, measured end to end on the chip
scripts/tpu_run.sh bvecs_e2e_r5 10800 python scripts/bvecs_e2e_demo.py

# 6. VERDICT item 6: 50M stream-vs-sync interleaved A/B + phase-marked
#    stream pass (rebuilds the 50M index from scratch; phase checkpoints
#    make it restartable)
LIRA_STREAM_DIAG=1 scripts/tpu_run.sh tpu_50m_diag_r5 16000 \
  env LIRA_STREAM_DIAG=1 python scripts/tpu_50m_demo.py

echo "=== tpu_chain_r5 end $(date) ===" | tee -a logs/tpu_queue.log
