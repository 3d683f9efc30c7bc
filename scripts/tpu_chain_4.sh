#!/bin/bash
# Chain job 4: wait for chain 3 (pid in /tmp/tpu_chain3.pid), then re-run
# the two jobs that failed earlier in this session:
#  - latency_bench: hit a mid-edit import race (NameError on the new
#    single-parameter norms helper) — code is complete and tested now;
#  - the 10M hard demo's measured serving sweep: the einsum(x, x)
#    double-parameter compile OOM at its 19.2M-row redundant table, fixed
#    by _row_sqnorms_dev; the pipeline outputs are cached so this rerun
#    skips straight to engine build + sweep.
cd /root/repo
pid=$(cat /tmp/tpu_chain3.pid 2>/dev/null)
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
echo "=== chain4: start $(date) ===" | tee -a logs/tpu_queue.log
timeout 3600 python scripts/latency_bench.py > logs/latency_bench.log 2>&1
echo "=== chain4: latency_bench rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 14400 python scripts/tpu_10m_demo.py 10000000 2048 2048 40 hard > logs/tpu_10m_hard_run4.log 2>&1
echo "=== chain4: tpu_10m_hard rc=$? $(date) ===" | tee -a logs/tpu_queue.log
