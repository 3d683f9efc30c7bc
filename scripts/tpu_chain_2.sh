#!/bin/bash
# Chain job 2: wait for chain 1 (queue + 10M hard demo, pid in
# /tmp/tpu_chain.pid) to finish, then run the round-3 additions:
# serving latency percentiles and the GIST-dimensionality (960d) sweep.
cd /root/repo
pid=$(cat /tmp/tpu_chain.pid 2>/dev/null)
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
echo "=== chain2: start $(date) ===" | tee -a logs/tpu_queue.log
timeout 3600 python scripts/latency_bench.py > logs/latency_bench.log 2>&1
echo "=== chain2: latency_bench rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 10800 python scripts/gist_dim_bench.py > logs/gist_dim_bench.log 2>&1
echo "=== chain2: gist_dim_bench rc=$? $(date) ===" | tee -a logs/tpu_queue.log
