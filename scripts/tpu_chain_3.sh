#!/bin/bash
# Chain job 3: wait for chain 2 (latency + gist benches, pid in
# /tmp/tpu_chain2.pid) to finish, then run the capacity-mode follow-ups:
# int8 kernel microbench, the capacity phase profile (post-fix), the 20M
# capacity demo rerun (chunked-screen OOM fix), and a bench.py re-check
# with the measured 4-tile bf16 margin default.
cd /root/repo
pid=$(cat /tmp/tpu_chain2.pid 2>/dev/null)
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
echo "=== chain3: start $(date) ===" | tee -a logs/tpu_queue.log
timeout 2400 python scripts/kernel_micro.py > logs/kernel_micro_int8.log 2>&1
echo "=== chain3: kernel_micro_int8 rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 3600 python scripts/capacity_profile.py > logs/capacity_profile.log 2>&1
echo "=== chain3: capacity_profile rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 7200 python scripts/tpu_serve_bench.py 20000000 1024 65536 blocked-bf16-cap 1024 > logs/capacity_20m_2.log 2>&1
echo "=== chain3: capacity_20m_2 rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 2400 python bench.py > logs/bench_r3_check2.log 2>&1
echo "=== chain3: bench_r3_check2 rc=$? $(date) ===" | tee -a logs/tpu_queue.log
