#!/bin/bash
# Chain job 8: after chain 7 - gist_dim_bench with the EMPIRICAL VMEM fit
# (chain-6 run OOM'd on the analytic budget's (512, 1024) pick; the fit's
# (256, 1024) is probe-confirmed on this rig).
cd /root/repo
pid=$(cat /tmp/tpu_chain7.pid 2>/dev/null)
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
echo "=== chain8: start $(date) ===" | tee -a logs/tpu_queue.log
timeout 7200 python scripts/gist_dim_bench.py > logs/gist_dim_bench4.log 2>&1
echo "=== chain8: gist_dim_bench rc=$? $(date) ===" | tee -a logs/tpu_queue.log
