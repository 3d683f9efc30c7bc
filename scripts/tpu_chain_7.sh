#!/bin/bash
# Chain job 7: after chain 6 - 10M hard f32 serve-only rerun (pipeline
# cached) with the new big-batch pipelined-stream throughput measurement.
cd /root/repo
pid=$(cat /tmp/tpu_chain6.pid 2>/dev/null)
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
echo "=== chain7: start $(date) ===" | tee -a logs/tpu_queue.log
timeout 7200 python scripts/tpu_10m_demo.py 10000000 2048 2048 40 hard float32 > logs/tpu_10m_hard_run6.log 2>&1
echo "=== chain7: tpu_10m_f32_stream rc=$? $(date) ===" | tee -a logs/tpu_queue.log
