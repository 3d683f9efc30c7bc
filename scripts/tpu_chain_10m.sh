#!/bin/bash
# Chain job: wait for the running tpu_queue.sh (pid in /tmp/tpu_queue.pid)
# to finish, then re-run the 10M hard-regime demo that round 3's first
# attempt lost to the tunnel outage (logs/tpu_10m_hard_run2.log).
cd /root/repo
pid=$(cat /tmp/tpu_queue.pid 2>/dev/null)
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
echo "=== chain: queue done, starting 10M hard demo $(date) ===" | tee -a logs/tpu_queue.log
timeout 14400 python scripts/tpu_10m_demo.py > logs/tpu_10m_hard_run3.log 2>&1
echo "=== chain: 10M hard demo rc=$? $(date) ===" | tee -a logs/tpu_queue.log
