#!/bin/bash
# Poll for the TPU tunnel; when a device probe succeeds, fire the
# round-3 measurement queue (scripts/tpu_queue.sh) exactly once.
# Bounded: gives up after MAX_POLLS so it never outlives the session.
cd /root/repo
mkdir -p logs
MAX_POLLS=${MAX_POLLS:-120}   # 120 x 5 min = 10 h
for i in $(seq 1 "$MAX_POLLS"); do
  if timeout 180 python -c "import jax; assert jax.devices()[0].platform == 'tpu'" 2>/dev/null; then
    echo "tpu up at $(date), poll $i — running queue" | tee -a logs/tpu_watch.log
    bash scripts/tpu_queue.sh
    echo "queue done at $(date)" | tee -a logs/tpu_watch.log
    exit 0
  fi
  echo "poll $i: tpu down at $(date)" >> logs/tpu_watch.log
  sleep 300
done
echo "gave up after $MAX_POLLS polls" | tee -a logs/tpu_watch.log
exit 1
