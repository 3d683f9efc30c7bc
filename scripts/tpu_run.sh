#!/bin/bash
# The ONLY sanctioned launch path for TPU measurements (VERDICT r4 item 8).
#
#   scripts/tpu_run.sh <name> <timeout_s> <cmd...>
#
# Serializes on a lockfile (so two measurements can never share the chip
# or the single host vCPU), runs the rig-health preamble, and refuses to
# start if the rig is degraded — every round-4 number that proved wrong
# traces to contention that this preamble would have flagged.
# The preamble's RIG_HEALTH line is prepended to the measurement log so
# a committed log carries its own health evidence.
set -u
cd /root/repo
name=$1; tmo=$2; shift 2
mkdir -p logs
log="logs/${name}.log"

exec 9>/tmp/lira_tpu.lock
if ! flock -w 14400 9; then
  echo "tpu_run: lock timeout for $name" | tee -a logs/tpu_queue.log
  exit 99
fi

echo "--- $name start $(date) ---" | tee -a logs/tpu_queue.log
# bound the preamble: a hung tunnel must fail fast, not wedge the chain
timeout 1200 python scripts/rig_health.py > "$log" 2>&1
hrc=$?
if [ $hrc -ne 0 ]; then
  echo "tpu_run: rig degraded, refusing $name (see $log)" | tee -a logs/tpu_queue.log
  echo "RIG DEGRADED — measurement refused" >> "$log"
  exit 98
fi
timeout "$tmo" "$@" >> "$log" 2>&1
rc=$?
echo "--- $name done rc=$rc $(date) ---" | tee -a logs/tpu_queue.log
exit $rc
