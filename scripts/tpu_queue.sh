#!/bin/bash
# Round-3 TPU measurement queue — run highest-value first so a short
# window still lands the critical evidence.  Each step is bounded and
# logged; failures don't block later steps.
cd /root/repo
mkdir -p logs
echo "=== tpu_queue start $(date) ===" | tee -a logs/tpu_queue.log

run() {
  name=$1; tmo=$2; shift 2
  echo "--- $name start $(date) ---" | tee -a logs/tpu_queue.log
  timeout "$tmo" "$@" > "logs/${name}.log" 2>&1
  rc=$?
  echo "--- $name done rc=$rc $(date) ---" | tee -a logs/tpu_queue.log
}

# 1. driver headline: validates the scatter construction + scaled margin
#    on the real chip (also refreshes the corpus cache under the new key)
run bench_r3_check 2400 python bench.py
# 2. VERDICT item 7: measured inner-product serving sweep at 1M
run ip_serve_bench 4800 python scripts/ip_serve_bench.py
# 3. zero-miss margin at sub-tile granularity (sets the bf16 default)
run bf16_margin_sweep_r3 3600 python scripts/bf16_margin_sweep.py
# 4. QPS of margin x granularity grid (picks the measured default)
run sel_rows_bench_r3 3600 python scripts/sel_rows_bench.py
# 5. pipelined stream vs single-batch serving rate; the 'blocked' filter
#    now also covers the int8 screen (blocked-int8) and the capacity mode
#    (blocked-bf16-cap)
run tpu_serve_bench_stream 4800 python scripts/tpu_serve_bench.py 1000000 1024 65536 blocked 1024
# 6. capacity demo: 20M rows served on ONE chip (bf16-only table, 0.5x HBM)
run capacity_20m 4800 python scripts/tpu_serve_bench.py 20000000 1024 65536 blocked-bf16-cap 1024
echo "=== tpu_queue end $(date) ===" | tee -a logs/tpu_queue.log
