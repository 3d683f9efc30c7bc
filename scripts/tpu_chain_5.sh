#!/bin/bash
# Chain job 5: re-run everything the (N,1) norms-column padding blowup and
# the double-counted shared table blocked (fixed by in-kernel norms +
# pad-row copies + rescore_arg aliasing):
#  - bench.py sanity first (the round bench must stay green on the new kernel);
#  - 10M hard serving sweep in f32 (pipeline outputs cached -> engine+sweep);
#  - GIST-dim 1M x 960 pipeline + sweep (knn_fused d-aware VMEM blocks);
#  - 20M one-chip capacity serving (bf16-only table).
cd /root/repo
pid=$(cat /tmp/tpu_chain4.pid 2>/dev/null)
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
echo "=== chain5: start $(date) ===" | tee -a logs/tpu_queue.log
timeout 3600 python bench.py > logs/bench_r3_check3.log 2>&1
echo "=== chain5: bench_check rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 7200 python scripts/tpu_10m_demo.py 10000000 2048 2048 40 hard float32 > logs/tpu_10m_hard_run5.log 2>&1
echo "=== chain5: tpu_10m_hard_f32 rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 7200 python scripts/gist_dim_bench.py > logs/gist_dim_bench2.log 2>&1
echo "=== chain5: gist_dim_bench rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 7200 python scripts/tpu_serve_bench.py 20000000 1024 65536 blocked-bf16-cap 1024 > logs/capacity_20m_3.log 2>&1
echo "=== chain5: capacity_20m rc=$? $(date) ===" | tee -a logs/tpu_queue.log
