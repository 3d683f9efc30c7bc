#!/bin/bash
# Chain job 6: after chain 5 -
#  - gist_dim_bench rerun (chain-5 run died on the cache-hit dummy bundle's
#    k_gt > n_base; fixed);
#  - kernel microbench (screen TFLOPS with in-kernel norms, to separate any
#    kernel cost from the rig slowdown seen in bench_r3_check3);
#  - bench.py once more on a hopefully quieter rig.
cd /root/repo
pid=$(cat /tmp/tpu_chain5.pid 2>/dev/null)
if [ -n "$pid" ]; then
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
fi
echo "=== chain6: start $(date) ===" | tee -a logs/tpu_queue.log
timeout 7200 python scripts/gist_dim_bench.py > logs/gist_dim_bench3.log 2>&1
echo "=== chain6: gist_dim_bench rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 3600 python scripts/kernel_micro.py > logs/kernel_micro7.log 2>&1
echo "=== chain6: kernel_micro rc=$? $(date) ===" | tee -a logs/tpu_queue.log
timeout 3600 python bench.py > logs/bench_r3_check4.log 2>&1
echo "=== chain6: bench_check rc=$? $(date) ===" | tee -a logs/tpu_queue.log
