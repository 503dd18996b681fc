#!/bin/bash
# Round-5 chip queue: the datapoints VERDICT r4 asked for, run back-to-back
# on the one real chip. Each step is timeout-bounded so a hang cannot eat
# the round. Results land in benchmarks/*.log / *.txt.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0

echo "=== [1/4] GQA datapoint (16 q heads x 4 kv heads, 128K) ==="
BENCH_KVHEADS=4 timeout 900 python bench.py > benchmarks/bench_gqa_r5.log 2>&1
echo "gqa rc=$?"
tail -2 benchmarks/bench_gqa_r5.log

echo "=== [2/4] MoE datapoint (DBRX-style FFN, 128K) ==="
BENCH_MOE=1 timeout 900 python bench.py > benchmarks/bench_moe_r5.log 2>&1
echo "moe rc=$?"
tail -2 benchmarks/bench_moe_r5.log

echo "=== [3/4] kernel sweep (fixed measurement, citable absolutes) ==="
{ timeout 700 python benchmarks/bench_kernels.py --ctx 131072 --bits 4 --flash
  timeout 500 python benchmarks/bench_kernels.py --ctx 131072 --bits 3
  timeout 500 python benchmarks/bench_kernels.py --ctx 131072 --bits 3 --pack --topk
} > benchmarks/kernel_sweep_r5.txt 2>&1
echo "sweep rc=$?"

echo "=== [4/4] 256K prefill remeasure (round-5 kernels, chunk 128) ==="
P256_MODEL=toy timeout 900 python benchmarks/prefill_256k.py \
    > benchmarks/prefill256k_toy_r5.log 2>&1
echo "prefill rc=$?"
tail -2 benchmarks/prefill256k_toy_r5.log
