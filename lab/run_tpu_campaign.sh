#!/bin/bash
# Round-3 TPU perf campaign. Run ONLY when the axon tunnel is healthy and
# NOTHING else is touching the TPU (single-client tunnel — see PERF_NOTES).
# Each step is serialized and bounded; results land in /tmp/campaign/.
set -u
OUT=/tmp/campaign
mkdir -p $OUT
cd "$(dirname "$0")/.."

run() {  # name timeout cmd...
  local name=$1 t=$2; shift 2
  echo "=== $name ==="
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "rc=$? (log: $OUT/$name.log)"
  tail -2 "$OUT/$name.log"
}

# 1. Headline bench with slab packing (first run since packing landed)
run bench_default 1800 python bench.py

# 2. EMA-on variant (BASELINE workload 4 cost)
run bench_ema 1200 env SSDT_BENCH_EMA=1 python bench.py

# 3. int8 full-step (fused kernel + packing)
run bench_int8 1200 env SSDT_BENCH_OPT=adamw8bit SSDT_BENCH_MOMENT=fp32 python bench.py

# 4. VAE-encode images/sec (regression check vs 68.2)
run bench_vae 1200 python bench_vae.py

# 4b. LoRA + custom-diffusion workload steps/s (BASELINE workloads 2/5)
run bench_lora 1200 env SSDT_BENCH_TARGET=lora_no-te python bench.py
run bench_cd 1200 env SSDT_BENCH_TARGET=custom_diffusion python bench.py

# 5. Sampling throughput (serving-side metric)
run bench_sample 1800 python bench_sample.py

# 6. Splash backward block sweep (quick grid)
run splash_sweep 3600 python lab/micro_splash_sweep.py quick

echo "campaign done; summarize into PERF_NOTES.md"
