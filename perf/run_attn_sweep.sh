#!/bin/bash
# Attention-kernel config sweep on the real TPU. One fresh process per
# config (importlib.reload of custom_vjp modules gives garbage timings).
# Results appended as JSON lines to perf/attn_results.jsonl.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=perf/attn_results.jsonl

run() {
  echo "=== $* ===" >&2
  env "$@" timeout 900 python perf/attn_bench.py >> "$OUT" 2>>perf/attn_sweep.log
  echo "rc=$?" >&2
}

: > "$OUT"
# forward sweep
run ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=128 E3D_FLASH_FWD_BUDGET_KB=3072
run ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=352 E3D_FLASH_FWD_BUDGET_KB=3072
run ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=352 E3D_FLASH_FWD_BUDGET_KB=1536
run ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=704 E3D_FLASH_FWD_BUDGET_KB=1536
run ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=704 E3D_FLASH_FWD_BUDGET_KB=768
run ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=1408 E3D_FLASH_FWD_BUDGET_KB=768
run ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=128 E3D_FLASH_FWD_BUDGET_KB=3072 E3D_FLASH_EXP_BF16=1
run ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=704 E3D_FLASH_FWD_BUDGET_KB=768 E3D_FLASH_EXP_BF16=1
run ATTN_MODE=fwd ATTN_IMPL=stock
echo "SWEEP DONE" >&2
