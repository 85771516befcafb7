#!/bin/bash
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=perf/attn_layout4.jsonl
run() {
  echo "=== $* ===" >&2
  env ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_KT=1 "$@" timeout 900 \
      python perf/attn_bench.py >> "$OUT" 2>>perf/attn_layout4.log
  echo "rc=$?" >&2
}
: > "$OUT"
run E3D_FLASH_BLOCK_Q=704 E3D_FLASH_FWD_BUDGET_KB=768 E3D_FLASH_PV_SPLIT=4
run E3D_FLASH_BLOCK_Q=704 E3D_FLASH_FWD_BUDGET_KB=768 E3D_FLASH_PV_SPLIT=2
run E3D_FLASH_BLOCK_Q=1408 E3D_FLASH_FWD_BUDGET_KB=512
run E3D_FLASH_BLOCK_Q=1408 E3D_FLASH_FWD_BUDGET_KB=512 E3D_FLASH_PV_SPLIT=4
echo "LAYOUT4 DONE" >&2
