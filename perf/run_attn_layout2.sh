#!/bin/bash
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=perf/attn_layout2.jsonl

run() {
  echo "=== $* ===" >&2
  env ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=704 \
      E3D_FLASH_FWD_BUDGET_KB=768 E3D_FLASH_KT=1 "$@" timeout 900 \
      python perf/attn_bench.py >> "$OUT" 2>>perf/attn_layout2.log
  echo "rc=$?" >&2
}

: > "$OUT"
run E3D_FLASH_DIMSEM=1
run E3D_FLASH_S_BF16=1
run E3D_FLASH_DIMSEM=1 E3D_FLASH_S_BF16=1 E3D_FLASH_EXP_BF16=1
env ATTN_MODE=fwd ATTN_IMPL=stock STOCK_BQ=704 STOCK_BKM=1408 STOCK_BK=128 \
  timeout 900 python perf/attn_bench.py >> "$OUT" 2>>perf/attn_layout2.log
echo "LAYOUT2 DONE" >&2
