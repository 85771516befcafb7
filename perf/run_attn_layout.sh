#!/bin/bash
# Layout experiments for the score matmul (BQ=704/hb=2 base).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:/root/.axon_site"
OUT=perf/attn_layout.jsonl

run() {
  echo "=== $* ===" >&2
  env ATTN_MODE=fwd ATTN_IMPL=pallas E3D_FLASH_BLOCK_Q=704 \
      E3D_FLASH_FWD_BUDGET_KB=768 "$@" timeout 900 \
      python perf/attn_bench.py >> "$OUT" 2>>perf/attn_layout.log
  echo "rc=$?" >&2
}

: > "$OUT"
run E3D_FLASH_KT=1
run E3D_FLASH_DOTGEN=1
run E3D_FLASH_KT=1 E3D_FLASH_NO_EXP=1 E3D_FLASH_NO_MASK=1 E3D_FLASH_NO_SCALE=1 E3D_FLASH_NO_MAXSUB=1
run E3D_FLASH_KT=1 E3D_FLASH_EXP_BF16=1
echo "LAYOUT DONE" >&2
