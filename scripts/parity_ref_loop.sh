#!/bin/bash
# Round-5 parity power fix (VERDICT r4 weak #2): drive the torch reference
# cells for the extended 16-pair ledger, one ~370 s CPU cell per
# invocation, until the ledger is complete. Runs nice -n19 so it only
# soaks cycles the TPU-driving processes leave idle (solver compiles leave
# the single host core idle for minutes at a time).
#
# Usage: bash scripts/parity_ref_loop.sh [ledger] [max_cells]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LEDGER=${1:-snapshot/full_parity_r5.jsonl}
MAX=${2:-40}
SEEDS=${3:-4}   # ref seeds per pair (session 2: 8 — CI ±0.148 → proj ±0.056)
LOG=snapshot/onchip_r5/parity_ref.log
mkdir -p snapshot/onchip_r5

for i in $(seq 1 "$MAX"); do
  echo "=== ref cell $i start $(date -u +%H:%M:%SZ) ===" >> "$LOG"
  out=$(PARITY_PAIRS=16 PARITY_SEEDS="$SEEDS" PARITY_SEEDS_OURS=16 \
        nice -n19 timeout 3000 python scripts/run_full_parity.py \
        "$LEDGER" ref 2>&1)
  rc=$?
  echo "$out" | tail -3 >> "$LOG"
  echo "=== ref cell $i exit=$rc $(date -u +%H:%M:%SZ) ===" >> "$LOG"
  if echo "$out" | grep -q "ALL CELLS DONE"; then
    echo "=== ledger complete ===" >> "$LOG"; break
  fi
  # a ref invocation that found nothing to do exits fast; stop looping
  if ! echo "$out" | grep -q "^ref pair"; then
    echo "=== no ref cell ran (rc=$rc) — stopping ===" >> "$LOG"; break
  fi
done
