#!/bin/bash
# Round-4 on-chip measurement queue (VERDICT r3 items 1-3): regenerate
# BENCH_ACCURACY.json with the fixed loss criterion, section by section
# so each completed section lands in the artifact even if the relay
# wedges mid-queue. parity_small runs at 6000 steps (the VERDICT item-7
# diagnostic); nano + temporal at the standard 3000.
#
# HISTORICAL (superseded by tools/r5_queue.sh, which adds per-section
# timeouts and rc aggregation — ADVICE r4 items 1+3; the cd guard below
# was backfilled for consistency).
set -uo pipefail
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r4_queue
mkdir -p "$LOG"

echo "== r4 queue start $(date -u +%FT%TZ) =="
python tools/bench_accuracy.py --only parity_small --steps 6000 \
    > "$LOG/parity.log" 2>&1
echo "parity_small rc=$? $(date -u +%FT%TZ)"
python tools/bench_accuracy.py --only nano --steps 3000 \
    > "$LOG/nano.log" 2>&1
echo "nano rc=$? $(date -u +%FT%TZ)"
python tools/bench_accuracy.py --only temporal --steps 3000 \
    > "$LOG/temporal.log" 2>&1
echo "temporal rc=$? $(date -u +%FT%TZ)"
echo "== r4 queue done =="
