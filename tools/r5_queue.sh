#!/bin/bash
# Round-5 on-chip measurement queue (VERDICT r4 items 2-4): temporal v2
# re-measure under the fixed grouped-lr recipe, the 6000-step
# parity_small diagnostic (with the CPU-backend-safe torch stage), and
# the nano criterion A/B. Sections are independent processes with
# per-section timeouts (ADVICE r4: a relay wedge mid-section must log
# rc=124 and let the rest of the queue proceed, not hang it forever)
# and every rc is printed AND checked into the summary line.
set -uo pipefail
cd "$(dirname "$0")/.." || exit 1
LOG=/tmp/r5_queue
mkdir -p "$LOG"
declare -A RC

run_section() {
    local name="$1" tmo="$2"; shift 2
    echo "-- $name start $(date -u +%FT%TZ)"
    timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
    RC[$name]=$?
    echo "-- $name rc=${RC[$name]} $(date -u +%FT%TZ)"
}

echo "== r5 queue start $(date -u +%FT%TZ) =="
# parity6000 first: its path is fully smoke-validated (the temporal
# section's new v2 recipe smoke is still completing when the queue
# launches; it lands before the chip reaches that section)
run_section parity6000 10800 \
    python tools/bench_accuracy.py --only parity_small --steps 6000
run_section temporal 10800 \
    python tools/bench_accuracy.py --only temporal --steps 3000
run_section ab_legacy 7200 python tools/criterion_ab.py --arm legacy
run_section ab_fixed2x 10800 python tools/criterion_ab.py --arm fixed2x

fail=0
for k in "${!RC[@]}"; do
    [ "${RC[$k]}" -ne 0 ] && { echo "FAILED: $k rc=${RC[$k]}"; fail=1; }
done
echo "== r5 queue done fail=$fail =="
exit "$fail"
