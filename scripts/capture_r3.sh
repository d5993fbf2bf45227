#!/usr/bin/env bash
# Round-3 on-chip capture battery — fire THE MOMENT the tunnel is healthy
# (single TPU process at a time — CLAUDE.md rule 1).
#
# Round 2's perf story exists only as builder-side notes because the
# tunnel died before the driver's capture; this battery re-establishes
# every claim as a logged artifact, cheapest-first so a mid-battery drop
# keeps the most valuable results:
#   1. official bench.py metric (the round artifact)
#   2. on-chip golden replay (f64 contract on the chip)
#   3. f32 canonical stop-step (the _sum2_f64 stabilization: expect 1674)
#   4. f64 canonical N=512 validation run
#   5. f32 transform headroom baseline (dct_bench)
set -u
set -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-capture_r3.log}

# single-client chip coordination (see bench.py's mutex notes): acquire
# the atomic chip mutex before the first chip step — a driver bench that
# is already running holds it, and we wait for it.  The mutex dir is
# re-touched between steps so holders are distinguishable from crash
# leftovers; CHSIMPY_CAPTURE=1 stops our own bench.py step from
# re-acquiring (it inherits ours).
MUTEX=chip.lock.d
HAVE_MUTEX=0
acquire_mutex() {
    local t0 budget pid
    t0=$(date +%s); budget=${MUTEX_BUDGET_S:-3600}
    while true; do
        if mkdir "$MUTEX" 2>/dev/null; then
            echo "battery $$" > "$MUTEX/owner"
            HAVE_MUTEX=1
            return 0
        fi
        pid=$(awk '{print $2}' "$MUTEX/owner" 2>/dev/null || true)
        if [ -n "${pid:-}" ] && ! kill -0 "$pid" 2>/dev/null; then
            echo "breaking stale chip mutex (dead pid $pid)" | tee -a "$LOG"
            rm -rf "$MUTEX"; continue
        fi
        if [ -d "$MUTEX" ] && \
           [ -z "$(find "$MUTEX" -maxdepth 0 -mmin -180 2>/dev/null)" ]; then
            echo "breaking stale chip mutex (mtime >3h)" | tee -a "$LOG"
            rm -rf "$MUTEX"; continue
        fi
        if [ $(( $(date +%s) - t0 )) -ge "$budget" ]; then
            return 1
        fi
        sleep 30
    done
}
release_mutex() {
    [ "$HAVE_MUTEX" = 1 ] && rm -rf "$MUTEX"
}
trap release_mutex EXIT
export CHSIMPY_CAPTURE=1

if ! acquire_mutex; then
    echo "capture battery: chip mutex never freed; aborting" | tee -a "$LOG"
    exit 1
fi

echo "== r3 capture battery $(date -u +%FT%TZ) ==" | tee -a "$LOG"

run() {
    touch "$MUTEX"   # live-holder heartbeat for the staleness checks
    echo "--- $* ---" | tee -a "$LOG"
    timeout "${T:-1800}" "$@" 2>&1 | tee -a "$LOG"
    echo "exit=${PIPESTATUS[0]}" | tee -a "$LOG"
}

# 1. the official driver metric
T=3600 run python bench.py

# 2. f64 contract on the chip (auto transform = ozaki on TPU f64)
run python scripts/tpu_golden_replay.py

# 3. f32 stop-step stabilization: the canonical default run in fast mode
#    must now stop at step 1674 like the reference (was 1669-1673 before
#    the f64-outer-accumulation change, PERFORMANCE.md accuracy table).
#    (--no-gui without --png drops the view, so update_every is off.)
run python -m chsimpy_tpu -N 512 -n 5000 --no-gui \
    --precision float32 -f r3f32stop

# 4. canonical f64 N=512 on-chip validation run (stop step + E contract)
run python -m chsimpy_tpu -N 512 -n 5000 --no-gui \
    --precision float64 -f r3f64stop

# (the round-3 fused-ozaki ship-or-kill battery ran 2026-08-19 — killed;
# record in artifacts/r3/capture_r3_fused.log and PERFORMANCE.md)

# 5. f32 transform headroom: fold routes vs the production perm routes
#    (substring filter: all split-perm/fold variants + the matmul anchor)
run python -m chsimpy_tpu.benchmarks.dct_bench \
    --sizes 2048,4096 --dtypes float32 --routes perm,fold,matmul --reps 4

# 6. end-to-end --fold-field decision run at N=4096 f32 (vs the default)
for F in "" "--fold-field"; do
    run python -m chsimpy_tpu.benchmarks.bench -N 4096 -n 256 -R 2 -w 1 \
        --warmup-ntmax 64 --no-gui --precision float32 $F \
        -K 2.98911291966116e-4
done

echo "== r3 battery done $(date -u +%FT%TZ) ==" | tee -a "$LOG"
