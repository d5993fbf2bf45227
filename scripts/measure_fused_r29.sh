#!/usr/bin/env bash
# Round-2.9 fused-ozaki measurement battery (run when the TPU tunnel is
# healthy; single TPU process at a time — CLAUDE.md rule 1).
#
# Order matters: transform-level timing first (cheap adoption signal),
# then the accuracy gates, then end-to-end steps/s.  Each step appends to
# the log so a mid-battery tunnel drop keeps partial results.
set -u
set -o pipefail
cd "$(dirname "$0")/.."
LOG=${1:-fused_r29_measurements.log}
echo "== fused-ozaki r2.9 battery $(date -u +%FT%TZ) ==" | tee -a "$LOG"

run() {
    echo "--- $* ---" | tee -a "$LOG"
    timeout 1800 "$@" 2>&1 | tee -a "$LOG"
    echo "exit=${PIPESTATUS[0]}" | tee -a "$LOG"
}

# 1. transform bake-off: fused routes vs the production pairwise route
run python -m chsimpy_tpu.benchmarks.dct_bench \
    --sizes 2048,4096 --dtypes float64 \
    --routes ozaki-int8 --reps 4

# 2. component profile (P-rows = production, F-rows = fused kernels)
run python -m chsimpy_tpu.benchmarks.ozaki_profile -N 4096 --inner 10 --reps 4

# 3. accuracy gates on the chip: golden replay forced through the fused path
run python scripts/tpu_golden_replay.py --kernels pallas-fused

# 4. end-to-end f64 steps/s at N=4096, fused vs current pallas default
for K in pallas pallas-fused; do
    run python -m chsimpy_tpu.benchmarks.bench -N 4096 -n 128 -R 2 -w 1 \
        --warmup-ntmax 32 --no-gui --precision float64 --transform ozaki \
        --kernels "$K" -K 2.98911291966116e-4
done

echo "== battery done; adoption gate: canonical N=512 run (see" \
     "PERFORMANCE.md round 2.8 protocol) before changing any default ==" \
    | tee -a "$LOG"
