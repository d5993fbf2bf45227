#!/usr/bin/env bash
# Smoke suite (reference tests/run-tests.sh equivalent): unit tests, a tiny
# benchmark, CLI runs across view modes, and an experiment run; pass/fail by
# exit code.
set -e
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )/../" &> /dev/null && pwd )
export PYTHONPATH="${SCRIPT_DIR}"
export MPLBACKEND=Agg
cd "$(mktemp -d)"

python -m pytest "${SCRIPT_DIR}/tests" -q -x

python -m chsimpy_tpu.benchmarks.bench -N 100 -n 50 -R 1 -w 0 --no-gui \
    --cinit 0.875 -K 3e-4
python -m chsimpy_tpu -n 100 -N 64 --no-gui -K 3e-4
python -m chsimpy_tpu -n 100 -N 64 --no-diagrams --update-every=50 \
    -g simplex --png --no-gui -K 3e-4
python -m chsimpy_tpu.experiment --ntmax 50 -N 64 -R 2 -K 3e-4 --no-gui

echo "ALL SMOKE TESTS PASSED"
