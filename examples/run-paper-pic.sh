#!/usr/bin/env bash
# Paper-artifact runs (reference examples/run-paper-pic.sh): four simulated
# durations at c0=0.875, PNG + YAML + CSV exports.
set -e
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )/../" &> /dev/null && pwd )
export PYTHONPATH="${SCRIPT_DIR}"
chsimpy='python -m chsimpy_tpu'

c0=0.875
for t in 1 60 320 1020; do
  echo "$t min"
  $chsimpy --cinit=$c0 --threshold=$c0 -t $t -z --no-diagrams --png --yaml \
    --export-csv='E2,E,U,SA' --file-id="paper-pic-${t}min-$c0" --no-gui
done
