#!/bin/bash
# UQ ensemble sweep (reference experiments/run-experiment.sh): R runs with
# uniform A-source, plus the independent variant.
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )/../" &> /dev/null && pwd )
export PYTHONPATH="${SCRIPT_DIR}"

runs=${1:-10}
procs=${2:--1}
exportcsv='E,E2,SA'
Asrc='uniform'
Aseed=85972
seed=2023
c0=0.89

fname="$c0-$Asrc-$seed"
options="--png --yaml -N 512 -s ${seed} -R ${runs} --A-source=${Asrc} --A-seed=${Aseed} -P ${procs} --threshold=${c0} --cinit=${c0}"
python -m chsimpy_tpu.experiment $options --export-csv="$exportcsv" -C --file-id="$fname"
python -m chsimpy_tpu.experiment $options --independent --export-csv="$exportcsv" -C --file-id="$fname-independent"
