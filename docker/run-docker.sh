#!/usr/bin/env bash
# Run the chsimpy_tpu container with the working tree mounted and the
# JupyterLab port forwarded (reference analogue:
# /root/reference/docker/run-docker.sh).
#
#   ./docker/run-docker.sh                         # interactive shell
#   ./docker/run-docker.sh chsimpy-tpu --help      # any command
#   ./docker/run-docker.sh jupyter lab --ip 0.0.0.0 --allow-root
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${CHSIMPY_TPU_IMAGE:-chsimpy-tpu:cpu}"
docker run -it --rm -p 8888:8888 \
    -w /work \
    -v "$(pwd):/work" \
    "$TAG" "${@:-bash}"
