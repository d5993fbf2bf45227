#!/usr/bin/env bash
# Build the chsimpy_tpu container images (reference analogue:
# /root/reference/docker/build-docker.sh).
#
#   ./docker/build-docker.sh          # CPU image (validation contract)
#   ./docker/build-docker.sh tpu      # TPU image (jax[tpu] wheels)
set -euo pipefail
cd "$(dirname "$0")/.."
export DOCKER_BUILDKIT=1

TARGET="${1:-cpu}"
TAG="chsimpy-tpu:${TARGET}"
docker build --target "$TARGET" -t "$TAG" -f docker/Dockerfile .
echo "built $TAG"
