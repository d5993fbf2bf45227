#!/usr/bin/env bash
# Bump the package version (reference release-version.sh equivalent).
set -e
NEW=${1:?usage: release-version.sh <version>}
SCRIPT_DIR=$( cd -- "$( dirname -- "${BASH_SOURCE[0]}" )/../" &> /dev/null && pwd )
echo "__version__ = \"${NEW}\"" > "${SCRIPT_DIR}/chsimpy_tpu/version.py"
echo "version set to ${NEW}"
