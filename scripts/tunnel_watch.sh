#!/usr/bin/env bash
# Probe the axon TPU tunnel; fire the round-3 capture battery the moment it
# recovers. One TPU process at a time (CLAUDE.md rule 1): the probe itself
# is the only client, and the battery only starts after a probe succeeds.
set -u
cd "$(dirname "$0")/.."
DEADLINE=$(( $(date +%s) + ${WATCH_BUDGET_S:-36000} ))
echo "tunnel_watch: start $(date -u +%FT%TZ), deadline in ${WATCH_BUDGET_S:-36000}s"
n=0
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    n=$((n+1))
    # a live chip-mutex holder (driver bench or a battery) owns the
    # single-client tunnel: don't even probe against it.  Stale mutexes
    # are broken by the acquirers (capture_r3.sh / bench.py), not here.
    holder_pid=$(awk '{print $2}' chip.lock.d/owner 2>/dev/null || true)
    if [ -n "${holder_pid:-}" ] && kill -0 "$holder_pid" 2>/dev/null; then
        echo "tunnel_watch: chip mutex held (pid $holder_pid), deferring probe $n"
        sleep 120
        continue
    fi
    if timeout -k 10 90 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.ones((4,4)).sum()))
" >/dev/null 2>&1; then
        echo "tunnel_watch: probe $n OK at $(date -u +%FT%TZ) — firing battery"
        # the battery acquires the chip mutex atomically itself (and
        # waits if a driver bench started in the meantime)
        bash scripts/capture_r3.sh capture_r3.log
        echo "tunnel_watch: battery finished at $(date -u +%FT%TZ)"
        exit 0
    fi
    echo "tunnel_watch: probe $n down at $(date -u +%FT%TZ)"
    sleep 120
done
echo "tunnel_watch: deadline reached without tunnel recovery"
exit 1
