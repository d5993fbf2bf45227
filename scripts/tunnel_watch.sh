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
    # a running driver bench owns the chip: defer both the probe and the
    # battery until its lock clears (bench.py removes it on every exit
    # path; treat >70 min as a crash leftover — the bench watchdog is 55)
    if [ -f bench_running.lock ] && [ -n "$(find bench_running.lock -mmin -70 2>/dev/null)" ]; then
        echo "tunnel_watch: driver bench running, deferring probe $n"
        sleep 120
        continue
    fi
    if timeout -k 10 90 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jnp.ones((4,4)).sum()))
" >/dev/null 2>&1; then
        if [ -f bench_running.lock ] && [ -n "$(find bench_running.lock -mmin -70 2>/dev/null)" ]; then
            echo "tunnel_watch: tunnel up but driver bench started, deferring"
            sleep 120
            continue
        fi
        echo "tunnel_watch: probe $n OK at $(date -u +%FT%TZ) — firing battery"
        bash scripts/capture_r3.sh capture_r3.log
        echo "tunnel_watch: battery finished at $(date -u +%FT%TZ)"
        exit 0
    fi
    echo "tunnel_watch: probe $n down at $(date -u +%FT%TZ)"
    sleep 120
done
echo "tunnel_watch: deadline reached without tunnel recovery"
exit 1
