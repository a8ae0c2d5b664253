#!/bin/bash
# Sequential TPU job queue (round 5). ONE instance at a time (pid file +
# flock). Reads job lines from $JOBS (default /tmp/r5_jobs.txt), format:
#   name|logfile|stale_secs|command...
# Lines are claimed in order; completed names land in $DONE so appending
# new lines while the queue runs is safe. Between jobs the axon tunnel is
# probed with a bounded COMPUTATION (verify SKILL.md: device enumeration
# can answer while the execution path is wedged); on probe failure the
# queue waits and re-probes instead of wedging a trainer mid-compile.
#
# Usage: setsid bash scripts/tpu_queue.sh &   (then append to $JOBS)
set -u
JOBS="${JOBS:-/tmp/r5_jobs.txt}"
DONE="${DONE:-/tmp/r5_done.txt}"
QLOG="${QLOG:-/tmp/r5_queue.log}"
cd /root/repo

echo $$ > /tmp/r5_queue.pid
exec 8>/tmp/r5_queue.lock
if ! flock -n 8; then
    echo "another tpu_queue.sh holds the lock; exiting" >&2
    exit 97
fi
touch "$JOBS" "$DONE"

qlog() { echo "[queue $(date +%H:%M:%S)] $*" >> "$QLOG"; }

probe_tunnel() {
    timeout 100 python -c \
        "import jax; jax.devices(); import jax.numpy as jnp; float(jnp.ones(2).sum())" \
        >/dev/null 2>&1
}

qlog "queue runner started (pid $$, jobs $JOBS)"
idle=0
while :; do
    next=""
    while IFS= read -r line; do
        [ -z "$line" ] && continue
        case "$line" in \#*) continue;; esac
        name="${line%%|*}"
        if ! grep -qx "$name" "$DONE" 2>/dev/null; then
            next="$line"; break
        fi
    done < "$JOBS"

    if [ -z "$next" ]; then
        idle=$((idle + 30))
        sleep 30
        continue
    fi
    idle=0
    name="${next%%|*}"; rest="${next#*|}"
    log="${rest%%|*}"; rest="${rest#*|}"
    stale="${rest%%|*}"; cmd="${rest#*|}"

    if [ "$name" = "STOP" ]; then
        qlog "STOP sentinel; queue exiting"
        exit 0
    fi

    # Wait for a healthy tunnel (bounded probes, 60s apart, up to 30 min).
    tries=0
    until probe_tunnel; do
        tries=$((tries + 1))
        qlog "tunnel probe failed for ${name} (try ${tries}); waiting 60s"
        if [ "$tries" -ge 30 ]; then
            qlog "tunnel still dead after 30 min; marking ${name} SKIPPED_TUNNEL"
            echo "$name" >> "$DONE"
            continue 2
        fi
        sleep 60
    done

    qlog "starting ${name}: ${cmd} (log ${log}, stale ${stale}s)"
    # tpu_job.sh refuses (rc 98) while another client owns the TPU —
    # retry a few times in case a previous child is still unwinding.
    rc=98
    for _ in 1 2 3 4 5; do
        bash scripts/tpu_job.sh "$name" "$log" "$stale" $cmd >> "$QLOG" 2>&1
        rc=$?
        [ "$rc" -ne 98 ] && break
        qlog "${name}: TPU busy (rc 98), retrying in 60s"
        sleep 60
    done
    qlog "finished ${name}: rc=${rc}"
    echo "$name" >> "$DONE"
done
