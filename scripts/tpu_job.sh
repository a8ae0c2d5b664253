#!/bin/bash
# Single-TPU-job launcher with the round-3/4 hard-won guards baked in
# (.claude/skills/verify/SKILL.md "TPU job queueing"):
#   - refuses to start if another bench.py/train*.py process owns the TPU
#   - writes ITS OWN pid (not a nohup wrapper's) to /tmp/tpu_<name>.pid and
#     the trainer child's pid to /tmp/tpu_<name>.child.pid, so a later kill
#     targets real processes by PID, never by pattern
#   - stale-log watchdog: kills the child after $STALE seconds without log
#     writes (tunnel wedges stall silently; trainers print a line before
#     their first compile so a cold compile is not mistaken for a wedge)
#
# Usage: scripts/tpu_job.sh <name> <logfile> <stale_secs> <cmd...>
# Exit: child's exit code, or 99 if the watchdog killed it.
set -u
NAME="$1"; LOG="$2"; STALE="$3"; shift 3

echo $$ > "/tmp/tpu_${NAME}.pid"

# TPU-owner scan: any OTHER process whose cmdline mentions bench.py or a
# train script is assumed to hold the tunnel (one client at a time).
for f in /proc/[0-9]*/cmdline; do
    pid="${f#/proc/}"; pid="${pid%/cmdline}"
    [ "$pid" = "$$" ] && continue
    [ "$pid" = "$PPID" ] && continue
    cmd=$(tr '\0' ' ' < "$f" 2>/dev/null) || continue
    case "$cmd" in
        *bench.py*|*train_fused*|*train.py*|*__graft_entry__*)
            # ignore our own watchdog wrappers
            case "$cmd" in *tpu_job.sh*) continue;; esac
            echo "REFUSING to launch ${NAME}: TPU busy with pid ${pid}: ${cmd}" >&2
            exit 98;;
    esac
done

"$@" > "$LOG" 2>&1 &
CHILD=$!
echo "$CHILD" > "/tmp/tpu_${NAME}.child.pid"
echo "[tpu_job] ${NAME}: child pid ${CHILD}, log ${LOG}, stale budget ${STALE}s"

while kill -0 "$CHILD" 2>/dev/null; do
    sleep 30
    if [ -f "$LOG" ]; then
        now=$(date +%s)
        mt=$(stat -c %Y "$LOG")
        if [ $((now - mt)) -gt "$STALE" ]; then
            echo "[tpu_job] ${NAME}: WATCHDOG_KILLED after $((now - mt))s stale" | tee -a "$LOG" >&2
            kill "$CHILD" 2>/dev/null; sleep 5; kill -9 "$CHILD" 2>/dev/null
            exit 99
        fi
    fi
done
wait "$CHILD"
RC=$?
echo "[tpu_job] ${NAME}: child exited rc=${RC}"
exit $RC
